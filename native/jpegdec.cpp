// JPEG decoder for TIFF tile payloads (SURVEY.md N5: the openslide
// replacement).  Scope: baseline/extended sequential DCT (SOF0/SOF1)
// AND progressive DCT (SOF2, spectral selection + successive
// approximation), 8-bit samples, 1- or 3-component, interleaved or
// per-component scans, restart markers, and TIFF's abbreviated
// datastreams (tag 347 JPEGTables parsed first, then the per-tile
// SOI..SOS..EOI stream — the layout Aperio .svs and QuPath exports use).
// Arithmetic-coded, lossless, 12-bit and CMYK streams return
// kUnsupported and the Python caller falls back to PIL
// (data/tiffslide.py).
//
// Purpose-written for this repo: float matrix IDCT (two 8x8 matmuls per
// block — accuracy over table tricks; diffs vs libjpeg's islow are <=1
// LSB), nearest-neighbor chroma upsampling (libjpeg's "fancy" triangular
// filter differs by a few LSB on smooth data; segmentation masks are
// insensitive to it and tests bound the delta).
//
// Not derived from libjpeg/stb_image/nanojpeg — the decoder follows
// ITU-T T.81 directly with this file's own structure.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

enum : int32_t {
  kOk = 0,
  kCorrupt = 3,
  kUnsupported = 4,
  kBadArgument = 5,
  kDecodeError = 7,
};

// zigzag position -> natural (row-major) index, T.81 figure A.6
const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct HuffTable {
  // canonical decode tables (T.81 F.2.2.3): per code length 1..16
  int32_t mincode[17];
  int32_t maxcode[17];
  int32_t valptr[17];
  uint8_t vals[256];
  // 8-bit lookahead: (len << 8) | symbol for codes <= 8 bits (the vast
  // majority of symbols in practice); 0xFFFF = take the per-bit slow path
  uint16_t lut[256];
  bool present = false;

  bool build(const uint8_t counts[16], const uint8_t* symbols, int n_syms) {
    if (n_syms > 256) return false;
    std::memcpy(vals, symbols, n_syms);
    int32_t code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      valptr[l] = k;
      mincode[l] = code;
      code += counts[l - 1];
      k += counts[l - 1];
      // canonical-code overflow check: a valid table never assigns more
      // codes at length l than the code space holds (corrupt DHTs
      // otherwise index past lut[256] below)
      if (code > (1 << l)) return false;
      maxcode[l] = code - 1;
      if (counts[l - 1] == 0) maxcode[l] = -1;
      code <<= 1;
    }
    if (k != n_syms) return false;
    for (int i = 0; i < 256; ++i) lut[i] = 0xFFFF;
    k = 0;
    code = 0;
    for (int l = 1; l <= 8; ++l) {
      for (int c = 0; c < counts[l - 1]; ++c, ++k) {
        int32_t cc = mincode[l] + c;
        int fill_n = 1 << (8 - l);
        for (int f = 0; f < fill_n; ++f)
          lut[(cc << (8 - l)) | f] =
              static_cast<uint16_t>((l << 8) | vals[valptr[l] + c]);
      }
    }
    present = true;
    return true;
  }
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  int marker = 0;   // marker byte encountered in the entropy stream (RST/EOI)

  uint64_t acc = 0;  // left-aligned: top `nbits` bits are valid
  int nbits = 0;
  // truncation accounting: bits of REAL stream data pushed into acc vs
  // bits consumed by decoding.  fill() pads phantom zero bits past the
  // data / a marker (T.81 F.2.2.5 lets the final code complete with
  // arbitrary bits), which is fine as lookahead — but if decoding ever
  // CONSUMES beyond the real bits, the stream was truncated mid-scan and
  // the decoded tail is garbage (consumed > pushed at scan end).
  int64_t pushed = 0;
  int64_t consumed = 0;

  explicit BitReader(const uint8_t* data, size_t len)
      : p(data), end(data + len) {}

  // next entropy bytes with 0xFF00 stuffing; stops at markers.  Fast path
  // ingests 4 stuff-free bytes at once (0xFF bytes are rare in entropy
  // data); the serial bit stream is the decoder's critical path.
  void fill() {
    while (nbits <= 56) {
      if (!marker && nbits <= 32 && end - p >= 4) {
        uint32_t w;
        std::memcpy(&w, p, 4);
        // any byte == 0xFF?  (haszero trick on ~w)
        uint32_t nw = ~w;
        if (!((nw - 0x01010101u) & ~nw & 0x80808080u)) {
          p += 4;
          acc |= static_cast<uint64_t>(__builtin_bswap32(w)) << (32 - nbits);
          nbits += 32;
          pushed += 32;
          continue;
        }
      }
      if (marker || p >= end) {
        nbits += 8;  // phantom zero padding — not counted as pushed
        continue;
      }
      uint8_t b = *p++;
      if (b == 0xFF) {
        if (p < end && *p == 0x00) {
          ++p;  // stuffed 0xFF data byte
        } else if (p < end) {
          marker = *p;  // leave position at the marker id
          nbits += 8;
          continue;
        } else {
          nbits += 8;  // 0xFF at buffer end: treat as phantom
          continue;
        }
      }
      acc |= static_cast<uint64_t>(b) << (56 - nbits);
      nbits += 8;
      pushed += 8;
    }
  }

  int get_bits(int n) {  // MSB-first, n <= 16
    if (n == 0) return 0;
    if (nbits < n) fill();
    int v = static_cast<int>(acc >> (64 - n));
    acc <<= n;
    nbits -= n;
    consumed += n;
    return v;
  }

  int get_bit() { return get_bits(1); }

  bool truncated() const { return consumed > pushed; }

  // consume the pending restart marker and realign
  bool take_restart(int expected_rst) {
    if (!marker) fill();  // byte-aligned boundary: the marker is next in p
    acc = 0;
    nbits = 0;
    consumed = pushed;  // discarded alignment bits: re-sync the accounting
    if (marker < 0xD0 || marker > 0xD7) return false;
    if ((marker & 7) != (expected_rst & 7)) return false;
    ++p;  // step past the marker id (p was left pointing at it)
    marker = 0;
    return true;
  }

  int decode_huff(const HuffTable& t) {
    if (nbits < 16) fill();
    uint16_t e = t.lut[acc >> 56];
    if (e != 0xFFFF) {
      int l = e >> 8;
      acc <<= l;
      nbits -= l;
      consumed += l;
      return e & 0xFF;
    }
    // slow path: codes longer than 8 bits
    int code = get_bits(8);
    for (int l = 9; l <= 16; ++l) {
      code = (code << 1) | get_bit();
      if (t.maxcode[l] >= 0 && code <= t.maxcode[l])
        return t.vals[t.valptr[l] + code - t.mincode[l]];
    }
    return -1;
  }
};

inline int extend(int v, int t) {
  // T.81 F.2.2.1: map the t-bit magnitude to its signed value
  if (t == 0) return 0;
  return (v < (1 << (t - 1))) ? v - (1 << t) + 1 : v;
}

struct Component {
  int id = 0;
  int h = 1, v = 1;  // sampling factors
  int tq = 0;        // quant table id
  int td = 0, ta = 0;  // huff table ids (from SOS)
  int dc_pred = 0;
  // padded plane at this component's resolution (mcu-aligned)
  std::vector<uint8_t> plane;
  int plane_w = 0, plane_h = 0;
  int samp_w = 0, samp_h = 0;  // valid sample extent (ceil(W*h/hmax) etc.)
  // progressive mode: per-block coefficients in ZIGZAG order, accumulated
  // across scans and dequantized+IDCTed at EOI (int32: successive
  // approximation shifts can exceed int16 on hostile streams)
  std::vector<int32_t> coefs;
  int blocks_w = 0, blocks_h = 0;
};

struct Decoder {
  uint16_t qt[4][64];  // zigzag order, as stored
  bool qt_present[4] = {false, false, false, false};
  HuffTable dc[4], ac[4];
  Component comp[4];
  int ncomp = 0;
  int width = 0, height = 0;
  int hmax = 1, vmax = 1;
  int restart_interval = 0;
  int adobe_transform = -1;  // APP14 "Adobe" transform byte, -1 = absent
  int color_hint = -1;       // container hint: 0 = RGB, 1 = YCbCr, -1 = none
  bool jfif_seen = false;    // APP0 "JFIF": 3-component is YCbCr by spec
  bool progressive = false;  // SOF2: coefficients accumulate across scans
  bool scan_seen = false;
  int eobrun = 0;            // progressive AC end-of-band run counter

  // 8x8 IDCT basis: M[x][u] = Cu * cos((2x+1) u pi / 16)
  float basis[8][8];

  Decoder() {
    const double inv_sqrt2 = 0.70710678118654752440;
    for (int x = 0; x < 8; ++x)
      for (int u = 0; u < 8; ++u)
        basis[x][u] = static_cast<float>(
            (u == 0 ? inv_sqrt2 : 1.0) *
            std::cos((2 * x + 1) * u * M_PI / 16.0));
  }

  // round-half-up without the libm lround call; callers clamp to [0,255]
  // right after, so truncation artifacts below zero are clamped away
  static inline uint8_t clamp_u8(float v) {
    int pix = static_cast<int>(v + 0.5f);
    return static_cast<uint8_t>(std::min(255, std::max(0, pix)));
  }

  // spatial = (1/4) * M * F * M^T, +128 level shift, clamp to u8
  void idct_block(const float F[64], int n_ac, uint8_t* out, int out_stride) {
    if (n_ac == 0) {
      // DC-only block (the common case on smooth H&E tissue): the
      // spatial plane is the constant F[0]/8
      uint8_t v = clamp_u8(F[0] * 0.125f + 128.0f);
      for (int y = 0; y < 8; ++y)
        std::memset(out + y * out_stride, v, 8);
      return;
    }
    // two 8x8 matmul passes (a broadcast-FMA restructure with zero-skip
    // was measured SLOWER on this core, with and without AVX2 — the
    // decoder's bottleneck is the serial Huffman bit stream, not this)
    float tmp[64];
    for (int x = 0; x < 8; ++x) {
      for (int v = 0; v < 8; ++v) {
        float s = 0.0f;
        for (int u = 0; u < 8; ++u) s += basis[x][u] * F[v * 8 + u];
        tmp[v * 8 + x] = s;  // tmp[v][x] = sum_u M[x][u] F[v][u]
      }
    }
    for (int y = 0; y < 8; ++y) {
      for (int x = 0; x < 8; ++x) {
        float s = 0.0f;
        for (int v = 0; v < 8; ++v) s += basis[y][v] * tmp[v * 8 + x];
        out[y * out_stride + x] = clamp_u8(0.25f * s + 128.0f);
      }
    }
  }

  // decode one 8x8 block of component c into its plane at (bx, by) blocks
  int decode_block(BitReader& br, Component& c, int bx, int by) {
    const HuffTable& dct = dc[c.td];
    const HuffTable& act = ac[c.ta];
    if (!dct.present || !act.present || !qt_present[c.tq]) return kCorrupt;
    const uint16_t* q = qt[c.tq];

    float F[64];
    std::memset(F, 0, sizeof(F));
    int t = br.decode_huff(dct);
    if (t < 0 || t > 15) return kDecodeError;
    int diff = extend(br.get_bits(t), t);
    c.dc_pred += diff;
    F[0] = static_cast<float>(c.dc_pred * q[0]);

    int k = 1, n_ac = 0;
    while (k < 64) {
      int rs = br.decode_huff(act);
      if (rs < 0) return kDecodeError;
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r == 15) {  // ZRL: sixteen zeros
          k += 16;
          continue;
        }
        break;  // EOB
      }
      k += r;
      if (k > 63) return kDecodeError;
      int coef = extend(br.get_bits(s), s);
      F[kZigzag[k]] = static_cast<float>(coef * q[k]);
      ++k;
      ++n_ac;
    }

    uint8_t* dst = c.plane.data() +
                   (static_cast<size_t>(by) * 8 * c.plane_w + bx * 8);
    idct_block(F, n_ac, dst, c.plane_w);
    return kOk;
  }

  int parse_dqt(const uint8_t* p, int len) {
    int pos = 0;
    while (pos < len) {
      int pq = p[pos] >> 4, tq = p[pos] & 15;
      ++pos;
      if (tq > 3 || pq > 1) return kCorrupt;
      int need = pq ? 128 : 64;
      if (pos + need > len) return kCorrupt;
      for (int i = 0; i < 64; ++i)
        qt[tq][i] = pq ? static_cast<uint16_t>((p[pos + 2 * i] << 8) |
                                               p[pos + 2 * i + 1])
                       : p[pos + i];
      qt_present[tq] = true;
      pos += need;
    }
    return kOk;
  }

  int parse_dht(const uint8_t* p, int len) {
    int pos = 0;
    while (pos + 17 <= len) {
      int tc = p[pos] >> 4, th = p[pos] & 15;
      ++pos;
      if (tc > 1 || th > 3) return kCorrupt;
      const uint8_t* counts = p + pos;
      pos += 16;
      int n = 0;
      for (int i = 0; i < 16; ++i) n += counts[i];
      if (pos + n > len) return kCorrupt;
      HuffTable& t = tc ? ac[th] : dc[th];
      if (!t.build(counts, p + pos, n)) return kCorrupt;
      pos += n;
    }
    return pos == len ? kOk : kCorrupt;
  }

  int parse_sof(const uint8_t* p, int len) {
    if (len < 6) return kCorrupt;
    if (p[0] != 8) return kUnsupported;  // 12-bit
    height = (p[1] << 8) | p[2];
    width = (p[3] << 8) | p[4];
    ncomp = p[5];
    if (width <= 0 || height <= 0) return kCorrupt;
    if (ncomp != 1 && ncomp != 3) return kUnsupported;  // CMYK etc.
    if (len < 6 + 3 * ncomp) return kCorrupt;
    hmax = vmax = 1;
    for (int i = 0; i < ncomp; ++i) {
      comp[i].id = p[6 + 3 * i];
      comp[i].h = p[7 + 3 * i] >> 4;
      comp[i].v = p[7 + 3 * i] & 15;
      comp[i].tq = p[8 + 3 * i];
      if (comp[i].h < 1 || comp[i].h > 4 || comp[i].v < 1 || comp[i].v > 4 ||
          comp[i].tq > 3)
        return kCorrupt;
      hmax = std::max(hmax, comp[i].h);
      vmax = std::max(vmax, comp[i].v);
    }
    // allocate mcu-aligned planes
    int mcux = (width + 8 * hmax - 1) / (8 * hmax);
    int mcuy = (height + 8 * vmax - 1) / (8 * vmax);
    for (int i = 0; i < ncomp; ++i) {
      comp[i].plane_w = mcux * comp[i].h * 8;
      comp[i].plane_h = mcuy * comp[i].v * 8;
      comp[i].plane.assign(
          static_cast<size_t>(comp[i].plane_w) * comp[i].plane_h, 0);
      comp[i].samp_w = (width * comp[i].h + hmax - 1) / hmax;
      comp[i].samp_h = (height * comp[i].v + vmax - 1) / vmax;
      if (progressive) {
        comp[i].blocks_w = mcux * comp[i].h;
        comp[i].blocks_h = mcuy * comp[i].v;
        comp[i].coefs.assign(static_cast<size_t>(comp[i].blocks_w) *
                                 comp[i].blocks_h * 64,
                             0);
      }
    }
    return kOk;
  }

  // entropy-coded scan: p points at the first entropy byte, len to stream
  // end; returns bytes consumed via *consumed
  int decode_scan(const uint8_t* hdr, int hdr_len, const uint8_t* data,
                  size_t data_len) {
    if (hdr_len < 4) return kCorrupt;
    int ns = hdr[0];
    if (ns < 1 || ns > 4 || hdr_len < 1 + 2 * ns + 3) return kCorrupt;
    Component* scomp[4];
    for (int i = 0; i < ns; ++i) {
      int cid = hdr[1 + 2 * i];
      int tbl = hdr[2 + 2 * i];
      Component* c = nullptr;
      for (int j = 0; j < ncomp; ++j)
        if (comp[j].id == cid) c = &comp[j];
      if (!c) return kCorrupt;
      c->td = tbl >> 4;
      c->ta = tbl & 15;
      if (c->td > 3 || c->ta > 3) return kCorrupt;
      scomp[i] = c;
    }
    // baseline sequential: Ss=0, Se=63, Ah=Al=0 (anything else means a
    // progressive or lossless scan we don't decode)
    const uint8_t* tail = hdr + 1 + 2 * ns;
    if (tail[0] != 0 || tail[1] != 63 || tail[2] != 0) return kUnsupported;
    // A scan over a subset of the frame's components is a multi-scan
    // sequential file; decoding only its first scan would serve tiles
    // with zeroed chroma, so route those to the PIL fallback instead.
    if (ns != ncomp) return kUnsupported;

    BitReader br(data, data_len);
    int mcux, mcuy;
    if (ns > 1) {
      mcux = (width + 8 * hmax - 1) / (8 * hmax);
      mcuy = (height + 8 * vmax - 1) / (8 * vmax);
    } else {
      // T.81 A.2: an Ns=1 scan is ALWAYS non-interleaved — one 8x8 block
      // per MCU over the component's own block grid (matters for
      // single-component frames declaring sampling factors > 1)
      Component* c = scomp[0];
      int cw = (width * c->h + hmax - 1) / hmax;
      int ch = (height * c->v + vmax - 1) / vmax;
      mcux = (cw + 7) / 8;
      mcuy = (ch + 7) / 8;
    }

    int rst = 0, since_restart = 0;
    for (int my = 0; my < mcuy; ++my) {
      for (int mx = 0; mx < mcux; ++mx) {
        if (restart_interval && since_restart == restart_interval) {
          if (!br.take_restart(rst)) return kDecodeError;
          rst = (rst + 1) & 7;
          since_restart = 0;
          for (int i = 0; i < ns; ++i) scomp[i]->dc_pred = 0;
        }
        if (ns > 1) {
          for (int i = 0; i < ns; ++i) {
            Component* c = scomp[i];
            for (int v = 0; v < c->v; ++v)
              for (int hh = 0; hh < c->h; ++hh) {
                int rc = decode_block(br, *c, mx * c->h + hh, my * c->v + v);
                if (rc != kOk) return rc;
              }
          }
        } else {
          int rc = decode_block(br, *scomp[0], mx, my);
          if (rc != kOk) return rc;
        }
        ++since_restart;
      }
    }
    // phantom bits consumed = the entropy data ended (buffer end OR a
    // premature EOI) before the MCU grid was fully decoded — the tail
    // rows would be garbage, so reject instead of reporting success
    if (br.truncated()) return kDecodeError;
    return kOk;
  }

  // ---- progressive mode (SOF2, T.81 G): spectral selection +
  // successive approximation.  Each scan deposits/refines coefficients in
  // the per-component zigzag buffers; finalize_progressive() runs the
  // dequant + IDCT once at EOI.

  int prog_dc_block(BitReader& br, Component& c, int bx, int by, int Ah,
                    int Al) {
    if (bx >= c.blocks_w || by >= c.blocks_h) return kCorrupt;
    int32_t* blk =
        &c.coefs[(static_cast<size_t>(by) * c.blocks_w + bx) * 64];
    if (Ah == 0) {  // first DC scan: Huffman diff, shifted by Al
      const HuffTable& dct = dc[c.td];
      if (!dct.present) return kCorrupt;
      int t = br.decode_huff(dct);
      if (t < 0 || t > 15) return kDecodeError;
      c.dc_pred += extend(br.get_bits(t), t);
      blk[0] = c.dc_pred * (1 << Al);
    } else {  // refinement: one bit per block (T.81 G.1.2.1)
      if (br.get_bit()) blk[0] |= (1 << Al);
    }
    return kOk;
  }

  int prog_ac_block(BitReader& br, Component& c, int bx, int by, int Ss,
                    int Se, int Ah, int Al) {
    if (bx >= c.blocks_w || by >= c.blocks_h) return kCorrupt;
    int32_t* blk =
        &c.coefs[(static_cast<size_t>(by) * c.blocks_w + bx) * 64];
    const HuffTable& act = ac[c.ta];
    if (!act.present) return kCorrupt;

    if (Ah == 0) {  // first pass for this band (T.81 G.1.2.2)
      if (eobrun > 0) {
        --eobrun;
        return kOk;
      }
      int k = Ss;
      while (k <= Se) {
        int rs = br.decode_huff(act);
        if (rs < 0) return kDecodeError;
        int r = rs >> 4, s = rs & 15;
        if (s == 0) {
          if (r == 15) {  // ZRL
            k += 16;
            continue;
          }
          eobrun = (1 << r) - 1;
          if (r) eobrun += br.get_bits(r);
          break;
        }
        k += r;
        if (k > Se) return kDecodeError;
        blk[k] = extend(br.get_bits(s), s) * (1 << Al);
        ++k;
      }
      return kOk;
    }

    // refinement pass (T.81 G.1.2.3): correction bits on known-nonzero
    // coefficients, ±1<<Al insertions at newly significant positions
    const int p1 = 1 << Al, m1 = -(1 << Al);
    int k = Ss;
    if (eobrun == 0) {
      while (k <= Se) {
        int rs = br.decode_huff(act);
        if (rs < 0) return kDecodeError;
        int r = rs >> 4, s = rs & 15;
        int val = 0;
        if (s == 0) {
          if (r < 15) {
            // EOB: the count INCLUDES the current block — its remaining
            // band still receives correction bits below, then eobrun--
            eobrun = (1 << r);
            if (r) eobrun += br.get_bits(r);
            break;
          }
          // r == 15: skip 16 zero-history coefficients, inserting nothing
        } else {
          if (s != 1) return kDecodeError;  // refinement emits only ±1
          val = br.get_bit() ? p1 : m1;
        }
        while (k <= Se) {
          int32_t& cf = blk[k];
          if (cf != 0) {
            if (br.get_bit() && (cf & p1) == 0) cf += (cf >= 0) ? p1 : m1;
          } else {
            if (r == 0) {
              if (s) cf = val;
              ++k;
              break;
            }
            --r;
          }
          ++k;
        }
      }
    }
    if (eobrun > 0) {
      // inside an EOB run: correction bits only, for every nonzero left
      while (k <= Se) {
        int32_t& cf = blk[k];
        if (cf != 0 && br.get_bit() && (cf & p1) == 0)
          cf += (cf >= 0) ? p1 : m1;
        ++k;
      }
      --eobrun;
    }
    return kOk;
  }

  int decode_scan_prog(const uint8_t* hdr, int hdr_len, const uint8_t* data,
                       size_t data_len) {
    if (hdr_len < 4) return kCorrupt;
    int ns = hdr[0];
    if (ns < 1 || ns > 4 || hdr_len < 1 + 2 * ns + 3) return kCorrupt;
    Component* scomp[4];
    for (int i = 0; i < ns; ++i) {
      int cid = hdr[1 + 2 * i];
      int tbl = hdr[2 + 2 * i];
      Component* c = nullptr;
      for (int j = 0; j < ncomp; ++j)
        if (comp[j].id == cid) c = &comp[j];
      if (!c) return kCorrupt;
      c->td = tbl >> 4;
      c->ta = tbl & 15;
      if (c->td > 3 || c->ta > 3) return kCorrupt;
      scomp[i] = c;
    }
    const uint8_t* tail = hdr + 1 + 2 * ns;
    int Ss = tail[0], Se = tail[1];
    int Ah = tail[2] >> 4, Al = tail[2] & 15;
    if (Ss > 63 || Se > 63 || Se < Ss || Al > 13 || Ah > 13) return kCorrupt;
    const bool dc_scan = (Ss == 0);
    if (dc_scan && Se != 0) return kCorrupt;  // T.81 G.1.1.1.1
    if (!dc_scan && ns != 1) return kCorrupt;  // AC scans: one component
    eobrun = 0;
    for (int i = 0; i < ns; ++i) scomp[i]->dc_pred = 0;

    BitReader br(data, data_len);
    int mcux, mcuy;
    if (dc_scan && ns > 1) {
      mcux = (width + 8 * hmax - 1) / (8 * hmax);
      mcuy = (height + 8 * vmax - 1) / (8 * vmax);
    } else {  // non-interleaved: the component's own block grid
      Component* c = scomp[0];
      int cw = (width * c->h + hmax - 1) / hmax;
      int ch = (height * c->v + vmax - 1) / vmax;
      mcux = (cw + 7) / 8;
      mcuy = (ch + 7) / 8;
    }

    int rst = 0, since_restart = 0;
    for (int my = 0; my < mcuy; ++my) {
      for (int mx = 0; mx < mcux; ++mx) {
        if (restart_interval && since_restart == restart_interval) {
          if (!br.take_restart(rst)) return kDecodeError;
          rst = (rst + 1) & 7;
          since_restart = 0;
          eobrun = 0;
          for (int i = 0; i < ns; ++i) scomp[i]->dc_pred = 0;
        }
        int rc = kOk;
        if (dc_scan && ns > 1) {
          for (int i = 0; i < ns && rc == kOk; ++i) {
            Component* c = scomp[i];
            for (int v = 0; v < c->v && rc == kOk; ++v)
              for (int hh = 0; hh < c->h && rc == kOk; ++hh)
                rc = prog_dc_block(br, *c, mx * c->h + hh, my * c->v + v,
                                   Ah, Al);
          }
        } else if (dc_scan) {
          rc = prog_dc_block(br, *scomp[0], mx, my, Ah, Al);
        } else {
          rc = prog_ac_block(br, *scomp[0], mx, my, Ss, Se, Ah, Al);
        }
        if (rc != kOk) return rc;
        ++since_restart;
      }
    }
    if (br.truncated()) return kDecodeError;
    scan_seen = true;
    return kOk;
  }

  int finalize_progressive() {
    if (ncomp == 0 || !scan_seen) return kCorrupt;
    for (int i = 0; i < ncomp; ++i) {
      Component& c = comp[i];
      if (c.coefs.empty() || !qt_present[c.tq]) return kCorrupt;
      const uint16_t* q = qt[c.tq];
      for (int by = 0; by < c.blocks_h; ++by) {
        for (int bx = 0; bx < c.blocks_w; ++bx) {
          const int32_t* blk =
              &c.coefs[(static_cast<size_t>(by) * c.blocks_w + bx) * 64];
          float F[64];
          std::memset(F, 0, sizeof(F));
          F[0] = static_cast<float>(blk[0] * static_cast<int32_t>(q[0]));
          int n_ac = 0;
          for (int k = 1; k < 64; ++k)
            if (blk[k]) {
              F[kZigzag[k]] =
                  static_cast<float>(blk[k] * static_cast<int32_t>(q[k]));
              ++n_ac;
            }
          idct_block(F, n_ac,
                     c.plane.data() +
                         (static_cast<size_t>(by) * 8 * c.plane_w + bx * 8),
                     c.plane_w);
        }
      }
    }
    return kOk;
  }

  // sample component c at full-resolution (x, y) — slow path, used only
  // by the single-component (grayscale) emit.  Subsampled chroma uses
  // centered bilinear interpolation, which for factor-2 equals libjpeg's
  // triangular "fancy" upsampling weights (3/4, 1/4), keeping output
  // within ~1 LSB of the PIL fallback.
  inline float sample(const Component& c, int x, int y) const {
    if (c.h == hmax && c.v == vmax)
      return c.plane[static_cast<size_t>(y) * c.plane_w + x];
    float fx = (x + 0.5f) * c.h / hmax - 0.5f;
    float fy = (y + 0.5f) * c.v / vmax - 0.5f;
    fx = std::min(std::max(fx, 0.0f), static_cast<float>(c.samp_w - 1));
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(c.samp_h - 1));
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = std::min(x0 + 1, c.samp_w - 1);
    int y1 = std::min(y0 + 1, c.samp_h - 1);
    float ax = fx - x0, ay = fy - y0;
    const uint8_t* pl = c.plane.data();
    size_t w = static_cast<size_t>(c.plane_w);
    float top = pl[y0 * w + x0] * (1 - ax) + pl[y0 * w + x1] * ax;
    float bot = pl[y1 * w + x0] * (1 - ax) + pl[y1 * w + x1] * ax;
    return top * (1 - ay) + bot * ay;
  }

  // row-wise upsampler: same centered-bilinear math as sample(), but the
  // horizontal taps are precomputed once and the vertical blend runs at
  // chroma resolution — O(w) per row instead of per-pixel recomputation
  struct Upsampler {
    const Component* c = nullptr;
    int hmax = 1, vmax = 1, w = 0;
    bool direct = false;
    std::vector<int> tx0, tx1;
    std::vector<float> tax, vbuf, line;

    void init(const Component& cc, int hm, int vm, int ww) {
      c = &cc;
      hmax = hm;
      vmax = vm;
      w = ww;
      direct = (cc.h == hm && cc.v == vm);
      if (direct) return;
      tx0.resize(w);
      tx1.resize(w);
      tax.resize(w);
      for (int x = 0; x < w; ++x) {
        float fx = (x + 0.5f) * cc.h / hm - 0.5f;
        fx = std::min(std::max(fx, 0.0f), static_cast<float>(cc.samp_w - 1));
        tx0[x] = static_cast<int>(fx);
        tx1[x] = std::min(tx0[x] + 1, cc.samp_w - 1);
        tax[x] = fx - tx0[x];
      }
      vbuf.resize(cc.samp_w);
      line.resize(w);
    }

    // float view of the component's row y (full output resolution)
    const float* row(int y) {
      if (direct) {
        if (static_cast<int>(line.size()) != w) line.resize(w);
        const uint8_t* r = c->plane.data() +
                           static_cast<size_t>(y) * c->plane_w;
        for (int x = 0; x < w; ++x) line[x] = r[x];
        return line.data();
      }
      float fy = (y + 0.5f) * c->v / vmax - 0.5f;
      fy = std::min(std::max(fy, 0.0f), static_cast<float>(c->samp_h - 1));
      int y0 = static_cast<int>(fy);
      int y1 = std::min(y0 + 1, c->samp_h - 1);
      float ay = fy - y0;
      const uint8_t* r0 = c->plane.data() +
                          static_cast<size_t>(y0) * c->plane_w;
      const uint8_t* r1 = c->plane.data() +
                          static_cast<size_t>(y1) * c->plane_w;
      for (int i = 0; i < c->samp_w; ++i)
        vbuf[i] = r0[i] + (r1[i] - r0[i]) * ay;
      for (int x = 0; x < w; ++x) {
        float a = vbuf[tx0[x]];
        line[x] = a + (vbuf[tx1[x]] - a) * tax[x];
      }
      return line.data();
    }
  };

  // Color space for 3-component streams.  In-stream markers win (they
  // describe the encoder's actual transform): an Adobe APP14 transform
  // byte, then libjpeg's (jdmaster.c) component-id heuristic — ids
  // 'R','G','B' mean the stream is already RGB (what PIL's TIFF writer
  // emits for photometric-RGB JPEG).  With neither, the container's hint
  // (TIFF PhotometricInterpretation at the tile call site) breaks the
  // tie; default YCbCr matches libjpeg.
  bool is_rgb() const {
    if (ncomp != 3) return false;
    if (adobe_transform >= 0) return adobe_transform == 0;
    if (comp[0].id == 'R' && comp[1].id == 'G' && comp[2].id == 'B')
      return true;
    if (jfif_seen) return false;  // JFIF fixes YCbCr regardless of hint
    return color_hint == 0;
  }

  void emit_rgb(uint8_t* out, int out_w, int out_h) const {
    const bool rgb = is_rgb();
    int w = std::min(width, out_w), h = std::min(height, out_h);
    if (ncomp == 1) {
      const Component& cy = comp[0];
      for (int y = 0; y < h; ++y) {
        uint8_t* row = out + static_cast<size_t>(y) * out_w * 3;
        for (int x = 0; x < w; ++x) {
          uint8_t g = clamp_u8(sample(cy, x, y));
          row[x * 3] = row[x * 3 + 1] = row[x * 3 + 2] = g;
        }
      }
      return;
    }
    Upsampler up[3];
    for (int c = 0; c < 3; ++c) up[c].init(comp[c], hmax, vmax, w);
    const bool y_direct = up[0].direct;
    for (int y = 0; y < h; ++y) {
      uint8_t* row = out + static_cast<size_t>(y) * out_w * 3;
      if (rgb && up[0].direct && up[1].direct && up[2].direct) {
        // full-res RGB stream (PIL's photometric-RGB TIFF JPEG): pure
        // byte interleave, no float round-trip
        const uint8_t* r = comp[0].plane.data() +
                           static_cast<size_t>(y) * comp[0].plane_w;
        const uint8_t* g = comp[1].plane.data() +
                           static_cast<size_t>(y) * comp[1].plane_w;
        const uint8_t* b = comp[2].plane.data() +
                           static_cast<size_t>(y) * comp[2].plane_w;
        for (int x = 0; x < w; ++x) {
          row[x * 3 + 0] = r[x];
          row[x * 3 + 1] = g[x];
          row[x * 3 + 2] = b[x];
        }
      } else if (rgb) {
        const float* r = up[0].row(y);
        const float* g = up[1].row(y);
        const float* b = up[2].row(y);
        for (int x = 0; x < w; ++x) {
          row[x * 3 + 0] = clamp_u8(r[x]);
          row[x * 3 + 1] = clamp_u8(g[x]);
          row[x * 3 + 2] = clamp_u8(b[x]);
        }
      } else if (y_direct) {
        // the common 4:2:0 / 4:2:2 / 4:4:4 layouts: luma reads straight
        // from its plane, chroma through the row upsampler
        const uint8_t* yr = comp[0].plane.data() +
                            static_cast<size_t>(y) * comp[0].plane_w;
        const float* cbr = up[1].row(y);
        const float* crr = up[2].row(y);
        for (int x = 0; x < w; ++x) {
          // CCIR 601 full-range (JFIF): same constants libjpeg uses
          float Y = yr[x];
          float cb = cbr[x] - 128.0f;
          float cr = crr[x] - 128.0f;
          row[x * 3 + 0] = clamp_u8(Y + 1.40200f * cr);
          row[x * 3 + 1] = clamp_u8(Y - 0.34414f * cb - 0.71414f * cr);
          row[x * 3 + 2] = clamp_u8(Y + 1.77200f * cb);
        }
      } else {
        const float* yrow = up[0].row(y);
        const float* cbr = up[1].row(y);
        const float* crr = up[2].row(y);
        for (int x = 0; x < w; ++x) {
          float cb = cbr[x] - 128.0f;
          float cr = crr[x] - 128.0f;
          row[x * 3 + 0] = clamp_u8(yrow[x] + 1.40200f * cr);
          row[x * 3 + 1] = clamp_u8(
              yrow[x] - 0.34414f * cb - 0.71414f * cr);
          row[x * 3 + 2] = clamp_u8(yrow[x] + 1.77200f * cb);
        }
      }
    }
  }

  // parse one marker stream; when a SOS is hit, decode the scan and stop.
  // `is_tables` streams (TIFF tag 347) carry only DQT/DHT/DRI.
  int parse(const uint8_t* p, size_t len, bool is_tables) {
    if (len < 2 || p[0] != 0xFF || p[1] != 0xD8) return kCorrupt;  // SOI
    size_t pos = 2;
    while (pos + 2 <= len) {
      if (p[pos] != 0xFF) return kCorrupt;
      while (pos < len && p[pos] == 0xFF) ++pos;  // fill bytes
      if (pos >= len) return kCorrupt;
      uint8_t m = p[pos++];
      if (m == 0xD9) {  // EOI
        if (is_tables) return kOk;
        // a sequential image stream returns from the SOS case below, so
        // reaching EOI here means either a progressive stream to finalize
        // or an image with no scan at all (corrupt)
        return progressive ? finalize_progressive() : kCorrupt;
      }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) continue;  // TEM/RSTn: bare
      if (pos + 2 > len) return kCorrupt;
      int seg = (p[pos] << 8) | p[pos + 1];
      if (seg < 2 || pos + seg > len) return kCorrupt;
      const uint8_t* body = p + pos + 2;
      int blen = seg - 2;
      int rc = kOk;
      switch (m) {
        case 0xDB: rc = parse_dqt(body, blen); break;
        case 0xC4: rc = parse_dht(body, blen); break;
        case 0xC0: case 0xC1: rc = parse_sof(body, blen); break;
        case 0xC2:  // progressive DCT
          progressive = true;
          rc = parse_sof(body, blen);
          break;
        case 0xC3: case 0xC5: case 0xC6: case 0xC7:
        case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
          return kUnsupported;  // lossless/arithmetic/differential
        case 0xDD:
          if (blen < 2) return kCorrupt;
          restart_interval = (body[0] << 8) | body[1];
          break;
        case 0xE0:  // APP0: JFIF signature
          if (blen >= 5 && std::memcmp(body, "JFIF\0", 5) == 0)
            jfif_seen = true;
          break;
        case 0xEE:  // APP14: Adobe color-transform flag
          if (blen >= 12 && std::memcmp(body, "Adobe", 5) == 0)
            adobe_transform = body[11];
          break;
        case 0xDA: {
          if (is_tables || ncomp == 0) return kCorrupt;
          const uint8_t* entropy = body + blen;
          size_t elen = static_cast<size_t>(len - (entropy - p));
          if (!progressive)
            return decode_scan(body, blen, entropy, elen);  // single scan
          rc = decode_scan_prog(body, blen, entropy, elen);
          if (rc != kOk) return rc;
          // step over the entropy data to the next true marker (skipping
          // 0xFF00 stuffing and RSTn), then keep parsing scans
          size_t q = static_cast<size_t>(entropy - p);
          while (q + 1 < len) {
            if (p[q] == 0xFF && p[q + 1] != 0x00 &&
                !(p[q + 1] >= 0xD0 && p[q + 1] <= 0xD7))
              break;
            ++q;
          }
          if (q + 1 >= len) return kCorrupt;
          pos = q;
          continue;
        }
        default: break;  // APPn / COM / DNL: skip
      }
      if (rc != kOk) return rc;
      pos += seg;
    }
    return is_tables ? kOk : kCorrupt;  // image stream must reach SOS
  }
};

}  // namespace

extern "C" {

// Decode a (possibly abbreviated) baseline JPEG into an RGB888 buffer of
// out_w*out_h (zero-padded beyond the image; cropped if larger).  `tables`
// is the TIFF JPEGTables stream (tag 347) or null.  `color_hint` is the
// container's color space for 3-component streams (0 = RGB, 1 = YCbCr,
// -1 = unknown); in-stream Adobe/component-id markers take precedence.
// Returns kOk / kUnsupported (caller should fall back) / kCorrupt /
// kDecodeError; *img_w / *img_h (optional) receive the stream's own
// dimensions.
int32_t jpeg_decode_rgb(const uint8_t* tables, int64_t tables_len,
                        const uint8_t* scan, int64_t scan_len,
                        uint8_t* out, int32_t out_w, int32_t out_h,
                        int32_t* img_w, int32_t* img_h,
                        int32_t color_hint) try {
  if (!scan || scan_len < 4 || !out || out_w <= 0 || out_h <= 0)
    return kBadArgument;
  Decoder d;
  d.color_hint = color_hint;
  if (tables && tables_len > 0) {
    int rc = d.parse(tables, static_cast<size_t>(tables_len), true);
    if (rc != kOk) return rc;
  }
  int rc = d.parse(scan, static_cast<size_t>(scan_len), false);
  if (rc != kOk) return rc;
  std::memset(out, 0, static_cast<size_t>(out_w) * out_h * 3);
  d.emit_rgb(out, out_w, out_h);
  if (img_w) *img_w = d.width;
  if (img_h) *img_h = d.height;
  return kOk;
} catch (...) {
  return kCorrupt;
}

}  // extern "C"
