// Native pyramidal-TIFF slide reader for the WSI inference path.
//
// The reference reads whole-slide images through openslide
// (SURVEY.md §3.5 / N5): a C library stack (libtiff + libopenjpeg + glib)
// that decodes tiles on demand.  This is the tpu-native equivalent for the
// formats that matter on the serving path: tiled (Big)TIFF pyramids —
// the container used by SVS, generic pyramidal TIFF, and QuPath/PyHIST
// exports — decoded straight into caller-provided uint8 RGB buffers with a
// thread pool, no Python object churn, no GIL, O(tile) memory.
//
// Scope (returns a per-call error code outside it; the Python wrapper
// falls back to PIL or raw-byte handoff):
//   * classic TIFF (magic 42) and BigTIFF (magic 43), II and MM byte order;
//   * tile-organized (322/323/324/325) and strip-organized (273/278/279)
//     IFDs — strips are exposed as width×rows_per_strip virtual tiles;
//   * compression: 1 (none), 8 / 32946 (zlib deflate), 5 (TIFF LZW with
//     early-change), each with predictor 1 (none) or 2 (horizontal
//     differencing); 7 (JPEG) decodes in-repo via native/jpegdec.cpp
//     (sequential + progressive, JPEGTables abbreviated streams) with a
//     raw-byte handoff to Python/PIL for out-of-scope streams; 33003 /
//     33005 (Aperio JPEG2000) hand their raw codestreams to PIL/openjpeg;
//   * 8-bit samples, PlanarConfig 1 (chunky), SamplesPerPixel 1/3/4
//     (gray replicated, RGBA alpha dropped), photometric 0/1/2.
//
// Pyramid model: every IFD in the chain that carries image data is a
// level, sorted by width descending (level 0 = full resolution) — the
// layout written by libvips/openslide-compatible pyramids, SVS, and our
// own writer (data/tiffwriter.py).  SubIFD (tag 330) chains are followed
// one level deep, covering the "pyramid in SubIFDs" flavor.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libtiffreader.so
//        tiffreader.cpp jpegdec.cpp -lz -lpthread  (see Makefile)

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <functional>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <unordered_map>
#include <thread>
#include <vector>

// native/jpegdec.cpp — baseline-JPEG decoder for compression-7 tiles
extern "C" int32_t jpeg_decode_rgb(const uint8_t* tables, int64_t tables_len,
                                   const uint8_t* scan, int64_t scan_len,
                                   uint8_t* out, int32_t out_w, int32_t out_h,
                                   int32_t* img_w, int32_t* img_h,
                                   int32_t color_hint);

namespace {

enum ErrorCode : int32_t {
  kOk = 0,
  kOpenFailed = 1,
  kBadMagic = 2,
  kCorrupt = 3,
  kUnsupported = 4,       // compression/bit depth/planar outside scope
  kBadArgument = 5,
  kJpegTile = 6,          // tile is JPEG: fetch raw bytes instead
  kDecodeError = 7,
};

// ---------------------------------------------------------------------------
// little/big-endian file reader
// ---------------------------------------------------------------------------

struct FileReader {
  std::ifstream f;
  bool little = true;

  bool open(const char* path) {
    f.open(path, std::ios::binary);
    return f.good();
  }
  bool read_at(uint64_t off, void* dst, size_t n) {
    f.clear();
    f.seekg(static_cast<std::streamoff>(off));
    f.read(reinterpret_cast<char*>(dst), static_cast<std::streamsize>(n));
    return f.gcount() == static_cast<std::streamsize>(n);
  }
  uint64_t get_uint(const uint8_t* p, int width) const {
    uint64_t v = 0;
    if (little) {
      for (int i = width - 1; i >= 0; --i) v = (v << 8) | p[i];
    } else {
      for (int i = 0; i < width; ++i) v = (v << 8) | p[i];
    }
    return v;
  }
};

// TIFF field types → byte widths (0 = variable/unused here)
inline uint32_t type_size(uint16_t t) {
  switch (t) {
    case 1: case 2: case 6: case 7: return 1;   // BYTE/ASCII/SBYTE/UNDEF
    case 3: case 8: return 2;                   // SHORT/SSHORT
    case 4: case 9: case 11: return 4;          // LONG/SLONG/FLOAT
    case 5: case 10: case 12: case 16: case 17: return 8;  // RATIONAL/DOUBLE/LONG8
    default: return 0;
  }
}

struct IfdEntry {
  uint16_t tag = 0;
  uint16_t type = 0;
  uint64_t count = 0;
  uint8_t inline_val[8] = {0};  // value if it fits, else offset
  uint64_t value_off = 0;
  bool is_offset = false;
};

struct Level {
  uint64_t width = 0, height = 0;
  uint32_t tile_w = 0, tile_h = 0;   // for strips: width × rows_per_strip
  bool tiled = false;
  uint16_t compression = 1;
  uint16_t photometric = 2;
  uint16_t samples = 3;
  uint16_t predictor = 1;
  uint16_t planar = 1;
  uint16_t bits = 8;
  std::vector<uint64_t> offsets;
  std::vector<uint64_t> byte_counts;
  std::vector<uint8_t> jpeg_tables;  // tag 347, empty if absent
  uint32_t tiles_x() const { return static_cast<uint32_t>((width + tile_w - 1) / tile_w); }
  uint32_t tiles_y() const { return static_cast<uint32_t>((height + tile_h - 1) / tile_h); }
};

// ---------------------------------------------------------------------------
// TIFF LZW (MSB-first codes, early change) — spec §13
// ---------------------------------------------------------------------------

bool lzw_decode(const uint8_t* src, size_t n, uint8_t* dst, size_t out_len) {
  constexpr int kClear = 256, kEoi = 257, kFirstFree = 258, kMaxCode = 4096;
  // dictionary as (prefix, suffix) pairs; entries < 256 are literals
  std::vector<int> prefix(kMaxCode, -1);
  std::vector<uint8_t> suffix(kMaxCode, 0);
  std::vector<uint8_t> stack(kMaxCode);

  size_t out = 0;
  uint64_t bitbuf = 0;
  int bits = 0, code_len = 9, next_code = kFirstFree, prev = -1;
  size_t i = 0;

  auto emit = [&](int code) -> bool {
    int sp = 0;
    while (code >= 256) {
      if (sp >= kMaxCode || code >= kMaxCode) return false;
      stack[sp++] = suffix[code];
      code = prefix[code];
    }
    stack[sp++] = static_cast<uint8_t>(code);
    // A decoded string that would overflow the output is corruption, not a
    // truncation point: emitting a clipped prefix would silently produce the
    // TAIL bytes of the dictionary string (stack is reversed).  Fail instead.
    if (out + static_cast<size_t>(sp) > out_len) return false;
    for (int k = sp - 1; k >= 0; --k) dst[out++] = stack[k];
    return true;
  };
  auto first_byte = [&](int code) -> uint8_t {
    while (code >= 256) code = prefix[code];
    return static_cast<uint8_t>(code);
  };

  while (out < out_len) {
    while (bits < code_len) {
      if (i >= n) return out == out_len;
      bitbuf = (bitbuf << 8) | src[i++];
      bits += 8;
    }
    int code = static_cast<int>((bitbuf >> (bits - code_len)) &
                                ((1u << code_len) - 1));
    bits -= code_len;

    if (code == kEoi) break;
    if (code == kClear) {
      code_len = 9;
      next_code = kFirstFree;
      prev = -1;
      continue;
    }
    if (prev < 0) {
      if (code >= 256) return false;
      dst[out++] = static_cast<uint8_t>(code);
      prev = code;
      continue;
    }
    if (code < next_code) {
      if (!emit(code)) return false;
      if (next_code < kMaxCode) {
        prefix[next_code] = prev;
        suffix[next_code] = first_byte(code);
        ++next_code;
      }
    } else if (code == next_code) {
      // KwKwK case
      if (next_code >= kMaxCode) return false;
      prefix[next_code] = prev;
      suffix[next_code] = first_byte(prev);
      ++next_code;
      if (!emit(code)) return false;
    } else {
      return false;
    }
    prev = code;
    // TIFF "early change": code width bumps one code earlier than raw LZW
    if (next_code == (1 << code_len) - 1 && code_len < 12) ++code_len;
  }
  return out == out_len;
}

// ---------------------------------------------------------------------------
// thread pool (shared by all open slides; sized at first use)
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(unsigned n) {
    for (unsigned i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void run(std::vector<std::function<void()>> jobs) {
    if (jobs.empty()) return;
    std::atomic<size_t> remaining(jobs.size());
    std::mutex done_mu;
    std::condition_variable done_cv;
    {
      std::unique_lock<std::mutex> lk(mu_);
      for (auto& j : jobs) {
        queue_.push([&, job = std::move(j)] {
          job();
          if (remaining.fetch_sub(1) == 1) {
            std::unique_lock<std::mutex> dlk(done_mu);
            done_cv.notify_one();
          }
        });
      }
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> dlk(done_mu);
    done_cv.wait(dlk, [&] { return remaining.load() == 0; });
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        job = std::move(queue_.front());
        queue_.pop();
      }
      job();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool& pool() {
  static ThreadPool p(std::max(1u, std::thread::hardware_concurrency()));
  return p;
}

// ---------------------------------------------------------------------------
// slide
// ---------------------------------------------------------------------------

struct Slide {
  FileReader fr;
  bool big = false;
  std::vector<Level> levels;  // sorted by width desc
  std::string description;    // tag 270 of the first IFD that carries one
  std::mutex io_mu;           // file reads are serialized; decode is parallel

  // LRU cache of DECODED tiles: sliding-window inference reads overlapping
  // regions (stride < window), so the same stored tile is otherwise
  // decoded up to ~4x at stride=tile (boundary misalignment) and ~9x at
  // 2x overlap.  Decoding happens outside the lock (a racing pair may
  // decode the same tile twice; the second insert wins — harmless).
  struct CachedTile {
    std::vector<uint8_t> rgb;
    uint64_t stamp = 0;
  };
  std::mutex cache_mu;
  std::unordered_map<uint64_t, CachedTile> tile_cache;
  uint64_t cache_stamp = 0;
  size_t cache_bytes = 0;
  static constexpr size_t kCacheCapBytes = 64ull << 20;  // 64 MiB

  // Per-tile compressed-size cap: a corrupt byte count must not drive a
  // multi-GiB resize (bad_alloc across the C ABI).  Derived from the
  // tile's own decoded size rather than a fixed constant, because
  // strip-organized levels are exposed as full-width virtual tiles and a
  // single-strip uncompressed slide legitimately exceeds any fixed cap.
  // No TIFF codec here (none/deflate/LZW/JPEG) inflates its input by more
  // than a small factor; 2× decoded + 1 MiB covers pathological-but-valid
  // incompressible payloads with headers.
  static uint64_t max_tile_bytes(const Level& lv) {
    uint64_t decoded = static_cast<uint64_t>(lv.tile_w) * lv.tile_h *
                       lv.samples * ((lv.bits + 7) / 8);
    return 2 * decoded + (1ull << 20);
  }

  bool read_tile_bytes(const Level& lv, uint32_t idx,
                       std::vector<uint8_t>& out) {
    if (idx >= lv.offsets.size() || idx >= lv.byte_counts.size()) return false;
    if (lv.byte_counts[idx] > max_tile_bytes(lv)) return false;
    size_t n = static_cast<size_t>(lv.byte_counts[idx]);
    out.resize(n);
    std::lock_guard<std::mutex> lk(io_mu);
    return fr.read_at(lv.offsets[idx], out.data(), n);
  }
};

// parse one IFD at `off`; returns offset of next IFD (0 = end)
uint64_t parse_ifd(Slide& s, uint64_t off, std::vector<uint64_t>* subifds) {
  FileReader& fr = s.fr;
  const int entry_sz = s.big ? 20 : 12;
  const int count_w = s.big ? 8 : 2;

  uint8_t cntbuf[8];
  if (!fr.read_at(off, cntbuf, count_w)) return 0;
  uint64_t n_entries = fr.get_uint(cntbuf, count_w);
  if (n_entries > 4096) return 0;  // sanity

  std::vector<uint8_t> buf(n_entries * entry_sz + 8);
  if (!fr.read_at(off + count_w, buf.data(), buf.size())) return 0;

  Level lv;
  bool has_size = false;
  uint32_t rows_per_strip = 0;
  std::vector<uint64_t> strip_offsets, strip_counts;

  auto values = [&](const uint8_t* e, std::vector<uint64_t>& out) -> bool {
    uint16_t type = static_cast<uint16_t>(fr.get_uint(e + 2, 2));
    uint64_t count = fr.get_uint(e + 4, s.big ? 8 : 4);
    uint32_t tsz = type_size(type);
    if (!tsz || count > (1ull << 28)) return false;
    uint64_t total = count * tsz;
    const uint8_t* vp = e + (s.big ? 12 : 8);
    std::vector<uint8_t> ext;
    if (total > static_cast<uint64_t>(s.big ? 8 : 4)) {
      uint64_t voff = fr.get_uint(vp, s.big ? 8 : 4);
      ext.resize(total);
      if (!fr.read_at(voff, ext.data(), total)) return false;
      vp = ext.data();
    }
    out.resize(count);
    for (uint64_t i = 0; i < count; ++i)
      out[i] = fr.get_uint(vp + i * tsz, static_cast<int>(
          type == 5 || type == 10 ? 4 : tsz));  // rationals: numerator only
    return true;
  };

  for (uint64_t i = 0; i < n_entries; ++i) {
    const uint8_t* e = buf.data() + i * entry_sz;
    uint16_t tag = static_cast<uint16_t>(fr.get_uint(e, 2));
    std::vector<uint64_t> v;
    switch (tag) {
      case 256: if (values(e, v) && !v.empty()) { lv.width = v[0]; has_size = true; } break;
      case 257: if (values(e, v) && !v.empty()) lv.height = v[0]; break;
      case 258: if (values(e, v) && !v.empty()) lv.bits = static_cast<uint16_t>(v[0]); break;
      case 259: if (values(e, v) && !v.empty()) lv.compression = static_cast<uint16_t>(v[0]); break;
      case 262: if (values(e, v) && !v.empty()) lv.photometric = static_cast<uint16_t>(v[0]); break;
      case 270: {  // ImageDescription (ASCII): Aperio metadata / MPP
        std::vector<uint64_t> raw;
        if (s.description.empty() && values(e, raw) && raw.size() > 1 &&
            raw.size() <= (1u << 20)) {
          std::string d(raw.size(), '\0');
          for (size_t k = 0; k < raw.size(); ++k)
            d[k] = static_cast<char>(raw[k]);
          while (!d.empty() && d.back() == '\0') d.pop_back();
          s.description = d;
        }
        break;
      }
      case 273: values(e, strip_offsets); break;
      case 277: if (values(e, v) && !v.empty()) lv.samples = static_cast<uint16_t>(v[0]); break;
      case 278: if (values(e, v) && !v.empty()) rows_per_strip = static_cast<uint32_t>(v[0]); break;
      case 279: values(e, strip_counts); break;
      case 284: if (values(e, v) && !v.empty()) lv.planar = static_cast<uint16_t>(v[0]); break;
      case 317: if (values(e, v) && !v.empty()) lv.predictor = static_cast<uint16_t>(v[0]); break;
      case 322: if (values(e, v) && !v.empty()) lv.tile_w = static_cast<uint32_t>(v[0]); break;
      case 323: if (values(e, v) && !v.empty()) lv.tile_h = static_cast<uint32_t>(v[0]); break;
      case 324: values(e, lv.offsets); break;
      case 325: values(e, lv.byte_counts); break;
      case 330: if (subifds) values(e, *subifds); break;
      case 347: {
        std::vector<uint64_t> raw;
        if (values(e, raw)) {
          lv.jpeg_tables.resize(raw.size());
          for (size_t k = 0; k < raw.size(); ++k)
            lv.jpeg_tables[k] = static_cast<uint8_t>(raw[k]);
        }
        break;
      }
      default: break;
    }
  }

  uint8_t nextbuf[8];
  uint64_t next = 0;
  if (fr.read_at(off + count_w + n_entries * entry_sz, nextbuf,
                 s.big ? 8 : 4))
    next = fr.get_uint(nextbuf, s.big ? 8 : 4);

  if (has_size && lv.width && lv.height) {
    // Offsets and byte counts must pair 1:1 — a mismatched IFD would make
    // every byte_counts[idx] lookup on the read path an out-of-bounds read.
    if (lv.tile_w && lv.tile_h && !lv.offsets.empty() &&
        lv.byte_counts.size() == lv.offsets.size()) {
      lv.tiled = true;
      s.levels.push_back(std::move(lv));
    } else if (!strip_offsets.empty() &&
               strip_counts.size() == strip_offsets.size()) {
      // strip-organized: expose as full-width virtual tiles
      lv.tiled = false;
      lv.tile_w = static_cast<uint32_t>(lv.width);
      lv.tile_h = rows_per_strip ? rows_per_strip
                                 : static_cast<uint32_t>(lv.height);
      lv.offsets = std::move(strip_offsets);
      lv.byte_counts = std::move(strip_counts);
      s.levels.push_back(std::move(lv));
    }
  }
  return next;
}

// decode one tile of `lv` into dst (tile_w*tile_h*3, RGB, edge tiles padded
// with zeros beyond the image edge as stored)
int decode_tile(Slide& s, Level& lv, uint32_t tx, uint32_t ty, uint8_t* dst) {
  if (lv.bits != 8 || lv.planar != 1) return kUnsupported;
  if (lv.compression == 7) {
    // baseline JPEG decodes in-repo (native/jpegdec.cpp); kJpegTile only
    // for streams it cannot handle (arithmetic/lossless/CMYK/12-bit); the
    // Python caller routes to PIL
    uint32_t idx = ty * lv.tiles_x() + tx;
    std::vector<uint8_t> comp;
    if (!s.read_tile_bytes(lv, idx, comp)) return kCorrupt;
    // the TIFF photometric tag is the container's color-space claim
    // (2 = RGB, 6 = YCbCr); in-stream markers still take precedence
    int32_t hint = lv.photometric == 2 ? 0 : (lv.photometric == 6 ? 1 : -1);
    int32_t rc = jpeg_decode_rgb(
        lv.jpeg_tables.empty() ? nullptr : lv.jpeg_tables.data(),
        static_cast<int64_t>(lv.jpeg_tables.size()), comp.data(),
        static_cast<int64_t>(comp.size()), dst,
        static_cast<int32_t>(lv.tile_w), static_cast<int32_t>(lv.tile_h),
        nullptr, nullptr, hint);
    return rc == kOk ? kOk : kJpegTile;
  }
  if (lv.compression == 33003 || lv.compression == 33005) {
    // Aperio JPEG2000 tiles (YCbCr / RGB flavors): raw-codestream handoff
    // — the Python wrapper decodes them with PIL/openjpeg per tile
    return kJpegTile;
  }
  if (lv.compression != 1 && lv.compression != 5 && lv.compression != 8 &&
      lv.compression != 32946)
    return kUnsupported;
  if (tx >= lv.tiles_x() || ty >= lv.tiles_y()) return kBadArgument;

  const uint32_t tw = lv.tile_w, th = lv.tile_h;
  const uint32_t spp = lv.samples;
  // strip rows at the bottom may be short
  uint32_t rows = th;
  if (!lv.tiled) {
    uint64_t y0 = static_cast<uint64_t>(ty) * th;
    rows = static_cast<uint32_t>(std::min<uint64_t>(th, lv.height - y0));
  }
  const size_t raw_len = static_cast<size_t>(tw) * rows * spp;

  uint32_t idx = ty * lv.tiles_x() + tx;
  std::vector<uint8_t> comp;
  if (!s.read_tile_bytes(lv, idx, comp)) return kCorrupt;

  std::vector<uint8_t> raw(raw_len);
  switch (lv.compression) {
    case 1: {
      if (comp.size() < raw_len) return kCorrupt;
      std::memcpy(raw.data(), comp.data(), raw_len);
      break;
    }
    case 8:
    case 32946: {
      uLongf out_len = static_cast<uLongf>(raw_len);
      if (uncompress(raw.data(), &out_len, comp.data(),
                     static_cast<uLong>(comp.size())) != Z_OK ||
          out_len != raw_len)
        return kDecodeError;
      break;
    }
    case 5: {
      if (!lzw_decode(comp.data(), comp.size(), raw.data(), raw_len))
        return kDecodeError;
      break;
    }
  }

  if (lv.predictor == 2) {
    // horizontal differencing: accumulate per row, per sample
    for (uint32_t r = 0; r < rows; ++r) {
      uint8_t* row = raw.data() + static_cast<size_t>(r) * tw * spp;
      for (uint32_t c = spp; c < tw * spp; ++c)
        row[c] = static_cast<uint8_t>(row[c] + row[c - spp]);
    }
  }

  // convert to RGB into dst (tile_w × tile_h × 3; zero-fill short strips)
  std::memset(dst, 0, static_cast<size_t>(tw) * th * 3);
  const bool invert = (lv.photometric == 0);  // WhiteIsZero
  for (uint32_t r = 0; r < rows; ++r) {
    const uint8_t* src = raw.data() + static_cast<size_t>(r) * tw * spp;
    uint8_t* out = dst + static_cast<size_t>(r) * tw * 3;
    if (spp >= 3) {
      for (uint32_t c = 0; c < tw; ++c) {
        out[c * 3 + 0] = src[c * spp + 0];
        out[c * 3 + 1] = src[c * spp + 1];
        out[c * 3 + 2] = src[c * spp + 2];
      }
    } else {
      for (uint32_t c = 0; c < tw; ++c) {
        uint8_t g = invert ? static_cast<uint8_t>(255 - src[c]) : src[c];
        out[c * 3 + 0] = out[c * 3 + 1] = out[c * 3 + 2] = g;
      }
    }
  }
  return kOk;
}

// decode_tile through the slide's LRU cache of decoded tiles
int decode_tile_cached(Slide& s, int level_idx, Level& lv, uint32_t tx,
                       uint32_t ty, uint8_t* dst) {
  const size_t n = static_cast<size_t>(lv.tile_w) * lv.tile_h * 3;
  const uint64_t key = (static_cast<uint64_t>(level_idx) << 56) |
                       (static_cast<uint64_t>(ty) << 28) | tx;
  {
    std::lock_guard<std::mutex> lk(s.cache_mu);
    auto it = s.tile_cache.find(key);
    if (it != s.tile_cache.end() && it->second.rgb.size() == n) {
      it->second.stamp = ++s.cache_stamp;
      std::memcpy(dst, it->second.rgb.data(), n);
      return kOk;
    }
  }
  int rc = decode_tile(s, lv, tx, ty, dst);
  // oversized tiles (e.g. one giant uncompressed strip) would immediately
  // evict the whole cache for a single entry — skip those
  if (rc == kOk && n <= Slide::kCacheCapBytes / 4) {
    std::lock_guard<std::mutex> lk(s.cache_mu);
    auto& e = s.tile_cache[key];
    if (e.rgb.empty()) s.cache_bytes += n;
    e.rgb.assign(dst, dst + n);
    e.stamp = ++s.cache_stamp;
    while (s.cache_bytes > Slide::kCacheCapBytes && s.tile_cache.size() > 1) {
      auto oldest = s.tile_cache.begin();
      for (auto it = s.tile_cache.begin(); it != s.tile_cache.end(); ++it)
        if (it->second.stamp < oldest->second.stamp) oldest = it;
      s.cache_bytes -= oldest->second.rgb.size();
      s.tile_cache.erase(oldest);
    }
  }
  return rc;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// returns opaque handle, nullptr on failure
void* tiff_open(const char* path) try {
  // unique_ptr: a throw from parse_ifd must not leak the Slide (and its fd)
  auto s = std::make_unique<Slide>();
  if (!s->fr.open(path)) return nullptr;
  uint8_t hdr[16];
  if (!s->fr.read_at(0, hdr, 8)) return nullptr;
  if (hdr[0] == 'I' && hdr[1] == 'I') s->fr.little = true;
  else if (hdr[0] == 'M' && hdr[1] == 'M') s->fr.little = false;
  else return nullptr;
  uint64_t magic = s->fr.get_uint(hdr + 2, 2);
  uint64_t first_ifd;
  if (magic == 42) {
    s->big = false;
    first_ifd = s->fr.get_uint(hdr + 4, 4);
  } else if (magic == 43) {
    s->big = true;
    if (!s->fr.read_at(0, hdr, 16)) return nullptr;
    first_ifd = s->fr.get_uint(hdr + 8, 8);
  } else {
    return nullptr;
  }

  std::vector<uint64_t> subifds;
  uint64_t off = first_ifd;
  int guard = 0;
  while (off && guard++ < 256)
    off = parse_ifd(*s, off, &subifds);
  for (uint64_t so : subifds) {
    if (guard++ >= 256) break;
    parse_ifd(*s, so, nullptr);
  }
  if (s->levels.empty()) return nullptr;
  std::stable_sort(s->levels.begin(), s->levels.end(),
                   [](const Level& a, const Level& b) {
                     return a.width > b.width;
                   });
  return s.release();
} catch (...) {
  // C++ exceptions (e.g. bad_alloc on a corrupt header) must not cross the
  // C ABI into ctypes — that terminates the host process.
  return nullptr;
}

void tiff_close(void* h) { delete static_cast<Slide*>(h); }

int32_t tiff_levels(void* h) {
  return static_cast<int32_t>(static_cast<Slide*>(h)->levels.size());
}

// info[0..7] = width, height, tile_w, tile_h, compression, tiles_x,
//              tiles_y, jpeg_tables_len
int32_t tiff_level_info(void* h, int32_t level, int64_t* info) {
  Slide* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int32_t>(s->levels.size()))
    return kBadArgument;
  const Level& lv = s->levels[level];
  info[0] = static_cast<int64_t>(lv.width);
  info[1] = static_cast<int64_t>(lv.height);
  info[2] = lv.tile_w;
  info[3] = lv.tile_h;
  info[4] = lv.compression;
  info[5] = lv.tiles_x();
  info[6] = lv.tiles_y();
  info[7] = static_cast<int64_t>(lv.jpeg_tables.size());
  return kOk;
}

// ImageDescription (tag 270, e.g. Aperio's "...|MPP = 0.25|..."): copies
// up to `cap` bytes into `out`, returns the full length (0 if absent) so
// callers can size a buffer and re-call.
int64_t tiff_description(void* h, uint8_t* out, int64_t cap) {
  Slide* s = static_cast<Slide*>(h);
  int64_t n = static_cast<int64_t>(s->description.size());
  if (out && cap > 0 && n > 0)
    std::memcpy(out, s->description.data(),
                static_cast<size_t>(std::min(n, cap)));
  return n;
}

int32_t tiff_jpeg_tables(void* h, int32_t level, uint8_t* out) {
  Slide* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int32_t>(s->levels.size()))
    return kBadArgument;
  const Level& lv = s->levels[level];
  std::memcpy(out, lv.jpeg_tables.data(), lv.jpeg_tables.size());
  return kOk;
}

// raw (compressed) bytes of one tile; *size in = capacity, out = actual
int32_t tiff_tile_raw(void* h, int32_t level, int32_t tx, int32_t ty,
                      uint8_t* out, int64_t* size) try {
  Slide* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int32_t>(s->levels.size()))
    return kBadArgument;
  Level& lv = s->levels[level];
  if (tx < 0 || ty < 0 || tx >= static_cast<int32_t>(lv.tiles_x()) ||
      ty >= static_cast<int32_t>(lv.tiles_y()))
    return kBadArgument;
  uint32_t idx = static_cast<uint32_t>(ty) * lv.tiles_x() + tx;
  if (idx >= lv.byte_counts.size()) return kCorrupt;
  int64_t n = static_cast<int64_t>(lv.byte_counts[idx]);
  if (n > *size) { *size = n; return kBadArgument; }
  std::vector<uint8_t> buf;
  if (!s->read_tile_bytes(lv, idx, buf)) return kCorrupt;
  std::memcpy(out, buf.data(), buf.size());
  *size = n;
  return kOk;
} catch (...) {
  return kCorrupt;
}

// decode one tile to RGB888 (tile_w*tile_h*3)
int32_t tiff_read_tile(void* h, int32_t level, int32_t tx, int32_t ty,
                       uint8_t* dst) try {
  Slide* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int32_t>(s->levels.size()))
    return kBadArgument;
  Level& lv = s->levels[level];
  if (tx < 0 || ty < 0 || tx >= static_cast<int32_t>(lv.tiles_x()) ||
      ty >= static_cast<int32_t>(lv.tiles_y()))
    return kBadArgument;
  return decode_tile_cached(*s, level, lv, static_cast<uint32_t>(tx),
                            static_cast<uint32_t>(ty), dst);
} catch (...) {
  return kCorrupt;
}

// assemble an arbitrary region (x, y, w, h) of `level` into dst (w*h*3 RGB),
// zero-filled outside the image; tiles decode on the thread pool
int32_t tiff_read_region(void* h, int32_t level, int64_t x, int64_t y,
                         int64_t w, int64_t hh, uint8_t* dst) try {
  Slide* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int32_t>(s->levels.size()) ||
      w <= 0 || hh <= 0)
    return kBadArgument;
  Level& lv = s->levels[level];

  std::memset(dst, 0, static_cast<size_t>(w) * hh * 3);
  const int64_t tw = lv.tile_w, th = lv.tile_h;
  int64_t tx0 = std::max<int64_t>(0, x / tw);
  int64_t ty0 = std::max<int64_t>(0, y / th);
  int64_t tx1 = std::min<int64_t>(lv.tiles_x() - 1, (x + w - 1) / tw);
  int64_t ty1 = std::min<int64_t>(lv.tiles_y() - 1, (y + hh - 1) / th);
  if (tx1 < tx0 || ty1 < ty0) return kOk;  // fully outside

  std::atomic<int32_t> err(kOk);
  std::vector<std::function<void()>> jobs;
  for (int64_t ty = ty0; ty <= ty1; ++ty) {
    for (int64_t tx = tx0; tx <= tx1; ++tx) {
      jobs.push_back([&, tx, ty] {
        if (err.load() != kOk) return;
        // Worker-thread exceptions would std::terminate — convert to kCorrupt.
        try {
        std::vector<uint8_t> tile(static_cast<size_t>(tw) * th * 3);
        int32_t rc = decode_tile_cached(*s, level, lv,
                                        static_cast<uint32_t>(tx),
                                        static_cast<uint32_t>(ty),
                                        tile.data());
        if (rc != kOk) { err.store(rc); return; }
        // copy the overlap of this tile with the region
        int64_t sx0 = std::max<int64_t>(x, tx * tw);
        int64_t sy0 = std::max<int64_t>(y, ty * th);
        int64_t sx1 = std::min<int64_t>(x + w, (tx + 1) * tw);
        int64_t sy1 = std::min<int64_t>(y + hh,
                                        std::min<int64_t>((ty + 1) * th,
                                                          lv.height));
        for (int64_t r = sy0; r < sy1; ++r) {
          const uint8_t* src = tile.data() +
              ((r - ty * th) * tw + (sx0 - tx * tw)) * 3;
          uint8_t* out = dst + ((r - y) * w + (sx0 - x)) * 3;
          std::memcpy(out, src, static_cast<size_t>(sx1 - sx0) * 3);
        }
        } catch (...) { err.store(kCorrupt); }
      });
    }
  }
  pool().run(std::move(jobs));
  return err.load();
} catch (...) {
  return kCorrupt;
}

}  // extern "C"
