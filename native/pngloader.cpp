// Native batch PNG decoder for the patch-loading hot path.
//
// The reference's data pipeline bottleneck is per-worker PNG decode +
// augmentation in Python DataLoader subprocesses (reference dataset.py:24-30,
// SURVEY.md §3.1 hot loops).  Augmentation moved on-device (ops/augment.py);
// this library replaces the decode side: a C++ thread pool inflating and
// unfiltering PNG scanlines straight into a caller-provided NHWC uint8
// batch buffer — no Python object churn, no per-image allocations, no GIL.
//
// Decode is streaming: IDAT inflates in ~4-row chunks and each complete
// scanline unfilters immediately while it is still hot in L1/L2, instead
// of materializing the whole filtered image and re-reading it in a second
// pass (two full-image passes saved per tile).  The Sub / Average / Paeth
// unfilters have SSSE3 kernels behind a one-time runtime CPUID dispatch
// (the build is ISA-baseline x86-64 — no -march=native — so the same .so
// runs on any host; non-x86 builds keep the scalar path):
//   * Sub is a strided in-register prefix sum — byte shifts at the pixel
//     stride (3,6,12 for RGB / 4,8 for RGBA) + a pshufb-splat carry of the
//     last pixel, 16 filtered bytes per iteration;
//   * Average / Paeth carry a loop dependency at pixel granularity, so
//     they vectorize across channels (one pixel per iteration, u16 lanes;
//     Paeth picks among a/b/c with cmp+blend on the |p-x| distances).
//
// Scope: 8-bit non-interlaced PNGs (gray / gray+alpha / RGB / RGBA /
// palette), which covers QuPath tile exports and PyHIST tiles.  Anything
// else returns a per-image error code and the Python wrapper falls back to
// PIL for that image.
//
// Build: g++ -O3 -shared -fPIC -o libpngloader.so pngloader.cpp -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#if defined(__x86_64__) || defined(_M_X64)
#define PNGLOADER_X86 1
#include <immintrin.h>
#else
#define PNGLOADER_X86 0
#endif

namespace {

constexpr uint8_t kPngSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

enum ErrorCode : int32_t {
  kOk = 0,
  kOpenFailed = 1,
  kBadSignature = 2,
  kUnsupported = 3,   // 16-bit / interlaced
  kInflateError = 4,
  kSizeMismatch = 5,  // decoded dims != expected dims
  kCorrupt = 6,
};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// ---------------------------------------------------------------------------
// Scalar unfilter kernels (baseline + non-x86 + odd bpp tail).
// `cur` receives the reconstructed row; `in` is the filtered row (after the
// filter-type byte); `prev` is the reconstructed row above (nullptr on row 0).

void sub_scalar(uint8_t* cur, const uint8_t* in, const uint8_t*, size_t n,
                int bpp) {
  for (size_t x = 0; x < n; ++x)
    cur[x] = uint8_t(in[x] + (x >= size_t(bpp) ? cur[x - bpp] : 0));
}

void up_scalar(uint8_t* cur, const uint8_t* in, const uint8_t* prev, size_t n,
               int) {
  for (size_t x = 0; x < n; ++x) cur[x] = uint8_t(in[x] + (prev ? prev[x] : 0));
}

void avg_scalar(uint8_t* cur, const uint8_t* in, const uint8_t* prev, size_t n,
                int bpp) {
  for (size_t x = 0; x < n; ++x) {
    int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
    int b = prev ? prev[x] : 0;
    cur[x] = uint8_t(in[x] + ((a + b) >> 1));
  }
}

void paeth_scalar(uint8_t* cur, const uint8_t* in, const uint8_t* prev,
                  size_t n, int bpp) {
  for (size_t x = 0; x < n; ++x) {
    int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
    int b = prev ? prev[x] : 0;
    int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
    cur[x] = uint8_t(in[x] + paeth(a, b, c));
  }
}

#if PNGLOADER_X86

// Sub: cur[x] = in[x] + cur[x-bpp] is a prefix sum at stride bpp; u8 adds
// wrap mod 256 exactly like the scalar loop, so the in-register doubling
// (shift by bpp, 2·bpp, 4·bpp …) reproduces it bit-exactly.  The carry into
// the next 16-byte block is the accumulated LAST pixel, splatted channel-
// aligned with pshufb (for bpp=3 the splat index is 13 + (j mod 3): block
// boundaries split pixels, but the stride-3 byte distance keeps channels
// aligned regardless).
__attribute__((target("ssse3"))) void sub_ssse3(uint8_t* cur,
                                                const uint8_t* in,
                                                const uint8_t*, size_t n,
                                                int bpp) {
  __m128i carry = _mm_setzero_si128();
  __m128i splat;
  switch (bpp) {
    case 3:
      splat = _mm_setr_epi8(13, 14, 15, 13, 14, 15, 13, 14, 15, 13, 14, 15,
                            13, 14, 15, 13);
      break;
    case 4:
      splat = _mm_setr_epi8(12, 13, 14, 15, 12, 13, 14, 15, 12, 13, 14, 15,
                            12, 13, 14, 15);
      break;
    case 2:
      splat = _mm_setr_epi8(14, 15, 14, 15, 14, 15, 14, 15, 14, 15, 14, 15,
                            14, 15, 14, 15);
      break;
    default:  // bpp == 1
      splat = _mm_set1_epi8(15);
      break;
  }
  size_t x = 0;
  for (; x + 16 <= n; x += 16) {
    __m128i v = _mm_loadu_si128(reinterpret_cast<const __m128i*>(in + x));
    switch (bpp) {
      case 3:
        v = _mm_add_epi8(v, _mm_slli_si128(v, 3));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 6));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 12));
        break;
      case 4:
        v = _mm_add_epi8(v, _mm_slli_si128(v, 4));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 8));
        break;
      case 2:
        v = _mm_add_epi8(v, _mm_slli_si128(v, 2));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 4));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 8));
        break;
      default:  // bpp == 1
        v = _mm_add_epi8(v, _mm_slli_si128(v, 1));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 2));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 4));
        v = _mm_add_epi8(v, _mm_slli_si128(v, 8));
        break;
    }
    v = _mm_add_epi8(v, carry);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(cur + x), v);
    carry = _mm_shuffle_epi8(v, splat);
  }
  for (; x < n; ++x)
    cur[x] = uint8_t(in[x] + (x >= size_t(bpp) ? cur[x - bpp] : 0));
}

__attribute__((target("sse2"))) void up_sse2(uint8_t* cur, const uint8_t* in,
                                             const uint8_t* prev, size_t n,
                                             int) {
  if (!prev) {
    std::memcpy(cur, in, n);
    return;
  }
  size_t x = 0;
  for (; x + 16 <= n; x += 16) {
    __m128i a = _mm_loadu_si128(reinterpret_cast<const __m128i*>(in + x));
    __m128i b = _mm_loadu_si128(reinterpret_cast<const __m128i*>(prev + x));
    _mm_storeu_si128(reinterpret_cast<__m128i*>(cur + x), _mm_add_epi8(a, b));
  }
  for (; x < n; ++x) cur[x] = uint8_t(in[x] + prev[x]);
}

// Load / store one pixel (<= 4 bytes) as the low lanes of an XMM register.
__attribute__((target("sse2"))) inline __m128i load_px(const uint8_t* p,
                                                       int bpp) {
  uint32_t v = 0;
  std::memcpy(&v, p, size_t(bpp));
  return _mm_cvtsi32_si128(int(v));
}

__attribute__((target("sse2"))) inline void store_px(uint8_t* p, __m128i v,
                                                     int bpp) {
  uint32_t u = uint32_t(_mm_cvtsi128_si32(v));
  std::memcpy(p, &u, size_t(bpp));
}

// Average / Paeth carry a true dependency on the reconstructed left pixel,
// so they vectorize across channels: one pixel per iteration in u16 lanes.
__attribute__((target("ssse3"))) void avg_ssse3(uint8_t* cur,
                                                const uint8_t* in,
                                                const uint8_t* prev, size_t n,
                                                int bpp) {
  const __m128i zero = _mm_setzero_si128();
  __m128i a = zero;  // reconstructed left pixel, u16 lanes
  size_t x = 0;
  for (; x + bpp <= n; x += bpp) {
    __m128i b = prev ? _mm_unpacklo_epi8(load_px(prev + x, bpp), zero) : zero;
    __m128i r = _mm_unpacklo_epi8(load_px(in + x, bpp), zero);
    // (a + b) >> 1 in u16 — exact, no pavgb rounding-up bias
    r = _mm_add_epi16(r, _mm_srli_epi16(_mm_add_epi16(a, b), 1));
    r = _mm_and_si128(r, _mm_set1_epi16(0xFF));  // wrap mod 256
    a = r;
    store_px(cur + x, _mm_packus_epi16(r, r), bpp);
  }
  for (; x < n; ++x) {  // ragged tail (never hit: bpp divides stride)
    int av = x >= size_t(bpp) ? cur[x - bpp] : 0;
    int bv = prev ? prev[x] : 0;
    cur[x] = uint8_t(in[x] + ((av + bv) >> 1));
  }
}

__attribute__((target("ssse3"))) void paeth_ssse3(uint8_t* cur,
                                                  const uint8_t* in,
                                                  const uint8_t* prev,
                                                  size_t n, int bpp) {
  const __m128i zero = _mm_setzero_si128();
  __m128i a = zero;  // left, u16
  __m128i c = zero;  // upper-left, u16
  size_t x = 0;
  for (; x + bpp <= n; x += bpp) {
    __m128i b = prev ? _mm_unpacklo_epi8(load_px(prev + x, bpp), zero) : zero;
    // distances in i16: pa = |b-c|, pb = |a-c|, pc = |a+b-2c|
    __m128i pa = _mm_abs_epi16(_mm_sub_epi16(b, c));
    __m128i pb = _mm_abs_epi16(_mm_sub_epi16(a, c));
    __m128i pc = _mm_abs_epi16(
        _mm_sub_epi16(_mm_add_epi16(a, b), _mm_add_epi16(c, c)));
    // predictor: a if pa<=pb && pa<=pc else b if pb<=pc else c
    __m128i use_a = _mm_and_si128(
        _mm_cmpeq_epi16(pa, _mm_min_epi16(pa, pb)),
        _mm_cmpeq_epi16(pa, _mm_min_epi16(pa, pc)));
    __m128i use_b = _mm_cmpeq_epi16(pb, _mm_min_epi16(pb, pc));
    __m128i pred = _mm_or_si128(
        _mm_and_si128(use_a, a),
        _mm_andnot_si128(
            use_a, _mm_or_si128(_mm_and_si128(use_b, b),
                                _mm_andnot_si128(use_b, c))));
    __m128i r = _mm_add_epi16(_mm_unpacklo_epi8(load_px(in + x, bpp), zero),
                              pred);
    r = _mm_and_si128(r, _mm_set1_epi16(0xFF));
    store_px(cur + x, _mm_packus_epi16(r, r), bpp);
    a = r;
    c = b;
  }
  for (; x < n; ++x) {  // ragged tail (never hit: bpp divides stride)
    int av = x >= size_t(bpp) ? cur[x - bpp] : 0;
    int bv = prev ? prev[x] : 0;
    int cv = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
    cur[x] = uint8_t(in[x] + paeth(av, bv, cv));
  }
}

#endif  // PNGLOADER_X86

using UnfilterFn = void (*)(uint8_t*, const uint8_t*, const uint8_t*, size_t,
                            int);

struct UnfilterTable {
  UnfilterFn sub = sub_scalar;
  UnfilterFn up = up_scalar;
  UnfilterFn avg = avg_scalar;
  UnfilterFn paeth = paeth_scalar;
};

const UnfilterTable& unfilters() {
  static const UnfilterTable t = [] {
    UnfilterTable t;
#if PNGLOADER_X86
    __builtin_cpu_init();
    if (__builtin_cpu_supports("sse2")) t.up = up_sse2;
    if (__builtin_cpu_supports("ssse3")) {
      t.sub = sub_ssse3;
      t.avg = avg_ssse3;
      t.paeth = paeth_ssse3;
    }
#endif
    return t;
  }();
  return t;
}

// Reconstruct one scanline. `src` points at the filter-type byte.
bool unfilter_row(const uint8_t* src, uint8_t* out, uint32_t y, size_t stride,
                  int bpp) {
  const UnfilterTable& t = unfilters();
  const uint8_t* in = src + 1;
  uint8_t* cur = &out[y * stride];
  const uint8_t* prev = y ? &out[(y - 1) * stride] : nullptr;
  switch (src[0]) {
    case 0:
      std::memcpy(cur, in, stride);
      return true;
    case 1:
      t.sub(cur, in, nullptr, stride, bpp);
      return true;
    case 2:
      t.up(cur, in, prev, stride, bpp);
      return true;
    case 3:
      t.avg(cur, in, prev, stride, bpp);
      return true;
    case 4:
      t.paeth(cur, in, prev, stride, bpp);
      return true;
    default:
      return false;
  }
}

struct PngImage {
  uint32_t width = 0, height = 0;
  int channels = 0;  // after palette expansion: 1, 2, 3 or 4
  std::vector<uint8_t> pixels;  // H * W * channels
};

// Decode one PNG file into `img`. Returns an ErrorCode.
int decode_png(const char* path, PngImage* img) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return kOpenFailed;
  std::vector<uint8_t> file((std::istreambuf_iterator<char>(f)),
                            std::istreambuf_iterator<char>());
  if (file.size() < 45 || std::memcmp(file.data(), kPngSig, 8) != 0)
    return kBadSignature;

  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples
  std::vector<uint8_t> trns;

  size_t pos = 8;
  while (pos + 12 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    if (pos + 12 + len > file.size()) return kCorrupt;
    const uint8_t* type = &file[pos + 4];
    const uint8_t* data = &file[pos + 8];
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return kCorrupt;
      width = be32(data);
      height = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
      if (bit_depth != 8 || interlace != 0) return kUnsupported;
      if (color_type != 0 && color_type != 2 && color_type != 3 &&
          color_type != 4 && color_type != 6)
        return kUnsupported;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(data, data + len);
    } else if (!std::memcmp(type, "tRNS", 4)) {
      trns.assign(data, data + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (width == 0 || height == 0 || idat.empty()) return kCorrupt;
  if (size_t(width) * height > (size_t(1) << 30))  // 1 Gpx per-image cap
    return kUnsupported;

  int src_channels;
  switch (color_type) {
    case 0: src_channels = 1; break;  // gray
    case 2: src_channels = 3; break;  // RGB
    case 3: src_channels = 1; break;  // palette indices
    case 4: src_channels = 2; break;  // gray+alpha
    default: src_channels = 4; break; // RGBA
  }
  const size_t stride = size_t(width) * src_channels;
  const size_t row_bytes = stride + 1;  // filter byte + filtered row
  const int bpp = src_channels;         // bytes per pixel (8-bit depth)
  std::vector<uint8_t> out(size_t(width) * height * src_channels);

  // Streaming inflate: fill a small chunk buffer and unfilter each complete
  // scanline while it is cache-hot (no whole-image filtered temporary).
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return kInflateError;
  zs.next_in = idat.data();
  zs.avail_in = uInt(idat.size());
  const size_t chunk = std::max<size_t>(row_bytes * 4, size_t(1) << 16);
  std::vector<uint8_t> buf(chunk + row_bytes);
  size_t have = 0;
  uint32_t y = 0;
  int zret = Z_OK;
  while (y < height) {
    if (have < row_bytes) {
      if (zret == Z_STREAM_END) break;  // truncated stream
      zs.next_out = buf.data() + have;
      zs.avail_out = uInt(buf.size() - have);
      zret = inflate(&zs, Z_NO_FLUSH);
      if (zret != Z_OK && zret != Z_STREAM_END) {
        inflateEnd(&zs);
        return kInflateError;
      }
      size_t produced = (buf.size() - have) - zs.avail_out;
      if (produced == 0 && zret != Z_STREAM_END) {
        inflateEnd(&zs);  // no progress and not at end: corrupt/truncated
        return kInflateError;
      }
      have += produced;
      continue;
    }
    size_t off = 0;
    while (have - off >= row_bytes && y < height) {
      if (!unfilter_row(buf.data() + off, out.data(), y, stride, bpp)) {
        inflateEnd(&zs);
        return kCorrupt;
      }
      off += row_bytes;
      ++y;
    }
    std::memmove(buf.data(), buf.data() + off, have - off);
    have -= off;
  }
  inflateEnd(&zs);
  if (y < height) return kInflateError;  // stream ended early

  img->width = width;
  img->height = height;
  if (color_type == 3) {
    // palette expansion → RGB
    if (palette.size() < 3) return kCorrupt;
    img->channels = 3;
    img->pixels.resize(size_t(width) * height * 3);
    for (size_t i = 0; i < size_t(width) * height; ++i) {
      size_t idx = out[i] * 3;
      if (idx + 2 >= palette.size()) idx = 0;
      img->pixels[i * 3 + 0] = palette[idx + 0];
      img->pixels[i * 3 + 1] = palette[idx + 1];
      img->pixels[i * 3 + 2] = palette[idx + 2];
    }
  } else {
    img->channels = src_channels;
    img->pixels = std::move(out);
  }
  return kOk;
}

// Convert a decoded image into the requested channel count in-place into
// `dst` (C == 3: RGB; C == 1: first channel / palette index luminance).
void write_converted(const PngImage& img, uint8_t* dst, int want_c) {
  const size_t n = size_t(img.width) * img.height;
  const int c = img.channels;
  if (want_c == c) {
    std::memcpy(dst, img.pixels.data(), n * c);
    return;
  }
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* px = &img.pixels[i * c];
    if (want_c == 3) {
      if (c == 1 || c == 2) {
        dst[i * 3] = dst[i * 3 + 1] = dst[i * 3 + 2] = px[0];
      } else {  // RGBA -> RGB
        dst[i * 3] = px[0];
        dst[i * 3 + 1] = px[1];
        dst[i * 3 + 2] = px[2];
      }
    } else {  // want_c == 1: take first channel
      dst[i] = px[0];
    }
  }
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

// Decode `n` PNGs into a preallocated NHWC uint8 buffer `out`
// (n * height * width * channels).  Every image must decode to exactly
// (height, width); per-image status codes land in `status[n]`.
// Returns the number of failures (0 == all good).
int decode_png_batch(const char** paths, int n, uint8_t* out,
                     int height, int width, int channels, int threads,
                     int32_t* status) {
  if (threads < 1) threads = 1;
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  std::vector<std::thread> pool;
  const size_t img_bytes = size_t(height) * width * channels;
  auto work = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      PngImage img;
      int rc;
      try {
        rc = decode_png(paths[i], &img);
      } catch (...) {  // bad_alloc etc. must not cross the ctypes boundary
        rc = kCorrupt;
      }
      if (rc == kOk &&
          (int(img.height) != height || int(img.width) != width)) {
        rc = kSizeMismatch;
      }
      status[i] = rc;
      if (rc != kOk) {
        failures.fetch_add(1);
        continue;
      }
      write_converted(img, out + size_t(i) * img_bytes, channels);
    }
  };
  int nt = std::min(threads, n);
  for (int t = 0; t < nt; ++t) pool.emplace_back(work);
  for (auto& t : pool) t.join();
  return failures.load();
}

// Probe a PNG's dimensions without decoding. Returns ErrorCode.
int png_info(const char* path, int32_t* height, int32_t* width) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return kOpenFailed;
  uint8_t hdr[33];
  f.read(reinterpret_cast<char*>(hdr), 33);
  if (f.gcount() < 33 || std::memcmp(hdr, kPngSig, 8) != 0)
    return kBadSignature;
  if (std::memcmp(hdr + 12, "IHDR", 4) != 0) return kCorrupt;
  *width = int32_t(be32(hdr + 16));
  *height = int32_t(be32(hdr + 20));
  return kOk;
}

}  // extern "C"
