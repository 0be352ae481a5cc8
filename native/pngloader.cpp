// Native batch PNG decoder for the patch-loading hot path.
//
// The reference's data pipeline bottleneck is per-worker PNG decode +
// augmentation in Python DataLoader subprocesses (reference dataset.py:24-30,
// SURVEY.md §3.1 hot loops).  Augmentation moved on-device (ops/augment.py);
// this library replaces the decode side: a C++ thread pool inflating and
// unfiltering PNG scanlines straight into a caller-provided NHWC uint8
// batch buffer — no Python object churn, no per-image allocations, no GIL.
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

  int src_channels;
  switch (color_type) {
    case 0: src_channels = 1; break;  // gray
    case 2: src_channels = 3; break;  // RGB
    case 3: src_channels = 1; break;  // palette indices
    case 4: src_channels = 2; break;  // gray+alpha
    default: src_channels = 4; break; // RGBA
  }
  const size_t stride = size_t(width) * src_channels;
  const size_t raw_size = (stride + 1) * height;
  std::vector<uint8_t> raw(raw_size);

  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return kInflateError;
  zs.next_in = idat.data();
  zs.avail_in = uInt(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = uInt(raw.size());
  int zret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zret != Z_STREAM_END && !(zret == Z_OK && zs.avail_out == 0))
    return kInflateError;

  // unfilter scanlines in place into `out`
  std::vector<uint8_t> out(size_t(width) * height * src_channels);
  const int bpp = src_channels;  // bytes per pixel (8-bit depth)
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* src = &raw[y * (stride + 1)];
    uint8_t filter = src[0];
    const uint8_t* cur_in = src + 1;
    uint8_t* cur = &out[y * stride];
    const uint8_t* prev = y ? &out[(y - 1) * stride] : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(cur, cur_in, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          cur[x] = uint8_t(cur_in[x] + (x >= size_t(bpp) ? cur[x - bpp] : 0));
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          cur[x] = uint8_t(cur_in[x] + (prev ? prev[x] : 0));
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          cur[x] = uint8_t(cur_in[x] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
          cur[x] = uint8_t(cur_in[x] + paeth(a, b, c));
        }
        break;
      default:
        return kCorrupt;
    }
  }

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
      int rc = decode_png(paths[i], &img);
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
