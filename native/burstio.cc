// burstio — native burst-image IO core for fbanet_tpu.
//
// The reference reached its data-path performance through NVIDIA DALI's C++
// executor: nvJPEG/libpng decode on GPU plus an async pipelined executor
// (reference: fba_net/pipeline/real_bsr_iterator.py:26-95, SURVEY.md §2.4
// N5/N6). TPUs have no decode hardware, so the equivalent is a host-side
// native decode pool: libpng decoding on a persistent std::thread pool,
// writing straight into caller-provided contiguous burst buffers (zero
// Python-object churn, no GIL involvement between submissions).
//
// C API (ctypes-friendly), all functions return 0 on success:
//   burstio_version()                         -> int
//   burstio_pool_create(threads)              -> opaque handle
//   burstio_pool_destroy(handle)
//   burstio_decode_files(handle, n, paths[], out, h, w, c)
//       decode n PNG files in parallel into out[n, h, w, c] uint8;
//       fails if any image's dimensions mismatch (h, w) or channels < c.
//   burstio_decode_files_f32(handle, n, paths[], out, h, w, c)
//       same but writes float32 in [0, 1] (fuses the /255 normalization the
//       training loop needs, reference: fba_net/train.py:82-83).
//   burstio_transform_f32(handle, src, out, sel[], n_sel, src_h, src_w, c,
//                         r0, c0, cs, dihedral)
//       sample-assembly fast path over a decoded uint8 frame cache: gather
//       the selected frames, crop a cs x cs window at (r0, c0), apply one of
//       the 8 dihedral transforms and write float32/255 — the whole
//       crop+augment+normalize step of the reference's training dataset
//       (fba_net/ManualDataset.py.bak:125-148) in one GIL-free pass.
//
// Build: make -C native   (links against the system libpng16/zlib)

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- thread pool

class ThreadPool {
 public:
  explicit ThreadPool(int threads) {
    if (threads < 1) threads = 1;
    for (int i = 0; i < threads; ++i) {
      workers_.emplace_back([this] { Loop(); });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      queue_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        job = std::move(queue_.front());
        queue_.pop();
      }
      job();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> queue_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

// ------------------------------------------------------------------ png read

struct MemReader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void PngReadFromMem(png_structp png, png_bytep out, png_size_t count) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + count > r->size) {
    png_error(png, "burstio: truncated PNG stream");
  }
  std::memcpy(out, r->data + r->pos, count);
  r->pos += count;
}

// Decode a PNG byte buffer to tightly packed RGB8 (or the first `channels`
// channels). Returns 0 on success; fills height/width.
int DecodePng(const uint8_t* bytes, size_t len, uint8_t* out, int expect_h,
              int expect_w, int channels) {
  if (len < 8 || png_sig_cmp(bytes, 0, 8) != 0) return 2;  // not a PNG

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return 3;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 3;
  }
  std::vector<png_bytep> rows;
  std::vector<uint8_t> scratch;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 4;  // libpng longjmp'd: corrupt stream
  }

  MemReader reader{bytes, len, 0};
  png_set_read_fn(png, &reader, PngReadFromMem);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // normalize everything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  if ((expect_h > 0 && static_cast<int>(h) != expect_h) ||
      (expect_w > 0 && static_cast<int>(w) != expect_w)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 5;  // dimension mismatch
  }
  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes < static_cast<size_t>(w) * channels) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 6;
  }

  rows.resize(h);
  if (rowbytes == static_cast<size_t>(w) * channels) {
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = out + static_cast<size_t>(y) * w * channels;
    png_read_image(png, rows.data());
  } else {
    scratch.resize(rowbytes * h);
    for (png_uint_32 y = 0; y < h; ++y) rows[y] = scratch.data() + y * rowbytes;
    png_read_image(png, rows.data());
    for (png_uint_32 y = 0; y < h; ++y)
      std::memcpy(out + static_cast<size_t>(y) * w * channels, rows[y],
                  static_cast<size_t>(w) * channels);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int ReadFile(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return 1;
  }
  out->resize(static_cast<size_t>(size));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size() ? 0 : 1;
}

struct Latch {
  explicit Latch(int n) : remaining(n) {}
  void CountDown() {
    std::lock_guard<std::mutex> lock(mu);
    if (--remaining == 0) cv.notify_all();
  }
  void Wait() {
    std::unique_lock<std::mutex> lock(mu);
    cv.wait(lock, [this] { return remaining == 0; });
  }
  std::mutex mu;
  std::condition_variable cv;
  int remaining;
};

template <typename WritePixel>
int DecodeFilesImpl(ThreadPool* pool, int n, const char** paths, int h, int w,
                    int c, WritePixel write_one) {
  std::atomic<int> status{0};
  Latch latch(n);
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      std::vector<uint8_t> bytes;
      int rc = ReadFile(paths[i], &bytes);
      if (rc == 0) {
        rc = write_one(i, bytes);
      }
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc + i * 100);
      }
      latch.CountDown();
    });
  }
  latch.Wait();
  return status.load();
}

}  // namespace

extern "C" {

int burstio_version() { return 11; }

void* burstio_pool_create(int threads) { return new ThreadPool(threads); }

void burstio_pool_destroy(void* pool) {
  delete static_cast<ThreadPool*>(pool);
}

// out: [n, h, w, c] uint8
int burstio_decode_files(void* pool, int n, const char** paths, uint8_t* out,
                         int h, int w, int c) {
  size_t frame = static_cast<size_t>(h) * w * c;
  return DecodeFilesImpl(
      static_cast<ThreadPool*>(pool), n, paths, h, w, c,
      [&](int i, const std::vector<uint8_t>& bytes) {
        return DecodePng(bytes.data(), bytes.size(), out + i * frame, h, w, c);
      });
}

// out: [n, h, w, c] float32 in [0, 1]
int burstio_decode_files_f32(void* pool, int n, const char** paths, float* out,
                             int h, int w, int c) {
  size_t frame = static_cast<size_t>(h) * w * c;
  return DecodeFilesImpl(
      static_cast<ThreadPool*>(pool), n, paths, h, w, c,
      [&](int i, const std::vector<uint8_t>& bytes) {
        std::vector<uint8_t> tmp(frame);
        int rc = DecodePng(bytes.data(), bytes.size(), tmp.data(), h, w, c);
        if (rc != 0) return rc;
        float* dst = out + i * frame;
        constexpr float kScale = 1.0f / 255.0f;
        for (size_t k = 0; k < frame; ++k) dst[k] = tmp[k] * kScale;
        return 0;
      });
}

// Gather+crop+dihedral+normalize from a decoded uint8 cache.
//   src: [n_src, src_h, src_w, c] uint8; out: [n_sel, cs, cs, c] float32.
//   sel[i] selects the source frame; the cs x cs window starts at (r0, c0);
//   `dihedral` follows fbanet_tpu.data.realbsr.dihedral_transform numbering
//   (t%4 = #rot90(axes=(-2,-3)), t>=4 adds a row flip). All 8 transforms are
//   affine index maps out[y][x] = crop[a0+ay*y+ax*x][b0+by*y+bx*x].
int burstio_transform_f32(void* pool, const uint8_t* src, float* out,
                          const int* sel, int n_sel, int n_src, int src_h,
                          int src_w, int c, int r0, int c0, int cs,
                          int dihedral) {
  if (r0 < 0 || c0 < 0 || cs <= 0 || r0 + cs > src_h || c0 + cs > src_w)
    return 1;
  if (dihedral < 0 || dihedral > 7) return 2;
  const int N = cs - 1;
  // {a0, ay, ax, b0, by, bx} per transform (derived from the numpy
  // rot90/flip composition; pinned by tests/test_native_io.py)
  static const int kMap[8][6] = {
      {0, 1, 0, 0, 0, 1},    // t0: identity
      {0, 0, -1, 0, 1, 0},   // t1: sy=N-x, sx=y  (a0 adjusted below)
      {0, -1, 0, 0, 0, -1},  // t2: sy=N-y, sx=N-x
      {0, 0, 1, 0, -1, 0},   // t3: sy=x,   sx=N-y
      {0, -1, 0, 0, 0, 1},   // t4: sy=N-y, sx=x
      {0, 0, -1, 0, -1, 0},  // t5: sy=N-x, sx=N-y
      {0, 1, 0, 0, 0, -1},   // t6: sy=y,   sx=N-x
      {0, 0, 1, 0, 1, 0},    // t7: sy=x,   sx=y
  };
  int a0 = kMap[dihedral][0], ay = kMap[dihedral][1], ax = kMap[dihedral][2];
  int b0 = kMap[dihedral][3], by = kMap[dihedral][4], bx = kMap[dihedral][5];
  if (ay < 0 || ax < 0) a0 = N;
  if (by < 0 || bx < 0) b0 = N;

  std::atomic<int> status{0};
  Latch latch(n_sel);
  constexpr float kScale = 1.0f / 255.0f;
  size_t src_frame = static_cast<size_t>(src_h) * src_w * c;
  size_t out_frame = static_cast<size_t>(cs) * cs * c;
  for (int i = 0; i < n_sel; ++i) {
    static_cast<ThreadPool*>(pool)->Submit([&, i] {
      int f = sel[i];
      if (f < 0 || f >= n_src) {
        int expected = 0;
        status.compare_exchange_strong(expected, 3 + i * 100);
        latch.CountDown();
        return;
      }
      const uint8_t* frame = src + f * src_frame;
      float* dst = out + i * out_frame;
      for (int y = 0; y < cs; ++y) {
        int sy_base = a0 + ay * y;
        int sx_base = b0 + by * y;
        for (int x = 0; x < cs; ++x) {
          const uint8_t* px =
              frame + (static_cast<size_t>(r0 + sy_base + ax * x) * src_w +
                       (c0 + sx_base + bx * x)) *
                          c;
          float* q = dst + (static_cast<size_t>(y) * cs + x) * c;
          for (int k = 0; k < c; ++k) q[k] = px[k] * kScale;
        }
      }
      latch.CountDown();
    });
  }
  latch.Wait();
  return status.load();
}

}  // extern "C"
