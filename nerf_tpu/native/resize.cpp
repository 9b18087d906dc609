// Native area-downsample kernel for the LLFF loader's minify step.
//
// Replaces the reference's out-of-process ImageMagick `mogrify -resize`
// shell-out (load_llff.py:45-51) with an in-process block-mean reduction
// (exactly what OpenCV INTER_AREA computes for integer factors). Called from
// Python via ctypes (nerf_tpu/native/resize.py); built on demand with g++.
//
// Layout: row-major interleaved channels (H, W, C). Output is the
// floor(H/f) x floor(W/f) block mean, one thread per output row stripe.

#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// uint8 input -> float output in [0, 255]
void area_downsample_u8(const uint8_t* in, int64_t H, int64_t W, int64_t C,
                        int64_t factor, float* out) {
  const int64_t H2 = H / factor, W2 = W / factor;
  const float inv = 1.0f / static_cast<float>(factor * factor);
  int64_t n_threads = std::min<int64_t>(
      std::max(1u, std::thread::hardware_concurrency()), H2);
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int64_t r = t; r < H2; r += n_threads) {
        for (int64_t c = 0; c < W2; ++c) {
          for (int64_t ch = 0; ch < C; ++ch) {
            float acc = 0.0f;
            for (int64_t dr = 0; dr < factor; ++dr) {
              const uint8_t* row = in + ((r * factor + dr) * W + c * factor) * C + ch;
              for (int64_t dc = 0; dc < factor; ++dc) acc += row[dc * C];
            }
            out[(r * W2 + c) * C + ch] = acc * inv;
          }
        }
      }
    });
  }
  for (auto& w : workers) w.join();
}

// float input -> float output (same scale as input)
void area_downsample_f32(const float* in, int64_t H, int64_t W, int64_t C,
                         int64_t factor, float* out) {
  const int64_t H2 = H / factor, W2 = W / factor;
  const float inv = 1.0f / static_cast<float>(factor * factor);
  int64_t n_threads = std::min<int64_t>(
      std::max(1u, std::thread::hardware_concurrency()), H2);
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int64_t r = t; r < H2; r += n_threads) {
        for (int64_t c = 0; c < W2; ++c) {
          for (int64_t ch = 0; ch < C; ++ch) {
            float acc = 0.0f;
            for (int64_t dr = 0; dr < factor; ++dr) {
              const float* row = in + ((r * factor + dr) * W + c * factor) * C + ch;
              for (int64_t dc = 0; dc < factor; ++dc) acc += row[dc * C];
            }
            out[(r * W2 + c) * C + ch] = acc * inv;
          }
        }
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
