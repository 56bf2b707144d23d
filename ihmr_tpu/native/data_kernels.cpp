// Native host-side data-plane kernels for ihmr_tpu.
//
// The reference's data path leans on native code via OpenCV (decode/resize)
// and torch's C++ collate; feeding a TPU at full rate needs the same class of
// host throughput. These kernels implement the hot per-sample image ops --
// letterbox resize (top-left anchored, bilinear) and uint8-BGR -> normalized
// float32-RGB conversion (the reference's ToTensor+Normalize(.5,.5);
// ref src/data/baseline_dataset.py:41-44, data_preprocess.py:45-60) -- as a
// small C library with a std::thread pool for batch parallelism.
//
// Exposed via ctypes (see ihmr_tpu/native/__init__.py); built with
// `python -m ihmr_tpu.native.build`.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear sample of a uint8 HWC image at (x, y) for channel c.
inline float bilinear(const uint8_t* img, int h, int w, int channels, float y,
                      float x, int c) {
  int x0 = static_cast<int>(x);
  int y0 = static_cast<int>(y);
  int x1 = std::min(x0 + 1, w - 1);
  int y1 = std::min(y0 + 1, h - 1);
  float fx = x - x0;
  float fy = y - y0;
  const float v00 = img[(y0 * w + x0) * channels + c];
  const float v01 = img[(y0 * w + x1) * channels + c];
  const float v10 = img[(y1 * w + x0) * channels + c];
  const float v11 = img[(y1 * w + x1) * channels + c];
  return v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
         v10 * fy * (1 - fx) + v11 * fy * fx;
}

template <typename Fn>
void parallel_for(int n, Fn&& fn) {
  int workers = std::min<int>(n, std::max(1u, std::thread::hardware_concurrency()));
  if (workers <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Letterbox one uint8 HWC image into a final_size x final_size canvas
// (top-left anchored, zero padding) and emit normalized float32 in [-1, 1],
// CHANNEL ORDER PRESERVED (the reference feeds cv2 BGR straight through
// ToTensor; ref baseline_dataset.py:41-44,123). Returns the resize ratio
// applied to pixel coordinates.
float letterbox_normalize(const uint8_t* img, int h, int w, int channels,
                          int final_size, float* out /* S*S*3 */) {
  float ratio;
  int new_h, new_w;
  if (h > w) {
    ratio = static_cast<float>(final_size) / h;
    new_h = final_size;
    new_w = static_cast<int>(ratio * w);
  } else {
    ratio = static_cast<float>(final_size) / w;
    new_w = final_size;
    new_h = static_cast<int>(ratio * h);
  }
  std::memset(out, 0, sizeof(float) * final_size * final_size * 3);
  // normalized zero-pixel value is (0/255 - .5)/.5 = -1
  for (int i = 0; i < final_size * final_size * 3; ++i) out[i] = -1.0f;

  const float sx = static_cast<float>(w) / new_w;
  const float sy = static_cast<float>(h) / new_h;
  for (int y = 0; y < new_h; ++y) {
    const float src_y = std::min((y + 0.5f) * sy - 0.5f, h - 1.0f);
    const float cy = src_y < 0 ? 0 : src_y;
    for (int x = 0; x < new_w; ++x) {
      const float src_x = std::min((x + 0.5f) * sx - 0.5f, w - 1.0f);
      const float cx = src_x < 0 ? 0 : src_x;
      float* dst = out + (y * final_size + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float v = bilinear(img, h, w, channels, cy, cx, c);
        dst[c] = (v / 255.0f - 0.5f) / 0.5f;
      }
    }
  }
  return ratio;
}

// Batched variant over images with identical input dims.
void letterbox_normalize_batch(const uint8_t* imgs, int batch, int h, int w,
                               int channels, int final_size, float* out,
                               float* ratios) {
  const size_t in_stride = static_cast<size_t>(h) * w * channels;
  const size_t out_stride = static_cast<size_t>(final_size) * final_size * 3;
  parallel_for(batch, [&](int i) {
    ratios[i] = letterbox_normalize(imgs + i * in_stride, h, w, channels,
                                    final_size, out + i * out_stride);
  });
}

// Batched uint8 HWC -> normalized float32 HWC (no resize), channel order
// preserved (the reference feeds cv2 BGR straight through ToTensor).
void normalize_batch(const uint8_t* imgs, int batch, int h, int w, float* out) {
  const size_t stride = static_cast<size_t>(h) * w * 3;
  parallel_for(batch, [&](int i) {
    const uint8_t* src = imgs + i * stride;
    float* dst = out + i * stride;
    for (size_t p = 0; p < stride; ++p) {
      dst[p] = (src[p] / 255.0f - 0.5f) / 0.5f;
    }
  });
}

}  // extern "C"
