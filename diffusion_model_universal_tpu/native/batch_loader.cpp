// Native host-side batch assembly for the TPU input pipeline.
//
// The reference offloads its host data path to torchvision transforms run
// in DataLoader worker *processes* (reference datasets/dataset_utils.py:
// 160-178, num_workers=4). On TPU hosts the equivalent hot path is batch
// GATHER + geometry from a resident uint8 dataset array: the float math
// happens on-device (see datasets/pipeline.py), so what remains on the host
// is memory-bandwidth-bound uint8 shuffling that Python/NumPy fancy
// indexing does single-threaded with an extra copy.
//
// This library provides:
//   * dmu_gather_batch        — multi-threaded strided gather of sample
//                               rows into a contiguous batch buffer
//                               (optionally horizontally flipped per
//                               sample), writing directly into the
//                               caller-provided (pinnable) buffer.
//   * dmu_center_crop_resize  — threaded uint8 center-crop + bilinear
//                               resize (the CelebA 178→64 path,
//                               reference celeba_loader.py:88-102).
//   * dmu_shuffle             — Fisher-Yates with SplitMix64, seeded, for
//                               deterministic epoch permutations.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Deterministic shuffle (SplitMix64 + Fisher-Yates)
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

void dmu_shuffle(int64_t* indices, int64_t n, uint64_t seed) {
  for (int64_t i = 0; i < n; ++i) indices[i] = i;
  uint64_t state = seed ^ 0xD1B54A32D192ED03ULL;
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)(splitmix64(&state) % (uint64_t)(i + 1));
    std::swap(indices[i], indices[j]);
  }
}

// ---------------------------------------------------------------------------
// Threaded batch gather (+ optional per-sample horizontal flip)
// ---------------------------------------------------------------------------

static void gather_range(const uint8_t* data, const int64_t* indices,
                         const uint8_t* flip, uint8_t* out, int64_t begin,
                         int64_t end, int64_t h, int64_t w, int64_t c) {
  const int64_t sample_bytes = h * w * c;
  const int64_t row_bytes = w * c;
  for (int64_t b = begin; b < end; ++b) {
    const uint8_t* src = data + indices[b] * sample_bytes;
    uint8_t* dst = out + b * sample_bytes;
    if (flip != nullptr && flip[b]) {
      // Horizontal flip: reverse pixel order within each row.
      for (int64_t y = 0; y < h; ++y) {
        const uint8_t* srow = src + y * row_bytes;
        uint8_t* drow = dst + y * row_bytes;
        for (int64_t x = 0; x < w; ++x) {
          std::memcpy(drow + x * c, srow + (w - 1 - x) * c, (size_t)c);
        }
      }
    } else {
      std::memcpy(dst, src, (size_t)sample_bytes);
    }
  }
}

void dmu_gather_batch(const uint8_t* data, const int64_t* indices,
                      const uint8_t* flip, uint8_t* out, int64_t batch,
                      int64_t h, int64_t w, int64_t c, int num_threads) {
  if (num_threads <= 1 || batch < 64) {
    gather_range(data, indices, flip, out, 0, batch, h, w, c);
    return;
  }
  int threads = std::min<int64_t>(num_threads, batch);
  std::vector<std::thread> pool;
  pool.reserve(threads);
  int64_t chunk = (batch + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min(begin + chunk, batch);
    if (begin >= end) break;
    pool.emplace_back(gather_range, data, indices, flip, out, begin, end, h,
                      w, c);
  }
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// Threaded uint8 center-crop + bilinear resize (NHWC)
// ---------------------------------------------------------------------------

static void crop_resize_one(const uint8_t* src, uint8_t* dst, int64_t sh,
                            int64_t sw, int64_t c, int64_t crop, int64_t out_hw) {
  const int64_t top = std::max<int64_t>((sh - crop) / 2, 0);
  const int64_t left = std::max<int64_t>((sw - crop) / 2, 0);
  const int64_t eff = std::min({crop, sh, sw});
  const float scale = (float)eff / (float)out_hw;
  for (int64_t oy = 0; oy < out_hw; ++oy) {
    // align_corners=false bilinear sampling (matches jax.image.resize).
    float fy = ((float)oy + 0.5f) * scale - 0.5f;
    int64_t y0 = (int64_t)fy;
    if (fy < 0) y0 = 0;
    int64_t y1 = std::min(y0 + 1, eff - 1);
    float wy = fy - (float)y0;
    if (wy < 0) wy = 0;
    for (int64_t ox = 0; ox < out_hw; ++ox) {
      float fx = ((float)ox + 0.5f) * scale - 0.5f;
      int64_t x0 = (int64_t)fx;
      if (fx < 0) x0 = 0;
      int64_t x1 = std::min(x0 + 1, eff - 1);
      float wx = fx - (float)x0;
      if (wx < 0) wx = 0;
      for (int64_t ch = 0; ch < c; ++ch) {
        const float v00 = src[((top + y0) * sw + (left + x0)) * c + ch];
        const float v01 = src[((top + y0) * sw + (left + x1)) * c + ch];
        const float v10 = src[((top + y1) * sw + (left + x0)) * c + ch];
        const float v11 = src[((top + y1) * sw + (left + x1)) * c + ch];
        const float v0 = v00 + (v01 - v00) * wx;
        const float v1 = v10 + (v11 - v10) * wx;
        float v = v0 + (v1 - v0) * wy;
        dst[(oy * out_hw + ox) * c + ch] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

void dmu_center_crop_resize(const uint8_t* data, uint8_t* out, int64_t n,
                            int64_t sh, int64_t sw, int64_t c, int64_t crop,
                            int64_t out_hw, int num_threads) {
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      crop_resize_one(data + i * sh * sw * c, out + i * out_hw * out_hw * c,
                      sh, sw, c, crop, out_hw);
    }
  };
  int threads = std::max(1, std::min<int>(num_threads, (int)n));
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
