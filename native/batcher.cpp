// jvt native batcher: shuffled, augmented host-side batch assembly.
//
// The reference's data layer is torchvision/DataLoader (Python workers,
// per-sample transforms).  This is the TPU-framework equivalent of that
// runtime component in C++: the whole dataset lives in one pinned buffer
// (float32 or uint8 — uint8 quarters host RAM for imagenet-scale sets);
// each batch is assembled by one fused pass per sample —
// shuffle-gather + bilinear resize + random crop with zero padding +
// horizontal flip + normalize ((v - mean[c]) / std[c]) — multithreaded
// across samples, writing straight into the caller-provided float output
// buffer that feeds jax.device_put.
//
// C ABI (ctypes-friendly); no Python.h dependency.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batcher {
  const void* data;        // (n, c, h, w) float32 or uint8, not owned
  const int32_t* labels;   // (n,), not owned
  int64_t n, c, h, w;      // source geometry
  int64_t oh, ow;          // output geometry (resize target; == h, w if off)
  int is_u8;               // dataset element type
  uint64_t seed;
  int hflip;               // 0/1: random horizontal flip
  int crop_pad;            // 0: off; k: random crop from k-padded canvas
  std::vector<float> mean, inv_std;  // per-channel normalize (post-scale)
  std::vector<int64_t> order;
  uint64_t epoch = 0;

  int64_t src_elems() const { return c * h * w; }
  int64_t out_elems() const { return c * oh * ow; }
};

inline uint64_t mix(uint64_t a, uint64_t b) {
  // splitmix64-style combine for per-(epoch, sample) streams
  uint64_t z = a + 0x9e3779b97f4a7c15ULL * (b + 1);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

template <typename T>
inline float load_px(const T* row, int64_t x);

template <>
inline float load_px<float>(const float* row, int64_t x) { return row[x]; }

template <>
inline float load_px<uint8_t>(const uint8_t* row, int64_t x) {
  return row[x] * (1.0f / 255.0f);
}

// One sample: gather source row `src`, resize to (oh, ow), apply the
// per-sample random crop/flip, normalize, write (c, oh, ow) floats.
template <typename T>
void assemble_one_t(const Batcher* B, int64_t src, uint64_t rng_key,
                    float* out) {
  const int64_t c = B->c, h = B->h, w = B->w, oh = B->oh, ow = B->ow;
  const T* img = static_cast<const T*>(B->data) + src * B->src_elems();
  const bool resizing = (oh != h || ow != w);

  bool flip = false;
  int64_t dy = 0, dx = 0;
  if (B->hflip || B->crop_pad) {
    uint64_t r = rng_key;
    if (B->hflip) {
      flip = (r & 1ULL) != 0;
      r >>= 1;
    }
    if (B->crop_pad) {
      const int64_t span = 2 * B->crop_pad + 1;
      dy = static_cast<int64_t>(r % span) - B->crop_pad;
      r /= span;
      dx = static_cast<int64_t>(r % span) - B->crop_pad;
    }
  }

  // resize mapping: output grid point g in [0, og) samples source
  // coordinate g * (s - 1) / (og - 1) (corner-aligned bilinear)
  const float fy = (oh > 1 && resizing)
                       ? static_cast<float>(h - 1) / static_cast<float>(oh - 1)
                       : 1.0f;
  const float fx = (ow > 1 && resizing)
                       ? static_cast<float>(w - 1) / static_cast<float>(ow - 1)
                       : 1.0f;

  for (int64_t ch = 0; ch < c; ++ch) {
    const T* src_ch = img + ch * h * w;
    float* dst_ch = out + ch * oh * ow;
    const float m = B->mean.empty() ? 0.0f : B->mean[ch];
    const float is = B->inv_std.empty() ? 1.0f : B->inv_std[ch];
    for (int64_t y = 0; y < oh; ++y) {
      float* dst_row = dst_ch + y * ow;
      // edge-replicated crop canvas: out-of-range coordinates clamp to the
      // nearest edge pixel, matching the numpy path's np.pad(mode='edge')
      // and the reference's RandomCrop(padding_mode='edge')
      // (ref utils/torch_load.py:409-412)
      const int64_t gy =
          std::min<int64_t>(std::max<int64_t>(y + dy, 0), oh - 1);
      for (int64_t x = 0; x < ow; ++x) {
        const int64_t gx0 = x + dx;
        const int64_t gxf = flip ? (ow - 1 - gx0) : gx0;
        const int64_t gx =
            std::min<int64_t>(std::max<int64_t>(gxf, 0), ow - 1);
        float v;
        if (!resizing) {
          v = load_px<T>(src_ch + gy * w, gx);
        } else {
          const float sy = gy * fy, sx = gx * fx;
          const int64_t y0 = static_cast<int64_t>(sy);
          const int64_t x0 = static_cast<int64_t>(sx);
          const int64_t y1 = std::min<int64_t>(y0 + 1, h - 1);
          const int64_t x1 = std::min<int64_t>(x0 + 1, w - 1);
          const float ay = sy - y0, ax = sx - x0;
          const float v00 = load_px<T>(src_ch + y0 * w, x0);
          const float v01 = load_px<T>(src_ch + y0 * w, x1);
          const float v10 = load_px<T>(src_ch + y1 * w, x0);
          const float v11 = load_px<T>(src_ch + y1 * w, x1);
          v = (1 - ay) * ((1 - ax) * v00 + ax * v01) +
              ay * ((1 - ax) * v10 + ax * v11);
        }
        dst_row[x] = (v - m) * is;
      }
    }
  }
}

void assemble_one(const Batcher* B, int64_t src, uint64_t rng_key,
                  float* out) {
  if (B->is_u8) {
    assemble_one_t<uint8_t>(B, src, rng_key, out);
  } else {
    assemble_one_t<float>(B, src, rng_key, out);
  }
}

Batcher* make_batcher(const void* data, const int32_t* labels, int64_t n,
                      int64_t c, int64_t h, int64_t w, int64_t oh, int64_t ow,
                      int is_u8, uint64_t seed, int hflip, int crop_pad,
                      const float* mean, const float* std_) {
  auto* B = new Batcher{data, labels, n, c, h, w,
                        oh > 0 ? oh : h, ow > 0 ? ow : w,
                        is_u8, seed, hflip, crop_pad,
                        {}, {}, {}, 0};
  if (mean) B->mean.assign(mean, mean + c);
  if (std_) {
    B->inv_std.resize(c);
    for (int64_t i = 0; i < c; ++i)
      B->inv_std[i] = std_[i] != 0.0f ? 1.0f / std_[i] : 1.0f;
  }
  B->order.resize(n);
  for (int64_t i = 0; i < n; ++i) B->order[i] = i;
  return B;
}

}  // namespace

extern "C" {

void* jvt_batcher_create(const float* data, const int32_t* labels,
                         int64_t n, int64_t c, int64_t h, int64_t w,
                         uint64_t seed, int hflip, int crop_pad) {
  return make_batcher(data, labels, n, c, h, w, 0, 0, /*is_u8=*/0, seed,
                      hflip, crop_pad, nullptr, nullptr);
}

// v2: uint8 or float source, bilinear resize to (out_h, out_w), fused
// per-channel normalization ((v - mean[c]) / std[c] after the 1/255 scale
// for uint8 sources); mean/std may be null.
void* jvt_batcher_create_v2(const void* data, int is_u8,
                            const int32_t* labels,
                            int64_t n, int64_t c, int64_t h, int64_t w,
                            int64_t out_h, int64_t out_w,
                            uint64_t seed, int hflip, int crop_pad,
                            const float* mean, const float* std_) {
  return make_batcher(data, labels, n, c, h, w, out_h, out_w, is_u8, seed,
                      hflip, crop_pad, mean, std_);
}

void jvt_batcher_destroy(void* p) { delete static_cast<Batcher*>(p); }

void jvt_batcher_start_epoch(void* p, uint64_t epoch, int shuffle) {
  auto* B = static_cast<Batcher*>(p);
  B->epoch = epoch;
  for (int64_t i = 0; i < B->n; ++i) B->order[i] = i;
  if (shuffle) {
    std::mt19937_64 rng(mix(B->seed, epoch));
    std::shuffle(B->order.begin(), B->order.end(), rng);
  }
}

// Fill x_out (bs, c, out_h, out_w) and y_out (bs); returns actual batch
// size (possibly < batch_size at the tail), or -1 on out-of-range index.
int64_t jvt_batcher_get_batch(void* p, int64_t batch_index,
                              int64_t batch_size, float* x_out,
                              int32_t* y_out) {
  auto* B = static_cast<Batcher*>(p);
  const int64_t start = batch_index * batch_size;
  if (start >= B->n || batch_index < 0) return -1;
  const int64_t bs = std::min(batch_size, B->n - start);

  const unsigned hw_threads = std::thread::hardware_concurrency();
  const int64_t n_threads =
      std::max<int64_t>(1, std::min<int64_t>(hw_threads ? hw_threads : 1,
                                             bs / 16 ? bs / 16 : 1));

  auto work = [&](int64_t t) {
    for (int64_t i = t; i < bs; i += n_threads) {
      const int64_t src = B->order[start + i];
      y_out[i] = B->labels[src];
      const uint64_t key = mix(mix(B->seed, B->epoch), start + i);
      assemble_one(B, src, key, x_out + i * B->out_elems());
    }
  };

  if (n_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> ts;
    ts.reserve(n_threads);
    for (int64_t t = 0; t < n_threads; ++t) ts.emplace_back(work, t);
    for (auto& t : ts) t.join();
  }
  return bs;
}

}  // extern "C"
