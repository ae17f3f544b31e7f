// jvt native batcher: shuffled, augmented host-side batch assembly.
//
// The reference's data layer is torchvision/DataLoader (Python workers,
// per-sample transforms).  This is the TPU-framework equivalent of that
// runtime component in C++: the whole dataset lives in one pinned float
// buffer; each batch is assembled by a fused shuffle-gather + augmentation
// (horizontal flip, random crop with zero padding) pass, multithreaded
// across samples, writing straight into the caller-provided output buffer
// that feeds jax.device_put.
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
  const float* data;       // (n, c, h, w), not owned
  const int32_t* labels;   // (n,), not owned
  int64_t n, c, h, w;
  uint64_t seed;
  int hflip;               // 0/1: random horizontal flip
  int crop_pad;            // 0: off; k: random crop from k-padded canvas
  std::vector<int64_t> order;
  uint64_t epoch = 0;

  int64_t image_elems() const { return c * h * w; }
};

inline uint64_t mix(uint64_t a, uint64_t b) {
  // splitmix64-style combine for per-(epoch, sample) streams
  uint64_t z = a + 0x9e3779b97f4a7c15ULL * (b + 1);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

void assemble_one(const Batcher* B, int64_t src, uint64_t rng_key,
                  float* out) {
  const int64_t c = B->c, h = B->h, w = B->w;
  const float* img = B->data + src * B->image_elems();

  bool flip = false;
  int64_t oh = 0, ow = 0;
  if (B->hflip || B->crop_pad) {
    uint64_t r = rng_key;
    if (B->hflip) {
      flip = (r & 1ULL) != 0;
      r >>= 1;
    }
    if (B->crop_pad) {
      const int64_t span = 2 * B->crop_pad + 1;
      oh = static_cast<int64_t>(r % span) - B->crop_pad;
      r /= span;
      ow = static_cast<int64_t>(r % span) - B->crop_pad;
    }
  }

  if (!flip && oh == 0 && ow == 0) {
    std::memcpy(out, img, sizeof(float) * B->image_elems());
    return;
  }

  for (int64_t ch = 0; ch < c; ++ch) {
    const float* src_ch = img + ch * h * w;
    float* dst_ch = out + ch * h * w;
    for (int64_t y = 0; y < h; ++y) {
      const int64_t sy = y + oh;
      float* dst_row = dst_ch + y * w;
      if (sy < 0 || sy >= h) {
        std::memset(dst_row, 0, sizeof(float) * w);
        continue;
      }
      const float* src_row = src_ch + sy * w;
      for (int64_t x = 0; x < w; ++x) {
        const int64_t sx0 = x + ow;
        const int64_t sx = flip ? (w - 1 - sx0) : sx0;
        dst_row[x] = (sx < 0 || sx >= w) ? 0.0f : src_row[sx];
      }
    }
  }
}

}  // namespace

extern "C" {

void* jvt_batcher_create(const float* data, const int32_t* labels,
                         int64_t n, int64_t c, int64_t h, int64_t w,
                         uint64_t seed, int hflip, int crop_pad) {
  auto* B = new Batcher{data, labels, n, c, h, w, seed,
                        hflip, crop_pad, {}, 0};
  B->order.resize(n);
  for (int64_t i = 0; i < n; ++i) B->order[i] = i;
  return B;
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

// Fill x_out (bs, c, h, w) and y_out (bs); returns actual batch size
// (possibly < batch_size at the tail), or -1 on out-of-range index.
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
      assemble_one(B, src, key, x_out + i * B->image_elems());
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
