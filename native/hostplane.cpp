// hostplane — native host-side data plane for passt_tpu.
//
// The reference's data plane leans on external native code (PyAV/ffmpeg
// decode workers, torch collation; reference audioset/dataset.py:55-70 and
// ex_audioset.py:42-48 with num_workers=16). This library is the TPU-host
// equivalent: the per-item waveform work — int16 PCM conversion,
// pad/head-truncate/random-crop, gain scaling, circular roll, wave-mixup
// blending and batch collation — runs in one C++ pass per batch with a
// worker-thread pool, so the Python loader only orchestrates HDF5 reads.
//
// ABI: plain C functions over raw buffers (loaded via ctypes; no pybind11
// in this image). All waveform buffers are float32 or int16 little-endian.
//
// Build: make -C native  (produces libhostplane.so)

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// A tiny reusable thread pool (N workers; N=0 -> run inline).
// ---------------------------------------------------------------------------
class Pool {
 public:
  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> fn) {
    if (workers_.empty()) {
      fn();
      return;
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

  // Run fn(i) for i in [0, n) across the pool and wait for completion.
  void ParallelFor(int64_t n, const std::function<void(int64_t)>& fn) {
    if (workers_.empty() || n == 1) {
      for (int64_t i = 0; i < n; ++i) fn(i);
      return;
    }
    std::atomic<int64_t> next(0), done(0);
    std::mutex done_mu;
    std::condition_variable done_cv;
    int shards = static_cast<int>(workers_.size());
    for (int s = 0; s < shards; ++s) {
      Submit([&, n] {
        int64_t i;
        while ((i = next.fetch_add(1)) < n) {
          fn(i);
          ++done;
        }
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      });
    }
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [&] { return done.load() >= n; });
  }

 private:
  void Run() {
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

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

Pool* g_pool = nullptr;
int g_threads = 0;

Pool& pool() {
  if (!g_pool) g_pool = new Pool(g_threads);
  return *g_pool;
}

// xorshift128+ per-item RNG seeded deterministically (seed, item index).
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed * 0x9E3779B97F4A7C15ull + 1;
    s1 = (seed ^ 0xDEADBEEFCAFEBABEull) * 0xBF58476D1CE4E5B9ull + 1;
    Next();
    Next();
  }
  uint64_t Next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // uniform in [0, 1)
  double Uniform() { return (Next() >> 11) * (1.0 / 9007199254740992.0); }
  int64_t UniformInt(int64_t lo, int64_t hi) {  // [lo, hi]
    return lo + static_cast<int64_t>(Uniform() * (hi - lo + 1));
  }
};

void DecodeOne(const int16_t* src, int64_t src_len, float* dst, int64_t dst_len,
               float gain, int64_t roll, int64_t crop_offset) {
  // Head/offset crop + pad, int16 -> f32, gain, then circular roll, fused.
  const float scale = gain / 32768.0f;
  std::vector<float> tmp(dst_len);
  int64_t n = std::min(src_len - crop_offset, dst_len);
  if (n < 0) n = 0;
  for (int64_t i = 0; i < n; ++i) tmp[i] = src[crop_offset + i] * scale;
  for (int64_t i = n; i < dst_len; ++i) tmp[i] = 0.0f;
  if (roll == 0) {
    std::memcpy(dst, tmp.data(), dst_len * sizeof(float));
  } else {
    int64_t r = ((roll % dst_len) + dst_len) % dst_len;
    std::memcpy(dst + r, tmp.data(), (dst_len - r) * sizeof(float));
    std::memcpy(dst, tmp.data() + (dst_len - r), r * sizeof(float));
  }
}

}  // namespace

extern "C" {

// Configure the worker pool (call before first batch; 0 = inline).
void hostplane_init(int n_threads) {
  delete g_pool;
  g_pool = nullptr;
  g_threads = n_threads;
}

int hostplane_version() { return 1; }

// Assemble a batch of fixed-length waveforms from int16 PCM items.
//
//  srcs        : array of B pointers to int16 PCM
//  src_lens    : [B] lengths (samples)
//  out         : [B, clip_samples] float32 (caller-allocated)
//  clip_samples: target length per clip
//  gain_db     : if > 0, per-item random gain in [-gain_db, gain_db) dB
//                (reference pydub_augment, audioset/dataset.py:108-111)
//  roll_range  : if > 0, per-item random circular roll in [-range, range]
//                (reference get_roll_func, audioset/dataset.py:315-329)
//  random_crop : 1 -> random offset when src longer than clip (FSD50K
//                fsd50k/dataset.py:70-79), 0 -> head truncate
//  seed        : RNG seed; item i uses fold(seed, i) (reproducible)
void hostplane_assemble_batch(const int16_t** srcs, const int64_t* src_lens,
                              float* out, int64_t batch, int64_t clip_samples,
                              int gain_db, int64_t roll_range, int random_crop,
                              uint64_t seed) {
  pool().ParallelFor(batch, [&](int64_t b) {
    Rng rng(seed * 0x100000001B3ull + static_cast<uint64_t>(b));
    float gain = 1.0f;
    if (gain_db > 0) {
      int64_t g = rng.UniformInt(0, 2 * gain_db - 1) - gain_db;
      gain = std::pow(10.0f, static_cast<float>(g) / 20.0f);
    }
    int64_t roll = roll_range > 0 ? rng.UniformInt(-roll_range, roll_range) : 0;
    int64_t off = 0;
    if (random_crop && src_lens[b] > clip_samples) {
      off = rng.UniformInt(0, src_lens[b] - clip_samples);
    }
    DecodeOne(srcs[b], src_lens[b], out + b * clip_samples, clip_samples, gain,
              roll, off);
  });
}

// Wave-mixup a prepared batch in place against a second batch:
//   out[b] = centered(out[b]) * lam[b] + centered(other[b]) * (1 - lam[b]),
//   then re-centered (reference MixupDataset, audioset/dataset.py:125-137).
// apply[b] in {0,1}; lam[b] precomputed by the caller (Beta(2,2) max-trick).
void hostplane_wavmix(float* out, const float* other, const float* lam,
                      const uint8_t* apply, int64_t batch, int64_t t) {
  pool().ParallelFor(batch, [&](int64_t b) {
    if (!apply[b]) return;
    float* x = out + b * t;
    const float* y = other + b * t;
    double mx = 0, my = 0;
    for (int64_t i = 0; i < t; ++i) mx += x[i];
    for (int64_t i = 0; i < t; ++i) my += y[i];
    float cx = static_cast<float>(mx / t), cy = static_cast<float>(my / t);
    float l = lam[b];
    double m = 0;
    for (int64_t i = 0; i < t; ++i) {
      x[i] = (x[i] - cx) * l + (y[i] - cy) * (1.0f - l);
      m += x[i];
    }
    float c = static_cast<float>(m / t);
    for (int64_t i = 0; i < t; ++i) x[i] -= c;
  });
}

// Unpack packbits multilabel targets: in [B, ceil(C/8)] uint8 -> out [B, C]
// float32 (reference np.unpackbits, audioset/dataset.py:197-199).
void hostplane_unpack_targets(const uint8_t* packed, float* out, int64_t batch,
                              int64_t packed_width, int64_t classes) {
  pool().ParallelFor(batch, [&](int64_t b) {
    const uint8_t* src = packed + b * packed_width;
    float* dst = out + b * classes;
    for (int64_t c = 0; c < classes; ++c) {
      dst[c] = (src[c >> 3] >> (7 - (c & 7))) & 1 ? 1.0f : 0.0f;
    }
  });
}

}  // extern "C"
