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

#include <dlfcn.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <memory>
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
    // The shard lambdas capture these stack locals by reference, so the
    // waiter must not return until EVERY submitted shard has finished its
    // epilogue — waiting on completed-item count alone let the waiter
    // return (and the stack unwind) while late shards still touched
    // next/done_mu: a use-after-free when shards > items or on the final
    // notify. Hence: count finished SHARDS, not items.
    std::atomic<int64_t> next(0);
    std::mutex done_mu;
    std::condition_variable done_cv;
    int shards = static_cast<int>(workers_.size());
    int shards_done = 0;  // guarded by done_mu
    for (int s = 0; s < shards; ++s) {
      Submit([&, n] {
        int64_t i;
        while ((i = next.fetch_add(1)) < n) fn(i);
        std::lock_guard<std::mutex> lk(done_mu);
        if (++shards_done == shards) done_cv.notify_one();
      });
    }
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [&] { return shards_done == shards; });
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
std::mutex g_pool_mu;  // guards lazy init (ctypes releases the GIL, so two
// loader threads can make their first native call concurrently) AND the
// in-flight lease count below
int64_t g_inflight = 0;              // leases outstanding (guarded by g_pool_mu)
std::condition_variable g_idle_cv;   // signaled when g_inflight drops to 0

// Pins the pool for the duration of one batch call: hostplane_init waits
// for all leases to drain before deleting the pool, so a concurrent
// re-init can never pull the workers out from under a running ParallelFor
// (previously a documented-but-unenforced contract).
class PoolLease {
 public:
  PoolLease() {
    std::lock_guard<std::mutex> lk(g_pool_mu);
    if (!g_pool) g_pool = new Pool(g_threads);
    pool_ = g_pool;
    ++g_inflight;
  }
  ~PoolLease() {
    std::lock_guard<std::mutex> lk(g_pool_mu);
    if (--g_inflight == 0) g_idle_cv.notify_all();
  }
  Pool* operator->() { return pool_; }

 private:
  Pool* pool_;
};

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

// Circular-roll tmp into dst (shared tail of every assembly path, so the
// PCM and mp3 paths cannot drift apart).
void RollInto(float* dst, const std::vector<float>& tmp, int64_t dst_len,
              int64_t roll) {
  if (roll == 0) {
    std::memcpy(dst, tmp.data(), dst_len * sizeof(float));
  } else {
    int64_t r = ((roll % dst_len) + dst_len) % dst_len;
    std::memcpy(dst + r, tmp.data(), (dst_len - r) * sizeof(float));
    std::memcpy(dst, tmp.data() + (dst_len - r), r * sizeof(float));
  }
}

// Per-item augmentation draws, shared by the PCM and mp3 batch paths —
// draw ORDER is part of the (seed, index) determinism contract.
void DrawAugment(Rng& rng, int gain_db, int64_t roll_range, int random_crop,
                 int64_t src_len, int64_t clip_samples, float* gain,
                 int64_t* roll, int64_t* off) {
  *gain = 1.0f;
  if (gain_db > 0) {
    int64_t g = rng.UniformInt(0, 2 * gain_db - 1) - gain_db;
    *gain = std::pow(10.0f, static_cast<float>(g) / 20.0f);
  }
  *roll = roll_range > 0 ? rng.UniformInt(-roll_range, roll_range) : 0;
  *off = 0;
  if (random_crop && src_len > clip_samples) {
    *off = rng.UniformInt(0, src_len - clip_samples);
  }
}

// Crop/pad + gain from a float source, then circular roll.
void AssembleFromFloat(const float* src, int64_t src_len, float* dst,
                       int64_t dst_len, float gain, int64_t roll,
                       int64_t crop_offset) {
  std::vector<float> tmp(dst_len);
  int64_t n = std::min(src_len - crop_offset, dst_len);
  if (n < 0) n = 0;
  for (int64_t i = 0; i < n; ++i) tmp[i] = src[crop_offset + i] * gain;
  for (int64_t i = n; i < dst_len; ++i) tmp[i] = 0.0f;
  RollInto(dst, tmp, dst_len, roll);
}

void DecodeOne(const int16_t* src, int64_t src_len, float* dst, int64_t dst_len,
               float gain, int64_t roll, int64_t crop_offset) {
  // Head/offset crop + pad, int16 -> f32, gain, then circular roll, fused.
  const float scale = gain / 32768.0f;
  std::vector<float> tmp(dst_len);
  int64_t n = std::min(src_len - crop_offset, dst_len);
  if (n < 0) n = 0;
  for (int64_t i = 0; i < n; ++i) tmp[i] = src[crop_offset + i] * scale;
  for (int64_t i = n; i < dst_len; ++i) tmp[i] = 0.0f;
  RollInto(dst, tmp, dst_len, roll);
}

// ---------------------------------------------------------------------------
// mp3 decode via the system libmpg123 (the TPU-host equivalent of the
// reference's PyAV/ffmpeg decode workers, reference audioset/dataset.py:55-70:
// decode_mp3 -> float32 waveform at the file's native rate). libmpg123 is
// dlopen'd lazily so libhostplane.so itself builds and loads on machines
// without it; hostplane_mp3_available() reports the outcome.
//
// Only the stable public libmpg123-0 C ABI is used (prototypes declared
// here; the image ships the runtime library but no headers).
// ---------------------------------------------------------------------------
using mpg123_handle = void;

struct Mpg123Api {
  void* dso = nullptr;
  int (*init)() = nullptr;
  mpg123_handle* (*new_)(const char*, int*) = nullptr;
  void (*delete_)(mpg123_handle*) = nullptr;
  int (*param)(mpg123_handle*, int, long, double) = nullptr;
  int (*open_feed)(mpg123_handle*) = nullptr;
  int (*close)(mpg123_handle*) = nullptr;
  int (*decode)(mpg123_handle*, const unsigned char*, size_t, unsigned char*,
                size_t, size_t*) = nullptr;
  int (*getformat)(mpg123_handle*, long*, int*, int*) = nullptr;
  bool ok = false;
};

// Public ABI constants from <mpg123.h> (stable since 1.x).
enum {
  kMpg123Ok = 0,
  kMpg123NeedMore = -10,
  kMpg123NewFormat = -11,
  kMpg123Done = -12,
  kParamAddFlags = 2,              // MPG123_ADD_FLAGS
  kFlagQuiet = 0x20,               // MPG123_QUIET
  kFlagForceFloat = 0x400,         // MPG123_FORCE_FLOAT
  kEncSigned16 = 0xD0,             // MPG123_ENC_SIGNED_16
  kEncFloat32 = 0x200,             // MPG123_ENC_FLOAT_32
};

const Mpg123Api& mpg123() {
  static Mpg123Api api = [] {
    Mpg123Api a;
    for (const char* name :
         {"libmpg123.so.0", "libmpg123.so", "libmpg123-fad61782.so.0.47.0"}) {
      a.dso = dlopen(name, RTLD_LAZY | RTLD_LOCAL);
      if (a.dso) break;
    }
    if (!a.dso) return a;
    auto sym = [&](const char* s) { return dlsym(a.dso, s); };
    a.init = reinterpret_cast<decltype(a.init)>(sym("mpg123_init"));
    a.new_ = reinterpret_cast<decltype(a.new_)>(sym("mpg123_new"));
    a.delete_ = reinterpret_cast<decltype(a.delete_)>(sym("mpg123_delete"));
    a.param = reinterpret_cast<decltype(a.param)>(sym("mpg123_param"));
    a.open_feed =
        reinterpret_cast<decltype(a.open_feed)>(sym("mpg123_open_feed"));
    a.close = reinterpret_cast<decltype(a.close)>(sym("mpg123_close"));
    a.decode = reinterpret_cast<decltype(a.decode)>(sym("mpg123_decode"));
    a.getformat =
        reinterpret_cast<decltype(a.getformat)>(sym("mpg123_getformat"));
    a.ok = a.init && a.new_ && a.delete_ && a.open_feed && a.close &&
           a.decode && a.getformat;
    if (a.ok && a.init() != kMpg123Ok) a.ok = false;
    return a;
  }();
  return api;
}

// Decode one in-memory mp3 into mono float32 at the native rate.
// Returns the total decoded sample count (which may exceed out_cap; the
// first out_cap samples are written), or a negative error code.
int64_t DecodeMp3One(const uint8_t* data, int64_t size, float* out,
                     int64_t out_cap, int32_t* rate_out) {
  const Mpg123Api& m = mpg123();
  if (!m.ok) return -2;
  int err = 0;
  mpg123_handle* h = m.new_(nullptr, &err);
  if (!h) return -1;
  if (m.param) {
    m.param(h, kParamAddFlags, kFlagQuiet | kFlagForceFloat, 0.0);
  }
  if (m.open_feed(h) != kMpg123Ok) {
    m.delete_(h);
    return -1;
  }
  long rate = 0;
  int channels = 0, encoding = 0;
  std::vector<unsigned char> chunk(1 << 16);
  // Carry one stereo frame's worth so channel pairs never split chunks.
  std::vector<unsigned char> pending;
  int64_t total = 0;  // mono samples produced
  const unsigned char* in = data;
  size_t in_left = static_cast<size_t>(size);
  bool done = false;
  auto emit = [&](const unsigned char* buf, size_t bytes) {
    // Convert bytes -> mono float32 samples, append into out up to cap.
    if (encoding == kEncFloat32) {
      const float* f = reinterpret_cast<const float*>(buf);
      size_t n = bytes / sizeof(float) / channels;
      for (size_t i = 0; i < n; ++i) {
        if (total < out_cap) {
          float v = f[i * channels];
          for (int c = 1; c < channels; ++c) v += f[i * channels + c];
          out[total] = v / channels;
        }
        ++total;
      }
    } else if (encoding == kEncSigned16) {
      const int16_t* p = reinterpret_cast<const int16_t*>(buf);
      size_t n = bytes / sizeof(int16_t) / channels;
      for (size_t i = 0; i < n; ++i) {
        if (total < out_cap) {
          float v = p[i * channels];
          for (int c = 1; c < channels; ++c) v += p[i * channels + c];
          out[total] = v / (32768.0f * channels);
        }
        ++total;
      }
    }
  };
  while (!done) {
    size_t got = 0;
    int rc = m.decode(h, in, in_left, chunk.data(), chunk.size(), &got);
    in = nullptr;  // feed the input exactly once
    in_left = 0;
    if (got > 0) {
      if (channels <= 0) {  // format not yet announced; should not happen
        m.delete_(h);
        return -1;
      }
      size_t frame = static_cast<size_t>(channels) *
                     (encoding == kEncFloat32 ? 4 : 2);
      pending.insert(pending.end(), chunk.data(), chunk.data() + got);
      size_t usable = (pending.size() / frame) * frame;
      emit(pending.data(), usable);
      pending.erase(pending.begin(), pending.begin() + usable);
    }
    switch (rc) {
      case kMpg123NewFormat: {
        long new_rate = 0;
        int new_ch = 0, new_enc = 0;
        if (m.getformat(h, &new_rate, &new_ch, &new_enc) != kMpg123Ok ||
            (new_enc != kEncFloat32 && new_enc != kEncSigned16)) {
          m.delete_(h);
          return -1;
        }
        if ((total > 0 || !pending.empty()) &&
            (new_rate != rate || new_ch != channels || new_enc != encoding)) {
          // Mid-stream format change (concatenated stereo->mono / rate
          // switch): continuing would re-frame stale pending bytes with
          // the new frame size and count old-rate samples at the new
          // rate — silent garbling. Fail loudly instead (round-5 review
          // finding); callers surface it as a decode error.
          m.delete_(h);
          return -4;
        }
        rate = new_rate;
        channels = new_ch;
        encoding = new_enc;
        break;
      }
      case kMpg123Ok:
        break;
      case kMpg123NeedMore:  // whole buffer fed -> end of stream
      case kMpg123Done:
        done = true;
        break;
      default:  // decode error
        m.delete_(h);
        // Partial decode (truncated/corrupt tail — the reference's PyAV
        // path is equally tolerant): the rate IS known once any frame was
        // emitted, and callers read *rate_out whenever the return is
        // positive, so it must be set here too.
        if (total > 0 && rate > 0) {
          if (rate_out) *rate_out = static_cast<int32_t>(rate);
          return total;
        }
        return -1;
    }
  }
  m.close(h);
  m.delete_(h);
  if (rate_out) *rate_out = static_cast<int32_t>(rate);
  if (total == 0) return -3;  // no audio frames found
  return total;
}

}  // namespace

extern "C" {

// Configure the worker pool (call before first batch; 0 = inline).
void hostplane_init(int n_threads) {
  // Drains in-flight batch calls (PoolLease) before swapping the pool, so
  // re-init during a running ParallelFor is safe (it briefly blocks).
  std::unique_lock<std::mutex> lk(g_pool_mu);
  g_idle_cv.wait(lk, [] { return g_inflight == 0; });
  delete g_pool;
  g_pool = nullptr;
  g_threads = n_threads;
}

int hostplane_version() { return 2; }  // v2: per-item-index RNG seeding ABI

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
//  item_index  : [B] DATASET index of each item; slot b draws from
//                fold(seed, item_index[b]). Seeding by dataset index (not
//                batch position) keeps every item's augmentation stream
//                independent across the epoch — position seeding would
//                repeat the same B draw-triples for every batch.
//  seed        : epoch RNG seed
void hostplane_assemble_batch(const int16_t** srcs, const int64_t* src_lens,
                              float* out, int64_t batch, int64_t clip_samples,
                              int gain_db, int64_t roll_range, int random_crop,
                              const int64_t* item_index, uint64_t seed) {
  PoolLease lease;
  lease->ParallelFor(batch, [&](int64_t b) {
    Rng rng(seed * 0x100000001B3ull + static_cast<uint64_t>(item_index[b]));
    float gain;
    int64_t roll, off;
    DrawAugment(rng, gain_db, roll_range, random_crop, src_lens[b],
                clip_samples, &gain, &roll, &off);
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
  PoolLease lease;
  lease->ParallelFor(batch, [&](int64_t b) {
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
  PoolLease lease;
  lease->ParallelFor(batch, [&](int64_t b) {
    const uint8_t* src = packed + b * packed_width;
    float* dst = out + b * classes;
    // classes may exceed 8*packed_width (container packed for fewer
    // classes): zero-fill past the row like np.unpackbits(count=...) —
    // never read beyond the packed row.
    const int64_t in_row = std::min<int64_t>(classes, packed_width * 8);
    for (int64_t c = 0; c < in_row; ++c) {
      dst[c] = (src[c >> 3] >> (7 - (c & 7))) & 1 ? 1.0f : 0.0f;
    }
    for (int64_t c = in_row; c < classes; ++c) dst[c] = 0.0f;
  });
}

// 1 when the system libmpg123 was found and bound, else 0.
int hostplane_mp3_available() { return mpg123().ok ? 1 : 0; }

// Decode one in-memory mp3 (column bytes from an AudioSet-style HDF5) into
// mono float32 at the file's native rate (reference decode_mp3,
// audioset/dataset.py:55-70). Writes min(n, out_cap) samples into out and
// returns the full decoded length n (call again with a larger buffer if
// n > out_cap), *rate_out = native sample rate. Negative return = error:
// -1 bitstream/decoder error, -2 libmpg123 missing, -3 no audio frames.
int64_t hostplane_decode_mp3(const uint8_t* data, int64_t size, float* out,
                             int64_t out_cap, int32_t* rate_out) {
  return DecodeMp3One(data, size, out, out_cap, rate_out);
}

// Fused mp3 batch assembly: per item decode + pad-or-crop + gain + roll in
// one C++ pass (mp3-column twin of hostplane_assemble_batch; same RNG
// streams, so (seed, item_index) determinism carries over). rates[b] gets
// the native rate, lens[b] the full decoded length (negative = decode
// error; the row is zero-filled so one bad clip doesn't kill the batch).
void hostplane_assemble_mp3_batch(const uint8_t** datas, const int64_t* sizes,
                                  float* out, int64_t batch,
                                  int64_t clip_samples, int gain_db,
                                  int64_t roll_range, int random_crop,
                                  const int64_t* item_index, uint64_t seed,
                                  int32_t* rates, int64_t* lens) {
  PoolLease lease;
  lease->ParallelFor(batch, [&](int64_t b) {
    float* dst = out + b * clip_samples;
    // Decode the whole clip first (random_crop needs the true length) into
    // a grow-only per-worker scratch buffer. A plain std::vector sized by
    // the 64x capacity heuristic VALUE-INITIALIZES ~40 MB per 10 s clip —
    // measured 4x slower than the decode itself; the scratch is allocated
    // uninitialized and reused across clips on the same worker thread.
    thread_local std::unique_ptr<float[]> wav;
    thread_local int64_t wav_cap = 0;
    int64_t need = std::max<int64_t>(sizes[b] * 64 + 65536, clip_samples);
    if (need > wav_cap) {
      wav.reset(new float[need]);
      wav_cap = need;
    }
    int64_t n = DecodeMp3One(datas[b], sizes[b], wav.get(), wav_cap, &rates[b]);
    lens[b] = n;
    if (n <= 0) {
      std::memset(dst, 0, clip_samples * sizeof(float));
      return;
    }
    if (n > wav_cap) {  // capacity heuristic missed (free-format stream)
      wav.reset(new float[n]);
      wav_cap = n;
      n = DecodeMp3One(datas[b], sizes[b], wav.get(), wav_cap, &rates[b]);
      lens[b] = n;
    }
    Rng rng(seed * 0x100000001B3ull + static_cast<uint64_t>(item_index[b]));
    float gain;
    int64_t roll, off;
    DrawAugment(rng, gain_db, roll_range, random_crop, n, clip_samples,
                &gain, &roll, &off);
    AssembleFromFloat(wav.get(), n, dst, clip_samples, gain, roll, off);
  });
}

}  // extern "C"
