// Native training-batch feeder: the complete host-side hot loop in C++.
//
// The reference keeps this path in Python across 4 feeder *processes* per
// rank (/root/reference/tensorflow/tf_train_tdnn.py:151-164 spawning
// tf_data.DataGenerator:22-125, which itself shells out to Kaldi's
// apply-cmvn-sliding binary per scp shard).  Here the whole per-utterance
// pipeline -- ark seek + FM/CM decode, sliding cepstral mean normalization,
// random crop / random-shift zero-pad, batch assembly, optional bf16 wire
// quantization -- runs in a C++ thread pool behind one ctypes call with the
// GIL released.  Python only parses the scp/utt2id once at startup and then
// receives finished (A*B, T, F) buffers.
//
// Semantics mirrored from the Python pipeline (the reference implementation
// for tests, voxsrc2020_speaker_verification_tpu/data/dataset.py):
//   * 10%-random-skip reshuffle per pass over the shard (ref tf_data.py:69)
//   * sliding CMN: 300-frame centered window, mean only, float64 cumsum
//     (== Kaldi apply-cmvn-sliding --norm-vars=false --center=true,
//     ref tf_train_tdnn.py:83; == dataset.py:sliding_cmn_np)
//   * crop/pad policy of ref tf_data.py:84-101: uniform shift in
//     [0, |T-L|] inclusive, zero fill when short
//   * bf16 via round-to-nearest-even, matching ml_dtypes' float32->bfloat16
//     cast used by the Python wire path (dataset.py BatchFeeder.wire_bf16)
//
// C ABI: vox_feeder_create / vox_feeder_next / vox_feeder_stop /
// vox_feeder_destroy.  vox_feeder_next blocks until a full optimizer-step
// batch is available and writes into caller-owned buffers.

#include <cstdint>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include "feeder_core.h"

// Public decoder from vox_io.cc (linked into the same libvox_io.so).
extern "C" int vox_read_mat(const char* path, int64_t offset, float** out,
                            int32_t* rows, int32_t* cols);
extern "C" void vox_free(void* p);

namespace {

inline uint16_t f32_to_bf16(float x) {
  uint32_t u;
  std::memcpy(&u, &x, 4);
  if ((u & 0x7fffffffu) > 0x7f800000u) return (uint16_t)((u >> 16) | 0x0040);
  u += 0x7fffu + ((u >> 16) & 1u);  // round to nearest even
  return (uint16_t)(u >> 16);
}

// Sliding-window mean normalization over (t, f), window centered, mean only;
// float64 accumulation like the numpy reference (dataset.py:sliding_cmn_np).
void sliding_cmn(float* feat, int32_t t, int32_t f, int window) {
  std::vector<double> csum((size_t)(t + 1) * f, 0.0);
  for (int32_t i = 0; i < t; ++i) {
    const double* prev = &csum[(size_t)i * f];
    double* cur = &csum[(size_t)(i + 1) * f];
    const float* row = feat + (size_t)i * f;
    for (int32_t j = 0; j < f; ++j) cur[j] = prev[j] + row[j];
  }
  const int32_t max_start = t - window > 0 ? t - window : 0;
  for (int32_t i = 0; i < t; ++i) {
    int32_t start = i - window / 2;
    if (start < 0) start = 0;
    if (start > max_start) start = max_start;
    int32_t end = start + window < t ? start + window : t;
    const double inv = 1.0 / (end - start);
    const double* cs = &csum[(size_t)start * f];
    const double* ce = &csum[(size_t)end * f];
    float* row = feat + (size_t)i * f;
    for (int32_t j = 0; j < f; ++j)
      row[j] = (float)(row[j] - (ce[j] - cs[j]) * inv);
  }
}

struct Sample {
  std::vector<float> feat;  // feat_length * feat_dim
  int32_t label;
};

struct Entry {
  std::string path;
  int64_t offset;
  int32_t label;
};

struct Feeder {
  // config
  int32_t feat_dim, feat_length, batch, accum;
  int32_t cmn_window, skip_percent;
  bool wire_bf16, apply_cmn;
  uint64_t seed;
  // optional global CMVN (ref tf_train_tdnn.py:91 cmvn_pkl -> tf_data.py:
  // 80-81): applied per frame AFTER sliding CMN, (x - mean) / std
  std::vector<float> cmvn_mean, cmvn_std;

  std::vector<Entry> entries;
  FeederCore<Sample> core;  // queue/workers/dead-shard protocol

  // decode one scp entry -> (feat_length, feat_dim) crop (the per-entry
  // body; shard split / skip / pass accounting live in feeder_core.h)
  bool produce(size_t i, std::mt19937_64& rng, Sample* s) const {
    const Entry& e = entries[i];
    float* raw = nullptr;
    int32_t t = 0, f = 0;
    if (vox_read_mat(e.path.c_str(), e.offset, &raw, &t, &f) != 0 ||
        f != feat_dim || t <= 0) {
      if (raw) vox_free(raw);
      return false;
    }
    if (apply_cmn) sliding_cmn(raw, t, f, cmn_window);
    if (!cmvn_mean.empty()) {
      for (int32_t r = 0; r < t; ++r) {
        float* row = raw + (size_t)r * f;
        for (int32_t j = 0; j < f; ++j)
          row[j] = (row[j] - cmvn_mean[j]) / cmvn_std[j];
      }
    }
    s->label = e.label;
    s->feat.assign((size_t)feat_length * feat_dim, 0.0f);
    const int32_t L = feat_length;
    if (t < L) {  // random-shift zero-pad (ref tf_data.py:95-101)
      const int32_t shift = (int32_t)(rng() % (uint64_t)(L - t + 1));
      std::memcpy(s->feat.data() + (size_t)shift * f, raw,
                  (size_t)t * f * 4);
    } else {  // random crop (ref tf_data.py:84-93)
      const int32_t shift = (int32_t)(rng() % (uint64_t)(t - L + 1));
      std::memcpy(s->feat.data(), raw + (size_t)shift * f,
                  (size_t)L * f * 4);
    }
    vox_free(raw);
    return true;
  }

  void worker(size_t widx, size_t nworkers) {
    core.worker_loop(
        widx, nworkers, entries.size(), seed, skip_percent,
        [this](size_t i, std::mt19937_64& rng, Sample* s) {
          return produce(i, rng, s);
        });
  }
};

}  // namespace

extern "C" {

// paths/offsets/labels are parallel arrays of n scp entries (Python parses
// the scp + utt2id once).  num_threads worker threads each own a contiguous
// shard.  cmvn_mean/cmvn_std (nullable, feat_dim each) apply global CMVN
// after sliding CMN (ref tf_train_tdnn.py:91 cmvn_pkl, tf_data.py:80-81).
// Returns an opaque handle (never null on valid args).
void* vox_feeder_create(const char* const* paths, const int64_t* offsets,
                        const int32_t* labels, int64_t n, int32_t feat_dim,
                        int32_t feat_length, int32_t batch, int32_t accum,
                        int32_t num_threads, uint64_t seed,
                        int32_t cmn_window, int32_t skip_percent,
                        int32_t wire_bf16, const float* cmvn_mean,
                        const float* cmvn_std) {
  if (n <= 0 || feat_dim <= 0 || feat_length <= 0 || batch <= 0 || accum <= 0)
    return nullptr;
  Feeder* fd = new Feeder();
  if (cmvn_mean && cmvn_std) {
    fd->cmvn_mean.assign(cmvn_mean, cmvn_mean + feat_dim);
    fd->cmvn_std.assign(cmvn_std, cmvn_std + feat_dim);
  }
  fd->feat_dim = feat_dim;
  fd->feat_length = feat_length;
  fd->batch = batch;
  fd->accum = accum;
  fd->cmn_window = cmn_window > 0 ? cmn_window : 300;
  fd->apply_cmn = cmn_window > 0;
  fd->skip_percent = skip_percent;
  fd->wire_bf16 = wire_bf16 != 0;
  fd->seed = seed;
  fd->entries.reserve((size_t)n);
  for (int64_t i = 0; i < n; ++i)
    fd->entries.push_back(Entry{paths[i], offsets[i], labels[i]});
  // two optimizer-step batches of headroom, like the Python feeder's
  // depth-2 queues (ref tf_train_tdnn.py:153)
  fd->core.cap = (size_t)batch * accum * 2;
  if (num_threads < 1) num_threads = 1;
  if ((size_t)num_threads > fd->entries.size())
    num_threads = (int32_t)fd->entries.size();
  fd->core.n_workers = num_threads;
  for (int32_t w = 0; w < num_threads; ++w)
    fd->core.workers.emplace_back(&Feeder::worker, fd, (size_t)w,
                                  (size_t)num_threads);
  return fd;
}

// Blocks until accum*batch samples are available, then writes features into
// feats_out (accum*batch*feat_length*feat_dim elements, float32 or bf16
// uint16 depending on wire_bf16) and labels into labels_out (accum*batch).
// Returns 0; -1 after vox_feeder_stop; -2 if every worker's shard failed
// to decode (check vox_feeder_errors for the count).
// Must not race vox_feeder_destroy (the Python wrapper serializes them).
int vox_feeder_next(void* handle, void* feats_out, int32_t* labels_out) {
  Feeder* fd = (Feeder*)handle;
  const size_t need = (size_t)fd->batch * fd->accum;
  const size_t sz = (size_t)fd->feat_length * fd->feat_dim;
  for (size_t k = 0; k < need; ++k) {
    Sample s;
    const int rc = fd->core.pop(&s);
    if (rc != 0) return rc;
    labels_out[k] = s.label;
    if (fd->wire_bf16) {
      uint16_t* dst = (uint16_t*)feats_out + k * sz;
      for (size_t i = 0; i < sz; ++i) dst[i] = f32_to_bf16(s.feat[i]);
    } else {
      std::memcpy((float*)feats_out + k * sz, s.feat.data(), sz * 4);
    }
  }
  return 0;
}

int64_t vox_feeder_errors(void* handle) {
  return ((Feeder*)handle)->core.decode_errors.load();
}

// Workers that died after a full pass with zero successful decodes (one
// worker == one contiguous scp shard).  A non-zero value means part of the
// dataset is silently missing from training -- callers should fail loudly
// (training/loop.py checks this every log interval).
int32_t vox_feeder_dead_workers(void* handle) {
  return ((Feeder*)handle)->core.dead_workers.load();
}

void vox_feeder_stop(void* handle) {
  ((Feeder*)handle)->core.request_stop();
}

void vox_feeder_destroy(void* handle) {
  Feeder* fd = (Feeder*)handle;
  fd->core.request_stop();
  fd->core.join_all();
  delete fd;
}

}  // extern "C"
