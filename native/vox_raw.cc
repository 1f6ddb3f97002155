// Native raw-audio batch feeder: the north-star host hot loop in C++.
//
// The framework's headline design replaces the reference's offline feature
// store (/root/reference/prepare_data.sh:161-166: terabyte-scale compressed
// FBANK arks for voxceleb2_dev_aug) with raw audio in + on-device FBANK.
// That moves the reference's offline augmentation rendering (Kaldi
// `wav-reverberate` pipes built by steps/data/{reverberate,augment}
// _data_dir.py) into the training-time host loop: wav decode, RIR
// convolution, SNR noise mixing, waveform crop.  The Python implementation
// (data/augment.py render_spec + data/raw_dataset.py) is the reference for
// these semantics but sustains only ~160 audio-s/s on two cores (measured,
// scripts/bench_feeder.py --raw) -- an order of magnitude under the
// north-star model's ~1100 audio-s/s device demand.  This file is the same
// loop in a C++ thread pool behind one ctypes call per optimizer step.
//
// Semantics mirrored (parity-tested in tests/test_native_raw.py):
//   * reverberate: FFT convolution in double, output shifted left by the
//     RIR's direct-path peak (argmax |rir|) and power-normalized to the
//     input power == `wav-reverberate --shift-output=true` defaults
//     (augment.py:59-83)
//   * add_noise: noise scaled so 10*log10(P_sig/P_noise_scaled) = snr, with
//     P_sig over the whole signal and P_noise over the added segment;
//     background noises looped to the full duration (augment.py:86-102,
//     extend_to_duration:51-56)
//   * JSON augmentation specs: {"source", "rir", "noises": [{"path",
//     "snr", "start", "extend"}]} as written by data/augment.py policies
//   * crop: int16 clip/round (nearbyint == numpy round-half-even), Kaldi
//     snip-edges frame count, t0 ~ U[0, n-L] with <=context frames of CMVN
//     context each side, random zero-pad shift for short utterances --
//     exactly data/raw_dataset.py:_crop (ref tf_data.py:84-101)
//
// C ABI: vox_render_spec (parity-test hook) and vox_raw_feeder_create /
// _next / _errors / _dead_workers / _stop / _destroy.

#include <algorithm>
#include <atomic>
#include <cfenv>
#include <cmath>
#include <complex>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <locale.h>
#include <mutex>
#include <random>
#include <memory>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "feeder_core.h"

extern "C" int vox_read_wav(const char* path, float** out, int64_t* n,
                            int32_t* sample_rate);
extern "C" void vox_free(void* p);

namespace {

// ---------------------------------------------------------------------------
// Minimal JSON parsing -- exactly the subset data/augment.py specs use.
// ---------------------------------------------------------------------------

struct NoiseSpec {
  std::string path;
  double snr = 0.0;
  int64_t start = 0;
  bool extend = false;
};

struct Spec {
  std::string source;
  std::string rir;  // empty = none
  std::vector<NoiseSpec> noises;
};

struct JsonParser {
  const char* p;
  const char* end;
  bool ok = true;

  explicit JsonParser(const char* s, size_t n) : p(s), end(s + n) {}

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool consume(char c) {
    ws();
    if (p < end && *p == c) { ++p; return true; }
    return false;
  }
  bool peek(char c) {
    ws();
    return p < end && *p == c;
  }
  bool lit(const char* s) {
    ws();
    size_t l = strlen(s);
    if ((size_t)(end - p) >= l && !memcmp(p, s, l)) { p += l; return true; }
    return false;
  }
  // \uXXXX (and surrogate pairs) -> UTF-8: json.dumps defaults to
  // ensure_ascii=True, so every non-ASCII byte in a wav path arrives as
  // escapes; decoding them to a single char would corrupt the path and
  // silently drop those utterances as decode errors.
  void append_utf8(std::string* out, uint32_t cp) {
    if (cp < 0x80) {
      *out += (char)cp;
    } else if (cp < 0x800) {
      *out += (char)(0xC0 | (cp >> 6));
      *out += (char)(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
      *out += (char)(0xE0 | (cp >> 12));
      *out += (char)(0x80 | ((cp >> 6) & 0x3F));
      *out += (char)(0x80 | (cp & 0x3F));
    } else {
      *out += (char)(0xF0 | (cp >> 18));
      *out += (char)(0x80 | ((cp >> 12) & 0x3F));
      *out += (char)(0x80 | ((cp >> 6) & 0x3F));
      *out += (char)(0x80 | (cp & 0x3F));
    }
  }

  uint32_t hex4() {  // reads 4 hex digits at p, advances
    char buf[5] = {p[0], p[1], p[2], p[3], 0};
    p += 4;
    return (uint32_t)strtol(buf, nullptr, 16);
  }

  std::string parse_string() {
    std::string out;
    if (!consume('"')) { ok = false; return out; }
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        ++p;
        switch (*p) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {
            if (end - p < 5) { ok = false; return out; }
            ++p;
            uint32_t cp = hex4();
            if (cp >= 0xD800 && cp <= 0xDBFF && end - p >= 6 &&
                p[0] == '\\' && p[1] == 'u') {
              p += 2;
              const uint32_t lo = hex4();
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            }
            append_utf8(&out, cp);
            continue;  // p already past the escape
          }
          default: out += *p;
        }
        ++p;
      } else {
        out += *p++;
      }
    }
    if (p < end) ++p; else ok = false;
    return out;
  }
  double parse_number() {
    ws();
    char* q = nullptr;
    // strtod_l with a pinned C locale: plain strtod is LC_NUMERIC-sensitive,
    // so under a comma-decimal locale "snr": 12.5 would stop at '.' and the
    // whole spec (hence utterance) would be silently dropped as a decode
    // error.  json.dumps always writes C-locale numbers.
    static const locale_t c_loc = newlocale(LC_ALL_MASK, "C", (locale_t)0);
    double v = strtod_l(p, &q, c_loc);
    if (q == p) ok = false;
    p = q;
    return v;
  }
  void skip_value() {  // tolerate unknown keys
    ws();
    if (p >= end) { ok = false; return; }
    if (*p == '"') { parse_string(); return; }
    if (*p == '{' || *p == '[') {
      char open = *p, close = (*p == '{') ? '}' : ']';
      int depth = 0;
      bool in_str = false;
      while (p < end) {
        if (in_str) {
          if (*p == '\\') ++p;
          else if (*p == '"') in_str = false;
        } else if (*p == '"') in_str = true;
        else if (*p == open) ++depth;
        else if (*p == close && --depth == 0) { ++p; return; }
        ++p;
      }
      ok = false;
      return;
    }
    if (lit("true") || lit("false") || lit("null")) return;
    parse_number();
  }
};

// "{...}" -> Spec.  Returns false on malformed input.
bool parse_spec(const char* json, size_t n, Spec* spec) {
  JsonParser j(json, n);
  if (!j.consume('{')) return false;
  if (j.consume('}')) return true;  // empty object
  do {
    std::string key = j.parse_string();
    if (!j.ok || !j.consume(':')) return false;
    if (key == "source") {
      spec->source = j.parse_string();
    } else if (key == "rir") {
      if (j.lit("null")) spec->rir.clear();
      else spec->rir = j.parse_string();
    } else if (key == "noises") {
      if (!j.consume('[')) return false;
      if (!j.consume(']')) {
        do {
          if (!j.consume('{')) return false;
          NoiseSpec nd;
          if (!j.consume('}')) {
            do {
              std::string k2 = j.parse_string();
              if (!j.ok || !j.consume(':')) return false;
              if (k2 == "path") nd.path = j.parse_string();
              else if (k2 == "snr") nd.snr = j.parse_number();
              else if (k2 == "start") nd.start = (int64_t)j.parse_number();
              else if (k2 == "extend") {
                if (j.lit("true")) nd.extend = true;
                else if (j.lit("false") || j.lit("null")) nd.extend = false;
                else nd.extend = j.parse_number() != 0.0;
              } else j.skip_value();
              if (!j.ok) return false;
            } while (j.consume(','));
            if (!j.consume('}')) return false;
          }
          spec->noises.push_back(std::move(nd));
        } while (j.consume(','));
        if (!j.consume(']')) return false;
      }
    } else {
      j.skip_value();
      if (!j.ok) return false;
    }
  } while (j.consume(','));
  return j.ok && j.consume('}') && !spec->source.empty();
}

// ---------------------------------------------------------------------------
// DSP: FFT convolution reverb + SNR noise mixing (augment.py semantics).
//
// Single-precision FFT deliberately: the wire format downstream is int16
// PCM (one quantum = 1.0 on signals of amplitude ~10^3-10^4), and a float
// radix-2 FFT's error at these lengths is ~10^-2 absolute -- two orders
// below the quantization the Python reference itself applies.  Real
// signals go through the standard half-size packing (an N-point real FFT
// as an N/2-point complex FFT + O(N) untangle), and RIR spectra are cached
// per (path, fft size): a training pass revisits the same few hundred RIRs
// at the same handful of pow-2 sizes millions of times.
// ---------------------------------------------------------------------------

using cfloat = std::complex<float>;

struct Wav {
  float* data = nullptr;
  int64_t n = 0;
  int32_t sr = 0;
  ~Wav() { if (data) vox_free(data); }
  bool read(const std::string& path) {
    return vox_read_wav(path.c_str(), &data, &n, &sr) == 0;
  }
};

// e^{sign * 2*pi*i*k / sz} for k = 0..count-1, resynced from polar() every
// 64 steps so the multiplicative recurrence cannot drift.
void make_twiddles(size_t count, size_t sz, double sign,
                   std::vector<cfloat>* out) {
  out->resize(count);
  const std::complex<double> step =
      std::polar(1.0, sign * 2.0 * M_PI / (double)sz);
  std::complex<double> w(1.0, 0.0);
  for (size_t k = 0; k < count; ++k) {
    if ((k & 63) == 0)
      w = std::polar(1.0, sign * 2.0 * M_PI * (double)k / (double)sz);
    (*out)[k] = (cfloat)w;
    w *= step;
  }
}

// Twiddle-table cache: e^{sign*2*pi*i*k/sz}, k < sz/2, keyed by fft size.
// Only a handful of pow-2 sizes ever occur (signal lengths round up to
// powers of two), and recomputing the table inside every fft() call
// roughly doubled the per-crop reverb cost.  thread_local: no locking, a
// few entries x sz/2 cfloats per worker thread.
const std::vector<cfloat>& twiddles(size_t sz, bool invert) {
  thread_local std::unordered_map<size_t, std::vector<cfloat>> cache[2];
  auto& m = cache[invert ? 1 : 0];
  auto it = m.find(sz);
  if (it == m.end()) {
    std::vector<cfloat> tw;
    make_twiddles(sz / 2, sz, invert ? 1.0 : -1.0, &tw);
    it = m.emplace(sz, std::move(tw)).first;
  }
  return it->second;
}

// Iterative radix-2 complex FFT.  Twiddles tabulated per level (resynced
// recurrence, cached per size) so error does not accumulate across a
// w *= wlen chain.
void fft(cfloat* a, size_t n, bool invert) {
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const size_t half = len / 2;
    const std::vector<cfloat>& tw = twiddles(len, invert);
    for (size_t i = 0; i < n; i += len) {
      for (size_t k = 0; k < half; ++k) {
        const cfloat u = a[i + k];
        const cfloat v = a[i + k + half] * tw[k];
        a[i + k] = u + v;
        a[i + k + half] = u - v;
      }
    }
  }
  if (invert) {
    const float inv = 1.0f / (float)n;
    for (size_t i = 0; i < n; ++i) a[i] *= inv;
  }
}

// Real forward FFT of sz (pow-2) real points -> sz/2+1 complex bins, via
// one sz/2-point complex FFT of packed even/odd samples.
void rfft(const float* x, size_t n_valid, size_t sz, std::vector<cfloat>* out) {
  const size_t half = sz / 2;  // callers guarantee sz >= 2 (pow-2)
  std::vector<cfloat> z(half, cfloat(0.f, 0.f));
  for (size_t j = 0; j < (n_valid + 1) / 2; ++j) {
    const float re = x[2 * j];
    const float im = (2 * j + 1 < n_valid) ? x[2 * j + 1] : 0.f;
    z[j] = cfloat(re, im);
  }
  fft(z.data(), half, false);
  const std::vector<cfloat>& tw = twiddles(sz, false);
  out->resize(half + 1);
  for (size_t k = 0; k < half; ++k) {
    const cfloat zk = z[k];
    const cfloat znk = std::conj(z[(half - k) % half]);
    const cfloat fe = 0.5f * (zk + znk);
    const cfloat fo = cfloat(0.f, -0.5f) * (zk - znk);
    (*out)[k] = fe + tw[k] * fo;
  }
  (*out)[half] = cfloat(z[0].real() - z[0].imag(), 0.f);
}

// Inverse of rfft: sz/2+1 bins -> sz real points, via one sz/2-point
// complex inverse FFT.
void irfft(const std::vector<cfloat>& spec, size_t sz, std::vector<float>* out) {
  const size_t half = sz / 2;
  std::vector<cfloat> z(half);
  const std::vector<cfloat>& tw = twiddles(sz, true);
  for (size_t k = 0; k < half; ++k) {
    const cfloat yk = spec[k];
    const cfloat ynk = std::conj(spec[half - k]);
    const cfloat fe = 0.5f * (yk + ynk);
    const cfloat fo = 0.5f * (yk - ynk) * tw[k];
    z[k] = fe + cfloat(0.f, 1.f) * fo;
  }
  fft(z.data(), half, true);
  out->resize(sz);
  for (size_t j = 0; j < half; ++j) {
    (*out)[2 * j] = z[j].real();
    (*out)[2 * j + 1] = z[j].imag();
  }
}

double power(const float* x, size_t n) {  // augment.py:_power
  double acc = 0.0;
  for (size_t i = 0; i < n; ++i) acc += (double)x[i] * (double)x[i];
  return acc / (double)(n > 0 ? n : 1);
}

// RIR spectrum cache: (path, fft size) -> shared spectrum + direct-path
// shift.  shared_ptr values: a reader keeps its entry alive across the
// (long) convolution even if another thread evicts meanwhile.  A second,
// tiny path->length map avoids re-reading the RIR file just to compute
// the FFT size.
//
// Honesty about scale: with the full RIRS_NOISES simulated corpus (~60k
// RIRs x several pow-2 signal sizes) a 4096-entry cache has a low hit
// rate -- uniform RIR sampling has no locality to exploit -- and a miss
// costs one extra forward FFT (~1.5 ms at 2^17, measured) on 1/5 of
// crops, i.e. the worst case adds ~0.3 ms/crop over the all-hit bench
// numbers.  The cache still wins for dev corpora, room-limited setups
// and repeated sizes; eviction is single-victim (not clear-all) so one
// insert cannot wipe every other thread's working set.
struct RirEntry {
  std::vector<cfloat> spec;
  size_t shift;
};
std::mutex g_rir_mu;
std::unordered_map<std::string, std::shared_ptr<RirEntry>> g_rir_cache;
std::unordered_map<std::string, int64_t> g_rir_len;  // path -> samples
// spectrum cache bounded (each entry ~1 MB; RIRS_NOISES is ~60k files);
// the length map is a few bytes per path and never cleared
constexpr size_t kRirCacheMax = 4096;

// Spectrum of `path` zero-padded to `sz`, plus its direct-path shift.
// `pre` is the already-decoded wav when the caller just read it (avoids a
// second read on a cache miss); nullptr otherwise.
bool rir_spectrum(const std::string& path, size_t sz, const Wav* pre,
                  std::shared_ptr<RirEntry>* out) {
  const std::string key = path + '\0' + std::to_string(sz);
  {
    std::lock_guard<std::mutex> lk(g_rir_mu);
    auto it = g_rir_cache.find(key);
    if (it != g_rir_cache.end()) { *out = it->second; return true; }
  }
  Wav local;
  const Wav* rir = pre;
  if (rir == nullptr) {
    if (!local.read(path)) return false;
    rir = &local;
  }
  auto e = std::make_shared<RirEntry>();
  e->shift = 0;  // argmax |rir|: first max, like np.argmax
  double best = -1.0;
  for (int64_t i = 0; i < rir->n; ++i) {
    const double v = std::fabs((double)rir->data[i]);
    if (v > best) { best = v; e->shift = (size_t)i; }
  }
  rfft(rir->data, (size_t)rir->n, sz, &e->spec);
  std::lock_guard<std::mutex> lk(g_rir_mu);
  g_rir_len[path] = rir->n;
  if (g_rir_cache.size() >= kRirCacheMax)
    g_rir_cache.erase(g_rir_cache.begin());  // single victim, not clear-all
  g_rir_cache.emplace(std::move(key), e);
  *out = std::move(e);
  return true;
}

// RIR convolution keeping the input length; shift-output + power
// normalization (augment.py:reverberate, == wav-reverberate defaults).
bool reverberate(std::vector<float>& sig, const std::string& rir_path) {
  const size_t n = sig.size();
  if (n == 0) return true;
  // RIR length (needed for the FFT size): length map, else one file read
  // that is reused for the spectrum below
  int64_t m64 = -1;
  {
    std::lock_guard<std::mutex> lk(g_rir_mu);
    auto it = g_rir_len.find(rir_path);
    if (it != g_rir_len.end()) m64 = it->second;
  }
  Wav pre;
  if (m64 < 0) {
    if (!pre.read(rir_path)) return false;
    m64 = pre.n;
  }
  const size_t m = (size_t)m64;
  if (m == 0) return true;
  const size_t full = n + m - 1;
  // sz >= 2: the packed real-FFT (one sz/2-point complex FFT) needs at
  // least one complex point -- a 1-sample source convolved with a 1-sample
  // RIR (full == 1) would otherwise index an empty buffer.
  size_t sz = 2;
  while (sz < full) sz <<= 1;
  std::shared_ptr<RirEntry> rir;
  if (!rir_spectrum(rir_path, sz, pre.data ? &pre : nullptr, &rir))
    return false;

  std::vector<cfloat> spec;
  rfft(sig.data(), n, sz, &spec);
  for (size_t k = 0; k < spec.size(); ++k) spec[k] *= rir->spec[k];
  std::vector<float> conv;
  irfft(spec, sz, &conv);

  const double p_in = power(sig.data(), n);
  const size_t shift = rir->shift;
  double p_out = 0.0;
  for (size_t i = 0; i < n; ++i) {
    const double v = (double)conv[shift + i];
    p_out += v * v;
  }
  p_out /= (double)n;
  const double scale = p_out > 0.0 ? std::sqrt(p_in / p_out) : 1.0;
  for (size_t i = 0; i < n; ++i)
    sig[i] = (float)((double)conv[shift + i] * scale);
  return true;
}

// Mix `noise[0:seg]` into sig[start:...] at snr dB (augment.py:add_noise).
void add_noise(std::vector<float>& sig, const float* noise, size_t noise_len,
               double snr_db, int64_t start) {
  const int64_t n = (int64_t)sig.size();
  if (start < 0 || start >= n) return;  // reject out-of-range offsets
  const size_t seg = std::min<int64_t>((int64_t)noise_len, n - start);
  if (seg == 0) return;
  const double p_sig = power(sig.data(), n);
  const double p_noise = power(noise, seg);
  if (p_noise <= 0.0) return;
  const double scale =
      std::sqrt(p_sig / (p_noise * std::pow(10.0, snr_db / 10.0)));
  for (size_t i = 0; i < seg; ++i)
    sig[start + i] += (float)(scale * (double)noise[i]);
}

// Materialize a spec -> waveform (augment.py:render_spec).  Returns false
// on any failed read/parse.
bool render_spec_impl(const Spec& spec, std::vector<float>* out,
                      int32_t* sr) {
  Wav src;
  if (!src.read(spec.source)) return false;
  out->assign(src.data, src.data + src.n);
  *sr = src.sr;
  if (!spec.rir.empty()) {
    if (!reverberate(*out, spec.rir)) return false;
  }
  for (const NoiseSpec& nd : spec.noises) {
    Wav noise;
    if (!noise.read(nd.path)) return false;
    if (nd.extend) {
      // noise looped to the full signal duration (extend_to_duration) then
      // mixed -- done without materializing the looped buffer: the segment
      // power decomposes into full repetitions + a prefix, and the add
      // walks the source in chunks
      const int64_t n = (int64_t)out->size();
      const size_t m2 = (size_t)noise.n;
      if (nd.start < 0 || nd.start >= n || m2 == 0) continue;
      const size_t seg = (size_t)(n - nd.start);
      double e_m = 0.0, e_pre = 0.0;
      for (size_t i = 0; i < m2; ++i)
        e_m += (double)noise.data[i] * (double)noise.data[i];
      const size_t rem = seg % m2;
      for (size_t i = 0; i < rem; ++i)
        e_pre += (double)noise.data[i] * (double)noise.data[i];
      const double p_noise = ((double)(seg / m2) * e_m + e_pre) / seg;
      if (p_noise <= 0.0) continue;
      const double p_sig = power(out->data(), (size_t)n);
      const double scale =
          std::sqrt(p_sig / (p_noise * std::pow(10.0, nd.snr / 10.0)));
      float* dst = out->data() + nd.start;
      for (size_t at = 0; at < seg;) {
        const size_t chunk = std::min(m2, seg - at);
        for (size_t i = 0; i < chunk; ++i)
          dst[at + i] += (float)(scale * (double)noise.data[i]);
        at += chunk;
      }
    } else {
      add_noise(*out, noise.data, (size_t)noise.n, nd.snr, nd.start);
    }
  }
  return true;
}

// wav.scp value: JSON spec or plain path (augment.py:load_utterance).
bool load_utterance(const std::string& rxwav, std::vector<float>* out,
                    int32_t* sr) {
  const char* s = rxwav.c_str();
  while (*s == ' ' || *s == '\t') ++s;
  if (*s == '{') {
    Spec spec;
    if (!parse_spec(s, rxwav.size() - (s - rxwav.c_str()), &spec))
      return false;
    return render_spec_impl(spec, out, sr);
  }
  Wav w;
  if (!w.read(rxwav)) return false;
  out->assign(w.data, w.data + w.n);
  *sr = w.sr;
  return true;
}

// ---------------------------------------------------------------------------
// Feeder (same thread-pool/queue skeleton as vox_feeder.cc).
// ---------------------------------------------------------------------------

struct RawSample {
  std::vector<int16_t> wave;  // max_samples, zero-padded
  int32_t num_samples, target_offset, pad_shift, label;
};

struct RawFeeder {
  int32_t feat_length, context, frame_shift, frame_length;
  int32_t batch, accum, skip_percent;
  int64_t max_samples;
  uint64_t seed;

  struct Entry {
    std::string rxwav;
    int32_t label;
  };
  std::vector<Entry> entries;
  FeederCore<RawSample> core;  // queue/workers/dead-shard protocol

  int32_t num_frames(int64_t ns) const {  // Kaldi snip-edges (ops/fbank.py)
    if (ns < frame_length) return 0;
    return (int32_t)(1 + (ns - frame_length) / frame_shift);
  }

  // data/raw_dataset.py:_crop, bit-for-bit semantics (nearbyint ==
  // numpy's round-half-even under the default rounding mode).
  RawSample crop(const std::vector<float>& samples, std::mt19937_64& rng,
                 int32_t label) const {
    RawSample s;
    s.label = label;
    s.wave.assign((size_t)max_samples, 0);
    std::vector<int16_t> pcm(samples.size());
    for (size_t i = 0; i < samples.size(); ++i) {
      double v = std::nearbyint((double)samples[i]);
      if (v < -32768.0) v = -32768.0;
      if (v > 32767.0) v = 32767.0;
      pcm[i] = (int16_t)v;
    }
    const int64_t len = (int64_t)pcm.size();
    const int32_t n = num_frames(len);
    const int32_t L = feat_length;
    if (n >= L) {
      const int32_t t0 = (int32_t)(rng() % (uint64_t)(n - L + 1));
      const int32_t lo = std::max(0, t0 - context);
      const int32_t hi = std::min(n, t0 + L + context);
      const int64_t s_lo = (int64_t)lo * frame_shift;
      const int64_t s_hi =
          std::min(len, (int64_t)(hi - 1) * frame_shift + frame_length);
      std::memcpy(s.wave.data(), pcm.data() + s_lo,
                  (size_t)(s_hi - s_lo) * 2);
      s.num_samples = (int32_t)(s_hi - s_lo);
      s.target_offset = t0 - lo;
      s.pad_shift = 0;
    } else {
      const int32_t shift = (int32_t)(rng() % (uint64_t)(L - n + 1));
      std::memcpy(s.wave.data(), pcm.data(), (size_t)len * 2);
      s.num_samples = (int32_t)len;
      s.target_offset = 0;
      s.pad_shift = shift;
    }
    return s;
  }

  // decode + render + crop one wav.scp entry (the per-entry body; shard
  // split / skip / pass accounting live in feeder_core.h)
  bool produce(size_t i, std::mt19937_64& rng, RawSample* s) const {
    std::vector<float> samples;
    int32_t sr = 0;
    if (!load_utterance(entries[i].rxwav, &samples, &sr) ||
        num_frames((int64_t)samples.size()) < 1)
      return false;
    *s = crop(samples, rng, entries[i].label);
    return true;
  }

  void worker(size_t widx, size_t nworkers) {
    core.worker_loop(
        widx, nworkers, entries.size(), seed, skip_percent,
        [this](size_t i, std::mt19937_64& rng, RawSample* s) {
          return produce(i, rng, s);
        });
  }
};

}  // namespace

extern "C" {

// Parity-test hook: render one wav.scp value (plain path or JSON spec) to
// a waveform.  Mirrors data/augment.py:load_utterance; compare against the
// Python implementation in tests.  Output via malloc, release with
// vox_free.  Returns 0 on success.
int vox_render_spec(const char* rxwav, float** out, int64_t* n,
                    int32_t* sample_rate) {
  std::vector<float> sig;
  int32_t sr = 0;
  if (!load_utterance(rxwav, &sig, &sr)) return -1;
  float* buf = (float*)malloc(sig.size() * 4);
  if (!buf) return -5;
  std::memcpy(buf, sig.data(), sig.size() * 4);
  *out = buf;
  *n = (int64_t)sig.size();
  *sample_rate = sr;
  return 0;
}

// rxwavs/labels: parallel arrays of n wav.scp values (plain paths or JSON
// augmentation specs) and int labels.  feat_length in frames; context in
// frames of sliding-CMVN context each side (ops/pipeline.py); frame_shift/
// frame_length in samples (FbankConfig: 160/400 at 16 kHz).
void* vox_raw_feeder_create(const char* const* rxwavs, const int32_t* labels,
                            int64_t n, int32_t feat_length, int32_t context,
                            int32_t frame_shift, int32_t frame_length,
                            int32_t batch, int32_t accum,
                            int32_t num_threads, uint64_t seed,
                            int32_t skip_percent) {
  if (n <= 0 || feat_length <= 0 || frame_shift <= 0 || frame_length <= 0 ||
      batch <= 0 || accum <= 0)
    return nullptr;
  RawFeeder* fd = new RawFeeder();
  fd->feat_length = feat_length;
  fd->context = context;
  fd->frame_shift = frame_shift;
  fd->frame_length = frame_length;
  fd->batch = batch;
  fd->accum = accum;
  fd->skip_percent = skip_percent;
  fd->seed = seed;
  // ops/pipeline.py:max_crop_samples
  fd->max_samples =
      (int64_t)(feat_length + 2 * context - 1) * frame_shift + frame_length;
  fd->entries.reserve((size_t)n);
  for (int64_t i = 0; i < n; ++i)
    fd->entries.push_back(RawFeeder::Entry{rxwavs[i], labels[i]});
  fd->core.cap = (size_t)batch * accum * 2;
  if (num_threads < 1) num_threads = 1;
  if ((size_t)num_threads > fd->entries.size())
    num_threads = (int32_t)fd->entries.size();
  fd->core.n_workers = num_threads;
  for (int32_t w = 0; w < num_threads; ++w)
    fd->core.workers.emplace_back(&RawFeeder::worker, fd, (size_t)w,
                                  (size_t)num_threads);
  return fd;
}

// Blocks until accum*batch samples are ready, then fills caller buffers:
// waves (accum*batch, max_samples) int16 zero-padded, num_samples /
// target_offset / pad_shift / labels (accum*batch,) int32 -- the exact
// tuple ops/pipeline.py:waveform_to_features consumes.  Returns 0; -1
// after stop; -2 when every worker's shard is dead.
int vox_raw_feeder_next(void* handle, int16_t* waves_out,
                        int32_t* num_samples_out, int32_t* target_offset_out,
                        int32_t* pad_shift_out, int32_t* labels_out) {
  RawFeeder* fd = (RawFeeder*)handle;
  const size_t need = (size_t)fd->batch * fd->accum;
  const size_t sz = (size_t)fd->max_samples;
  for (size_t k = 0; k < need; ++k) {
    RawSample s;
    const int rc = fd->core.pop(&s);
    if (rc != 0) return rc;
    std::memcpy(waves_out + k * sz, s.wave.data(), sz * 2);
    num_samples_out[k] = s.num_samples;
    target_offset_out[k] = s.target_offset;
    pad_shift_out[k] = s.pad_shift;
    labels_out[k] = s.label;
  }
  return 0;
}

int64_t vox_raw_feeder_errors(void* handle) {
  return ((RawFeeder*)handle)->core.decode_errors.load();
}

int32_t vox_raw_feeder_dead_workers(void* handle) {
  return ((RawFeeder*)handle)->core.dead_workers.load();
}

void vox_raw_feeder_stop(void* handle) {
  ((RawFeeder*)handle)->core.request_stop();
}

void vox_raw_feeder_destroy(void* handle) {
  RawFeeder* fd = (RawFeeder*)handle;
  fd->core.request_stop();
  fd->core.join_all();
  delete fd;
}

}  // extern "C"
