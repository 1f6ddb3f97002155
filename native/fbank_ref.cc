// Independent reference implementation of Kaldi-semantics FBANK features
// and sliding-window CMN, used ONLY as a test oracle.
//
// Purpose (see tests/test_fbank_cpp_oracle.py): the production TPU path
// (voxsrc2020_speaker_verification_tpu/ops/fbank.py) folds the whole DSP
// chain into three matmuls; the numpy test oracle shares that derivation.
// This file instead follows the *scalar per-frame algorithm* that Kaldi's
// compute-fbank-feats / apply-cmvn-sliding binaries implement
// (feature-window.cc, mel-computations.cc, cmvn.cc semantics; the reference
// pipeline invokes them at /root/reference/prepare_data.sh:68 and
// tensorflow/tf_train_tdnn.py:83): frame extraction, DC removal, in-place
// preemphasis, Povey windowing, zero-padding, a literal DFT, power spectrum,
// triangular mel accumulation, log flooring -- so agreement between the two
// stacks is evidence of correctness, not of a shared derivation.
//
// Everything is computed in double precision and emitted as float32 (Kaldi
// does per-frame float32; tests allow for that difference).
//
// C ABI: returns 0 on success, negative on failure.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr float kFltEpsilon = 1.1920928955078125e-7f;  // FLT_EPSILON

double mel(double freq) { return 1127.0 * std::log(1.0 + freq / 700.0); }

int pow2_at_least(int n) {
  int p = 1;
  while (p < n) p *= 2;
  return p;
}

}  // namespace

extern "C" {

// Number of snip-edges frames for num_samples.
int fbank_ref_num_frames(int num_samples, int sample_rate,
                         double frame_length_ms, double frame_shift_ms) {
  const int frame_length = static_cast<int>(sample_rate * 1e-3 * frame_length_ms);
  const int frame_shift = static_cast<int>(sample_rate * 1e-3 * frame_shift_ms);
  if (num_samples < frame_length) return 0;
  return 1 + (num_samples - frame_length) / frame_shift;
}

// Log-mel FBANK of one waveform (int16-scale float32), dither off.
// out must hold num_frames * num_bins floats.
int fbank_ref_compute(const float* wave, int num_samples, int sample_rate,
                      int num_bins, double frame_length_ms,
                      double frame_shift_ms, double low_freq,
                      double high_freq_offset, double preemph_coeff,
                      int remove_dc_offset, float* out) {
  const int frame_length = static_cast<int>(sample_rate * 1e-3 * frame_length_ms);
  const int frame_shift = static_cast<int>(sample_rate * 1e-3 * frame_shift_ms);
  const int padded = pow2_at_least(frame_length);
  const int num_fft_bins = padded / 2;
  const int t_total = fbank_ref_num_frames(num_samples, sample_rate,
                                           frame_length_ms, frame_shift_ms);
  if (t_total <= 0) return 0;

  // Povey window.
  std::vector<double> window(frame_length);
  for (int i = 0; i < frame_length; ++i) {
    const double hann = 0.5 - 0.5 * std::cos(2.0 * kPi * i / (frame_length - 1));
    window[i] = std::pow(hann, 0.85);
  }

  // Triangular mel bank: per mel bin, the fft-bin range and weights.
  const double nyquist = 0.5 * sample_rate;
  const double high_freq =
      high_freq_offset > 0 ? high_freq_offset : nyquist + high_freq_offset;
  if (!(0 <= low_freq && low_freq < high_freq && high_freq <= nyquist))
    return -1;
  const double fft_bin_width = static_cast<double>(sample_rate) / padded;
  const double mel_low = mel(low_freq), mel_high = mel(high_freq);
  const double mel_delta = (mel_high - mel_low) / (num_bins + 1);
  std::vector<std::vector<double>> bank(num_bins,
                                        std::vector<double>(num_fft_bins, 0.0));
  for (int b = 0; b < num_bins; ++b) {
    const double left = mel_low + b * mel_delta;
    const double center = left + mel_delta;
    const double right = center + mel_delta;
    for (int k = 0; k < num_fft_bins; ++k) {
      const double m = mel(fft_bin_width * k);
      if (m > left && m <= center)
        bank[b][k] = (m - left) / (center - left);
      else if (m > center && m < right)
        bank[b][k] = (right - m) / (right - center);
    }
  }

  std::vector<double> frame(frame_length);
  std::vector<double> power(num_fft_bins);
  for (int t = 0; t < t_total; ++t) {
    const float* src = wave + t * frame_shift;
    for (int i = 0; i < frame_length; ++i) frame[i] = src[i];

    if (remove_dc_offset) {
      double mean = 0.0;
      for (double v : frame) mean += v;
      mean /= frame_length;
      for (double& v : frame) v -= mean;
    }
    if (preemph_coeff != 0.0) {
      // in-place, back to front (Kaldi Preemphasize)
      for (int i = frame_length - 1; i > 0; --i)
        frame[i] -= preemph_coeff * frame[i - 1];
      frame[0] -= preemph_coeff * frame[0];
    }
    for (int i = 0; i < frame_length; ++i) frame[i] *= window[i];

    // Literal real DFT over the zero-padded frame, bins [0, padded/2).
    for (int k = 0; k < num_fft_bins; ++k) {
      double re = 0.0, im = 0.0;
      for (int i = 0; i < frame_length; ++i) {
        const double angle = 2.0 * kPi * i * k / padded;
        re += frame[i] * std::cos(angle);
        im -= frame[i] * std::sin(angle);
      }
      power[k] = re * re + im * im;
    }

    for (int b = 0; b < num_bins; ++b) {
      double e = 0.0;
      for (int k = 0; k < num_fft_bins; ++k) e += bank[b][k] * power[k];
      const float ef = static_cast<float>(e);
      out[t * num_bins + b] =
          std::log(ef > kFltEpsilon ? ef : kFltEpsilon);
    }
  }
  return 0;
}

// Sliding-window CMN, centered, mean-only: the literal windowed double loop
// (apply-cmvn-sliding --norm-vars=false --center=true semantics).
// feats/out: t x dim row-major float32.
int cmvn_sliding_ref(const float* feats, int t, int dim, int window,
                     float* out) {
  for (int i = 0; i < t; ++i) {
    int start = i - window / 2;
    if (start > t - window) start = t - window;
    if (start < 0) start = 0;
    int end = start + window;
    if (end > t) end = t;
    const int count = end - start;
    for (int d = 0; d < dim; ++d) {
      double sum = 0.0;
      for (int j = start; j < end; ++j) sum += feats[j * dim + d];
      out[i * dim + d] =
          feats[i * dim + d] - static_cast<float>(sum / count);
    }
  }
  return 0;
}

}  // extern "C"
