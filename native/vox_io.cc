// Native host-side IO for the TPU speaker-verification framework.
//
// Replaces the reference pipeline's dependence on Kaldi C++ binaries
// (copy-feats/compute-fbank-feats ark plumbing, wav-to-duration; see
// /root/reference/prepare_data.sh:66-71 and tensorflow/kaldi_io.py) with an
// in-process library: the training feeder's hot path -- seek into an ark,
// decode a binary float or CM-compressed matrix -- runs here without Python
// overhead, called via ctypes with the GIL released.
//
// Formats implemented (byte-compatible with Kaldi and with
// voxsrc2020_speaker_verification_tpu/data/kaldi_io.py):
//   "\0B FM "  binary float32 matrix     (rows, cols int32 LE + data)
//   "\0B DM "  binary float64 matrix     (converted to float32 on read)
//   "\0B CM "  compressed matrix format 1: global (min, range) float32 +
//              per-column uint16 percentile headers {p0,p25,p75,p100} +
//              uint8 codes, three linear segments over [0,64],(64,192],
//              (192,255]  (kaldi_io.py:_read_compressed_mat)
//   "\0B FV "  binary float32 vector
//   16-bit PCM WAV (RIFF) -> float32 in int16 scale
//
// C ABI: every entry point returns 0 on success, negative on failure; array
// outputs are malloc'd and released with vox_free.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

struct File {
  FILE* f;
  explicit File(const char* path) : f(fopen(path, "rb")) {}
  ~File() { if (f) fclose(f); }
};

bool read_exact(FILE* f, void* buf, size_t n) {
  return fread(buf, 1, n, f) == n;
}

// Kaldi basic-type int32: one size-marker byte (0x04) + LE int32.
// (The CM GlobalHeader dims are raw int32s without the marker.)
int read_int32(FILE* f, int32_t* v) {
  unsigned char marker;
  if (!read_exact(f, &marker, 1) || marker != 4) return -1;
  return read_exact(f, v, 4) ? 0 : -1;
}

int read_raw_int32(FILE* f, int32_t* v) {
  return read_exact(f, v, 4) ? 0 : -1;
}

// After the "<key> " token the binary marker "\0B" precedes the header.
int expect_binary(FILE* f) {
  unsigned char b[2];
  if (!read_exact(f, b, 2)) return -1;
  if (b[0] != 0 || b[1] != 'B') return -2;
  return 0;
}

int decode_cm(FILE* f, float** out, int32_t* rows, int32_t* cols) {
  float gmin, grange;
  if (!read_exact(f, &gmin, 4) || !read_exact(f, &grange, 4)) return -1;
  int32_t r, c;
  if (read_raw_int32(f, &r) || read_raw_int32(f, &c)) return -1;
  if (r <= 0 || c <= 0 || r > (1 << 24) || c > (1 << 16)) return -3;

  uint16_t* pct = (uint16_t*)malloc((size_t)c * 4 * 2);
  uint8_t* codes = (uint8_t*)malloc((size_t)c * r);
  float* data = (float*)malloc((size_t)r * c * 4);
  if (!pct || !codes || !data ||
      !read_exact(f, pct, (size_t)c * 4 * 2) ||
      !read_exact(f, codes, (size_t)c * r)) {
    free(pct); free(codes); free(data);
    return -1;
  }
  const float scale = grange / 65535.0f;
  for (int32_t j = 0; j < c; ++j) {
    const float p0 = pct[j * 4 + 0] * scale + gmin;
    const float p25 = pct[j * 4 + 1] * scale + gmin;
    const float p75 = pct[j * 4 + 2] * scale + gmin;
    const float p100 = pct[j * 4 + 3] * scale + gmin;
    const float d_low = p25 - p0;
    const float d_mid = p75 - p25;
    const float d_high = p100 - p75;
    const uint8_t* col = codes + (size_t)j * r;
    // expression order mirrors kaldi_io.py:_read_compressed_mat so the
    // decode is bit-identical to the Python reference
    for (int32_t i = 0; i < r; ++i) {
      const float v = col[i];
      float x;
      if (v <= 64.0f)       x = p0 + d_low * (v / 64.0f);
      else if (v <= 192.0f) x = p25 + d_mid * ((v - 64.0f) / 128.0f);
      else                  x = p75 + d_high * ((v - 192.0f) / 63.0f);
      data[(size_t)i * c + j] = x;  // stored col-major; emit row-major
    }
  }
  free(pct);
  free(codes);
  *out = data;
  *rows = r;
  *cols = c;
  return 0;
}

int read_mat_stream(FILE* f, float** out, int32_t* rows, int32_t* cols) {
  int rc = expect_binary(f);
  if (rc) return rc;
  char hdr[3];
  if (!read_exact(f, hdr, 3)) return -1;
  if (memcmp(hdr, "CM ", 3) == 0) return decode_cm(f, out, rows, cols);
  const bool fm = memcmp(hdr, "FM ", 3) == 0;
  const bool dm = memcmp(hdr, "DM ", 3) == 0;
  if (!fm && !dm) return -4;
  int32_t r, c;
  if (read_int32(f, &r) || read_int32(f, &c)) return -1;
  if (r <= 0 || c <= 0 || r > (1 << 24) || c > (1 << 16)) return -3;
  float* data = (float*)malloc((size_t)r * c * 4);
  if (!data) return -5;
  if (fm) {
    if (!read_exact(f, data, (size_t)r * c * 4)) { free(data); return -1; }
  } else {
    double* tmp = (double*)malloc((size_t)r * c * 8);
    if (!tmp || !read_exact(f, tmp, (size_t)r * c * 8)) {
      free(tmp); free(data); return -1;
    }
    for (size_t i = 0; i < (size_t)r * c; ++i) data[i] = (float)tmp[i];
    free(tmp);
  }
  *out = data;
  *rows = r;
  *cols = c;
  return 0;
}

}  // namespace

extern "C" {

void vox_free(void* p) { free(p); }

// Read a matrix at an scp byte offset (offset points at "\0B").
int vox_read_mat(const char* path, int64_t offset,
                 float** out, int32_t* rows, int32_t* cols) {
  File fp(path);
  if (!fp.f) return -10;
  if (offset > 0 && fseek(fp.f, (long)offset, SEEK_SET) != 0) return -11;
  return read_mat_stream(fp.f, out, rows, cols);
}

// Read a float vector at an scp byte offset.
int vox_read_vec(const char* path, int64_t offset, float** out, int32_t* n) {
  File fp(path);
  if (!fp.f) return -10;
  if (offset > 0 && fseek(fp.f, (long)offset, SEEK_SET) != 0) return -11;
  int rc = expect_binary(fp.f);
  if (rc) return rc;
  char hdr[3];
  if (!read_exact(fp.f, hdr, 3)) return -1;
  if (memcmp(hdr, "FV ", 3) != 0) return -4;
  int32_t len;
  if (read_int32(fp.f, &len) || len <= 0 || len > (1 << 26)) return -3;
  float* data = (float*)malloc((size_t)len * 4);
  if (!data) return -5;
  if (!read_exact(fp.f, data, (size_t)len * 4)) { free(data); return -1; }
  *out = data;
  *n = len;
  return 0;
}

// 16-bit PCM RIFF WAV -> mono float32 (int16 scale). Multi-channel averaged.
int vox_read_wav(const char* path, float** out, int64_t* n, int32_t* sample_rate) {
  File fp(path);
  if (!fp.f) return -10;
  char riff[12];
  if (!read_exact(fp.f, riff, 12)) return -1;
  if (memcmp(riff, "RIFF", 4) != 0 || memcmp(riff + 8, "WAVE", 4) != 0)
    return -4;
  uint16_t channels = 0, bits = 0;
  uint32_t rate = 0;
  for (;;) {
    char id[4];
    uint32_t size;
    if (!read_exact(fp.f, id, 4) || !read_exact(fp.f, &size, 4)) return -1;
    if (memcmp(id, "fmt ", 4) == 0) {
      unsigned char fmt[16];
      if (size < 16 || !read_exact(fp.f, fmt, 16)) return -1;
      uint16_t audio_format;
      memcpy(&audio_format, fmt, 2);
      memcpy(&channels, fmt + 2, 2);
      memcpy(&rate, fmt + 4, 4);
      memcpy(&bits, fmt + 14, 2);
      if (audio_format != 1 || bits != 16) return -6;  // PCM16 only
      if (size > 16 && fseek(fp.f, size - 16, SEEK_CUR) != 0) return -1;
    } else if (memcmp(id, "data", 4) == 0) {
      if (channels == 0) return -4;
      const int64_t frames = (int64_t)size / (channels * 2);
      int16_t* raw = (int16_t*)malloc(size);
      float* data = (float*)malloc((size_t)frames * 4);
      if (!raw || !data || !read_exact(fp.f, raw, size)) {
        free(raw); free(data);
        return -1;
      }
      if (channels == 1) {
        for (int64_t i = 0; i < frames; ++i) data[i] = (float)raw[i];
      } else {
        for (int64_t i = 0; i < frames; ++i) {
          float acc = 0.0f;
          for (int ch = 0; ch < channels; ++ch) acc += raw[i * channels + ch];
          data[i] = acc / channels;
        }
      }
      free(raw);
      *out = data;
      *n = frames;
      *sample_rate = (int32_t)rate;
      return 0;
    } else {
      if (fseek(fp.f, size + (size & 1), SEEK_CUR) != 0) return -1;
    }
  }
}

}  // extern "C"
