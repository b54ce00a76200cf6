// talkshow_native: threaded host-side audio preprocessing.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the one
// host-bound stage — per-clip audio featurization during dataset
// preprocessing (the reference precomputes MFCCs clip-by-clip in python,
// data_utils/mesh_dataset.py:204-220, which dominates first-run load time).
//
// Exposes, via a C ABI (ctypes):
//   * ts_resample_sinc : polyphase windowed-sinc resampling, identical
//     algorithm to talkshow_tpu.ops.audio.resample (torchaudio
//     sinc_interp_hann semantics)
//   * ts_mfcc          : frame (reflect-pad, hann) -> FFT -> power ->
//     mel (matrix passed in) -> dB (top_db) -> DCT (matrix passed in)
//   * ts_mfcc_batch    : OpenMP-parallel MFCC over many clips
//
// Mel/DCT matrices are supplied by the caller so numerics match the JAX
// frontend bit-for-bit in construction.
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// Iterative radix-2 complex FFT (n must be a power of two).
// ---------------------------------------------------------------------------
void fft_radix2(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / static_cast<double>(len);
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const double ur = re[i + k], ui = im[i + k];
        const double vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        const double vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

// one frame -> power spectrum (n_fft/2+1 bins)
void frame_power(const float* frame, const float* window, int n_fft,
                 double* power_out) {
  std::vector<double> re(n_fft), im(n_fft, 0.0);
  for (int i = 0; i < n_fft; ++i)
    re[i] = static_cast<double>(frame[i]) * static_cast<double>(window[i]);
  fft_radix2(re, im);
  const int bins = n_fft / 2 + 1;
  for (int i = 0; i < bins; ++i) power_out[i] = re[i] * re[i] + im[i] * im[i];
}

// reflect-padded sample access
inline float reflect_at(const float* x, int64_t n, int64_t i) {
  if (i < 0) i = -i;
  if (i >= n) i = 2 * (n - 1) - i;
  return x[i];
}

}  // namespace

extern "C" {

// Polyphase windowed-sinc resampling; matches ops/audio.resample.
// Returns number of output samples written (<= out_cap).
int64_t ts_resample_sinc(const float* x, int64_t n, int32_t orig_freq,
                         int32_t new_freq, int32_t lowpass_filter_width,
                         float rolloff, float* out, int64_t out_cap) {
  auto gcd = [](int64_t a, int64_t b) {
    while (b) { int64_t t = a % b; a = b; b = t; }
    return a;
  };
  const int64_t g = gcd(orig_freq, new_freq);
  const int64_t orig = orig_freq / g, newf = new_freq / g;
  const double base_freq = static_cast<double>(std::min(orig, newf)) * rolloff;
  const int64_t width =
      static_cast<int64_t>(std::ceil(lowpass_filter_width * orig / base_freq));
  const int64_t klen = 2 * width + orig;

  // kernel[p][k] for phase p in [0, newf)
  std::vector<double> kernel(static_cast<size_t>(newf * klen));
  for (int64_t p = 0; p < newf; ++p) {
    for (int64_t k = 0; k < klen; ++k) {
      double t = (-static_cast<double>(p) / newf) +
                 static_cast<double>(k - width) / orig;
      t *= base_freq;
      if (t < -lowpass_filter_width) t = -lowpass_filter_width;
      if (t > lowpass_filter_width) t = lowpass_filter_width;
      const double win =
          std::pow(std::cos(t * kPi / lowpass_filter_width / 2.0), 2.0);
      const double tp = t * kPi;
      const double sinc = (tp == 0.0) ? 1.0 : std::sin(tp) / tp;
      kernel[static_cast<size_t>(p * klen + k)] =
          sinc * win * (base_freq / orig);
    }
  }

  const int64_t target_len =
      static_cast<int64_t>(std::ceil(static_cast<double>(newf) * n / orig));
  const int64_t blocks = (n + orig - 1) / orig + 1;
  int64_t written = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t b = 0; b < blocks; ++b) {
    for (int64_t p = 0; p < newf; ++p) {
      const int64_t oi = b * newf + p;
      if (oi >= target_len || oi >= out_cap) continue;
      double acc = 0.0;
      const int64_t x0 = b * orig - width;
      for (int64_t k = 0; k < klen; ++k) {
        const int64_t xi = x0 + k;
        if (xi >= 0 && xi < n)
          acc += kernel[static_cast<size_t>(p * klen + k)] * x[xi];
      }
      out[oi] = static_cast<float>(acc);
    }
  }
  written = std::min(target_len, out_cap);
  return written;
}

// MFCC of one waveform.
//   x[n], hann window[n_fft], mel_fb[(n_fft/2+1) * n_mels] row-major,
//   dct[n_mels * n_mfcc] row-major, top_db (<=0 disables).
// out[num_frames * n_mfcc]; returns num_frames.
int64_t ts_mfcc(const float* x, int64_t n, int32_t n_fft, int32_t hop,
                const float* window, const float* mel_fb, int32_t n_mels,
                const float* dct, int32_t n_mfcc, float top_db, float* out,
                int64_t out_cap_frames) {
  const int64_t pad = n_fft / 2;
  const int64_t padded = n + 2 * pad;
  const int64_t num_frames = 1 + (padded - n_fft) / hop;
  const int bins = n_fft / 2 + 1;
  if (num_frames > out_cap_frames) return -1;

  std::vector<float> mel_db(static_cast<size_t>(num_frames * n_mels));
  float global_max = -1e30f;

#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<float> frame(n_fft);
    std::vector<double> power(bins);
    float local_max = -1e30f;
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
    for (int64_t f = 0; f < num_frames; ++f) {
      const int64_t start = f * hop - pad;
      for (int i = 0; i < n_fft; ++i)
        frame[i] = reflect_at(x, n, start + i);
      frame_power(frame.data(), window, n_fft, power.data());
      for (int m = 0; m < n_mels; ++m) {
        double acc = 0.0;
        for (int b = 0; b < bins; ++b)
          acc += power[b] * mel_fb[static_cast<size_t>(b) * n_mels + m];
        float db = 10.0f * std::log10(std::max(acc, 1e-10));
        mel_db[static_cast<size_t>(f) * n_mels + m] = db;
        local_max = std::max(local_max, db);
      }
    }
#ifdef _OPENMP
#pragma omp critical
#endif
    global_max = std::max(global_max, local_max);
  }

  const float floor_db = (top_db > 0) ? global_max - top_db : -1e30f;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t f = 0; f < num_frames; ++f) {
    for (int c = 0; c < n_mfcc; ++c) {
      double acc = 0.0;
      for (int m = 0; m < n_mels; ++m) {
        const float v =
            std::max(mel_db[static_cast<size_t>(f) * n_mels + m], floor_db);
        acc += static_cast<double>(v) * dct[static_cast<size_t>(m) * n_mfcc + c];
      }
      out[f * n_mfcc + c] = static_cast<float>(acc);
    }
  }
  return num_frames;
}

int32_t ts_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
