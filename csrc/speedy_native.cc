//  speedy_tpu native runtime implementation.
//
//  Fresh C++ implementation of the Mach1/Speedy analysis chain, the
//  tension->speed control law, a WSOLA time-scaler, the sonic2-compatible
//  chunked streaming shim, and RIFF WAV I/O. The algorithm spec (constants,
//  state-machine semantics, feature layout) mirrors the JAX implementation
//  in ../speedy_tpu (see speedy_tpu/config.py for the reference citations);
//  tests/test_native.py holds this library to the same golden gates as the
//  device path.

#include "speedy_native.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <string>
#include <vector>

namespace {

constexpr float kFrameRateHz = 100.0f;
constexpr float kMinSpeed = 0.01f;
constexpr float kPreemphasis = 0.97f;
constexpr float kEps = 2.2204e-16f;
constexpr float kMeanSpectrogramEnergy = 2.14204f;
constexpr float kMeanEwld = 123.837f;
constexpr float kMeanEwLpf = 123.979f;
constexpr float kMeanRsd = 0.971975f;
constexpr float kMaxEnergyHysteresis = 1.41421f;
// MATCH_MATLAB hysteresis orientation (speedy.h:136-146); the tests and
// golden data pin this configuration.
constexpr int kHystFuture = 8;
constexpr int kHystPast = 12;
constexpr int kWsolaMinPitchHz = 65;
constexpr int kWsolaMaxPitchHz = 400;

inline int posmod(int64_t x, int n) {
  int r = static_cast<int>(x % n);
  return r < 0 ? r + n : r;
}

}  // namespace

/* ==================================================================== */
/* Speedy analysis stream                                               */
/* ==================================================================== */

struct speedyStreamStruct {
  int sample_rate = 0;
  int window_size = 0;
  int fft_size = 0;
  int64_t current_time = -1;
  float preemph_state = 0.0f;
  float lpf_alpha = 0.0f;
  float energy_lp_state = kMeanSpectrogramEnergy;
  float diff_lp_state = kMeanEwld;
  int skip_frame_count = 1;
  float current_duration = 0.0f;
  float desired_duration = 0.0f;
  std::vector<float> window;                 // Hamming
  std::vector<double> dft_cos, dft_sin;      // [window][window+1]
  std::vector<float> spec_ring;              // [hist][window+1]
  std::vector<float> hyst_ring;              // [2*hist]
  std::vector<float> spectrogram_full;       // [fft_size] (mirrored)
  std::vector<float> normalized;             // [window]
  float features[kFeatureValueCount] = {0};
  int hist = kHystFuture + kHystPast + 1;

  float* spec_at(int64_t t) {
    return &spec_ring[posmod(t, hist) * (window_size + 1)];
  }
  float hyst_at(int64_t t) const {
    return hyst_ring[posmod(t, 2 * hist)];
  }
};

speedyStream speedyCreateStream(int sample_rate) {
  auto* s = new speedyStreamStruct();
  s->sample_rate = sample_rate;
  s->window_size = static_cast<int>(1.5 * sample_rate / kFrameRateHz);
  s->fft_size = 2 * s->window_size;
  s->lpf_alpha = std::exp(-1.0 / kFrameRateHz);
  const int w = s->window_size;
  s->window.resize(w);
  for (int i = 0; i < w; i++) {
    s->window[i] = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (w - 1.0));
  }
  s->dft_cos.resize(static_cast<size_t>(w) * (w + 1));
  s->dft_sin.resize(static_cast<size_t>(w) * (w + 1));
  for (int n = 0; n < w; n++) {
    for (int k = 0; k <= w; k++) {
      double ang = 2.0 * M_PI * static_cast<double>(k) * n / (2.0 * w);
      s->dft_cos[static_cast<size_t>(n) * (w + 1) + k] = std::cos(ang);
      s->dft_sin[static_cast<size_t>(n) * (w + 1) + k] = -std::sin(ang);
    }
  }
  s->spec_ring.assign(static_cast<size_t>(s->hist) * (w + 1), 0.0f);
  s->hyst_ring.assign(2 * s->hist, 0.0f);
  s->spectrogram_full.assign(s->fft_size, 0.0f);
  s->normalized.assign(w, 0.0f);
  return s;
}

void speedyDestroyStream(speedyStream s) { delete s; }
int speedyInputFrameSize(speedyStream s) { return s->window_size; }
int speedyInputFrameStep(speedyStream s) {
  return s->sample_rate / static_cast<int>(kFrameRateHz);
}
int speedyFFTSize(speedyStream s) { return s->fft_size; }
float speedyBinToFreq(speedyStream s, int bin) {
  return bin * (s->sample_rate / static_cast<float>(s->fft_size));
}
int speedyFreqToBin(speedyStream s, float freq) {
  return static_cast<int>(
      std::lround(freq * s->fft_size / static_cast<float>(s->sample_rate)));
}
int64_t speedyGetCurrentTime(speedyStream s) { return s->current_time; }
float* speedyGetInternalState(speedyStream s) { return s->features; }
float* speedyGetSpectrogram(speedyStream s) { return s->spectrogram_full.data(); }
float* speedyGetNormalizedSpectrogram(speedyStream s) {
  return s->normalized.data();
}

void speedyAddData(speedyStream s, const float* input, int64_t at_time) {
  const int w = s->window_size;
  std::vector<float> buf(input, input + w);
  // Preemphasis with persistent cross-call state.
  float state = s->preemph_state;
  s->preemph_state = buf[w - 1];
  for (int i = w - 1; i > 0; i--) buf[i] -= kPreemphasis * buf[i - 1];
  buf[0] -= kPreemphasis * state;
  // Windowed matrix DFT, double accumulation.
  std::vector<double> fw(w);
  for (int i = 0; i < w; i++) fw[i] = static_cast<double>(buf[i]) * s->window[i];
  float* spec = s->spec_at(at_time);
  for (int k = 0; k <= w; k++) {
    double re = 0.0, im = 0.0;
    const double* cp = &s->dft_cos[k];
    const double* sp = &s->dft_sin[k];
    for (int n = 0; n < w; n++) {
      re += fw[n] * cp[static_cast<size_t>(n) * (w + 1)];
      im += fw[n] * sp[static_cast<size_t>(n) * (w + 1)];
    }
    spec[k] = static_cast<float>(std::sqrt(re * re + im * im));
  }
  // Mirrored full-spectrum view for the spectrogram callback.
  for (int k = 0; k <= w; k++) s->spectrogram_full[k] = spec[k];
  for (int k = 1; k < w; k++) s->spectrogram_full[2 * w - k] = spec[k];
  // Local energy chain.
  float energy = 0.0f;
  for (int k = 1; k < w; k++) energy += spec[k] * spec[k];
  s->energy_lp_state =
      (1.0f - s->lpf_alpha) * energy + s->lpf_alpha * s->energy_lp_state;
  float local = energy / s->energy_lp_state;
  float compressed = std::sqrt(std::min(2.0f, local));
  s->hyst_ring[posmod(at_time, 2 * s->hist)] = compressed;
  s->features[1] = s->energy_lp_state;
  s->features[2] = local;
  s->features[3] = compressed;
  s->features[12] = static_cast<float>(at_time);
  s->current_time = at_time;
}

void speedyAddDataShort(speedyStream s, const int16_t* input, int64_t at_time) {
  std::vector<float> buf(s->window_size);
  for (int i = 0; i < s->window_size; i++) buf[i] = input[i] / 32768.0f;
  speedyAddData(s, buf.data(), at_time);
}

float speedyEvaluateHysteresis(speedyStream s, int64_t at_time);
static float EvaluateHysteresis(speedyStream s, int64_t at_time) {
  float future_max = 0.0f, past_max = 0.0f;
  for (int i = 0; i <= kHystFuture; i++) {
    float v = s->hyst_at(at_time + i) * (kHystFuture - i) /
              static_cast<float>(kHystFuture);
    future_max = std::max(future_max, v);
  }
  for (int i = 0; i <= kHystPast; i++) {
    float v = s->hyst_at(at_time - i) * (kHystPast - i) /
              static_cast<float>(kHystPast);
    past_max = std::max(past_max, v);
  }
  return (past_max + future_max) / 2.0f;
}

float speedyEvaluateHysteresis(speedyStream s, int64_t at_time) {
  return EvaluateHysteresis(s, at_time);
}

void speedyAddToHysteresisBuffer(speedyStream s, float value, int64_t at_time) {
  s->hyst_ring[posmod(at_time, 2 * s->hist)] = value;
}

float* speedyGetSpectrogramAtTime(speedyStream s, int64_t at_time) {
  return s->spec_at(at_time);
}

void speedyPreemphasisFilter(speedyStream s, float* input, int length) {
  // filter([1 -0.97], 1, x) in place with persistent state (speedy.c:416).
  for (int i = 0; i < length; i++) {
    float last = input[i];
    input[i] -= kPreemphasis * s->preemph_state;
    s->preemph_state = last;
  }
}

float speedyNormalizeByEnergy(const float* spectrogram, float* normalized,
                              int length) {
  float energy = 0.0f;
  for (int i = 1; i < length; i++) energy += spectrogram[i] * spectrogram[i];
  float inv = 1.0f / (std::sqrt(energy) + kEps);
  for (int i = 0; i < length; i++) normalized[i] = spectrogram[i] * inv;
  return energy;
}

float* speedySpectrogram(speedyStream s, float* input) {
  // Windowed magnitude DFT of a caller-provided frame (no preemphasis, no
  // ring update) — the white-box entry used by the reference's tests.
  const int w = s->window_size;
  std::vector<double> fw(w);
  for (int i = 0; i < w; i++) fw[i] = static_cast<double>(input[i]) * s->window[i];
  for (int k = 0; k <= w; k++) {
    double re = 0.0, im = 0.0;
    for (int n = 0; n < w; n++) {
      re += fw[n] * s->dft_cos[static_cast<size_t>(n) * (w + 1) + k];
      im += fw[n] * s->dft_sin[static_cast<size_t>(n) * (w + 1) + k];
    }
    s->spectrogram_full[k] = static_cast<float>(std::sqrt(re * re + im * im));
  }
  for (int k = 1; k < w; k++) {
    s->spectrogram_full[2 * w - k] = s->spectrogram_full[k];
  }
  return s->spectrogram_full.data();
}

/* FirstOrderFilter C API (speedy.c:50-88 semantics). */
struct FirstOrderFilterStruct {
  float state = 0.0f;
  float alpha = 0.0f;
};

FirstOrderFilter CreateFirstOrderFilter(float tau) {
  auto* f = new FirstOrderFilterStruct();
  DesignFirstOrderLowpassFilter(f, tau);
  return f;
}
void DesignFirstOrderLowpassFilter(FirstOrderFilter f, float tau) {
  f->state = 0.0f;
  f->alpha = tau > 0 ? std::exp(-1.0 / tau) : 0.0f;
}
float IterateFirstOrderFilter(FirstOrderFilter f, float input) {
  f->state = (1.0f - f->alpha) * input + f->alpha * f->state;
  return f->state;
}
void ResetFirstOrderFilter(FirstOrderFilter f) { f->state = 0.0f; }
void SetFirstOrderFilterState(FirstOrderFilter f, float v) { f->state = v; }
void DeleteFirstOrderFilter(FirstOrderFilter f) { delete f; }

int speedyComputeTension(speedyStream s, int64_t at_time, float* tension) {
  if (at_time + kHystFuture > s->current_time) return 0;
  const int w = s->window_size;
  float* cur = s->spec_at(at_time);
  float* last = s->spec_at(at_time - 1);
  float* f = s->features;
  float hyst = EvaluateHysteresis(s, at_time);
  float energy = 0.0f, last_energy = 0.0f;
  for (int k = 1; k < w; k++) {
    energy += cur[k] * cur[k];
    last_energy += last[k] * last[k];
  }
  float inv = 1.0f / (std::sqrt(energy) + kEps);
  for (int k = 0; k < w; k++) s->normalized[k] = cur[k] * inv;
  float inv_last = 1.0f / (std::sqrt(last_energy) + kEps);

  f[4] = hyst;
  f[0] = energy;
  f[14] = 0.04f * kMaxEnergyHysteresis;
  bool low = energy <= f[14];
  f[5] = low ? 1.0f : 0.0f;
  f[13] = static_cast<float>(at_time);
  if (low) s->skip_frame_count = 1;
  if (s->skip_frame_count > 0) {
    s->skip_frame_count--;
    f[5] = 1.0f;
    f[6] = f[7] = f[9] = f[10] = 0.0f;
    s->diff_lp_state = s->lpf_alpha * s->diff_lp_state;  // iterate with 0
    f[8] = s->diff_lp_state;
  } else {
    s->skip_frame_count = 0;
    float thresh = 0.0f;
    for (int k = 1; k < w; k++) thresh = std::max(thresh, cur[k]);
    thresh /= 100.0f;
    float lsd = 0.0f;
    for (int k = 1; k < w; k++) {
      if (cur[k] > thresh && last[k] > thresh) {
        lsd += std::fabs(std::log((cur[k] * inv + kEps) /
                                  (last[k] * inv_last + kEps)));
      }
    }
    float ewld = lsd * hyst;
    s->diff_lp_state =
        (1.0f - s->lpf_alpha) * ewld + s->lpf_alpha * s->diff_lp_state;
    float rsd = ewld / (s->diff_lp_state + 0.01f * kMeanEwLpf);
    f[6] = lsd;
    f[7] = ewld;
    f[8] = s->diff_lp_state;
    f[9] = rsd;
    f[10] = std::min(rsd, 4.0f * kMeanRsd);
  }
  f[11] = 0.5f * (f[4] - 0.7f) + 0.25f * (f[10] - 1.0f);
  *tension = f[11];
  return 1;
}

float speedyComputeSpeedFromTension(float tension, float R_g,
                                    float duration_feedback_strength,
                                    speedyStream s) {
  float requested;
  if (R_g > 1.0f) {
    requested = std::max(1.0f, R_g + (1.0f - R_g) * tension);
  } else {
    requested = std::max(kMinSpeed, std::min(1.0f, R_g - (1.0f - R_g) * tension));
  }
  if (duration_feedback_strength > 0.0f) {
    float excess = s->current_duration - s->desired_duration;
    requested += std::max(kMinSpeed, duration_feedback_strength * excess);
  }
  float frame_duration = 1.0f / kFrameRateHz;
  s->current_duration += frame_duration / requested;
  s->desired_duration += frame_duration / R_g;
  return requested;
}

/* ==================================================================== */
/* WSOLA engine (skip/insert pitch-period algebra, see ops/wsola.py)    */
/* ==================================================================== */

namespace {

class WsolaEngine {
 public:
  WsolaEngine(int sample_rate, int channels)
      : channels_(channels),
        min_period_(sample_rate / kWsolaMaxPitchHz),
        max_period_(sample_rate / kWsolaMinPitchHz) {}

  void set_speed(float s) { speed_ = s; }
  void set_rate(float r) { rate_ = r; }

  void write(const float* interleaved, int n_samples) {
    if (n_samples > 0) {
      long end = in_base_ + total_in() + n_samples;
      if (!speed_segs_.empty() && speed_segs_.back().second == speed_) {
        speed_segs_.back().first = end;
      } else {
        speed_segs_.emplace_back(end, speed_);
      }
    }
    size_t old = in_.size();
    in_.resize(old + static_cast<size_t>(n_samples) * channels_);
    std::memcpy(in_.data() + old, interleaved,
                sizeof(float) * n_samples * channels_);
    process(false);
    drain_rate();
  }

  // Sum over global input samples [g0, g1) of 1/speed_written (see the
  // Python engine: quanta lag the writer, so play time must use the speed
  // each sample was written under — alternating-speed length accuracy).
  double speed_integral(long g0, long g1) const {
    double total = 0.0;
    long prev = g0;
    for (const auto& seg : speed_segs_) {
      if (seg.first <= g0) continue;
      long hi = std::min(seg.first, g1);
      if (hi > prev) {
        total += (hi - prev) / static_cast<double>(seg.second);
        prev = hi;
      }
      if (prev >= g1) break;
    }
    if (prev < g1) total += (g1 - prev) / static_cast<double>(speed_);
    return total;
  }

  void flush() {
    process(true);
    drain_rate();
    long limit = std::lround(play_time_);
    while (emitted_ < limit) {
      for (int c = 0; c < channels_; c++) out_.push_back(0.0f);
      emitted_++;
    }
  }

  int available() const {
    long limit = std::lround(play_time_);
    return static_cast<int>(
        std::max(0L, std::min<long>(emitted_, limit) - read_));
  }

  int read(float* dst, int max_samples) {
    // read_ / emitted_ / fifo_base_ are GLOBAL stream indices; compaction
    // only moves fifo_base_ (rebasing emitted_ without play_time_ made
    // flush pad spurious silence once the fifo compacted).
    int take = std::min(available(), max_samples);
    long local = read_ - fifo_base_;
    for (int i = 0; i < take * channels_; i++) {
      dst[i] = out_[local * channels_ + i];
    }
    read_ += take;
    if (read_ - fifo_base_ > 65536) {  // keep the fifo bounded
      out_.erase(out_.begin(),
                 out_.begin() + (read_ - fifo_base_) * channels_);
      fifo_base_ = read_;
    }
    return take;
  }

 private:
  int total_in() const { return static_cast<int>(in_.size()) / channels_; }

  float mono(int i) const {
    if (channels_ == 1) return in_[i];
    float sum = 0.0f;
    for (int c = 0; c < channels_; c++) sum += in_[i * channels_ + c];
    return sum / channels_;
  }

  int pitch(int p) const {
    // AMDF argmin over [min_period, max_period] (ties -> smallest lag).
    double best = 1e30;
    int best_lag = min_period_;
    for (int lag = min_period_; lag <= max_period_; lag++) {
      double d = 0.0;
      for (int i = 0; i < lag; i++) {
        d += std::fabs(mono(p + i) - mono(p + i + lag));
      }
      d /= lag;
      if (d < best) {
        best = d;
        best_lag = lag;
      }
    }
    return best_lag;
  }

  void emit_copy(int p, int n) {
    for (int i = 0; i < n; i++) {
      for (int c = 0; c < channels_; c++) {
        raw_.push_back(sample(p + i, c));
      }
    }
  }

  float sample(int i, int c) const {
    if (i < 0 || i >= total_in()) return 0.0f;
    return in_[static_cast<size_t>(i) * channels_ + c];
  }

  void emit_blend(int pa, int pb, int n) {
    // OLA: pa ramps down, pb ramps up over n samples.
    for (int i = 0; i < n; i++) {
      float up = static_cast<float>(i) / std::max(n, 1);
      for (int c = 0; c < channels_; c++) {
        raw_.push_back(sample(pa + i, c) * (1.0f - up) + sample(pb + i, c) * up);
      }
    }
  }

  void advance(int consumed, float s, bool final_pass, int real_n) {
    int c_real = std::max(0, std::min(real_n - pos_, consumed));
    long g0 = in_base_ + pos_;
    play_time_ += speed_integral(g0, g0 + c_real) / rate_;
    pos_ += consumed;
  }

  void process(bool final_pass) {
    const int chunk = max_period_;
    const int need = 2 * max_period_ + chunk;
    const int real_n = total_in();
    if (final_pass && pos_ < real_n) {
      // Zero-pad so the final pass's pitch search and blends never read
      // past the buffer (mono()/pitch() are unchecked; the Python engine
      // pads identically).
      in_.resize(in_.size() + static_cast<size_t>(need) * channels_, 0.0f);
    }
    float s = speed_;
    while (final_pass ? (pos_ < real_n) : (pos_ + need <= real_n)) {
      if (rem_copy_ > 0) {
        int n = std::min(rem_copy_, chunk);
        emit_copy(pos_, n);
        advance(n, s, final_pass, real_n);
        rem_copy_ -= n;
        continue;
      }
      if (s > 1.00001f) {
        int period = pitch(pos_);
        int n;
        if (s >= 2.0f) {
          n = std::max(1, static_cast<int>(period / (s - 1.0f)));
          rem_copy_ = 0;
        } else {
          n = period;
          rem_copy_ = std::max(
              0, static_cast<int>(period * (2.0f - s) / (s - 1.0f)));
        }
        emit_blend(pos_, pos_ + period, n);
        advance(period + n, s, final_pass, real_n);
      } else if (s < 0.99999f) {
        int period = pitch(pos_);
        int n;
        if (s <= 0.5f) {
          n = std::max(1, static_cast<int>(period * s / (1.0f - s)));
          rem_copy_ = 0;
        } else {
          n = period;
          rem_copy_ = std::max(
              0, static_cast<int>(period * (2.0f * s - 1.0f) / (1.0f - s)));
        }
        emit_copy(pos_, period);
        emit_blend(pos_ + period, pos_, n);
        advance(n, s, final_pass, real_n);
      } else {
        emit_copy(pos_, chunk);
        advance(chunk, s, final_pass, real_n);
      }
    }
    // Drop consumed input (keep alignment with channel stride).
    if (final_pass) {
      // Fully drained (pos_ >= real_n); discard the zero padding too.
      in_.clear();
      in_base_ += real_n;
      pos_ = 0;
      while (speed_segs_.size() > 1 && speed_segs_.front().first <= in_base_) {
        speed_segs_.pop_front();
      }
      return;
    }
    int drop = std::min(pos_, real_n);
    if (drop > 0) {
      in_.erase(in_.begin(), in_.begin() + static_cast<size_t>(drop) * channels_);
      pos_ -= drop;
      in_base_ += drop;
      while (speed_segs_.size() > 1 && speed_segs_.front().first <= in_base_) {
        speed_segs_.pop_front();
      }
    }
  }

  // Stateful streaming rate converter: moves raw_ into out_ (identity at
  // rate 1, linear interpolation otherwise), carrying fractional phase and
  // the last raw sample across calls.
  void drain_rate() {
    long n_raw = static_cast<long>(raw_.size()) / channels_;
    if (n_raw == 0) return;
    if (rate_ == 1.0f && !conv_primed_) {
      out_.insert(out_.end(), raw_.begin(), raw_.end());
      emitted_ += n_raw;
      raw_.clear();
      return;
    }
    std::vector<float> x;
    double start;
    if (conv_primed_) {
      x.reserve(raw_.size() + channels_);
      x.insert(x.end(), conv_last_.begin(), conv_last_.end());
      x.insert(x.end(), raw_.begin(), raw_.end());
      start = conv_phase_;
    } else {
      x = raw_;
      start = 0.0;
      conv_primed_ = true;
    }
    long n = static_cast<long>(x.size()) / channels_;
    double pos = start;
    long count = 0;
    while (pos <= n - 1 + 1e-9) {
      long i0 = std::min<long>(static_cast<long>(pos), n - 1);
      long i1 = std::min<long>(i0 + 1, n - 1);
      float frac = static_cast<float>(pos - i0);
      for (int c = 0; c < channels_; c++) {
        out_.push_back(x[i0 * channels_ + c] * (1.0f - frac) +
                       x[i1 * channels_ + c] * frac);
      }
      count++;
      pos += rate_;
    }
    emitted_ += count;
    conv_phase_ = pos - (n - 1);
    conv_last_.assign(x.end() - channels_, x.end());
    raw_.clear();
  }

  std::vector<float> in_;
  long in_base_ = 0;  // global index of in_[0]
  std::deque<std::pair<long, float>> speed_segs_;  // (global_end, speed)
  std::vector<float> raw_;   // pre-rate-conversion emissions
  std::vector<float> out_;   // post-rate-conversion output fifo
  int channels_;
  int min_period_, max_period_;
  float speed_ = 1.0f;
  float rate_ = 1.0f;
  int pos_ = 0;
  int rem_copy_ = 0;
  long emitted_ = 0;
  long read_ = 0;
  long fifo_base_ = 0;
  double play_time_ = 0.0;
  bool conv_primed_ = false;
  double conv_phase_ = 0.0;
  std::vector<float> conv_last_;
};

}  // namespace

/* ==================================================================== */
/* sonic2-compatible shim                                               */
/* ==================================================================== */

struct sonicStreamStruct {
  int sample_rate = 0;
  int channels = 1;
  float global_speed = 1.0f;
  float nonlinear = 0.0f;       // off by default (soniclib.c:117)
  float feedback = 0.1f;        // soniclib.c:122
  speedyStream speedy = nullptr;
  WsolaEngine* engine = nullptr;
  int buffer_size = 0;          // speedyInputFrameStep
  bool buffers_allocated = false;
  std::vector<float> pending;   // int16-valued interleaved samples
  long pending_base = 0;        // global sample index of pending[0]
  long write_total = 0;
  long speedy_frame = 0;        // speedyBufferFrameIndex
  long read_frame = 0;          // readBufferFrameIndex
  tensionFunction on_tension = nullptr;
  speedFunction on_speed = nullptr;
  featuresFunction on_features = nullptr;
  spectrogramFunction on_spectrogram = nullptr;
  spectrogramFunction on_normalized = nullptr;

  void frame_slice(long global_start, int count, std::vector<float>* out) {
    out->assign(static_cast<size_t>(count) * channels, 0.0f);
    long a = global_start - pending_base;
    for (int i = 0; i < count; i++) {
      long src = a + i;
      if (src >= 0 &&
          src < static_cast<long>(pending.size()) / channels) {
        for (int c = 0; c < channels; c++) {
          (*out)[static_cast<size_t>(i) * channels + c] =
              pending[src * channels + c];
        }
      }
    }
  }

  void trim_pending() {
    long keep = std::min(read_frame, speedy_frame) * buffer_size;
    long drop = keep - pending_base;
    if (drop > 0) {
      pending.erase(pending.begin(),
                    pending.begin() + drop * channels);
      pending_base = keep;
    }
  }
};

sonicStream sonicCreateStream(int sampleRate, int numChannels) {
  auto* st = new sonicStreamStruct();
  st->sample_rate = sampleRate;
  st->channels = numChannels;
  st->speedy = speedyCreateStream(sampleRate);
  st->engine = new WsolaEngine(sampleRate, numChannels);
  st->buffer_size = speedyInputFrameStep(st->speedy);
  return st;
}

void sonicDestroyStream(sonicStream st) {
  speedyDestroyStream(st->speedy);
  delete st->engine;
  delete st;
}

void sonicSetSpeed(sonicStream st, float speed) {
  st->global_speed = speed;
  st->engine->set_speed(speed);
}
void sonicSetRate(sonicStream st, float rate) { st->engine->set_rate(rate); }
void sonicEnableNonlinearSpeedup(sonicStream st, float f) { st->nonlinear = f; }
void sonicSetDurationFeedbackStrength(sonicStream st, float f) {
  st->feedback = f;
}
int getSonicBufferSize(sonicStream st) {
  return st->buffers_allocated ? st->buffer_size : 0;
}
int sonicSpectrogramSize(sonicStream st) { return speedyFFTSize(st->speedy); }
int sonicGetNumChannels(sonicStream st) { return st->channels; }
void sonicTensionCallback(sonicStream st, tensionFunction fn) {
  st->on_tension = fn;
}
void sonicSpeedCallback(sonicStream st, speedFunction fn) { st->on_speed = fn; }
void sonicFeaturesCallback(sonicStream st, featuresFunction fn) {
  st->on_features = fn;
}
void sonicSpectrogramCallback(sonicStream st, spectrogramFunction fn) {
  st->on_spectrogram = fn;
}
void sonicNormalizedSpectrogramCallback(sonicStream st, spectrogramFunction fn) {
  st->on_normalized = fn;
}
/* Getters (sonic2.h:106-124; see the header note on the speed getter's
 * reference-matching tensionFunction return type). */
tensionFunction getSonicTensionCallback(sonicStream st) {
  return st->on_tension;
}
tensionFunction getSonicSpeedCallback(sonicStream st) {
  return (tensionFunction)st->on_speed;
}
featuresFunction getSonicFeaturesCallback(sonicStream st) {
  return st->on_features;
}
spectrogramFunction getSonicSpectrogramCallback(sonicStream st) {
  return st->on_spectrogram;
}
spectrogramFunction getSonicNormalizedSpectrogramCallback(sonicStream st) {
  return st->on_normalized;
}

// Fire analysis/resynthesis for every trigger point reached
// (soniclib.c:427-450 semantics: frame k is sent to speedy once
// (k+1)*bufferSize + partial + 1 samples have arrived; AddData's at_time is
// the shim's writeBufferFrameIndex, one ahead of the content frame).
static void sonicPump(sonicStream st) {
  const int step = st->buffer_size;
  const int window = speedyInputFrameSize(st->speedy);
  const int full = window / step;
  const int partial = window - full * step;
  std::vector<float> frame, mono(window), buf;
  while (st->write_total >=
         (st->speedy_frame + full) * static_cast<long>(step) + partial + 1) {
    long k = st->speedy_frame;
    st->frame_slice(k * step, window, &frame);
    // Integer-average mixdown with C truncation (soniclib.c:271-274).
    for (int i = 0; i < window; i++) {
      long sum = 0;
      for (int c = 0; c < st->channels; c++) {
        sum += static_cast<long>(frame[static_cast<size_t>(i) * st->channels + c]);
      }
      mono[i] = static_cast<float>(sum / st->channels) / 32768.0f;
    }
    long at_time = k + full;
    speedyAddData(st->speedy, mono.data(), at_time);
    if (st->on_spectrogram) {
      st->on_spectrogram(st, static_cast<int>(at_time),
                         speedyGetSpectrogram(st->speedy));
    }
    if (st->on_normalized) {
      st->on_normalized(st, static_cast<int>(at_time),
                        speedyGetNormalizedSpectrogram(st->speedy));
    }
    st->speedy_frame++;
    float tension;
    if (speedyComputeTension(st->speedy, st->read_frame, &tension)) {
      if (st->on_tension) {
        st->on_tension(st, static_cast<int>(st->read_frame), tension);
      }
      if (st->on_features) {
        st->on_features(st, static_cast<int>(st->read_frame),
                        speedyGetInternalState(st->speedy));
      }
      float rate = speedyComputeSpeedFromTension(tension, st->global_speed,
                                                 st->feedback, st->speedy);
      rate = rate * st->nonlinear + st->global_speed * (1.0f - st->nonlinear);
      if (st->on_speed) {
        st->on_speed(st, static_cast<int>(st->read_frame), rate);
      }
      st->engine->set_speed(rate);
      st->frame_slice(st->read_frame * step, step, &buf);
      st->engine->write(buf.data(), step);
      st->read_frame++;
    }
  }
  st->trim_pending();
}

static int sonicWriteInternal(sonicStream st, const float* vals, int n) {
  // Callers pre-handle the nonlinear==0 short-circuit (with the engine's
  // +-1 sample scale); this path is the speedy-analysis route only.
  st->buffers_allocated = true;
  size_t old = st->pending.size();
  st->pending.resize(old + static_cast<size_t>(n) * st->channels);
  std::memcpy(st->pending.data() + old, vals, sizeof(float) * n * st->channels);
  st->write_total += n;
  sonicPump(st);
  return 1;
}

int sonicWriteShortToStream(sonicStream st, const int16_t* in, int n) {
  std::vector<float> vals(static_cast<size_t>(n) * st->channels);
  for (size_t i = 0; i < vals.size(); i++) vals[i] = in[i];
  if (st->nonlinear == 0.0f) {
    for (auto& v : vals) v /= 32768.0f;
    st->engine->write(vals.data(), n);
    return 1;
  }
  return sonicWriteInternal(st, vals.data(), n);
}

int sonicWriteFloatToStream(sonicStream st, const float* in, int n) {
  std::vector<float> vals(static_cast<size_t>(n) * st->channels);
  // soniclib.c:496: floats scaled by 32768 and truncated to short.
  for (size_t i = 0; i < vals.size(); i++) {
    vals[i] = std::trunc(in[i] * 32768.0f);
  }
  if (st->nonlinear == 0.0f) {
    for (auto& v : vals) v /= 32768.0f;
    st->engine->write(vals.data(), n);
    return 1;
  }
  return sonicWriteInternal(st, vals.data(), n);
}

int sonicReadShortFromStream(sonicStream st, int16_t* out, int bufferSize) {
  std::vector<float> vals(static_cast<size_t>(bufferSize) * st->channels);
  int n = st->engine->read(vals.data(), bufferSize);
  float scale = st->nonlinear == 0.0f ? 32768.0f : 1.0f;
  for (int i = 0; i < n * st->channels; i++) {
    float v = std::lround(vals[i] * scale);
    out[i] = static_cast<int16_t>(std::max(-32768.0f, std::min(32767.0f, v)));
  }
  return n;
}

int sonicReadFloatFromStream(sonicStream st, float* out, int bufferSize) {
  std::vector<float> vals(static_cast<size_t>(bufferSize) * st->channels);
  int n = st->engine->read(vals.data(), bufferSize);
  float scale = st->nonlinear == 0.0f ? 1.0f : (1.0f / 32768.0f);
  for (int i = 0; i < n * st->channels; i++) out[i] = vals[i] * scale;
  return n;
}

int sonicSamplesAvailable(sonicStream st) { return st->engine->available(); }

int sonicFlushStream(sonicStream st) {
  if (st->nonlinear != 0.0f) {
    const int step = st->buffer_size;
    long total_frames = (st->write_total + step - 1) / step;
    std::vector<float> buf;
    while (st->read_frame < total_frames) {
      int count = step;
      if ((st->read_frame + 1) * step > st->write_total) {
        count = static_cast<int>(st->write_total - st->read_frame * step);
      }
      st->frame_slice(st->read_frame * step, count, &buf);
      st->engine->write(buf.data(), count);
      st->read_frame++;
    }
  }
  st->engine->flush();
  return 1;
}

/* ==================================================================== */
/* WAV I/O                                                              */
/* ==================================================================== */

struct waveFileStruct {
  FILE* fp = nullptr;
  bool writing = false;
  int channels = 1;
  int sample_rate = 0;
  long data_remaining = 0;  // bytes (reading)
  long data_written = 0;    // bytes (writing)
};

static uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
static uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }

waveFile openInputWaveFile(const char* name, int* sampleRate, int* numChannels) {
  FILE* fp = std::fopen(name, "rb");
  if (!fp) return nullptr;
  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, fp) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(fp);
    return nullptr;
  }
  auto* wf = new waveFileStruct();
  wf->fp = fp;
  bool have_fmt = false;
  while (true) {
    uint8_t ch[8];
    if (std::fread(ch, 1, 8, fp) != 8) break;
    uint32_t sz = rd32(ch + 4);
    if (!std::memcmp(ch, "fmt ", 4)) {
      std::vector<uint8_t> body(sz);
      if (std::fread(body.data(), 1, sz, fp) != sz) break;
      wf->channels = rd16(body.data() + 2);
      wf->sample_rate = rd32(body.data() + 4);
      have_fmt = true;
      if (sz & 1) std::fseek(fp, 1, SEEK_CUR);
    } else if (!std::memcmp(ch, "data", 4)) {
      wf->data_remaining = sz;
      break;
    } else {
      std::fseek(fp, sz + (sz & 1), SEEK_CUR);
    }
  }
  if (!have_fmt || wf->data_remaining <= 0) {
    std::fclose(fp);
    delete wf;
    return nullptr;
  }
  *sampleRate = wf->sample_rate;
  *numChannels = wf->channels;
  return wf;
}

waveFile openOutputWaveFile(const char* name, int sampleRate, int numChannels) {
  FILE* fp = std::fopen(name, "wb");
  if (!fp) return nullptr;
  auto* wf = new waveFileStruct();
  wf->fp = fp;
  wf->writing = true;
  wf->channels = numChannels;
  wf->sample_rate = sampleRate;
  uint8_t hdr[44] = {0};
  std::memcpy(hdr, "RIFF", 4);
  std::memcpy(hdr + 8, "WAVEfmt ", 8);
  hdr[16] = 16;
  hdr[20] = 1;  // PCM
  hdr[22] = static_cast<uint8_t>(numChannels);
  uint32_t sr = sampleRate, br = sampleRate * numChannels * 2;
  std::memcpy(hdr + 24, &sr, 4);
  std::memcpy(hdr + 28, &br, 4);
  hdr[32] = static_cast<uint8_t>(numChannels * 2);
  hdr[34] = 16;
  std::memcpy(hdr + 36, "data", 4);
  std::fwrite(hdr, 1, 44, fp);
  return wf;
}

int readFromWaveFile(waveFile wf, int16_t* buffer, int maxSamples) {
  long want = static_cast<long>(maxSamples) * wf->channels * 2;
  want = std::min(want, wf->data_remaining);
  long got = static_cast<long>(std::fread(buffer, 1, want, wf->fp));
  wf->data_remaining -= got;
  return static_cast<int>(got / 2 / wf->channels) * wf->channels;
}

int writeToWaveFile(waveFile wf, const int16_t* buffer, int numSamples) {
  long bytes = static_cast<long>(numSamples) * wf->channels * 2;
  wf->data_written += std::fwrite(buffer, 1, bytes, wf->fp);
  return numSamples;
}

void closeWaveFile(waveFile wf) {
  if (wf->writing) {
    uint32_t riff = static_cast<uint32_t>(36 + wf->data_written);
    uint32_t data = static_cast<uint32_t>(wf->data_written);
    std::fseek(wf->fp, 4, SEEK_SET);
    std::fwrite(&riff, 4, 1, wf->fp);
    std::fseek(wf->fp, 40, SEEK_SET);
    std::fwrite(&data, 4, 1, wf->fp);
  }
  std::fclose(wf->fp);
  delete wf;
}
