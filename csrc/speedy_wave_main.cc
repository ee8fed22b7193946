//  Native speedy_wave CLI: WAV in -> time-compressed WAV out, using the
//  speedy_tpu native runtime (the C++ counterpart of speedy_tpu/cli.py;
//  flag surface follows speedy_wave.cc:257-277).

#include <getopt.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "speedy_native.h"

static FILE* tension_fp = nullptr;
static FILE* speed_fp = nullptr;
static FILE* features_fp = nullptr;
static FILE* spectrogram_fp = nullptr;
static FILE* normalized_spectrogram_fp = nullptr;

static void saveTension(sonicStream, int, float t) {
  std::fprintf(tension_fp, "%g\n", t);
}
static void saveSpeed(sonicStream, int, float v) {
  std::fprintf(speed_fp, "%g\n", v);
}
static void saveFeatures(sonicStream, int, float* f) {
  for (int i = 0; i < kFeatureValueCount; i++) {
    std::fprintf(features_fp, "%g ", f[i]);
  }
  std::fprintf(features_fp, "\n");
}
static void saveSpectrogram(sonicStream st, int, float* v) {
  int size = sonicSpectrogramSize(st);
  for (int i = 0; i < size; i++) std::fprintf(spectrogram_fp, "%g ", v[i]);
  std::fprintf(spectrogram_fp, "\n");
}
static void saveNormalizedSpectrogram(sonicStream st, int, float* v) {
  // Only fft_size/2 normalized bins are ever computed
  // (speedy.c:675-678 normalizes fft_size/2 values); the reference CLI
  // dumps the full fft_size including the never-written upper half of a
  // malloc'd buffer (speedy_wave.cc:113-121). Dump the defined half,
  // matching speedy_tpu/cli.py.
  int size = sonicSpectrogramSize(st) / 2;
  for (int i = 0; i < size; i++) {
    std::fprintf(normalized_spectrogram_fp, "%g ", v[i]);
  }
  std::fprintf(normalized_spectrogram_fp, "\n");
}

// Total frames (multi-channel samples) in a wave file, for --length
// two-pass targeting (speedy_wave.cc:428-447 counts the same way).
static long count_wave_frames(const std::string& input_file,
                              int* sample_rate) {
  int numChannels = 0;
  waveFile in = openInputWaveFile(input_file.c_str(), sample_rate,
                                  &numChannels);
  if (!in) {
    std::fprintf(stderr, "Can't open %s\n", input_file.c_str());
    std::exit(1);
  }
  const int kChunk = 1000;
  std::vector<int16_t> buf(static_cast<size_t>(kChunk) * numChannels);
  long total = 0;
  int shorts;
  while ((shorts = readFromWaveFile(in, buf.data(), kChunk)) > 0) {
    total += shorts / numChannels;
  }
  closeWaveFile(in);
  return total;
}

// Compress input_file at the given parameters; returns achieved ratio.
// Dump callbacks register only when register_dumps is set — like the
// Python CLI, measurement prepasses (--match_nonlinear / --length) stay
// silent and only the final pass writes the dump files.
static double compress_sound(const std::string& input_file, float speed,
                             float nonlinear, float feedback,
                             const std::string& output_file,
                             bool register_dumps = false) {
  int sampleRate = 0, numChannels = 0;
  waveFile in = openInputWaveFile(input_file.c_str(), &sampleRate, &numChannels);
  if (!in) {
    std::fprintf(stderr, "Can't open %s\n", input_file.c_str());
    std::exit(1);
  }
  waveFile out = nullptr;
  if (!output_file.empty()) {
    out = openOutputWaveFile(output_file.c_str(), sampleRate, numChannels);
    if (!out) {
      std::fprintf(stderr, "Can't create %s\n", output_file.c_str());
      std::exit(1);
    }
  }
  sonicStream st = sonicCreateStream(sampleRate, numChannels);
  sonicSetSpeed(st, speed);
  sonicEnableNonlinearSpeedup(st, nonlinear);
  sonicSetDurationFeedbackStrength(st, feedback);
  if (register_dumps) {
    if (tension_fp) sonicTensionCallback(st, saveTension);
    if (speed_fp) sonicSpeedCallback(st, saveSpeed);
    if (features_fp) sonicFeaturesCallback(st, saveFeatures);
    if (spectrogram_fp) sonicSpectrogramCallback(st, saveSpectrogram);
    if (normalized_spectrogram_fp) {
      sonicNormalizedSpectrogramCallback(st, saveNormalizedSpectrogram);
    }
  }

  const int kChunk = 1000;
  std::vector<int16_t> inBuf(static_cast<size_t>(kChunk) * numChannels);
  std::vector<int16_t> outBuf(static_cast<size_t>(kChunk) * numChannels);
  long total_in = 0, total_out = 0;
  int shorts;
  while ((shorts = readFromWaveFile(in, inBuf.data(), kChunk)) > 0) {
    int frames = shorts / numChannels;
    total_in += frames;
    sonicWriteShortToStream(st, inBuf.data(), frames);
    int got;
    while ((got = sonicReadShortFromStream(st, outBuf.data(), kChunk)) > 0) {
      total_out += got;
      if (out) writeToWaveFile(out, outBuf.data(), got);
    }
  }
  sonicFlushStream(st);
  int got;
  while ((got = sonicReadShortFromStream(st, outBuf.data(), kChunk)) > 0) {
    total_out += got;
    if (out) writeToWaveFile(out, outBuf.data(), got);
  }
  sonicDestroyStream(st);
  closeWaveFile(in);
  if (out) closeWaveFile(out);
  return static_cast<double>(total_in) / (total_out > 0 ? total_out : 1);
}

int main(int argc, char** argv) {
  std::string input_file, output_file;
  float speed = 3.0f, nonlinear = 1.0f, feedback = 0.1f;
  float desired_length = 0.0f;
  int match_nonlinear = 0;
  static struct option long_options[] = {
      {"match_nonlinear", no_argument, &match_nonlinear, 1},
      {"linear", no_argument, nullptr, 'l'},
      {"input", required_argument, nullptr, 'i'},
      {"output", required_argument, nullptr, 'o'},
      {"speed", required_argument, nullptr, 's'},
      {"nonlinear", required_argument, nullptr, 'n'},
      {"length", required_argument, nullptr, 'e'},
      {"duration_feedback_strength", required_argument, nullptr, 'd'},
      {"tension_file", required_argument, nullptr, 't'},
      {"speed_file", required_argument, nullptr, 'p'},
      {"features_file", required_argument, nullptr, 'f'},
      {"spectrogram_file", required_argument, nullptr, 'S'},
      {"normalized_spectrogram_file", required_argument, nullptr, 'N'},
      {nullptr, 0, nullptr, 0}};
  int c, idx = 0;
  while ((c = getopt_long(argc, argv, "li:o:s:n:e:d:t:p:f:S:N:", long_options,
                          &idx)) != -1) {
    switch (c) {
      case 0: break;
      case 'l': nonlinear = 0.0f; break;
      case 'i': input_file = optarg; break;
      case 'o': output_file = optarg; break;
      case 's': speed = std::strtof(optarg, nullptr); break;
      case 'n': nonlinear = std::strtof(optarg, nullptr); break;
      case 'e': desired_length = std::strtof(optarg, nullptr); break;
      case 'd': feedback = std::strtof(optarg, nullptr); break;
      case 't': tension_fp = std::fopen(optarg, "w"); break;
      case 'p': speed_fp = std::fopen(optarg, "w"); break;
      case 'f': features_fp = std::fopen(optarg, "w"); break;
      case 'S': spectrogram_fp = std::fopen(optarg, "w"); break;
      case 'N': normalized_spectrogram_fp = std::fopen(optarg, "w"); break;
      default:
        std::fprintf(stderr,
                     "Usage: %s --input in.wav --output out.wav [--speed 3.0] "
                     "[--nonlinear 1.0 | --linear] [--match_nonlinear] "
                     "[--length SECONDS] [--tension_file F] [--speed_file F] "
                     "[--features_file F] [--spectrogram_file F] "
                     "[--normalized_spectrogram_file F] ...\n",
                     argv[0]);
        return 1;
    }
  }
  if (input_file.empty() || output_file.empty()) {
    std::fprintf(stderr, "%s: must give --input and --output\n", argv[0]);
    return 1;
  }
  if (match_nonlinear) {
    speed = static_cast<float>(
        compress_sound(input_file, speed, 1.0f, feedback, ""));
    std::printf("Nonlinear run achieved %gx; matching it linearly.\n", speed);
  } else if (desired_length > 0.0f) {
    // Two-pass duration targeting (speedy_wave.cc:428-462 semantics,
    // matching speedy_tpu/cli.py): measure the achieved rate at the
    // naive speed, then rescale by the shortfall ratio.
    int sample_rate = 0;
    long frames = count_wave_frames(input_file, &sample_rate);
    double input_seconds = static_cast<double>(frames) / sample_rate;
    double desired_speed = input_seconds / desired_length;
    double achieved_pre = compress_sound(
        input_file, static_cast<float>(desired_speed), 1.0f, feedback, "");
    speed = static_cast<float>(desired_speed * (desired_speed / achieved_pre));
    std::printf(
        "Targeting %gs: first pass at %gx achieved %gx; using %gx.\n",
        desired_length, desired_speed, achieved_pre, speed);
  }
  double achieved = compress_sound(input_file, speed, nonlinear, feedback,
                                   output_file, /*register_dumps=*/true);
  std::printf("Achieved overall compression: %gx\n", achieved);
  if (tension_fp) std::fclose(tension_fp);
  if (speed_fp) std::fclose(speed_fp);
  if (features_fp) std::fclose(features_fp);
  if (spectrogram_fp) std::fclose(spectrogram_fp);
  if (normalized_spectrogram_fp) std::fclose(normalized_spectrogram_fp);
  return 0;
}
