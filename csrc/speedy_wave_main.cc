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

// Compress input_file at the given parameters; returns achieved ratio.
static double compress_sound(const std::string& input_file, float speed,
                             float nonlinear, float feedback,
                             const std::string& output_file) {
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
  if (tension_fp) sonicTensionCallback(st, saveTension);
  if (speed_fp) sonicSpeedCallback(st, saveSpeed);
  if (features_fp) sonicFeaturesCallback(st, saveFeatures);

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
  int match_nonlinear = 0;
  static struct option long_options[] = {
      {"match_nonlinear", no_argument, &match_nonlinear, 1},
      {"linear", no_argument, nullptr, 'l'},
      {"input", required_argument, nullptr, 'i'},
      {"output", required_argument, nullptr, 'o'},
      {"speed", required_argument, nullptr, 's'},
      {"nonlinear", required_argument, nullptr, 'n'},
      {"duration_feedback_strength", required_argument, nullptr, 'd'},
      {"tension_file", required_argument, nullptr, 't'},
      {"speed_file", required_argument, nullptr, 'p'},
      {"features_file", required_argument, nullptr, 'f'},
      {nullptr, 0, nullptr, 0}};
  int c, idx = 0;
  while ((c = getopt_long(argc, argv, "li:o:s:n:d:t:p:f:", long_options,
                          &idx)) != -1) {
    switch (c) {
      case 0: break;
      case 'l': nonlinear = 0.0f; break;
      case 'i': input_file = optarg; break;
      case 'o': output_file = optarg; break;
      case 's': speed = std::strtof(optarg, nullptr); break;
      case 'n': nonlinear = std::strtof(optarg, nullptr); break;
      case 'd': feedback = std::strtof(optarg, nullptr); break;
      case 't': tension_fp = std::fopen(optarg, "w"); break;
      case 'p': speed_fp = std::fopen(optarg, "w"); break;
      case 'f': features_fp = std::fopen(optarg, "w"); break;
      default:
        std::fprintf(stderr,
                     "Usage: %s --input in.wav --output out.wav [--speed 3.0] "
                     "[--nonlinear 1.0 | --linear] [--match_nonlinear] ...\n",
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
  }
  double achieved =
      compress_sound(input_file, speed, nonlinear, feedback, output_file);
  std::printf("Achieved overall compression: %gx\n", achieved);
  if (tension_fp) std::fclose(tension_fp);
  if (speed_fp) std::fclose(speed_fp);
  if (features_fp) std::fclose(features_fp);
  return 0;
}
