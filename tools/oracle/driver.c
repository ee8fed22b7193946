/* Golden-oracle driver: stream float32 raw audio through the REFERENCE
 * speedy.c (compiled with the exact-DFT kiss_fft.h shim in this
 * directory) using exactly the golden-test harness framing of
 * /root/reference/speedy_test.cc:890-935 — float step sampleRate/100,
 * frame start round(t * step), speedyAddData per frame, tension polled
 * per output time — and dump:
 *   features file:    one row per tension frame: 15 feature floats
 *                     (speedyGetInternalState layout, speedy.c:106-124)
 *                     then the returned tension.
 *   spectrogram file: one row per INPUT frame: fft_size/2 magnitudes.
 *
 * Usage: oracle <raw_f32_file> <sample_rate> <features_out> <spec_out>
 *
 * Built and checked against the in-tree expectations by
 * tools/oracle/run_oracle.py (VERDICT r1 item 6: the oracle recipe is
 * vendored, mechanically reproducible, and hash-pinned).
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "speedy.h"

int main(int argc, char **argv) {
  if (argc != 5) {
    fprintf(stderr,
            "usage: %s <raw_f32_file> <sample_rate> <features_out> "
            "<spectrogram_out>\n",
            argv[0]);
    return 2;
  }
  FILE *fin = fopen(argv[1], "rb");
  if (!fin) {
    perror("input");
    return 1;
  }
  fseek(fin, 0, SEEK_END);
  long bytes = ftell(fin);
  fseek(fin, 0, SEEK_SET);
  long n = bytes / (long)sizeof(float);
  float *x = (float *)malloc((size_t)bytes);
  if (fread(x, sizeof(float), (size_t)n, fin) != (size_t)n) {
    fprintf(stderr, "short read\n");
    return 1;
  }
  fclose(fin);

  int sample_rate = atoi(argv[2]);
  speedyStream stream = speedyCreateStream(sample_rate);
  if (!stream) {
    fprintf(stderr, "speedyCreateStream failed\n");
    return 1;
  }
  const int window_size = speedyInputFrameSize(stream);
  const int fft_size = speedyFFTSize(stream);
  const float step = sample_rate / 100.0f; /* speedy_test.cc:893 */
  const int frame_count = (int)((n - window_size) / step + 1);

  FILE *ffeat = fopen(argv[3], "w");
  FILE *fspec = fopen(argv[4], "w");
  if (!ffeat || !fspec) {
    perror("output");
    return 1;
  }

  int output_time = 0;
  for (int input_time = 0; input_time < frame_count; input_time++) {
    int input_start = (int)lroundf(input_time * step);
    float new_tension;
    speedyAddData(stream, &x[input_start], input_time);
    float *spec = speedyGetSpectrogram(stream);
    for (int i = 0; i < fft_size / 2; i++) {
      fprintf(fspec, "%s%.9g", i ? " " : "", spec[i]);
    }
    fprintf(fspec, "\n");
    if (speedyComputeTension(stream, output_time, &new_tension)) {
      float *feat = speedyGetInternalState(stream);
      for (int i = 0; i < kFeatureValueCount; i++) {
        fprintf(ffeat, "%.9g ", feat[i]);
      }
      fprintf(ffeat, "%.9g\n", new_tension);
      output_time++;
    }
  }
  fprintf(stderr, "oracle: %d input frames, %d tension frames\n", frame_count,
          output_time);
  fclose(ffeat);
  fclose(fspec);
  speedyDestroyStream(stream);
  free(x);
  return 0;
}
