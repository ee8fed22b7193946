/* Exact-DFT stand-in for the KissFFT API surface that the reference
 * speedy.c consumes when built with -DKISS_FFT (/root/reference/speedy.c:
 * 39-43,143-151,222-232,268-278,305-314,433-454).
 *
 * This is NOT KissFFT: it is an original O(N^2) direct DFT evaluated in
 * double precision, so the oracle's spectrogram carries no FFT rounding
 * at all. Its purpose (tools/oracle/run_oracle.py) is to pin the golden
 * feature gates of tests/test_golden.py: the shipped feature-8 threshold
 * (2300, speedy_test.cc:1014) includes KissFFT-float32 rounding luck —
 * the exact-DFT C reference itself lands at ~2291.9, which is why the
 * rebuild gates at 2200.
 *
 * The reference frees the plan with a bare free() and type-puns nothing,
 * so the cfg is a single malloc'd struct.
 */
#ifndef SPEEDY_ORACLE_KISS_FFT_H_
#define SPEEDY_ORACLE_KISS_FFT_H_

#include <math.h>
#include <stdlib.h>

typedef struct {
  float r;
  float i;
} kiss_fft_cpx;

typedef struct speedy_oracle_fft_state {
  int nfft;
  int inverse;
} *kiss_fft_cfg;

static kiss_fft_cfg kiss_fft_alloc(int nfft, int inverse_fft, void *mem,
                                   size_t *lenmem) {
  kiss_fft_cfg cfg;
  (void)mem;
  (void)lenmem;
  cfg = (kiss_fft_cfg)malloc(sizeof(*cfg));
  if (cfg) {
    cfg->nfft = nfft;
    cfg->inverse = inverse_fft;
  }
  return cfg;
}

/* Direct complex DFT, double accumulation:
 *   X[k] = sum_n x[n] * exp(-+ 2*pi*i*n*k / N)   (sign per cfg->inverse)
 */
static void kiss_fft(kiss_fft_cfg cfg, const kiss_fft_cpx *fin,
                     kiss_fft_cpx *fout) {
  const int n = cfg->nfft;
  const double sign = cfg->inverse ? 1.0 : -1.0;
  const double w0 = sign * 2.0 * M_PI / (double)n;
  int k, t;
  for (k = 0; k < n; k++) {
    double accr = 0.0, acci = 0.0;
    for (t = 0; t < n; t++) {
      const double ang = w0 * (double)((long long)k * t % n);
      const double c = cos(ang), s = sin(ang);
      accr += fin[t].r * c - fin[t].i * s;
      acci += fin[t].r * s + fin[t].i * c;
    }
    fout[k].r = (float)accr;
    fout[k].i = (float)acci;
  }
}

static void kiss_fft_cleanup(void) {}

#endif /* SPEEDY_ORACLE_KISS_FFT_H_ */
