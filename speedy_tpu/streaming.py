"""Streaming (chunked) API with sonic2-shim semantics — component C14-C18.

The reference's soniclib.c is a sample-serial C shim between user writes and
the WSOLA engine, with Speedy analysis riding on frame buffers. This module
provides the same contract for host-side streaming use:

  * `SonicStream` — drop-in behavioral equivalent of the sonic2 API
    (sonicCreateStream/Write/Read/Flush/EnableNonlinearSpeedup/
    SetDurationFeedbackStrength + the five monitoring callbacks).
  * `SpeedyFrontEndStream` — per-frame incremental analysis with the exact
    C state machine (the streaming counterpart of ops.analysis.analyze).
  * `WsolaStream` — incremental WSOLA with the same skip/insert algebra as
    ops.wsola (the streaming counterpart of the batched scan).

Faithfulness notes (verified against soniclib.c):
  * Frame k's mono analysis window is samples [k·step, k·step + window).
  * The shim calls speedyAddDataShort with at_time = writeBufferFrameIndex,
    which is k+1 for content frame k (soniclib.c:295-296 fires when the
    write pointer is one buffer ahead) — so tension(0) reads a still-zero
    spectrogram slot and is skipped as low-energy, and tension(r) is
    computed from content frame r-1. We replicate this 1-frame shift
    exactly so callback traces match the C shim.
  * Channel mixdown is integer averaging with C truncation
    (soniclib.c:271-274).
  * Flush drains pending frames at the last computed speed then flushes
    the engine (soniclib.c:529-552).

The heavy per-frame math (DFT) uses the same precomputed matrices as the
batched path; throughput work belongs on the batched/pjit path, this class
exists for API compatibility and latency-shaped (real-time) use.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import numpy as np

from . import config as C
from .config import SpeedyConfig
from .ops import dft


class SpeedyFrontEndStream:
    """Incremental Speedy analysis: the C speedyStream state machine
    (speedy.c:130-176) on numpy float32."""

    def __init__(self, sample_rate: int, match_matlab: bool = True):
        self.cfg = SpeedyConfig(sample_rate, match_matlab)
        cfg = self.cfg
        w = cfg.window_size
        self._win = dft.hamming_window(w, "float32")
        self._cos, self._sin = dft.dft_matrices(w, "float32")
        self.current_time = -1
        self.preemph_state = np.float32(0.0)
        self._alpha = np.float32(cfg.lpf_alpha)
        self.energy_lp_state = np.float32(C.MEAN_SPECTROGRAM_ENERGY)
        self.diff_lp_state = np.float32(C.MEAN_EMPHASIS_WEIGHTED_LOCAL_DIFFERENCE)
        self.skip_frame_count = 1  # speedy.c:293
        hist = cfg.hysteresis_future + cfg.hysteresis_past + 1
        self._spec_ring = np.zeros((hist, w + 1), np.float32)
        self._hyst_ring = np.zeros(2 * hist, np.float32)
        self.features = np.zeros(C.FEATURE_COUNT, np.float32)
        self.spectrogram = np.zeros(w + 1, np.float32)
        self.normalized = np.zeros(w, np.float32)
        # Duration-feedback integrator (speedy.c:768-788).
        self.current_duration = np.float32(0.0)
        self.desired_duration = np.float32(0.0)

    # -- ring helpers (modulo semantics of speedy.c:195-200) --
    def _spec_at(self, t: int) -> np.ndarray:
        return self._spec_ring[t % self._spec_ring.shape[0]]

    def _hyst_at(self, t: int) -> np.float32:
        return self._hyst_ring[t % self._hyst_ring.shape[0]]

    def input_frame_size(self) -> int:
        return self.cfg.window_size

    def input_frame_step(self) -> int:
        return self.cfg.frame_step_int

    def _lpf_energy(self, x):
        self.energy_lp_state = (1 - self._alpha) * np.float32(x) + self._alpha * self.energy_lp_state
        return self.energy_lp_state

    def _lpf_diff(self, x):
        self.diff_lp_state = (1 - self._alpha) * np.float32(x) + self._alpha * self.diff_lp_state
        return self.diff_lp_state

    # -- white-box API (speedy.h:61-121), same decomposition as the C --

    def get_current_time(self) -> int:
        """speedyGetCurrentTime (speedy.c:741-744)."""
        return self.current_time

    def fft_size(self) -> int:
        """speedyFFTSize (speedy.c:340-343)."""
        return self.cfg.fft_size

    def bin_to_freq(self, bin_number: int) -> float:
        """speedyBinToFreq (speedy.c:345-348)."""
        return self.cfg.bin_to_freq(bin_number)

    def freq_to_bin(self, freq: float) -> int:
        """speedyFreqToBin (speedy.c:350-353)."""
        return self.cfg.freq_to_bin(freq)

    def preemphasis_filter(self, x: np.ndarray) -> np.ndarray:
        """speedyPreemphasisFilter (speedy.c:416-427): filter([1 -.97], 1, x)
        with persistent cross-call state. Returns a filtered copy (the C
        filters in place)."""
        buf = np.asarray(x, np.float32).copy()
        if buf.size == 0:
            return buf
        last = buf[-1]
        shifted = np.concatenate([[self.preemph_state], buf[:-1]])
        buf -= np.float32(C.PREEMPHASIS_COEF) * shifted
        self.preemph_state = np.float32(last)
        return buf

    def _mirror_full(self, half: np.ndarray) -> np.ndarray:
        """Expand the stored [half_fft+1] unique bins to the reference's
        full fft_size magnitude array (conjugate-symmetric mirror)."""
        return np.concatenate([half, half[-2:0:-1]]).astype(np.float32)

    def compute_spectrogram(self, x: np.ndarray) -> np.ndarray:
        """speedySpectrogram (speedy.c:437-473): Hamming window + zero-pad to
        fft_size + magnitude. Input is the (already preemphasized) analysis
        window; returns the full [fft_size] magnitude like the C (we store
        the unique half internally — the rest is its mirror)."""
        fw = np.asarray(x, np.float32) * self._win
        re = fw @ self._cos
        im = fw @ self._sin
        spec = np.sqrt(re * re + im * im).astype(np.float32)
        self.spectrogram = spec
        return self._mirror_full(spec)

    def save_spectrogram_data(self, spectrogram: np.ndarray, at_time: int) -> None:
        """speedySaveSpectrogramData (speedy.c:476-483). Accepts the full
        [fft_size] array or the unique [half_fft+1] bins; stores the half."""
        spec = np.asarray(spectrogram, np.float32)
        half = self._spec_ring.shape[1]
        self._spec_ring[at_time % self._spec_ring.shape[0]] = spec[:half]

    def get_spectrogram_at_time(self, at_time: int) -> np.ndarray:
        """speedyGetSpectrogramAtTime (speedy.c:485-487), mirrored to full
        fft_size like the C history rows."""
        return self._mirror_full(self._spec_at(at_time))

    def add_to_hysteresis_buffer(self, value: float, at_time: int) -> None:
        """speedyAddToHysteresisBuffer (speedy.c:615-620)."""
        self._hyst_ring[at_time % self._hyst_ring.shape[0]] = np.float32(value)

    def compute_local_energy(self, at_time: int) -> None:
        """speedyComputeLocalEnergy (speedy.c:510-523): frame energy over
        bins [1, fft_size/2), 1-second LPF, ratio, sqrt-compress (clamped at
        sqrt(2)), then push to the hysteresis ring. NOTE: like the C, this
        reads the stream's own last-computed spectrogram (speedy.c:515 uses
        stream->spectrogram regardless of its argument)."""
        cfg = self.cfg
        spec = self.spectrogram
        energy = np.float32(np.sum(spec[1 : cfg.half_fft] ** 2, dtype=np.float32))
        lp = self._lpf_energy(energy)
        local = energy / lp
        compressed = np.float32(math.sqrt(min(2.0, local)))
        self.add_to_hysteresis_buffer(compressed, at_time)
        f = self.features
        f[C.F_ENERGY_LP] = lp
        f[C.F_ENERGY_LOCAL] = local
        f[C.F_ENERGY_COMPRESSED] = compressed
        f[C.F_TIME_ENERGY] = at_time

    @staticmethod
    def normalize_by_energy(spectrogram: np.ndarray) -> tuple:
        """speedyNormalizeByEnergy (speedy.c:628-647): returns
        (frame_energy_excluding_DC, spectrogram/(sqrt(energy)+eps))."""
        spec = np.asarray(spectrogram, np.float32)
        energy = np.float32(np.sum(spec[1:] ** 2, dtype=np.float32))
        norm = spec / (np.float32(math.sqrt(energy)) + np.float32(C.EPS))
        return energy, norm.astype(np.float32)

    def get_spectrogram(self) -> np.ndarray:
        """speedyGetSpectrogram / speedyGetInternalSpectrogram
        (speedy.c:355-358,393-396), mirrored to full fft_size."""
        return self._mirror_full(self.spectrogram)

    def get_normalized_spectrogram(self) -> np.ndarray:
        """speedyGetNormalizedSpectrogram (speedy.c:360-363): the
        [fft_size/2] normalized slice from the last tension computation."""
        return self.normalized

    def get_internal_state(self) -> np.ndarray:
        """speedyGetInternalState (speedy.c:388-391): the 15-feature vector
        (kFeatureValueCount, legend at speedy.c:365-386)."""
        return self.features

    def get_energy_compressed(self) -> float:
        """speedyGetEnergyCompressed (speedy.c:525-527)."""
        return float(self.features[C.F_ENERGY_COMPRESSED])

    def get_speech_changes(self) -> float:
        """speedyGetSpeechChanges (speedy.c:737-739)."""
        return float(self.features[C.F_SPEECH_CHANGES])

    def add_data(self, frame: np.ndarray, at_time: int) -> np.ndarray:
        """speedyAddData (speedy.c:540-551) — same call graph as the C:
        preemphasis -> spectrogram -> save to history -> local energy.
        `frame` float32 [window]; returns the stored [half_fft+1] bins."""
        buf = self.preemphasis_filter(frame)
        self.compute_spectrogram(buf)
        spec = self.spectrogram
        self.save_spectrogram_data(spec, at_time)
        self.compute_local_energy(at_time)
        self.current_time = at_time
        return spec

    def add_data_short(self, frame: np.ndarray, at_time: int) -> np.ndarray:
        return self.add_data(np.asarray(frame, np.float32) / 32768.0, at_time)

    def evaluate_hysteresis(self, at_time: int) -> float:
        """speedyEvaluateHysteresis (speedy.c:590-610)."""
        cfg = self.cfg
        fut, past = cfg.hysteresis_future, cfg.hysteresis_past
        future_max = 0.0
        for i in range(fut + 1):
            v = self._hyst_at(at_time + i) * (fut - i) / float(fut)
            future_max = max(future_max, v)
        past_max = 0.0
        for i in range(past + 1):
            v = self._hyst_at(at_time - i) * (past - i) / float(past)
            past_max = max(past_max, v)
        return (past_max + future_max) / 2.0

    def compute_spectral_difference(
        self, spectrogram: np.ndarray, last_spectrogram: np.ndarray, at_time: int
    ) -> None:
        """speedyComputeSpectralDifference (speedy.c:664-729): hysteresis,
        normalized frame energies, the low-energy skip gate, and the
        log-ratio spectral difference chain. Inputs are [half_fft] magnitude
        slices (the C passes fft_size rows but only reads fft_size/2)."""
        cfg = self.cfg
        f = self.features
        eps = np.float32(C.EPS)
        cur = np.asarray(spectrogram, np.float32)[: cfg.half_fft]
        last = np.asarray(last_spectrogram, np.float32)[: cfg.half_fft]
        hyst = np.float32(self.evaluate_hysteresis(at_time))
        energy, self.normalized = self.normalize_by_energy(cur)
        _, norm_last = self.normalize_by_energy(last)
        f[C.F_ENERGY_HYSTERESIS] = hyst
        f[C.F_SPECTROGRAM_ENERGY] = energy
        f[C.F_LOW_ENERGY_THRESHOLD] = cfg.low_energy_threshold
        low = energy <= np.float32(cfg.low_energy_threshold)
        f[C.F_LOW_ENERGY_FRAME] = float(low)
        f[C.F_TIME_SPECTRAL] = at_time
        if low:
            self.skip_frame_count = 1
        if self.skip_frame_count > 0:
            self.skip_frame_count -= 1
            f[C.F_LOW_ENERGY_FRAME] = 1.0
            f[C.F_LOCAL_SPECTRAL_DIFFERENCE] = 0.0
            f[C.F_EMPHASIS_WEIGHTED_LOCAL_DIFFERENCE] = 0.0
            f[C.F_RELATIVE_SPECTRAL_DIFFERENCE] = 0.0
            f[C.F_SPEECH_CHANGES] = 0.0
            f[C.F_EMPHASIS_WEIGHTED_LPF] = self._lpf_diff(0.0)
        else:
            self.skip_frame_count = 0
            thresh = np.float32(np.max(cur[1:]) / 100.0)
            mask = (cur[1:] > thresh) & (last[1:] > thresh)
            ratio = (self.normalized[1:] + eps) / (norm_last[1:] + eps)
            lsd = np.float32(np.sum(np.abs(np.log(ratio))[mask], dtype=np.float32))
            ewld = lsd * hyst
            lpf = self._lpf_diff(ewld)
            rsd = ewld / (lpf + np.float32(0.01 * C.MEAN_EMPHASIS_WEIGHTED_LPF))
            changes = min(rsd, np.float32(cfg.speech_changes_clamp))
            f[C.F_LOCAL_SPECTRAL_DIFFERENCE] = lsd
            f[C.F_EMPHASIS_WEIGHTED_LOCAL_DIFFERENCE] = ewld
            f[C.F_EMPHASIS_WEIGHTED_LPF] = lpf
            f[C.F_RELATIVE_SPECTRAL_DIFFERENCE] = rsd
            f[C.F_SPEECH_CHANGES] = changes

    def compute_tension(self, at_time: int) -> Optional[float]:
        """speedyComputeTension (speedy.c:752-766): None if not enough
        lookahead yet, else the tension (features vector updated). Same
        call graph as the C: spectral difference then the affine law."""
        cfg = self.cfg
        if at_time + cfg.hysteresis_future > self.current_time:
            return None
        f = self.features
        cur = self._spec_at(at_time)
        last = self._spec_at(at_time - 1)
        self.compute_spectral_difference(cur, last, at_time)
        tension = C.TENSION_A * (f[C.F_ENERGY_HYSTERESIS] - C.TENSION_M_E) + C.TENSION_B * (
            f[C.F_SPEECH_CHANGES] - C.TENSION_M_S
        )
        f[C.F_AUDIO_TENSION] = tension
        return float(tension)

    def speed_from_tension(self, tension, global_rate, feedback_strength) -> float:
        """speedyComputeSpeedFromTension (speedy.c:768-788), stateful."""
        if global_rate > 1.0:
            requested = max(1.0, global_rate + (1.0 - global_rate) * tension)
        else:
            requested = max(C.MIN_SPEED, min(1.0, global_rate - (1.0 - global_rate) * tension))
        if feedback_strength > 0:
            excess = self.current_duration - self.desired_duration
            requested += max(C.MIN_SPEED, feedback_strength * excess)
        frame_duration = 1.0 / C.FRAME_RATE_HZ
        self.current_duration += np.float32(frame_duration / requested)
        self.desired_duration += np.float32(frame_duration / global_rate)
        return float(requested)


class _RateConverter:
    """Stateful streaming linear resampler (sonicSetRate semantics: rate>1
    shortens and pitch-shifts). Carries fractional phase and the last
    sample across blocks."""

    def __init__(self, num_channels: int):
        self.rate = 1.0
        self.phase = 0.0
        self.last = np.zeros((1, num_channels), np.float32)
        self.primed = False

    def process(self, block: np.ndarray) -> np.ndarray:
        if self.rate == 1.0 and not self.primed:
            return block
        if len(block) == 0:
            return block
        # Concatenate carried sample so interpolation spans block joins.
        if self.primed:
            x = np.concatenate([self.last, block])
            start = self.phase  # position within x (0 = carried sample)
        else:
            x = block
            start = 0.0
            self.primed = True
        n = len(x)
        out = []
        pos = start
        positions = []
        while pos <= n - 1 + 1e-9:
            positions.append(pos)
            pos += self.rate
        if positions:
            p = np.asarray(positions)
            i0 = np.clip(np.floor(p).astype(np.int64), 0, n - 1)
            i1 = np.clip(i0 + 1, 0, n - 1)
            frac = (p - i0).astype(np.float32)[:, None]
            out = x[i0] * (1.0 - frac) + x[i1] * frac
        else:
            out = x[:0]
        self.phase = pos - (n - 1)
        self.last = x[-1:]
        return np.asarray(out, np.float32)


class WsolaStream:
    """Incremental WSOLA engine: streaming counterpart of ops.wsola with the
    libsonic-style interface (write / read / flush / set_speed / set_rate).

    Samples are interleaved int16-valued float32 internally; multichannel
    pitch decisions come from the channel average, OLA applies per channel.
    """

    def __init__(self, sample_rate: int, num_channels: int = 1):
        self.sample_rate = sample_rate
        self.num_channels = num_channels
        self.min_period = sample_rate // C.WSOLA_MAX_PITCH_HZ
        self.max_period = sample_rate // C.WSOLA_MIN_PITCH_HZ
        self.speed = 1.0
        self.rate = 1.0
        self._rate_conv = _RateConverter(num_channels)
        self._in = np.zeros((0, num_channels), np.float32)
        self._in_pos = 0
        self._in_base = 0  # global index of _in[0]
        # Per-write speed segments [(global_end, speed)] so play-time
        # accrues with the speed each sample was WRITTEN under, not the
        # speed at processing time — the engine's pitch-period quanta lag
        # the writer by up to ~1000 samples, and charging a quantum at one
        # speed smears alternating-speed streams (the reference fails its
        # own varying-speed length gates for exactly this reason,
        # sonic_test.cc:1026-1039).
        self._speed_segs = []
        self._consumed_real = 0.0
        self._play_time = 0.0  # expected output samples
        self._emitted = 0
        self._rem_copy = 0
        self._out_chunks = []
        self._out_read = 0  # global count of samples handed to the reader
        self._fifo_base = 0  # global index of _out_chunks[0][0]

    # -- input plumbing --
    def write(self, samples: np.ndarray) -> None:
        s = np.asarray(samples, np.float32).reshape(-1, self.num_channels)
        if len(s):
            end = self._in_base + len(self._in) + len(s)
            if self._speed_segs and self._speed_segs[-1][1] == self.speed:
                self._speed_segs[-1] = (end, self.speed)
            else:
                self._speed_segs.append((end, self.speed))
        self._in = np.concatenate([self._in, s]) if self._in.size else s
        self._process(final=False)

    def _speed_integral(self, g0: int, g1: int) -> float:
        """sum over global samples [g0, g1) of 1/speed_written."""
        total = 0.0
        prev = g0
        for end, sp in self._speed_segs:
            if end <= g0:
                continue
            hi = min(end, g1)
            if hi > prev:
                total += (hi - prev) / sp
                prev = hi
            if prev >= g1:
                break
        if prev < g1:  # beyond recorded segments: current speed
            total += (g1 - prev) / self.speed
        return total

    def set_speed(self, speed: float) -> None:
        self.speed = float(speed)

    def set_rate(self, rate: float) -> None:
        self.rate = float(rate)
        self._rate_conv.rate = float(rate)

    # -- core synthesis --
    def _pitch(self, mono: np.ndarray, pos: int) -> int:
        w = mono[pos : pos + 2 * self.max_period]
        lags = np.arange(self.min_period, self.max_period + 1)
        # AMDF via cumulative sums of |w[i]-w[i+L]| per lag (vectorized).
        i = np.arange(self.max_period)
        d = np.abs(w[i][:, None] - w[i[:, None] + lags[None, :]])
        d[i[:, None] >= lags[None, :]] = 0.0
        amdf = d.sum(axis=0) / lags
        return int(self.min_period + np.argmin(amdf))

    def _emit(self, block: np.ndarray) -> None:
        if self.rate != 1.0 or self._rate_conv.primed:
            block = self._rate_conv.process(block)
        self._out_chunks.append(block)
        self._emitted += len(block)

    def _process(self, final: bool) -> None:
        maxp = self.max_period
        chunk = maxp
        need = 2 * maxp + chunk
        x = self._in
        n = len(x)
        real_n = n
        if final and n - self._in_pos > 0:
            pad = np.zeros((need, self.num_channels), np.float32)
            x = np.concatenate([x, pad])
            n = len(x)
        mono = x.mean(axis=1) if self.num_channels > 1 else x[:, 0]
        s = self.speed
        while (self._in_pos + need <= n) if not final else (self._in_pos < real_n):
            p = self._in_pos
            if self._rem_copy > 0:
                c = min(self._rem_copy, chunk)
                self._emit(x[p : p + c])
                self._advance(c, c, real_n, s)
                self._rem_copy -= c
                continue
            if s > 1.00001:
                period = self._pitch(mono, p)
                if s >= 2.0:
                    nn = max(1, int(period / (s - 1.0)))
                    self._rem_copy = 0
                else:
                    nn = period
                    self._rem_copy = max(0, int(period * (2.0 - s) / (s - 1.0)))
                up = (np.arange(nn, dtype=np.float32) / max(nn, 1))[:, None]
                blend = x[p : p + nn] * (1.0 - up) + x[p + period : p + period + nn] * up
                self._emit(blend)
                self._advance(period + nn, nn, real_n, s)
            elif s < 0.99999:
                period = self._pitch(mono, p)
                if s <= 0.5:
                    nn = max(1, int(period * s / (1.0 - s)))
                    self._rem_copy = 0
                else:
                    nn = period
                    self._rem_copy = max(0, int(period * (2.0 * s - 1.0) / (1.0 - s)))
                self._emit(x[p : p + period])
                up = (np.arange(nn, dtype=np.float32) / max(nn, 1))[:, None]
                blend = x[p + period : p + period + nn] * (1.0 - up) + x[p : p + nn] * up
                self._emit(blend)
                self._advance(nn, period + nn, real_n, s)
            else:
                self._emit(x[p : p + chunk])
                self._advance(chunk, chunk, real_n, s)
        # Drop fully-consumed input to keep the fifo bounded.
        keep_from = min(self._in_pos, len(self._in))
        if keep_from > 0:
            self._in = self._in[keep_from:]
            self._in_pos -= keep_from
            self._in_base += keep_from
            while len(self._speed_segs) > 1 and self._speed_segs[0][0] <= self._in_base:
                self._speed_segs.pop(0)

    def _advance(self, consumed: int, emitted: int, real_n: int, s: float) -> None:
        c_real = max(0, min(real_n - self._in_pos, consumed))
        self._consumed_real += c_real
        g0 = self._in_base + self._in_pos
        self._play_time += self._speed_integral(g0, g0 + c_real) / self.rate
        self._in_pos += consumed

    # -- output plumbing --
    def _available(self) -> int:
        limit = int(round(self._play_time))
        return max(0, min(self._emitted, limit) - self._out_read)

    def read(self, max_samples: int) -> np.ndarray:
        """Pop up to max_samples (multi-channel) samples, honoring the
        expected-play-time limit like libsonic's output accounting.

        All counters (_emitted, _out_read, _fifo_base) are GLOBAL stream
        indices; compaction only moves _fifo_base. (Rebasing _emitted
        without rebasing _play_time made flush pad spurious silence once
        the fifo had compacted — caught by the varying-speed tests.)"""
        avail = self._available()
        take = min(avail, max_samples)
        if take == 0:
            return np.zeros((0, self.num_channels), np.float32)
        out = np.concatenate(self._out_chunks) if len(self._out_chunks) > 1 else self._out_chunks[0]
        self._out_chunks = [out]
        local = self._out_read - self._fifo_base
        res = out[local : local + take]
        self._out_read += take
        if self._out_read - self._fifo_base > 2 * self.sample_rate:
            self._out_chunks = [out[self._out_read - self._fifo_base :]]
            self._fifo_base = self._out_read
        return res

    def flush(self) -> None:
        """Process remaining buffered input (padded with silence), then make
        exactly round(play_time) samples available (libsonic's expected-
        output trimming; emitted shortfall is padded with silence)."""
        self._process(final=True)
        limit = int(round(self._play_time))
        if self._emitted < limit:
            pad = np.zeros((limit - self._emitted, self.num_channels), np.float32)
            self._emit(pad)

    def samples_available(self) -> int:
        return self._available()


class SonicStream:
    """Behavioral equivalent of the sonic2 shim API (sonic2.h:54-125).

    write_short/write_float accept interleaved arrays ("one sample spans all
    channels", sonic2.h:56-59); read_short/read_float return up to N
    interleaved samples. Callbacks fire with (stream, time, value) like the
    C callbacks (sonic2.h:104-124).
    """

    def __init__(self, sample_rate: int, num_channels: int = 1):
        self.sample_rate = sample_rate
        self.num_channels = num_channels
        self.global_speed = 1.0
        self.nonlinear_factor = 0.0  # off by default (soniclib.c:117)
        self.duration_feedback_strength = 0.1  # soniclib.c:122
        self.speedy = SpeedyFrontEndStream(sample_rate)
        self.engine = WsolaStream(sample_rate, num_channels)
        # Shim bookkeeping (soniclib.c:61-83).
        self._buffer_size = self.speedy.input_frame_step()
        self._pending = np.zeros((0, num_channels), np.float32)  # int16-valued
        self._write_total = 0       # total multichannel samples received
        self._speedy_frame = 0      # speedyBufferFrameIndex
        self._read_frame = 0        # readBufferFrameIndex
        self.on_tension: Optional[Callable] = None
        self.on_speed: Optional[Callable] = None
        self.on_features: Optional[Callable] = None
        self.on_spectrogram: Optional[Callable] = None
        self.on_normalized_spectrogram: Optional[Callable] = None
        self._buffers_allocated = False

    # -- setters (sonic2.h:70-92) --
    def set_speed(self, speed: float) -> None:
        self.global_speed = float(speed)
        self.engine.set_speed(speed)

    def set_rate(self, rate: float) -> None:
        self.engine.set_rate(rate)

    def enable_nonlinear_speedup(self, factor: float) -> None:
        self.nonlinear_factor = float(factor)

    def set_duration_feedback_strength(self, factor: float) -> None:
        self.duration_feedback_strength = float(factor)

    def get_buffer_size(self) -> int:
        return self._buffer_size if self._buffers_allocated else 0

    def spectrogram_size(self) -> int:
        return self.speedy.cfg.fft_size

    # -- writes --
    def write_short(self, samples: np.ndarray) -> bool:
        s = np.asarray(samples, np.float32).reshape(-1, self.num_channels)
        return self._write(s)

    def write_float(self, samples: np.ndarray) -> bool:
        s = np.asarray(samples, np.float32).reshape(-1, self.num_channels)
        # soniclib.c:496: floats scaled by 32768 and truncated to short.
        return self._write(np.trunc(s * 32768.0))

    def _write(self, s: np.ndarray) -> bool:
        if not self.nonlinear_factor:  # short-circuit (soniclib.c:397-399)
            self.engine.write(s)
            return True
        self._buffers_allocated = True
        self._pending = np.concatenate([self._pending, s]) if self._pending.size else s
        self._write_total += len(s)
        self._pump()
        return True

    def _pump(self) -> None:
        """Fire analysis/resynthesis for every trigger point reached
        (soniclib.c:427-450): frame k is sent to speedy when
        (k+1)*bufferSize + partial + 1 total samples have arrived."""
        cfg = self.speedy.cfg
        step = self._buffer_size
        window = self.speedy.input_frame_size()
        full = window // step
        partial = window - full * step
        while self._write_total >= (self._speedy_frame + full) * step + partial + 1:
            k = self._speedy_frame
            frame = self._pending_slice(k * step, window)
            # Integer-average mixdown with C truncation (soniclib.c:271-274).
            mono = np.trunc(frame.sum(axis=1) / self.num_channels)
            at_time = k + full  # == writeBufferFrameIndex at trigger time
            self.speedy.add_data_short(mono, at_time)
            if self.on_spectrogram:
                self.on_spectrogram(self, at_time, self._full_spec(self.speedy.spectrogram))
            if self.on_normalized_spectrogram:
                self.on_normalized_spectrogram(self, at_time, self.speedy.normalized.copy())
            self._speedy_frame += 1
            tension = self.speedy.compute_tension(self._read_frame)
            if tension is not None:
                if self.on_tension:
                    self.on_tension(self, self._read_frame, tension)
                if self.on_features:
                    self.on_features(self, self._read_frame, self.speedy.features.copy())
                rate = self.speedy.speed_from_tension(
                    tension, self.global_speed, self.duration_feedback_strength
                )
                rate = rate * self.nonlinear_factor + self.global_speed * (
                    1.0 - self.nonlinear_factor
                )
                if self.on_speed:
                    self.on_speed(self, self._read_frame, rate)
                self.engine.set_speed(rate)
                self.engine.write(self._pending_slice(self._read_frame * step, step))
                self._read_frame += 1
        self._trim_pending()

    def _pending_base(self) -> int:
        # _pending holds samples from global index _pending_start onward.
        return self._write_total - len(self._pending)

    def _pending_slice(self, global_start: int, count: int) -> np.ndarray:
        base = self._pending_base()
        a = global_start - base
        out = np.zeros((count, self.num_channels), np.float32)
        avail = self._pending[max(a, 0) : a + count]
        out[: len(avail)] = avail
        return out

    def _trim_pending(self) -> None:
        # Keep everything from the oldest still-needed frame onward.
        keep_global = min(self._read_frame, self._speedy_frame) * self._buffer_size
        drop = keep_global - self._pending_base()
        if drop > 0:
            self._pending = self._pending[drop:]

    def _full_spec(self, half: np.ndarray) -> np.ndarray:
        w = self.speedy.cfg.window_size
        return np.concatenate([half[: w + 1], half[1:w][::-1]])

    # -- reads --
    def read_short(self, max_samples: int) -> np.ndarray:
        out = self.engine.read(max_samples)
        res = np.clip(np.round(out), -32768, 32767).astype(np.int16)
        return res.reshape(-1) if self.num_channels == 1 else res

    def read_float(self, max_samples: int) -> np.ndarray:
        out = self.engine.read(max_samples) / 32768.0
        return out.reshape(-1) if self.num_channels == 1 else out

    def samples_available(self) -> int:
        return self.engine.samples_available()

    def flush(self) -> bool:
        """soniclib.c:529-552: drain pending frames at the last speed, then
        flush the engine."""
        if self.nonlinear_factor:
            step = self._buffer_size
            total_frames = -(-self._write_total // step)  # ceil: incl. partial
            while self._read_frame < total_frames:
                frame = self._pending_slice(self._read_frame * step, step)
                # Trim trailing zeros of the final partial frame.
                if (self._read_frame + 1) * step > self._write_total:
                    frame = frame[: self._write_total - self._read_frame * step]
                self.engine.write(frame)
                self._read_frame += 1
        self.engine.flush()
        return True
