#!/usr/bin/env python3
"""Build and run the exact-DFT C oracle, then re-derive the golden-gate
evidence that tests/test_golden.py cites (VERDICT r1 item 6).

What this does, mechanically reproducibly:
  1. gcc-compiles /root/reference/speedy.c (READ-ONLY reference) with
     -DMATCH_MATLAB -DKISS_FFT against the exact-double-DFT kiss_fft.h
     shim in this directory, plus driver.c.
  2. Runs it on tapestry22050.wav (float32 raw, /32768) with the golden
     harness framing (speedy_test.cc:890-935).
  3. Recomputes the per-feature cross-correlation SNRs against the Matlab
     dump tapestry_features_data.txt and prints the table — in particular
     feature 8 ("Emphasis Weighted Lowpass Filter"), whose exact-DFT SNR
     lands BELOW the shipped 2300 threshold (speedy_test.cc:1014),
     justifying the rebuild's 2200 gate (tests/test_golden.py:20-25).
  4. Hashes the oracle's feature table and compares it to the pinned
     hash in expected.json, so the relaxation is re-checkable forever.

Usage: python tools/oracle/run_oracle.py [--update-expected]
Exit 0 = oracle built, ran, feature-8 evidence holds, hash matches.
"""

import hashlib
import json
import os
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent.parent
REF = pathlib.Path("/root/reference")
EXPECTED = HERE / "expected.json"


def main(argv):
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    import numpy as np

    import testutil

    build = pathlib.Path("/tmp/speedy_oracle_build")
    build.mkdir(exist_ok=True)
    exe = build / "oracle"
    cmd = [
        "gcc", "-O2", "-DMATCH_MATLAB", "-DKISS_FFT",
        "-I", str(HERE), "-I", str(REF),
        str(HERE / "driver.c"), str(REF / "speedy.c"),
        "-o", str(exe), "-lm",
    ]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)

    s, sr = testutil.load_wave("tapestry22050.wav")
    x = (s.astype(np.float32) / 32768.0).astype(np.float32)
    raw = build / "tapestry22050.f32"
    x.tofile(raw)
    feat_path = build / "features.txt"
    spec_path = build / "spectrogram.txt"
    subprocess.run(
        [str(exe), str(raw), str(sr), str(feat_path), str(spec_path)],
        check=True,
    )

    table = np.loadtxt(feat_path, dtype=np.float64)  # [306, 16]
    expected_feats = testutil.load_golden("tapestry_features_data.txt")
    # 306 tension frames vs the Matlab dump's 314 input-frame rows; the
    # cross-correlation SNR handles the length mismatch exactly as
    # speedy_test.cc:840-857 / tests/test_golden.py do.
    assert table.shape == (306, 16), table.shape
    assert expected_feats.shape == (314, 12), expected_feats.shape

    names = [
        "Spectrogram energy", "Energy Lowpass", "Energy Local",
        "Energy Compressed", "Energy Hysteresis", "Low Energy Frame",
        "Local Spectral Difference", "Emphasis Weighted Local Difference",
        "Emphasis Weighted Lowpass Filter", "Relative Spectral Difference",
        "Speech Changes", "Audio Tension",
    ]
    snrs = {}
    for i, name in enumerate(names):
        delay, snr = testutil.best_delay_and_snr(
            table[:, i], expected_feats[:, i]
        )
        snrs[name] = (int(delay), float(snr))
        print(f"feature {i:2d} {name:36s} delay {delay:+d} SNR {snr:12.1f}")

    f8 = snrs["Emphasis Weighted Lowpass Filter"][1]
    # The evidence the relaxed gate cites: exact-DFT C lands below the
    # shipped 2300 (KissFFT-f32-rounding-specific) but above our 2200.
    assert 2200 < f8 < 2300, (
        f"feature-8 exact-DFT SNR {f8}: the 2200-gate justification no "
        f"longer reproduces"
    )

    digest = hashlib.sha256(table.tobytes()).hexdigest()
    payload = {
        "features_sha256": digest,
        "feature8_snr": round(f8, 1),
        "rows": int(table.shape[0]),
    }
    if "--update-expected" in argv:
        EXPECTED.write_text(json.dumps(payload, indent=2) + "\n")
        print(f"wrote {EXPECTED}")
        return 0
    pinned = json.loads(EXPECTED.read_text())
    assert pinned["features_sha256"] == digest, (
        "oracle feature table drifted:\n"
        f"  pinned {pinned['features_sha256']}\n  got    {digest}"
    )
    assert abs(pinned["feature8_snr"] - f8) < 0.5
    print(f"ORACLE-OK sha256={digest[:16]}… feature8_snr={f8:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
