"""The vendored exact-DFT C oracle must build, run, and reproduce the
pinned feature table + the feature-8 gate evidence (VERDICT r1 item 6;
tools/oracle/). This compiles the READ-ONLY reference speedy.c against
the in-tree double-DFT shim — the mechanical re-derivation of why
tests/test_golden.py gates feature 8 at 2200 instead of the shipped
2300."""

import pathlib
import shutil
import subprocess
import sys

import pytest

import testutil

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = REPO / "tools" / "oracle" / "run_oracle.py"


@pytest.mark.skipif(
    not testutil.have_test_data(), reason="reference test_data not available"
)
@pytest.mark.skipif(shutil.which("gcc") is None, reason="no gcc")
@pytest.mark.skipif(
    not pathlib.Path("/root/reference/speedy.c").exists(),
    reason="reference source not available",
)
def test_oracle_reproduces_pinned_table():
    out = subprocess.run(
        [sys.executable, str(SCRIPT)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "ORACLE-OK" in out.stdout, out.stdout
    assert "feature8_snr=2291.9" in out.stdout, out.stdout
