"""Driver-checkable hardware test-gate runner (round-4 verdict item 6).

Runs the hardware-facing test gates on the REAL TPU backend
(`SPEEDY_TEST_TPU=1`, i.e. the default axon platform instead of the
hermetic 8-virtual-CPU mesh) and records the per-test outcomes in a JSON
artifact, so "pallas gates N/N green on chip" is a checkable file rather
than ledger prose.

The gated files are the ones whose hardware behavior differs from the
hermetic interpret path: `tests/test_pallas.py` (Mosaic kernels on the
chip, incl. TPU-vs-interpret parity) and `tests/test_golden.py` (Matlab
golden parity of the production pipeline on the chip).

Usage:
    python tools/run_hw_gates.py [out.json]     # default HWGATES_r05.json

Writes {passed, failed, skipped, names: {nodeid: outcome}, duration_s,
platform} and exits nonzero if any gate fails (skips are expected for
the virtual-mesh-only tests that need >= 2 devices).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATED = ["tests/test_pallas.py", "tests/test_golden.py"]


class _Collector:
    def __init__(self):
        self.names = {}

    def pytest_runtest_logreport(self, report):
        if report.when == "call":
            self.names[report.nodeid] = report.outcome
        elif report.when == "setup" and report.outcome != "passed":
            # setup-time skip/xfail/error (skipif marks land here)
            self.names[report.nodeid] = report.outcome


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "HWGATES_r05.json"
    )
    # Must be set before tests/conftest.py imports jax: keeps the default
    # (real TPU) backend instead of forcing the virtual CPU mesh.
    os.environ["SPEEDY_TEST_TPU"] = "1"
    os.chdir(REPO)
    sys.path.insert(0, REPO)

    import pytest  # after env setup

    collector = _Collector()
    t0 = time.time()
    code = pytest.main(["-q", "--tb=short", *GATED], plugins=[collector])
    dt = time.time() - t0

    import jax

    outcomes = collector.names
    summary = {
        "passed": sum(v == "passed" for v in outcomes.values()),
        "failed": sum(v == "failed" for v in outcomes.values()),
        "skipped": sum(v == "skipped" for v in outcomes.values()),
        "names": outcomes,
        "duration_s": round(dt, 1),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "pytest_exit_code": int(code),
        "gated_files": GATED,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"HWGATES: {summary['passed']} passed, {summary['failed']} failed, "
        f"{summary['skipped']} skipped on {summary['device']} "
        f"in {dt:.0f}s -> {out_path}"
    )
    return 1 if summary["failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
