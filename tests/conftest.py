"""Test harness config: force CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4: the rebuild's analog
of the reference's single-host gtest binaries plus device-count-gated pjit
tests)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
