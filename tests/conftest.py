"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run hermetically anywhere (SURVEY.md §4: the
rebuild's analog of the reference's single-host gtest binaries plus
device-count-gated pjit tests).

Note: this environment's sitecustomize imports jax at interpreter boot with
JAX_PLATFORMS pointing at a TPU tunnel, so setting the env var here is too
late — we must also update the already-imported jax config."""

import os

if os.environ.get("SPEEDY_TEST_TPU", "0") == "1":
    # Opt-out: run the suite on the default (real TPU) backend so the
    # @skipif(backend != "tpu") hardware tests execute. Mesh tests that
    # need >= 2 devices skip themselves.
    import jax  # noqa: F401
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() >= 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()} "
        f"on {jax.devices()[0].platform}"
    )

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
