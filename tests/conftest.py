"""Test env: force JAX onto CPU with 8 virtual devices (SURVEY.md §4.5).

The jaxtyping pytest plugin imports jax BEFORE conftest runs, so setting
JAX_PLATFORMS in os.environ here is too late for jax.config's env snapshot.
Backends initialize lazily, though, so overriding via jax.config.update still
works -- as long as no test device has been touched yet.
"""

import os

# ASR_TPU_TESTS=1 leaves the real backend alone so tests/test_tpu_parity.py
# can check kernels on actual hardware (run it alone: the rest of the suite
# is written for the 8-virtual-device CPU mesh).
_ON_TPU = os.environ.get("ASR_TPU_TESTS", "") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual-CPU backend; a real backend was "
        "initialized before conftest could redirect it"
    )

import pytest

# The kernel-parity core: every Pallas kernel's correctness tests plus the
# beam searches they must match.  `pytest -m quick` covers the pieces most
# likely to break under kernel work in ~5 min; the full suite (~28 min on a
# 2-CPU box) stays the merge gate.
_QUICK_FILES = {
    "test_beam_pallas.py",
    "test_ctc_pallas.py",
    "test_stft_pallas.py",
    "test_prefix_beam.py",
    "test_ctc.py",
    "test_pallas_mesh.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
