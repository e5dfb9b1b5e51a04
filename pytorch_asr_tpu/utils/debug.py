"""Debug / sanitizer modes (SURVEY.md §5.2).

The TPU-native equivalents of race detectors/sanitizers:
  * ``nan_debug()``     -- jax_debug_nans: fail fast at the op producing NaN.
  * ``no_jit()``        -- op-by-op execution for printf-style debugging.
  * ``pallas_interpret()`` -- run all Pallas kernels in interpreter mode
    (the kernel sanitizer: bounds and semantics checked in pure Python).
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental.pallas import tpu as pltpu


@contextlib.contextmanager
def nan_debug():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def no_jit():
    with jax.disable_jit():
        yield


@contextlib.contextmanager
def pallas_interpret():
    with pltpu.force_tpu_interpret_mode():
        yield
