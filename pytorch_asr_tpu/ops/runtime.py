"""Pallas kernel gating (SURVEY.md layer T3/T0).

Every Pallas call site asks two questions answered here:

  * ``pallas_active()`` -- should the Pallas fast path run at all?  True on a
    real TPU backend, and also when interpreter mode is forced so that CPU
    test meshes and the driver's multi-chip dryrun exercise the SAME kernel
    code the TPU ships (``ASR_TPU_PALLAS_INTERPRET=1`` or
    ``force_interpret(True)``).
  * ``pallas_interpret()`` -- pass ``interpret=...`` to ``pl.pallas_call`` so
    forced runs execute in the Pallas interpreter instead of Mosaic.

Keeping this in one module (instead of per-call ``jax.default_backend()``
checks) is what lets the multi-chip dryrun certify the shipped configuration:
round-1 dryruns had to set ``use_pallas=False`` everywhere, so the fast path
was never compiled on a multi-device mesh (VERDICT.md round 1, Weak #2).
"""

from __future__ import annotations

import os

import jax

_FORCE_INTERPRET: bool | None = None


def force_interpret(on: bool | None) -> None:
    """Override interpreter-mode gating from code (None = env var decides)."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = on


def pallas_interpret() -> bool:
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return os.environ.get("ASR_TPU_PALLAS_INTERPRET", "") == "1"


def pallas_active() -> bool:
    """True when Pallas kernel paths should be taken (TPU, or forced interpret)."""
    return pallas_interpret() or jax.default_backend() == "tpu"
