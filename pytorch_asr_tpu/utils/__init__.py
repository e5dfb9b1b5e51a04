"""Profiling, debugging, and misc utilities."""

from pytorch_asr_tpu.utils.debug import nan_debug, no_jit, pallas_interpret
from pytorch_asr_tpu.utils.profiling import StepTimer, roofline, trace

__all__ = ["StepTimer", "nan_debug", "no_jit", "pallas_interpret",
           "roofline", "trace"]
