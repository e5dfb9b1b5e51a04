"""Loss kernels and Pallas TPU ops (SURVEY.md layer T3)."""

from pytorch_asr_tpu.ops.ce import make_decoder_io, smoothed_ce_loss
from pytorch_asr_tpu.ops.ctc import ctc_loss, ctc_loss_mean

__all__ = ["ctc_loss", "ctc_loss_mean", "make_decoder_io", "smoothed_ce_loss"]
