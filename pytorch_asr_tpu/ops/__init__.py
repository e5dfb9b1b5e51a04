"""Loss kernels and Pallas TPU ops (SURVEY.md layer T3).

Pallas kernels (imported lazily by their users to keep CPU paths light):
  ops.stft_pallas         framed STFT -> log-mel over HBM-resident audio
  ops.ctc_pallas          CTC alpha/beta recursions (custom VJP)
  ops.lstm_pallas         fused LSTM sequence (custom VJP)
  ops.dilated_conv_pallas fused TCN residual block (inference)
"""

from pytorch_asr_tpu.ops.ce import make_decoder_io, smoothed_ce_loss
from pytorch_asr_tpu.ops.ctc import ctc_loss, ctc_loss_mean

__all__ = ["ctc_loss", "ctc_loss_mean", "make_decoder_io", "smoothed_ce_loss"]
