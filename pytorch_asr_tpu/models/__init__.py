"""Model zoo: conv+BiLSTM encoder, TCN encoder, LAS decoder, ASR wrapper."""

from pytorch_asr_tpu.models.asr_model import ASRModel, build_encoder, encoder_output_dim
from pytorch_asr_tpu.models.encoder_bilstm import BiLSTMEncoder
from pytorch_asr_tpu.models.encoder_tcn import TCNEncoder
from pytorch_asr_tpu.models.las_decoder import DecoderState, LASDecoder

__all__ = ["ASRModel", "BiLSTMEncoder", "DecoderState", "LASDecoder",
           "TCNEncoder", "build_encoder", "encoder_output_dim"]
