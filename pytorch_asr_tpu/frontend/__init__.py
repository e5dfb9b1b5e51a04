"""Feature frontend: STFT -> log-mel (jnp reference + Pallas kernel path)."""

from pytorch_asr_tpu.frontend.features import (
    hann_window, log_mel, max_frames, mel_filterbank, normalize_features,
    num_frames, power_spectrum)

__all__ = ["hann_window", "log_mel", "max_frames", "mel_filterbank",
           "normalize_features", "num_frames", "power_spectrum"]
