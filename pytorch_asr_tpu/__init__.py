"""TPU-native ASR framework (JAX/XLA/Pallas/pjit).

A brand-new framework with the capabilities of ``chorowski-lab/pytorch-asr``
(reference absent in this environment -- see SURVEY.md §0; capability contract
anchored on BASELINE.json): log-mel/STFT frontend, CTC + attention (LAS)
encoder-decoder training, TCN and conv+BiLSTM encoders, and batched on-device
beam-search decoding with n-gram LM shallow fusion.

Layer map (SURVEY.md §1.3):
  T7 CLI            pytorch_asr_tpu.train / .decode
  T6 configs        pytorch_asr_tpu.configs
  T5 drivers        pytorch_asr_tpu.training
  T4 models         pytorch_asr_tpu.models
  T3 loss kernels   pytorch_asr_tpu.ops (Pallas CTC, fused CE)
  T2 frontend/data  pytorch_asr_tpu.frontend / .data
  T1 decoder        pytorch_asr_tpu.decoding
  T0 runtime        pytorch_asr_tpu.parallel (mesh/sharding/collectives)
"""

__version__ = "0.1.0"
