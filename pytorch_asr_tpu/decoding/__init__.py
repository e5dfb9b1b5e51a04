"""Decoders: greedy CTC, prefix beam + LM fusion, attention/joint beam,
streaming online recognition, WER."""

from pytorch_asr_tpu.decoding.attention_beam import attention_beam_search
from pytorch_asr_tpu.decoding.greedy import greedy_ctc
from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
from pytorch_asr_tpu.decoding.streaming import StreamingRecognizer
from pytorch_asr_tpu.decoding.wer import corpus_cer, corpus_wer, edit_distance

__all__ = ["StreamingRecognizer", "attention_beam_search", "corpus_cer",
           "corpus_wer", "edit_distance", "greedy_ctc", "prefix_beam_search"]
