"""BPE subword vocabulary end to end: train -> greedy eval -> prefix-beam
decode with HASHED n-gram fusion, all through the production Trainer
(the large-vocab path of SURVEY.md:145 exercised at the driver level)."""

import dataclasses

import numpy as np
import pytest

from pytorch_asr_tpu.configs import get_config
from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig,
    DataConfig,
    DecodeConfig,
    FrontendConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
from pytorch_asr_tpu.data.bpe import train_bpe
from pytorch_asr_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def bpe_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bpe_e2e")
    corpus = synthetic_corpus(16, 16000, seed=0, min_words=1, max_words=2)
    texts = [t for _, t in corpus]
    tok = train_bpe(texts, num_merges=40)
    vocab_path = str(tmp / "bpe_vocab.json")
    tok.save(vocab_path)

    from pytorch_asr_tpu.decoding.lm import train_char_ngram, write_arpa

    lm = train_char_ngram(texts, order=3, tokenizer=tok)
    arpa_path = str(tmp / "bpe.arpa")
    write_arpa(lm, arpa_path, tok)
    return corpus, tok, vocab_path, arpa_path


def test_bpe_train_and_hashed_beam_decode(bpe_setup):
    corpus, tok, vocab_path, arpa_path = bpe_setup
    cfg = get_config("ctc_bilstm_dev1h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(vocab=f"bpe:{vocab_path}", batch_size=4,
                        bucket_audio_lens=(40000,), bucket_label_lens=(24,)),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(4, 4), hidden_dim=48,
                                        num_layers=1, dropout=0.0,
                                        use_pallas=False),
            compute_dtype="float32",
        ),
        train=TrainConfig(optim=OptimConfig(peak_lr=3e-3, warmup_steps=20,
                                            total_steps=300), log_every=1),
        decode=DecodeConfig(method="prefix_beam", beam_size=4,
                            lm_path=arpa_path, lm_backend="hashed",
                            lm_alpha=0.2, lm_beta=0.3, max_decode_len=32),
    )
    data = BucketedDataset(corpus, batch_size=4,
                           bucket_audio_lens=cfg.data.bucket_audio_lens,
                           bucket_label_lens=cfg.data.bucket_label_lens,
                           tokenizer=tok)
    tr = Trainer(cfg, dataset=data, enable_checkpoints=False)
    assert tr.tokenizer.vocab_size == tok.vocab_size > 31

    first = tr.train(num_steps=5)
    rest = tr.train(num_steps=115)
    assert rest["ctc_loss"] < first["ctc_loss"], (first, rest)

    greedy = tr.evaluate()
    assert greedy["num_utts"] == 16

    # hashed-LM prefix beam through the production decode driver
    res = tr.decode_eval()
    assert res["method"] == "prefix_beam"
    assert np.isfinite(res["wer"]) and res["num_utts"] == 16
    # beam should not be (much) worse than greedy on the trained model
    assert res["wer"] <= greedy["wer"] + 0.3, (res, greedy)
