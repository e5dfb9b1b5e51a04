"""BPE subword tokenizer: training, encoding, persistence, e2e integration."""

import dataclasses

import numpy as np
import pytest

from pytorch_asr_tpu.data.bpe import (MARKER, BPETokenizer, _normalize_words,
                                      train_bpe)
from pytorch_asr_tpu.data.synthetic import synthetic_texts
from pytorch_asr_tpu.data.tokenizer import CharTokenizer, get_tokenizer


def _corpus():
    return synthetic_texts(64, seed=3)


def test_normalize_words():
    assert _normalize_words("Hello,  WORLD! it's me") == \
        ["hello", "world", "it's", "me"]


def test_roundtrip_and_coverage():
    tok = train_bpe(_corpus(), num_merges=100)
    # Any normalized text round-trips exactly, including words never seen
    # in training (base char pieces guarantee coverage).
    for text in _corpus()[:8] + ["zyxwv quux unseen'word"]:
        norm = " ".join(_normalize_words(text))
        assert tok.decode(tok.encode(text)) == norm


def test_merges_compress():
    texts = _corpus()
    tok = train_bpe(texts, num_merges=200)
    n_tok = sum(len(tok.encode(t)) for t in texts)
    char_tok = CharTokenizer()
    n_char_tokens = sum(len(char_tok.encode(t)) for t in texts)
    assert n_tok < 0.7 * n_char_tokens  # real compression, not a no-op


def test_determinism():
    a = train_bpe(_corpus(), num_merges=64)
    b = train_bpe(list(_corpus()), num_merges=64)
    assert a.pieces == b.pieces and a.merges == b.merges


def test_id_layout_matches_char_contract():
    tok = train_bpe(_corpus(), num_merges=32)
    assert tok.blank_id == 0
    assert tok.sos_id == len(tok.pieces) + 1
    assert tok.eos_id == tok.sos_id + 1
    assert tok.vocab_size == len(tok.pieces) + 3
    ids = tok.encode("hello world")
    assert ids.dtype == np.int32
    assert (ids >= 1).all() and (ids <= len(tok.pieces)).all()


def test_decode_ctc_collapse():
    tok = train_bpe(_corpus(), num_merges=16)
    ids = tok.encode("the fox")
    # blank-interleave + duplicate every id: greedy CTC rule must recover it
    noisy = []
    for i in ids:
        noisy += [0, int(i), int(i)]
    assert tok.decode_ctc(noisy) == "the fox"


def test_save_load(tmp_path):
    tok = train_bpe(_corpus(), num_merges=48)
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.pieces == tok.pieces and tok2.merges == tok.merges
    t = "beam search decode"
    assert np.array_equal(tok.encode(t), tok2.encode(t))
    # factory path
    tok3 = get_tokenizer(f"bpe:{p}")
    assert tok3.vocab_size == tok.vocab_size


def test_factory_rejects_unknown():
    with pytest.raises(ValueError, match="unsupported vocab"):
        get_tokenizer("wordpiece")


def test_marker_convention():
    tok = train_bpe(_corpus(), num_merges=0)
    ids = tok.encode("ab cd")
    pieces = [tok.pieces[i - 1] for i in ids]
    assert pieces == [MARKER + "a", "b", MARKER + "c", "d"]


def test_encode_applies_merges_in_rank_order():
    # hand-built vocabulary: merge ranks must drive segmentation
    texts = ["aaab aaab aaab ab ab"]
    tok = train_bpe(texts, num_merges=8, min_pair_freq=2)
    for text in ("aaab", "ab", "aab"):
        # brute-force reference: apply merges greedily by rank
        ref = [MARKER + text[0]] + list(text[1:])
        for a, b in tok.merges:
            i = 0
            while i < len(ref) - 1:
                if ref[i] == a and ref[i + 1] == b:
                    ref[i:i + 2] = [a + b]
                else:
                    i += 1
        got = [tok.pieces[i - 1] for i in tok.encode(text)]
        assert "".join(got) == MARKER + text
        assert len(got) <= len(ref)  # rank-order encode is at least as merged


def test_trainer_e2e_with_bpe(tmp_path, request):
    """Full integration: train a tiny CTC model with a BPE vocab and decode."""
    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (BiLSTMEncoderConfig, DataConfig,
                                              FrontendConfig, ModelConfig,
                                              OptimConfig, TrainConfig)
    from pytorch_asr_tpu.training.trainer import Trainer

    vocab_path = str(tmp_path / "bpe.json")
    train_bpe(synthetic_texts(128, seed=0), num_merges=64).save(vocab_path)

    cfg = get_config("ctc_bilstm_dev1h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(vocab=f"bpe:{vocab_path}", batch_size=8,
                        synthetic_num_utts=16,
                        bucket_audio_lens=(48000,), bucket_label_lens=(24,)),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(4, 4), hidden_dim=64,
                                        num_layers=1, dropout=0.0,
                                        use_pallas=False),
            decoder=None, ctc_weight=1.0, compute_dtype="float32"),
        train=TrainConfig(optim=OptimConfig(peak_lr=3e-3, warmup_steps=20,
                                            total_steps=200)),
    )
    trainer = Trainer(cfg, enable_checkpoints=False)
    request.addfinalizer(trainer.close)
    assert isinstance(trainer.tokenizer, BPETokenizer)
    assert trainer.tokenizer.vocab_size == \
        get_tokenizer(f"bpe:{vocab_path}").vocab_size
    first = trainer.train(num_steps=10)
    last = trainer.train(num_steps=190)
    assert last["ctc_loss"] < first["ctc_loss"]
    # greedy decode produces text from the BPE inventory without crashing
    wer = trainer.evaluate(max_batches=1)["wer"]
    assert np.isfinite(wer)
