"""Lazy file-backed data pipeline (VERDICT r2 item 1).

Covers: pseudo-split resolution (train-960 union, dev-clean-1h duration cap),
header-only audio probing, LazyCorpus on-demand decode with bounded RAM
(nothing decodes at startup), SortaGrad ordering without decode, and
bit-exact checkpoint resume of the prefetching grain iterator over a real
FLAC tree fixture.
"""

import os

import numpy as np
import pytest

from pytorch_asr_tpu.data import flac as flacmod
from pytorch_asr_tpu.data import librispeech as ls
from pytorch_asr_tpu.data.grain_pipeline import GrainBucketedIterator
from pytorch_asr_tpu.data.librispeech import (
    LazyCorpus,
    audio_info,
    load_corpus,
    resolve_split,
    scan_manifest,
)

SR = 16000


def _write_utt(dirpath, utt_id, n_samples, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples)
    pcm = np.clip((4000 * np.sin(t / 40.0)).astype(np.int64)
                  + rng.integers(-200, 200, size=n_samples), -32768, 32767)
    flacmod.write_flac(os.path.join(dirpath, utt_id + ".flac"), pcm, SR)


def _make_split(root, split, speakers, utts_per_chapter=3,
                sec_lo=1.0, sec_hi=3.0, seed=0):
    """Minimal LibriSpeech-layout split; returns {utt_id: n_samples}."""
    rng = np.random.default_rng(seed)
    made = {}
    for spk in speakers:
        chap = "10"
        d = os.path.join(root, split, str(spk), chap)
        os.makedirs(d, exist_ok=True)
        lines = []
        for u in range(utts_per_chapter):
            utt_id = f"{spk}-{chap}-{u:04d}"
            n = int(rng.uniform(sec_lo, sec_hi) * SR)
            _write_utt(d, utt_id, n, seed=hash((spk, u)) % 2**31)
            made[utt_id] = n
            lines.append(f"{utt_id} HELLO WORLD {spk} {u}\n")
        with open(os.path.join(d, f"{spk}-{chap}.trans.txt"), "w") as fh:
            fh.writelines(lines)
    return made


@pytest.fixture(scope="module")
def ls_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("librispeech"))
    sizes = {}
    sizes.update(_make_split(root, "train-clean-100", [19, 26], seed=1))
    sizes.update(_make_split(root, "train-clean-360", [33], seed=2))
    sizes.update(_make_split(root, "train-other-500", [41], seed=3))
    sizes.update(_make_split(root, "dev-clean", [84, 174], sec_lo=0.5,
                             sec_hi=1.5, seed=4))
    return root, sizes


def test_resolve_split_names():
    assert resolve_split("train-960") == (
        ("train-clean-100", "train-clean-360", "train-other-500"), None)
    assert resolve_split("train-460") == (
        ("train-clean-100", "train-clean-360"), None)
    assert resolve_split("dev-clean-1h") == (("dev-clean",), 3600.0)
    assert resolve_split("dev-clean") == (("dev-clean",), None)
    assert resolve_split("a+b") == (("a", "b"), None)


def test_audio_info_matches_decode(ls_root):
    root, sizes = ls_root
    utts = scan_manifest(root, "train-clean-100")
    for u in utts[:3]:
        n, sr = audio_info(u.audio_path)
        assert sr == SR
        audio, _ = ls.load_audio(u.audio_path)
        assert n == len(audio) == sizes[u.utt_id]


def test_train_960_union(ls_root):
    root, _ = ls_root
    got = {u.utt_id for u in scan_manifest(root, "train-960")}
    want = set()
    for m in ("train-clean-100", "train-clean-360", "train-other-500"):
        want |= {u.utt_id for u in scan_manifest(root, m)}
    assert got == want and len(got) == 12


def test_union_missing_member_raises(ls_root, tmp_path):
    root, _ = ls_root
    with pytest.raises(FileNotFoundError):
        scan_manifest(str(tmp_path), "train-960")
    # partial tree (only one member) must fail loudly, not train on 100h
    os.makedirs(tmp_path / "train-clean-100" / "1" / "1")
    with pytest.raises(FileNotFoundError):
        scan_manifest(str(tmp_path), "train-960")


def test_duration_capped_subset_deterministic(ls_root):
    root, sizes = ls_root
    cap_sec = 3.0  # tiny cap: the fixture has ~6 dev utterances of 0.5-1.5 s
    ls.DURATION_SPLITS["dev-clean-tst"] = ("dev-clean", cap_sec)
    try:
        a = scan_manifest(root, "dev-clean-tst", subset_seed=1)
        b = scan_manifest(root, "dev-clean-tst", subset_seed=1)
        assert [u.utt_id for u in a] == [u.utt_id for u in b]
        full = scan_manifest(root, "dev-clean")
        assert 0 < len(a) < len(full)
        dur = sum(sizes[u.utt_id] for u in a) / SR
        # cumulative duration crosses the cap on the last pick, never before
        assert dur >= cap_sec
        assert (dur - sizes[a[-1].utt_id] / SR if len(a) else 0) < cap_sec \
            or sum(sizes[u.utt_id] for u in a[:-1]) / SR < cap_sec
        c = scan_manifest(root, "dev-clean-tst", subset_seed=2)
        assert {u.utt_id for u in c} != {u.utt_id for u in a} \
            or len(full) <= len(a)
    finally:
        del ls.DURATION_SPLITS["dev-clean-tst"]


def test_lazy_corpus_no_decode_at_startup(ls_root, monkeypatch):
    root, sizes = ls_root
    calls = []
    real = ls.load_audio
    monkeypatch.setattr(ls, "load_audio", lambda p: (calls.append(p) or real(p)))
    corpus = load_corpus(root, "train-960")
    assert calls == []                       # manifest-only startup
    lens = corpus.audio_lengths()
    assert calls == []                       # header-only probing
    assert list(lens) == [sizes[u.utt_id] for u in corpus.utts]
    audio, text = corpus[0]
    assert len(calls) == 1                   # exactly one decode per access
    assert len(audio) == lens[0]
    assert text.startswith("HELLO WORLD")
    assert corpus.transcript(0) == text and len(calls) == 1


def test_grain_iterator_lazy_resume_bit_exact(ls_root):
    root, _ = ls_root
    corpus = load_corpus(root, "train-960")

    def make(prefetch):
        return GrainBucketedIterator(
            corpus, batch_size=4,
            bucket_audio_lens=(2 * SR, 3 * SR), bucket_label_lens=(32, 32),
            seed=7, sortagrad=True, prefetch=prefetch)

    it = make(prefetch=3)
    for _ in range(2):
        next(it)
    state = it.get_state()
    want = [next(it) for _ in range(5)]

    it2 = make(prefetch=2)
    it2.set_state(state)
    got = [next(it2) for _ in range(5)]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a["audio"], b["audio"])
        np.testing.assert_array_equal(a["tokens"], b["tokens"])
        np.testing.assert_array_equal(a["audio_len"], b["audio_len"])

    # synchronous (prefetch=0) delivers the identical sequence
    it3 = make(prefetch=0)
    it3.set_state(state)
    got3 = [next(it3) for _ in range(5)]
    for a, b in zip(want, got3):
        np.testing.assert_array_equal(a["audio"], b["audio"])
    it.close()
    it2.close()


def test_grain_state_is_json_small(ls_root):
    """Checkpoint state carries corpus indices, not audio: it must stay tiny
    and JSON-serializable (training/checkpoint.py json.dumps it)."""
    import json

    root, _ = ls_root
    corpus = load_corpus(root, "train-960")
    it = GrainBucketedIterator(
        corpus, batch_size=4, bucket_audio_lens=(2 * SR, 3 * SR),
        bucket_label_lens=(32, 32), seed=0, prefetch=2)
    next(it)
    s = json.dumps(it.get_state())
    it.close()
    assert len(s) < 20_000, f"iterator state unexpectedly large: {len(s)}B"


def test_sortagrad_lazy_no_decode(ls_root, monkeypatch):
    """SortaGrad ordering must come from headers, not decodes."""
    root, _ = ls_root
    corpus = load_corpus(root, "train-clean-100")
    corpus.audio_lengths()                   # pre-probe headers
    calls = []
    real = ls.load_audio
    monkeypatch.setattr(ls, "load_audio", lambda p: (calls.append(p) or real(p)))
    it = GrainBucketedIterator(
        corpus, batch_size=2, bucket_audio_lens=(3 * SR,),
        bucket_label_lens=(32,), seed=0, sortagrad=True, prefetch=0)
    assert calls == []                       # constructing = zero decodes
    b = next(it)
    # first SortaGrad batch = the 2 shortest utterances
    lens = sorted(corpus.audio_lengths())
    assert sorted(b["audio_len"].tolist()) == [lens[0], lens[1]]


def test_build_dataset_resolves_auto_buckets_lazily(ls_root, monkeypatch):
    from pytorch_asr_tpu.configs.base import DataConfig
    from pytorch_asr_tpu.data import resolve_buckets
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer

    root, _ = ls_root
    corpus = load_corpus(root, "train-960")
    corpus.audio_lengths()
    calls = []
    real = ls.load_audio
    monkeypatch.setattr(ls, "load_audio", lambda p: (calls.append(p) or real(p)))
    cfg = DataConfig(librispeech_root=root, split="train-960", auto_buckets=2)
    audio_b, label_b = resolve_buckets(cfg, corpus, CharTokenizer())
    assert calls == []                       # profiled from headers+manifest
    assert len(audio_b) == 2 and len(label_b) == 2
    assert max(audio_b) >= int(corpus.audio_lengths().max())


def test_canonical_config_splits_resolve(ls_root):
    """Config 1 (dev-clean-1h) and config 5 (train-960) must load real data
    the day LibriSpeech mounts (VERDICT r2: they previously resolved to
    nonexistent literal directories)."""
    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.data import load_corpus_for

    root, _ = ls_root
    for name in ("ctc_bilstm_dev1h", "joint_ctc_attention_960h"):
        cfg = get_config(name, **{"data.librispeech_root": root})
        corpus = load_corpus_for(cfg.data, SR)
        assert isinstance(corpus, LazyCorpus)
        assert len(corpus) > 0


def test_trainer_evaluates_on_dev_split(ls_root):
    """Training on real data runs periodic eval on data.eval_split (the
    reference's 'periodic dev WER' — SURVEY L5), not the training split."""
    import dataclasses

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (
        BiLSTMEncoderConfig, DataConfig, FrontendConfig, ModelConfig)
    from pytorch_asr_tpu.training.trainer import Trainer

    root, _ = ls_root
    cfg = dataclasses.replace(
        get_config("ctc_bilstm_dev1h"),
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(librispeech_root=root, split="train-clean-100",
                        eval_split="dev-clean", batch_size=2,
                        bucket_audio_lens=(3 * SR,), bucket_label_lens=(32,)),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(2, 2), hidden_dim=16,
                                        num_layers=1, dropout=0.0,
                                        use_pallas=False),
            compute_dtype="float32"),
    )
    with Trainer(cfg, enable_checkpoints=False) as tr:
        # train split has 6 utts (2 speakers x 3), dev-clean also 6 — but they
        # are different corpora; pin the eval dataset's size and separateness.
        assert tr.eval_dataset is not tr.dataset
        res = tr.evaluate(max_batches=2)
        assert res["num_utts"] > 0


def test_bucketed_dataset_lazy_no_decode_at_construction(ls_root, monkeypatch):
    """The eval path (BucketedDataset) must also stay RAM-bounded: headers +
    transcripts at construction, one batch of decodes per emitted batch."""
    from pytorch_asr_tpu.data.batching import BucketedDataset

    import threading

    root, _ = ls_root
    corpus = load_corpus(root, "train-960")
    corpus.audio_lengths()                   # pre-probe headers
    calls = []
    real = ls.load_audio
    main = threading.main_thread()

    def counting(p):
        # Count only this test's decodes: an earlier test's daemon prefetch
        # thread (Trainer grain pipeline) may still drain through this patch.
        if threading.current_thread() is main:
            calls.append(p)
        return real(p)

    monkeypatch.setattr(ls, "load_audio", counting)
    ds = BucketedDataset(corpus, batch_size=4,
                         bucket_audio_lens=(3 * SR,), bucket_label_lens=(32,))
    assert calls == []                       # constructing = zero decodes
    it = ds.epoch_batches(seed=0)
    b = next(it)
    assert len(calls) <= 4                   # exactly one batch of decodes
    assert b["audio"].shape == (4, 3 * SR)
    # SortaGrad ordering also decode-free until emission
    calls.clear()
    it2 = ds.epoch_batches(seed=0, sort_by_length=True)
    b2 = next(it2)
    assert len(calls) <= 4
    assert b2["audio_len"].max() <= b["audio"].shape[1]


def test_grain_lazy_decodes_batches_on_pool(ls_root, monkeypatch):
    """Lazy-metadata mode (round 4): the example stream carries header
    lengths only; audio decodes once per emitted batch, fanned over the
    decode thread pool -- never serially inside the stream."""
    import threading

    root, _ = ls_root
    corpus = load_corpus(root, "train-960")
    corpus.audio_lengths()                   # pre-probe headers
    calls = []
    real = ls.load_audio

    def counting(p):
        calls.append(threading.current_thread().name)
        return real(p)

    monkeypatch.setattr(ls, "load_audio", counting)
    it = GrainBucketedIterator(
        corpus, batch_size=4, bucket_audio_lens=(3 * SR,),
        bucket_label_lens=(32,), seed=0, prefetch=0, decode_workers=4)
    assert calls == []                       # construction: headers only
    b = next(it)
    assert b["audio"].shape == (4, 3 * SR)
    # Count only THIS iterator's pool threads (unique per-iterator prefix):
    # a leaked pool from another iterator in the same process shares the
    # generic "audio-decode" stem but not this instance's suffix.
    mine = [n for n in calls if n.startswith(it._pool_prefix)]
    assert len(mine) == 4, calls             # exactly one batch of decodes
    it.close()
