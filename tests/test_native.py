"""C++ native runtime parity tests (builds libasr_native.so with g++)."""

import os
import wave

import numpy as np
import pytest

from pytorch_asr_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.build():
        pytest.skip("native toolchain unavailable")


def _write_wav(path, data, rate=16000, width=2, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            pcm = (np.clip(data, -1, 1) * 32767).astype("<i2")
        else:
            pcm = (np.clip(data, -1, 1) * 2147483647).astype("<i4")
        if channels > 1:
            pcm = np.repeat(pcm[:, None], channels, axis=1).reshape(-1)
        w.writeframes(pcm.tobytes())


def test_wav_parity_with_stdlib(tmp_path):
    from pytorch_asr_tpu.data.librispeech import read_wav as py_read

    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, 16000).astype(np.float32)
    p = tmp_path / "a.wav"
    _write_wav(p, x)
    a_native, r1 = native.read_wav(str(p))
    a_py, r2 = py_read(str(p))
    assert r1 == r2 == 16000
    np.testing.assert_allclose(a_native, a_py, atol=1e-6)


def test_wav_stereo_and_32bit(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.5, 0.5, 8000).astype(np.float32)
    p2 = tmp_path / "stereo.wav"
    _write_wav(p2, x, channels=2)
    a, r = native.read_wav(str(p2))
    np.testing.assert_allclose(a, x, atol=1e-4)
    p3 = tmp_path / "w32.wav"
    _write_wav(p3, x, width=4)
    a32, _ = native.read_wav(str(p3))
    np.testing.assert_allclose(a32, x, atol=1e-6)


def test_wav_batch(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    ref = []
    for i in range(8):
        n = int(rng.integers(4000, 16000))
        x = rng.uniform(-0.9, 0.9, n).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        _write_wav(p, x)
        paths.append(str(p))
        ref.append(x)
    audio, lens, rates = native.read_wav_batch(paths, max_seconds=2.0)
    for i in range(8):
        assert lens[i] == len(ref[i])
        np.testing.assert_allclose(audio[i, : lens[i]], ref[i], atol=1e-4)


def test_edit_distance_batch_parity():
    from pytorch_asr_tpu.decoding.wer import edit_distance

    rng = np.random.default_rng(3)
    refs, hyps = [], []
    for _ in range(20):
        refs.append(list(rng.integers(0, 10, rng.integers(0, 15))))
        hyps.append(list(rng.integers(0, 10, rng.integers(0, 15))))
    out = native.edit_distance_batch(refs, hyps)
    want = [edit_distance(r, h) for r, h in zip(refs, hyps)]
    np.testing.assert_array_equal(out, want)


def test_arpa_dense_parity(tmp_path):
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer
    from pytorch_asr_tpu.decoding.lm import (
        read_arpa, tensorize, train_char_ngram, write_arpa)

    tok = CharTokenizer()
    lm = train_char_ngram(
        ["the cat sat on the mat", "a dog ate the cat food"],
        order=3, tokenizer=tok)
    path = str(tmp_path / "lm.arpa")
    write_arpa(lm, path, tok)

    # python path: reread the ARPA (roundtrip) and tensorize
    lm2 = read_arpa(path, tok)
    py_table = tensorize(lm2, tok)
    native_table, order = native.arpa_dense_table(path)
    assert order == 3
    assert native_table.shape == py_table.shape
    np.testing.assert_allclose(native_table, py_table, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kw", [
    dict(subframe="verbatim"),
    dict(subframe="constant"),
    dict(subframe="fixed", order=4, partition_order=2, blocksize=2048),
    dict(subframe="lpc", order=3, lpc_coefs=[45, -23, 10]),
    dict(subframe="fixed", order=2, escape=True),
    dict(subframe="fixed", order=1, wasted=3),
    dict(subframe="fixed", order=2, stereo_mode="mid_side"),
    dict(subframe="fixed", order=2, stereo_mode="left_side"),
    dict(subframe="fixed", order=2, bps=24),
])
def test_flac_cc_matches_python_oracle(tmp_path, kw):
    """C++ FLAC decoder bit-identical to the data/flac.py oracle."""
    from pytorch_asr_tpu.data import flac

    rng = np.random.default_rng(0)
    n = 5000
    ch = 2 if "stereo_mode" in kw else 1
    bps = kw.get("bps", 16)
    lim = 1 << (bps - 1)
    t = np.arange(n)
    pcm = np.clip((0.4 * lim * np.sin(t / 40.0)).astype(np.int64)[:, None]
                  + rng.integers(-lim // 64, lim // 64, size=(n, ch)),
                  -lim, lim - 1)
    if kw.get("subframe") == "constant":
        pcm = np.full((n, ch), -7, np.int64)
    if kw.get("wasted"):
        pcm = (pcm >> kw["wasted"]) << kw["wasted"]
    if ch == 1:
        pcm = pcm[:, 0]
    path = str(tmp_path / "t.flac")
    flac.write_flac(path, pcm, 16000, **kw)
    a_py, sr_py = flac.read_flac(path)
    a_cc, sr_cc = native.read_flac(path)
    assert sr_py == sr_cc == 16000
    np.testing.assert_array_equal(a_py, a_cc)


def test_flac_batch_and_errors(tmp_path):
    from pytorch_asr_tpu.data import flac

    rng = np.random.default_rng(1)
    paths = []
    for i in range(5):
        pcm = rng.integers(-2000, 2000, size=1000 + 100 * i).astype(np.int64)
        p = str(tmp_path / f"b{i}.flac")
        flac.write_flac(p, pcm, 16000, subframe="fixed", order=2)
        paths.append(p)
    audio, lens, rates = native.read_flac_batch(paths, max_seconds=1.0)
    assert list(lens) == [1000 + 100 * i for i in range(5)]
    assert all(r == 16000 for r in rates)

    bad = str(tmp_path / "bad.flac")
    with open(bad, "wb") as fh:
        fh.write(b"fLaC" + b"\x00" * 10)
    with pytest.raises(IOError):
        native.read_flac(bad)
