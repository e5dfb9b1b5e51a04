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
