"""FLAC codec round-trips (SURVEY.md §2.2 torchaudio/sox row).

FLAC is lossless: decode(encode(x)) must equal x bit-exactly for every
subframe type, stereo decorrelation mode, bit depth, rice configuration and
edge case.  The pure-Python decoder (data/flac.py) is validated here and then
serves as the oracle for the C++ decoder (test_native.py side).
"""

from __future__ import annotations

import numpy as np
import pytest

from pytorch_asr_tpu.data import flac


def _pcm(n: int, bps: int, seed: int = 0, channels: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    # smooth-ish signal + noise so fixed/LPC predictors see realistic residuals
    t = np.arange(n)
    base = (0.5 * lim * np.sin(t / 50.0)).astype(np.int64)
    noise = rng.integers(-lim // 64, lim // 64, size=(n, channels))
    x = np.clip(base[:, None] + noise, -lim, lim - 1)
    return x.astype(np.int64) if channels > 1 else x[:, 0].astype(np.int64)


def _roundtrip(tmp_path, pcm, sr=16000, **kw):
    path = str(tmp_path / "t.flac")
    flac.write_flac(path, pcm, sr, **kw)
    with open(path, "rb") as fh:
        got, got_sr = flac.decode_flac_bytes(fh.read())
    assert got_sr == sr
    want = np.asarray(pcm)
    if want.ndim == 1:
        want = want[:, None]
    np.testing.assert_array_equal(got, want)
    return path


@pytest.mark.parametrize("subframe,order", [
    ("verbatim", 0), ("fixed", 0), ("fixed", 1), ("fixed", 2), ("fixed", 3),
    ("fixed", 4), ("lpc", 1), ("lpc", 4), ("lpc", 8),
])
def test_roundtrip_subframe_types(tmp_path, subframe, order):
    pcm = _pcm(5000, 16, seed=order)
    _roundtrip(tmp_path, pcm, subframe=subframe, order=max(order, 1)
               if subframe == "lpc" else order, blocksize=1024)


def test_roundtrip_constant(tmp_path):
    pcm = np.full(1000, -1234, dtype=np.int64)
    _roundtrip(tmp_path, pcm, subframe="constant", blocksize=256)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_roundtrip_bit_depths(tmp_path, bps):
    _roundtrip(tmp_path, _pcm(3000, bps), bps=bps, subframe="fixed", order=2)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_roundtrip_stereo_modes(tmp_path, mode):
    pcm = _pcm(4000, 16, seed=7, channels=2)
    _roundtrip(tmp_path, pcm, stereo_mode=mode, subframe="fixed", order=2,
               blocksize=512)


def test_roundtrip_rice_partitions_and_escape(tmp_path):
    pcm = _pcm(4096, 16, seed=3)
    _roundtrip(tmp_path, pcm, subframe="fixed", order=2, partition_order=3,
               blocksize=2048)
    _roundtrip(tmp_path, pcm, subframe="fixed", order=2, escape=True,
               blocksize=2048)


def test_roundtrip_wasted_bits(tmp_path):
    pcm = (_pcm(2000, 12, seed=5) << 4)   # low 4 bits zero
    _roundtrip(tmp_path, pcm, bps=16, subframe="fixed", order=1, wasted=4)


def test_roundtrip_lpc_custom_coefs(tmp_path):
    pcm = _pcm(3000, 16, seed=9)
    _roundtrip(tmp_path, pcm, subframe="lpc", order=3,
               lpc_coefs=[45, -23, 10], lpc_shift=5, blocksize=1000)


def test_roundtrip_partial_last_frame(tmp_path):
    pcm = _pcm(1000, 16, seed=11)          # 1000 % 256 != 0
    _roundtrip(tmp_path, pcm, subframe="fixed", order=2, blocksize=256)


def test_roundtrip_odd_blocksize_and_rate(tmp_path):
    pcm = _pcm(777, 16, seed=13)
    _roundtrip(tmp_path, pcm, sr=12345, subframe="fixed", order=1,
               blocksize=250)


def test_read_flac_scales_to_float(tmp_path):
    pcm = _pcm(2000, 16, seed=1)
    path = _roundtrip(tmp_path, pcm, subframe="fixed", order=2)
    x, sr = flac.read_flac(path)
    assert x.dtype == np.float32 and sr == 16000
    np.testing.assert_allclose(x, pcm / 32768.0, atol=1e-7)


def test_corrupt_stream_raises(tmp_path):
    pcm = _pcm(1000, 16)
    path = str(tmp_path / "t.flac")
    flac.write_flac(path, pcm, 16000, subframe="fixed", order=2)
    data = bytearray(open(path, "rb").read())
    data[len(data) // 2] ^= 0xFF           # flip bits mid-frame
    with pytest.raises(flac.FlacError):
        flac.decode_flac_bytes(bytes(data))
    with pytest.raises(flac.FlacError, match="fLaC"):
        flac.decode_flac_bytes(b"RIFF" + bytes(data[4:]))


def test_load_audio_uses_flac_decoder(tmp_path):
    from pytorch_asr_tpu.data.librispeech import load_audio

    pcm = _pcm(2000, 16, seed=2)
    path = str(tmp_path / "u.flac")
    flac.write_flac(path, pcm, 16000, subframe="fixed", order=2)
    x, sr = load_audio(path)
    assert sr == 16000 and x.shape == (2000,)
    np.testing.assert_allclose(x, pcm / 32768.0, atol=1e-7)
