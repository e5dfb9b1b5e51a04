"""LibriSpeech corpus reader (SURVEY.md §2.1 'LibriSpeech data pipeline').

The reference genre reads LibriSpeech via torchaudio/sox; here audio decode is
host-side (threaded C++ WAV/FLAC decoders in native/asr_native.cc with pure-
Python fallbacks — data/flac.py is a from-scratch FLAC decoder since this
environment has no FLAC library at all) and everything after the raw waveform
lives on device.  Directory layout expected:

    root/<split>/<speaker>/<chapter>/<speaker>-<chapter>-<utt>.flac
    root/<split>/<speaker>/<chapter>/<speaker>-<chapter>.trans.txt
"""

from __future__ import annotations

import os
import wave
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Utterance:
    utt_id: str
    audio_path: str
    transcript: str


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV reader -> (float32 mono waveform in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, sr


def load_audio(path: str) -> tuple[np.ndarray, int]:
    from pytorch_asr_tpu import native

    if path.endswith(".wav"):
        if native.available():
            return native.read_wav(path)
        return read_wav(path)
    if path.endswith(".flac"):
        if native.available() and hasattr(native, "read_flac"):
            return native.read_flac(path)
        from pytorch_asr_tpu.data.flac import read_flac

        return read_flac(path)
    raise RuntimeError(f"cannot decode {path!r}: unsupported audio format")


def scan_manifest(root: str, split: str) -> list[Utterance]:
    """Walk a LibriSpeech split directory and pair audio files with transcripts."""
    split_dir = os.path.join(root, split)
    utts: list[Utterance] = []
    for dirpath, _dirnames, filenames in sorted(os.walk(split_dir)):
        trans = [f for f in filenames if f.endswith(".trans.txt")]
        if not trans:
            continue
        transcripts: dict[str, str] = {}
        for tf in trans:
            with open(os.path.join(dirpath, tf)) as fh:
                for line in fh:
                    utt_id, _, text = line.strip().partition(" ")
                    transcripts[utt_id] = text
        for f in sorted(filenames):
            stem, ext = os.path.splitext(f)
            if ext in (".flac", ".wav") and stem in transcripts:
                utts.append(Utterance(stem, os.path.join(dirpath, f), transcripts[stem]))
    return utts


def load_corpus(root: str, split: str, max_utts: int | None = None) -> list[tuple[np.ndarray, str]]:
    utts = scan_manifest(root, split)
    if max_utts is not None:
        utts = utts[:max_utts]
    out = []
    for u in utts:
        audio, _sr = load_audio(u.audio_path)
        out.append((audio, u.transcript))
    return out
