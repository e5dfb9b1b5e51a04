"""ctypes bindings for the C++ native runtime (native/asr_native.cc).

Gives the host-side hot paths native implementations (SURVEY.md §2.2):
threaded WAV decode (vs torchaudio/sox), ARPA->dense LM tensorization
(vs KenLM), batch Levenshtein (WER scoring).  Every entry point has a
pure-Python fallback so the framework works without the .so; ``build()``
compiles it on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libasr_native.so"))
_lib = None


def build(force: bool = False) -> bool:
    """Compile libasr_native.so with make/g++; returns availability."""
    global _lib
    if force and os.path.exists(_SO_PATH):
        os.remove(_SO_PATH)
        _lib = None
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False
    return load() is not None


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    c = ctypes
    f32p, i64p, i32p = (c.POINTER(c.c_float), c.POINTER(c.c_int64),
                        c.POINTER(c.c_int32))
    lib.asr_read_wav.restype = c.c_int
    lib.asr_read_wav.argtypes = [c.c_char_p, f32p, c.c_int64, i64p, i32p]
    lib.asr_read_wav_batch.restype = None
    lib.asr_read_wav_batch.argtypes = [
        c.POINTER(c.c_char_p), c.c_int32, f32p, c.c_int64, i64p, i32p, i32p,
        c.c_int32]
    lib.asr_read_flac.restype = c.c_int
    lib.asr_read_flac.argtypes = [c.c_char_p, f32p, c.c_int64, i64p, i32p]
    lib.asr_read_flac_batch.restype = None
    lib.asr_read_flac_batch.argtypes = [
        c.POINTER(c.c_char_p), c.c_int32, f32p, c.c_int64, i64p, i32p, i32p,
        c.c_int32]
    lib.asr_edit_distance.restype = c.c_int64
    lib.asr_edit_distance.argtypes = [i32p, c.c_int64, i32p, c.c_int64]
    lib.asr_edit_distance_batch.restype = None
    lib.asr_edit_distance_batch.argtypes = [
        i32p, i64p, i64p, i32p, i64p, i64p, c.c_int64, i64p, c.c_int32]
    lib.asr_arpa_dense.restype = c.c_int32
    lib.asr_arpa_dense.argtypes = [
        c.c_char_p, c.POINTER(c.c_char_p), c.c_int32, c.c_int32, f32p,
        c.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


# ------------------------------------------------------------------ WAV decode

def read_wav(path: str, max_seconds: float = 60.0):
    """(audio float32 mono, sample_rate); native if built, else stdlib wave."""
    lib = load()
    if lib is None:
        from pytorch_asr_tpu.data.librispeech import read_wav as py_read

        return py_read(path)
    max_samples = int(max_seconds * 48000)
    out = np.empty(max_samples, np.float32)
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.asr_read_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise IOError(f"asr_read_wav({path!r}) failed with code {rc}")
    return out[: n.value].copy(), int(rate.value)


def read_wav_batch(paths: list[str], max_seconds: float = 60.0,
                   n_threads: int = 0):
    """Threaded batch decode -> (audio (N, max_samples), lengths, rates)."""
    lib = load()
    if lib is None:
        outs = [read_wav(p, max_seconds) for p in paths]
        max_samples = int(max_seconds * max(r for _, r in outs))
        audio = np.zeros((len(paths), max_samples), np.float32)
        lens = np.zeros(len(paths), np.int64)
        rates = np.zeros(len(paths), np.int32)
        for i, (a, r) in enumerate(outs):
            audio[i, : len(a)] = a[:max_samples]
            lens[i] = min(len(a), max_samples)
            rates[i] = r
        return audio, lens, rates
    n = len(paths)
    max_samples = int(max_seconds * 48000)
    audio = np.zeros((n, max_samples), np.float32)
    lens = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int32)
    rcs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    nt = n_threads or os.cpu_count() or 2
    lib.asr_read_wav_batch(
        arr, n, audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nt)
    bad = np.nonzero(rcs)[0]
    if len(bad):
        raise IOError(f"batch WAV decode failed for {[paths[i] for i in bad]}")
    return audio, lens, rates


# ----------------------------------------------------------------- FLAC decode

def read_flac(path: str, max_seconds: float = 60.0):
    """(audio float32 mono, sample_rate); native decoder if built, else the
    pure-Python one (data/flac.py) — both from scratch, no FLAC lib exists
    in this environment (SURVEY.md §2.2 torchaudio/sox row)."""
    lib = load()
    if lib is None:
        from pytorch_asr_tpu.data.flac import read_flac as py_read

        return py_read(path)
    max_samples = int(max_seconds * 48000)
    out = np.empty(max_samples, np.float32)
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.asr_read_flac(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise IOError(f"asr_read_flac({path!r}) failed with code {rc}")
    return out[: n.value].copy(), int(rate.value)


def read_flac_batch(paths: list[str], max_seconds: float = 60.0,
                    n_threads: int = 0):
    """Threaded batch decode -> (audio (N, max_samples), lengths, rates)."""
    lib = load()
    n = len(paths)
    max_samples = int(max_seconds * 48000)
    audio = np.zeros((n, max_samples), np.float32)
    lens = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int32)
    if lib is None:
        for i, p in enumerate(paths):
            a, r = read_flac(p, max_seconds)
            audio[i, : len(a)] = a[:max_samples]
            lens[i] = min(len(a), max_samples)
            rates[i] = r
        return audio, lens, rates
    rcs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.asr_read_flac_batch(
        arr, n, audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads or os.cpu_count() or 2)
    bad = np.nonzero(rcs)[0]
    if len(bad):
        raise IOError(f"batch FLAC decode failed for {[paths[i] for i in bad]}")
    return audio, lens, rates


# ------------------------------------------------------------------- WER batch

def edit_distance_batch(refs: list[list[int]], hyps: list[list[int]],
                        n_threads: int = 0) -> np.ndarray:
    lib = load()
    if lib is None:
        from pytorch_asr_tpu.decoding.wer import edit_distance

        return np.asarray([edit_distance(r, h) for r, h in zip(refs, hyps)],
                          np.int64)
    n = len(refs)
    r_flat = np.asarray([x for r in refs for x in r], np.int32)
    h_flat = np.asarray([x for h in hyps for x in h], np.int32)
    r_len = np.asarray([len(r) for r in refs], np.int64)
    h_len = np.asarray([len(h) for h in hyps], np.int64)
    r_off = np.concatenate([[0], np.cumsum(r_len)[:-1]]).astype(np.int64)
    h_off = np.concatenate([[0], np.cumsum(h_len)[:-1]]).astype(np.int64)
    out = np.zeros(n, np.int64)
    if r_flat.size == 0:
        r_flat = np.zeros(1, np.int32)
    if h_flat.size == 0:
        h_flat = np.zeros(1, np.int32)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    lib.asr_edit_distance_batch(
        p(r_flat, ctypes.c_int32), p(r_off, ctypes.c_int64),
        p(r_len, ctypes.c_int64), p(h_flat, ctypes.c_int32),
        p(h_off, ctypes.c_int64), p(h_len, ctypes.c_int64),
        n, p(out, ctypes.c_int64), n_threads or os.cpu_count() or 2)
    return out


# ----------------------------------------------------------------- ARPA -> HBM

def arpa_dense_table(path: str, order: int | None = None):
    """Parse an ARPA char-LM and expand to the dense (V^(n-1), V) table.

    Native path is ~100x the pure-Python tensorize; falls back to
    decoding.lm.read_arpa + tensorize when the .so is unavailable.
    """
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer

    tok = CharTokenizer()
    lib = load()
    if lib is None:
        from pytorch_asr_tpu.decoding.lm import read_arpa, tensorize

        lm = read_arpa(path, tok)
        return tensorize(lm, tok, order=order), (order or lm.order)
    V = tok.vocab_size
    syms = []
    for i in range(V):
        if i == 0:
            syms.append("<blank>")
        elif i == tok.sos_id:
            syms.append("<s>?unused")
        elif i == tok.eos_id:
            syms.append("</s>?unused")
        else:
            syms.append(tok.decode([i]))
    cap = order or 8
    # probe order first with a tiny cap=1 call? parse once at full cap:
    n_ctx = V ** (cap - 1)
    # avoid huge allocs for unknown order: read the header cheaply
    hdr_order = _arpa_order(path)
    cap = min(cap, hdr_order)
    n_ctx = V ** (cap - 1)
    table = np.zeros((n_ctx, V), np.float32)
    arr = (ctypes.c_char_p * V)(*[s.encode() for s in syms])
    got = lib.asr_arpa_dense(
        path.encode(), arr, V, cap,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        os.cpu_count() or 2)
    if got < 0:
        raise IOError(f"asr_arpa_dense failed for {path!r}")
    if got < cap:
        table = table[: V ** (got - 1)]
    return table, got


def _arpa_order(path: str) -> int:
    order = 1
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("ngram "):
                order = max(order, int(line.split()[1].split("=")[0]))
            if line.startswith("\\1-grams"):
                break
    return order
