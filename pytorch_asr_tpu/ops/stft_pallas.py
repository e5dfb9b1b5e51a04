"""Pallas framed-STFT kernel over HBM-resident audio (SURVEY.md §2.1 frontend row).

The reference computes features on host via librosa/torchaudio C++.  The jnp
path (frontend/features.py) materializes overlapped frames in HBM -- a ~3.2x
memory amplification at hop=160/n_fft=512.  This kernel instead:

  * keeps the raw waveform in HBM and DMAs only the ~21k-sample span each
    128-frame block needs into VMEM;
  * builds the 128 overlapped frames in VMEM (dynamic-slice row copies);
  * computes the DFT as two MXU matmuls against precomputed windowed
    cos/sin bases (frames @ W == windowed rDFT), then the mel projection as a
    third matmul, then log -- one fused pass, no frame tensor ever in HBM.

Layout: frame block 128 x n_fft(512); freq bins padded 257->384 lanes; mel
output padded 80->128 lanes.  All matmuls are (128,512)@(512,384) and
(128,384)@(384,128) -- native MXU shapes.

Parity: test_stft_pallas.py checks against frontend.features.log_mel (itself
checked against numpy/torch).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.configs.base import FrontendConfig
from pytorch_asr_tpu.frontend import features

# Frames per kernel invocation.  Swept on v5e at the headline shape
# (scripts/bench_stft.py, two-point in-jit timing; ~5-15% run-to-run tunnel
# variance, so confirmed by a 3x alternated head-to-head): 256 beats 128 on
# every repetition (2.81-2.95 vs 3.00-3.03 ms; best run 2.67 ms / 66.2% SOL
# vs 3.05 / 57.9%); 384/512 regress (VMEM pressure).  256 doubles the
# matmul M-dim and halves per-block DMA/assembly overhead.  Remaining SOL
# gap is the VPU frame-assembly loop + M=256 MXU underutilization; cutting
# FLOPS (2-pass bf16 split, factorized FFT) lowers wall time but cannot
# raise %SOL, which counts executed flops.
FRAME_BLOCK = 256
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def _split_bf16(w: np.ndarray) -> np.ndarray:
    """fp32 -> (hi, lo) bf16 parts: w ~= hi + lo (bf16x3 trick).

    Pure numpy (ml_dtypes) so it stays a host-side constant under tracing."""
    import ml_dtypes

    hi = w.astype(ml_dtypes.bfloat16)
    lo = (w - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=8)
def _constants(cfg: FrontendConfig):
    """Precomputed windowed DFT bases and padded mel matrix (host, cached).

    Each matrix is returned as stacked bf16 (hi, lo) parts so the kernel can
    run 3-pass bf16x3 matmuls (~fp32-accurate at 3x the fp32 MXU rate)."""
    n_fft = cfg.n_fft
    n_freq = n_fft // 2 + 1
    f_pad = _round_up(n_freq, LANE)                 # 384 for n_fft=512
    m_pad = _round_up(cfg.n_mels, LANE)             # 128 for 80 mels
    win = np.zeros(n_fft, np.float32)
    win[: cfg.win_length] = features.hann_window(cfg.win_length)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    wc = np.zeros((n_fft, f_pad), np.float32)
    ws = np.zeros((n_fft, f_pad), np.float32)
    wc[:, :n_freq] = np.cos(ang) * win[:, None]
    ws[:, :n_freq] = np.sin(ang) * win[:, None]
    mel = np.zeros((f_pad, m_pad), np.float32)
    mel[:n_freq, : cfg.n_mels] = features.mel_filterbank(cfg)
    return _split_bf16(wc), _split_bf16(ws), _split_bf16(mel)


def _stft_kernel(audio_ref, wc_hi_ref, wc_lo_ref, ws_hi_ref,
                 ws_lo_ref, mel_hi_ref, mel_lo_ref, out_ref,
                 chunk0_ref, chunk1_ref, frames_ref, sem0, sem1,
                 *, hop: int, n_fft: int, span: int, a_pad: int,
                 log_floor: float, fblk: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    gp = b * nblk + i                           # global program index
    total = pl.num_programs(0) * nblk
    slot = jax.lax.rem(gp, 2)

    # audio is flattened to 1-D (B*a_pad,) so the DMA source is a plain
    # tile-aligned 1-D slice (row slicing a 2-D HBM memref trips Mosaic's
    # sublane tiling rules); a_pad, the block start and span are all
    # multiples of 1024.  Double-buffered: program g waits on the copy its
    # predecessor started, and prefetches g+1's chunk before computing.
    def copy_for(gidx, chunk, sem):
        bb = gidx // nblk
        ii = gidx - bb * nblk
        start = bb * a_pad + ii * fblk * hop
        return pltpu.make_async_copy(
            audio_ref.at[pl.ds(start, span)], chunk, sem)

    @pl.when(gp == 0)
    def _():
        copy_for(0, chunk0_ref, sem0).start()

    @pl.when((gp + 1 < total) & (slot == 0))
    def _():
        copy_for(gp + 1, chunk1_ref, sem1).start()

    @pl.when((gp + 1 < total) & (slot == 1))
    def _():
        copy_for(gp + 1, chunk0_ref, sem0).start()

    # Frame r starts at r*hop.  Group frames by phase p = r mod n_phase
    # (n_phase = 128/gcd(hop,128)): within a phase, consecutive frames are
    # exactly n_phase*hop = a whole number of 128-lane tiles apart, so a
    # phase's 8-frame group is ONE contiguous 1-D load reshaped to (8, row_w)
    # whose frames sit at a fixed static lane offset -- no per-row shuffles.
    # The resulting frame order is phase-major; stft_log_mel undoes it with a
    # free XLA gather on the (tiny) mel output.
    g = _gcd(hop, LANE)
    n_phase = LANE // g
    per_phase = fblk // n_phase                 # frames per phase
    row_w = n_phase * hop                       # 640: stride between same-phase frames
    groups = per_phase // 8                     # 8-row groups per phase

    def assemble(chunk_ref):
        for p in range(n_phase):
            off = (p * hop) % LANE              # static lane offset within a row
            base = p * hop - off                # tile-aligned flat start
            for m in range(groups):
                rows = []
                for j in range(8):
                    lo = base + (8 * m + j) * row_w
                    rows.append(chunk_ref[lo : lo + row_w].reshape(1, row_w))
                v = jnp.concatenate(rows, axis=0)   # (8, row_w), same phase
                frames_ref[p * per_phase + 8 * m : p * per_phase + 8 * m + 8, :] = (
                    v[:, off : off + n_fft])    # one static shuffle per group

    @pl.when(slot == 0)
    def _():
        copy_for(gp, chunk0_ref, sem0).wait()
        assemble(chunk0_ref)

    @pl.when(slot == 1)
    def _():
        copy_for(gp, chunk1_ref, sem1).wait()
        assemble(chunk1_ref)

    # bf16x3 MXU matmuls (x ~= x_hi + x_lo, W ~= W_hi + W_lo; keep the three
    # leading cross terms): ~1e-6 relative error at 2x the fp32-HIGHEST rate.
    # Far inside the log-mel parity tolerance vs the exact-fp32 jnp rFFT
    # oracle (test_stft_pallas.py).
    frames = frames_ref[:]
    f_hi = frames.astype(jnp.bfloat16)
    f_lo = (frames - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot3(w_hi_ref, w_lo_ref):
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)  # noqa: E731
        return d(f_hi, w_hi_ref[:]) + (d(f_hi, w_lo_ref[:]) + d(f_lo, w_hi_ref[:]))

    re = dot3(wc_hi_ref, wc_lo_ref)
    im = dot3(ws_hi_ref, ws_lo_ref)
    power = re * re + im * im
    p_hi = power.astype(jnp.bfloat16)
    p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mel = (jnp.dot(p_hi, mel_hi_ref[:], preferred_element_type=jnp.float32)
           + jnp.dot(p_hi, mel_lo_ref[:], preferred_element_type=jnp.float32)
           + jnp.dot(p_lo, mel_hi_ref[:], preferred_element_type=jnp.float32))
    out_ref[0] = jnp.log(jnp.maximum(mel, log_floor))


def stft_log_mel(audio: jax.Array, cfg: FrontendConfig,
                 interpret: bool = False,
                 frame_block: int | None = None) -> jax.Array:
    """(B, A) f32 waveform -> (B, T, n_mels) log-mel via the Pallas kernel.

    Output frames beyond the last full span are computed on zero padding; the
    caller masks with feat_len exactly as in the jnp path.  ``frame_block``
    overrides FRAME_BLOCK (must be a multiple of the phase count
    LANE/gcd(hop, LANE); the SOL study sweeps it).
    """
    B, A = audio.shape
    hop, n_fft = cfg.hop_length, cfg.n_fft
    fblk = frame_block or FRAME_BLOCK
    T = features.max_frames(A, cfg)
    if T == 0:
        return jnp.zeros((B, 0, cfg.n_mels), jnp.float32)
    nblk = pl.cdiv(T, fblk)
    # +LANE: the phase-aligned loads read n_fft+LANE lanes from the last row.
    # 1-D HBM slices must align to the full (8,128) tile = 1024 elements.
    span = _round_up((fblk - 1) * hop + n_fft + LANE, 8 * LANE)
    # Pad so every block's span slice is in range, then flatten to 1-D.
    a_pad = _round_up(nblk * fblk * hop + span, 8 * LANE)
    audio_p = jnp.pad(audio.astype(jnp.float32),
                      ((0, 0), (0, a_pad - A))).reshape(B * a_pad)

    (wc_hi, wc_lo), (ws_hi, ws_lo), (mel_hi, mel_lo) = _constants(cfg)
    f_pad, m_pad = wc_hi.shape[1], mel_hi.shape[1]

    kernel = functools.partial(
        _stft_kernel, hop=hop, n_fft=n_fft, span=span, a_pad=a_pad,
        log_floor=cfg.log_floor, fblk=fblk)
    out = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),          # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wc hi
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wc lo
            pl.BlockSpec(memory_space=pltpu.VMEM),         # ws hi
            pl.BlockSpec(memory_space=pltpu.VMEM),         # ws lo
            pl.BlockSpec(memory_space=pltpu.VMEM),         # mel hi
            pl.BlockSpec(memory_space=pltpu.VMEM),         # mel lo
        ],
        out_specs=pl.BlockSpec((1, fblk, m_pad),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nblk * fblk, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span,), jnp.float32),              # chunk buffer 0
            pltpu.VMEM((span,), jnp.float32),              # chunk buffer 1
            pltpu.VMEM((fblk, n_fft), jnp.float32),        # frames
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(audio_p, jnp.asarray(wc_hi), jnp.asarray(wc_lo), jnp.asarray(ws_hi),
      jnp.asarray(ws_lo), jnp.asarray(mel_hi), jnp.asarray(mel_lo))
    # Kernel rows are phase-major within each 128-frame block; undo with a
    # static gather (fused by XLA, negligible vs. the kernel).
    g = _gcd(hop, LANE)
    n_phase = LANE // g
    per_phase = fblk // n_phase
    f = np.arange(fblk)
    perm = (f % n_phase) * per_phase + f // n_phase   # frame f -> kernel row
    out = out.reshape(B, nblk, fblk, m_pad)[:, :, perm, :]
    out = out.reshape(B, nblk * fblk, m_pad)
    return out[:, :T, : cfg.n_mels]


def log_mel_pallas(
    audio: jax.Array,
    audio_len: jax.Array,
    cfg: FrontendConfig,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for frontend.features.log_mel (Pallas STFT path)."""
    feats = stft_log_mel(audio, cfg, interpret=interpret)
    feat_len = features.num_frames(audio_len, cfg)
    mask = jnp.arange(feats.shape[1])[None, :] < feat_len[:, None]
    feats = jnp.where(mask[..., None], feats, 0.0)
    if cfg.normalize:
        feats = features.normalize_features(feats, feat_len)
    return feats, feat_len
