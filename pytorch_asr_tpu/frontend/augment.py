"""On-device waveform augmentation (train-time).

The reference genre (deepspeech.pytorch-class trainers) augments on the host
with sox subprocesses: tempo/speed perturbation, gain, noise injection.  Here
the same augmentations run INSIDE the jitted train step on TPU, on the raw
waveform right before the Pallas STFT — zero host cost, fully vectorized over
the batch, and deterministic given the step RNG:

  * speed perturbation: per-utterance resample factor in [lo, hi] via linear
    interpolation (a (B, A) gather + lerp on the VPU); lengths rescale.
  * gain perturbation: per-utterance scale drawn in dB.
  * noise injection: white noise at a per-utterance SNR drawn in dB (scaled
    to each utterance's actual signal power over its valid samples).

All shapes stay static: resampling reads within the same (B, A) buffer and
re-masks, so XLA compiles one program per bucket regardless of the factors.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class WaveformAugmentConfig:
    speed: bool = True
    speed_range: tuple[float, float] = (0.85, 1.15)
    gain: bool = True
    gain_db_range: tuple[float, float] = (-6.0, 6.0)
    noise: bool = True
    noise_snr_db_range: tuple[float, float] = (15.0, 40.0)


def speed_perturb(rng: jax.Array, audio: jax.Array, audio_len: jax.Array,
                  lo: float, hi: float) -> tuple[jax.Array, jax.Array]:
    """Per-utterance linear-interp resample by a factor in [lo, hi].

    factor > 1 speeds up (shorter output).  Output stays (B, A); per-utterance
    factors are clamped to >= len/A so a slow-down never stretches past the
    buffer (which would silently truncate the tail while the CTC targets keep
    the full transcript); bucket slack absorbs the stretch otherwise.
    """
    B, A = audio.shape
    factor = jax.random.uniform(rng, (B, 1), minval=lo, maxval=hi)
    factor = jnp.maximum(factor, audio_len[:, None].astype(jnp.float32) / A)
    # Keep the exact integer index separate: forming t*factor directly in
    # float32 loses sub-sample precision for large t (ulp(1e6) = 1/16 sample);
    # t + t*(factor-1) bounds the error by ulp(0.15*t) instead.
    t = jnp.arange(A)[None, :].astype(jnp.float32)
    off = t * (factor - 1.0)
    ofl = jnp.floor(off)
    frac = (off - ofl).astype(audio.dtype)
    lob = jnp.arange(A)[None, :] + ofl.astype(jnp.int32)
    lob = jnp.clip(lob, 0, A - 1)
    hib = jnp.clip(lob + 1, 0, A - 1)
    x0 = jnp.take_along_axis(audio, lob, axis=1)
    x1 = jnp.take_along_axis(audio, hib, axis=1)
    out = x0 * (1.0 - frac) + x1 * frac
    new_len = jnp.minimum(
        (audio_len.astype(jnp.float32) / factor[:, 0]).astype(jnp.int32), A)
    mask = jnp.arange(A)[None, :] < new_len[:, None]
    return jnp.where(mask, out, 0.0), new_len


def gain_perturb(rng: jax.Array, audio: jax.Array,
                 lo_db: float, hi_db: float) -> jax.Array:
    B = audio.shape[0]
    db = jax.random.uniform(rng, (B, 1), minval=lo_db, maxval=hi_db)
    return audio * (10.0 ** (db / 20.0)).astype(audio.dtype)


def noise_inject(rng: jax.Array, audio: jax.Array, audio_len: jax.Array,
                 lo_snr_db: float, hi_snr_db: float) -> jax.Array:
    """Additive white noise at a per-utterance SNR over the valid samples."""
    B, A = audio.shape
    k_snr, k_n = jax.random.split(rng)
    mask = (jnp.arange(A)[None, :] < audio_len[:, None]).astype(audio.dtype)
    power = (audio * audio * mask).sum(axis=1) / jnp.maximum(
        audio_len.astype(audio.dtype), 1.0)                # (B,)
    snr_db = jax.random.uniform(k_snr, (B,), minval=lo_snr_db,
                                maxval=hi_snr_db)
    noise_power = power / (10.0 ** (snr_db / 10.0))
    noise = jax.random.normal(k_n, audio.shape, audio.dtype)
    return audio + noise * jnp.sqrt(noise_power)[:, None] * mask


def augment_waveform(rng: jax.Array, audio: jax.Array, audio_len: jax.Array,
                     cfg: WaveformAugmentConfig
                     ) -> tuple[jax.Array, jax.Array]:
    """Apply the configured augmentations; returns (audio, audio_len)."""
    k_speed, k_gain, k_noise = jax.random.split(rng, 3)
    if cfg.speed:
        audio, audio_len = speed_perturb(k_speed, audio, audio_len,
                                         *cfg.speed_range)
    if cfg.gain:
        audio = gain_perturb(k_gain, audio, *cfg.gain_db_range)
    if cfg.noise:
        audio = noise_inject(k_noise, audio, audio_len,
                             *cfg.noise_snr_db_range)
    return audio, audio_len
