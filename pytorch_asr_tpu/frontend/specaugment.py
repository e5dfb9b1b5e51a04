"""SpecAugment (Park et al. 2019) -- frequency/time masking on log-mel features.

SURVEY.md §2.1 data-pipeline row lists SpecAugment as part of the frontend
contract.  Pure-jnp, fixed-shape (mask positions are traced, shapes static),
applied inside the jitted train step when train=True.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SpecAugmentConfig:
    num_freq_masks: int = 2
    freq_mask_width: int = 27
    num_time_masks: int = 2
    time_mask_fraction: float = 0.05   # max width as a fraction of utterance
    # Time warp (Park et al. §2.1's third augmentation): a random pivot
    # w0 in [W, len-W) shifts by w in [-W, W]; the time axis is piecewise-
    # linearly resampled around it.  0 disables (the paper's W=80 for the
    # LibriSpeech policies).
    time_warp: int = 0
    enabled: bool = True


def time_warp(rng: jax.Array, feats: jax.Array, feat_len: jax.Array,
              W: int) -> jax.Array:
    """Piecewise-linear time warp (Park et al. §2.1), batched + static-shape.

    The sparse-image-warp of the paper reduces, for a 1-D time warp, to:
    output frame t reads input frame src(t) with
        src(t) = t * w0 / p                      for t <= p
        src(t) = w0 + (t - p) * (L - w0)/(L - p) for t >  p
    where p = w0 + w, linearly interpolated between neighboring frames.
    Rows shorter than 2W+2 frames and frames beyond the valid length pass
    through unchanged.
    """
    B, T, M = feats.shape
    k1, k2 = jax.random.split(rng)
    ok = feat_len > 2 * W + 1
    hi0 = jnp.maximum(feat_len - W, W + 1)
    w0 = jax.random.randint(k1, (B,), W, jnp.maximum(hi0, W + 1))
    w = jax.random.randint(k2, (B,), -W, W + 1)
    # keep the pivot strictly inside (0, len)
    p = jnp.clip(w0 + w, 1, jnp.maximum(feat_len - 1, 1))
    w0f = w0.astype(jnp.float32)[:, None]
    pf = p.astype(jnp.float32)[:, None]
    lf = feat_len.astype(jnp.float32)[:, None]
    t = jnp.arange(T, dtype=jnp.float32)[None, :]
    left = t * w0f / jnp.maximum(pf, 1.0)
    right = w0f + (t - pf) * (lf - w0f) / jnp.maximum(lf - pf, 1.0)
    src = jnp.where(t <= pf, left, right)
    identity = t
    src = jnp.where((t < lf) & ok[:, None], src, identity)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = (src - lo.astype(jnp.float32))[..., None]
    take = lambda idx: jnp.take_along_axis(  # noqa: E731
        feats, idx[..., None].repeat(M, -1), axis=1)
    return take(lo) * (1.0 - frac) + take(hi) * frac


def spec_augment(
    rng: jax.Array,
    feats: jax.Array,       # (B, T, M)
    feat_len: jax.Array,    # (B,)
    cfg: SpecAugmentConfig,
) -> jax.Array:
    """Apply time warp (optional) then frequency and time masks (zeros;
    features are mean-normalized)."""
    B, T, M = feats.shape
    keys = jax.random.split(rng, 5)
    if cfg.time_warp > 0:
        feats = time_warp(keys[4], feats, feat_len, cfg.time_warp)

    def band_mask(key_pos, key_width, size, count, max_width, axis_len_per_row):
        """(B, count) random [start, start+width) bands -> (B, size) bool keep-mask."""
        width = jax.random.randint(key_width, (B, count), 0, jnp.maximum(max_width, 1))
        start = jax.random.randint(key_pos, (B, count), 0, jnp.maximum(
            axis_len_per_row[:, None] - width, 1))
        idx = jnp.arange(size)[None, None, :]
        masked = (idx >= start[..., None]) & (idx < (start + width)[..., None])
        return ~jnp.any(masked, axis=1)                       # (B, size)

    freq_keep = band_mask(
        keys[0], keys[1], M, cfg.num_freq_masks, cfg.freq_mask_width,
        jnp.full((B,), M))
    max_t = jnp.maximum(
        (feat_len.astype(jnp.float32) * cfg.time_mask_fraction).astype(jnp.int32), 1)
    width_t = jax.random.randint(keys[2], (B, cfg.num_time_masks), 0, T)
    width_t = jnp.minimum(width_t, max_t[:, None])
    start_t = jax.random.randint(keys[3], (B, cfg.num_time_masks), 0, T)
    start_t = jnp.minimum(start_t, jnp.maximum(feat_len[:, None] - width_t, 0))
    idx_t = jnp.arange(T)[None, None, :]
    masked_t = (idx_t >= start_t[..., None]) & (idx_t < (start_t + width_t)[..., None])
    time_keep = ~jnp.any(masked_t, axis=1)                    # (B, T)

    return feats * time_keep[..., None] * freq_keep[:, None, :]
