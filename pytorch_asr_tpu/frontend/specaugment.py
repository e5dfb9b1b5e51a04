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
    enabled: bool = True


def spec_augment(
    rng: jax.Array,
    feats: jax.Array,       # (B, T, M)
    feat_len: jax.Array,    # (B,)
    cfg: SpecAugmentConfig,
) -> jax.Array:
    """Apply frequency and time masks (zeros; features are mean-normalized)."""
    B, T, M = feats.shape
    keys = jax.random.split(rng, 4)

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
