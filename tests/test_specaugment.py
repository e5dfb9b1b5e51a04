"""SpecAugment unit tests."""

import numpy as np

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.frontend.specaugment import SpecAugmentConfig, spec_augment


def test_spec_augment_masks_bands():
    rng = jax.random.PRNGKey(0)
    B, T, M = 4, 100, 80
    feats = jnp.ones((B, T, M))
    feat_len = jnp.asarray([100, 80, 60, 100])
    cfg = SpecAugmentConfig(num_freq_masks=2, freq_mask_width=20,
                            num_time_masks=2, time_mask_fraction=0.2)
    out = np.asarray(spec_augment(rng, feats, feat_len, cfg))
    # something got masked, but not everything
    assert (out == 0).any()
    assert (out == 1).mean() > 0.3
    # masked regions are full bands: per-(b) freq columns all-zero or untouched
    for b in range(B):
        col_zero = (out[b] == 0).all(axis=0)        # (M,) fully-masked freqs
        row_zero = (out[b] == 0).all(axis=1)        # (T,) fully-masked frames
        partial = (out[b] == 0) & ~col_zero[None, :] & ~row_zero[:, None]
        assert not partial.any()


def test_spec_augment_deterministic_given_key():
    rng = jax.random.PRNGKey(7)
    feats = jnp.ones((2, 50, 40))
    feat_len = jnp.asarray([50, 50])
    cfg = SpecAugmentConfig()
    a = spec_augment(rng, feats, feat_len, cfg)
    b = spec_augment(rng, feats, feat_len, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
