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


# ----------------------------------------------------------------- time warp
def test_time_warp_identity_when_disabled():
    from pytorch_asr_tpu.frontend.specaugment import (
        SpecAugmentConfig, spec_augment)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 40, 8)).astype(np.float32))
    lens = jnp.asarray([40, 30])
    cfg = SpecAugmentConfig(num_freq_masks=0, freq_mask_width=0,
                            num_time_masks=0, time_mask_fraction=0.0,
                            time_warp=0)
    out = spec_augment(jax.random.PRNGKey(0), feats, lens, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats))


def test_time_warp_matches_numpy_reference():
    from pytorch_asr_tpu.frontend.specaugment import time_warp

    rng = np.random.default_rng(1)
    B, T, M, W = 3, 64, 8, 10
    feats = rng.standard_normal((B, T, M)).astype(np.float32)
    lens = np.asarray([64, 50, 64], np.int32)
    key = jax.random.PRNGKey(3)
    out = np.asarray(time_warp(key, jnp.asarray(feats), jnp.asarray(lens), W))

    # reproduce the mapping with the SAME random draws
    k1, k2 = jax.random.split(key)
    hi0 = np.maximum(lens - W, W + 1)
    w0 = np.asarray(jax.random.randint(k1, (B,), W, np.maximum(hi0, W + 1)))
    w = np.asarray(jax.random.randint(k2, (B,), -W, W + 1))
    p = np.clip(w0 + w, 1, np.maximum(lens - 1, 1))
    for b in range(B):
        L = float(lens[b])
        for t in range(T):
            if t >= lens[b] or lens[b] <= 2 * W + 1:
                src = float(t)
            elif t <= p[b]:
                src = t * w0[b] / max(p[b], 1.0)
            else:
                src = w0[b] + (t - p[b]) * (L - w0[b]) / max(L - p[b], 1.0)
            lo = int(np.clip(np.floor(src), 0, T - 1))
            hi = min(lo + 1, T - 1)
            frac = src - lo
            want = feats[b, lo] * (1 - frac) + feats[b, hi] * frac
            np.testing.assert_allclose(out[b, t], want, rtol=1e-5, atol=1e-5)


def test_time_warp_keeps_padded_frames_and_bounds():
    from pytorch_asr_tpu.frontend.specaugment import time_warp

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 48, 4)).astype(np.float32)
    lens = jnp.asarray([32, 48])
    out = np.asarray(time_warp(jax.random.PRNGKey(1), jnp.asarray(feats),
                               lens, 8))
    # padded tail of row 0 untouched
    np.testing.assert_allclose(out[0, 32:], feats[0, 32:])
    # linear interpolation cannot exceed the input range
    assert out.min() >= feats.min() - 1e-5
    assert out.max() <= feats.max() + 1e-5
