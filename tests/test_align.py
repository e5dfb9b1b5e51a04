"""CTC forced alignment vs a brute-force path-enumeration oracle."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_asr_tpu.decoding.align import ctc_forced_align


def _oracle(logp, T, tokens, blank=0):
    """Enumerate every valid CTC path for `tokens`, return (best_path, score)."""
    L = len(tokens)
    ext = [blank]
    for t in tokens:
        ext += [t, blank]
    S = len(ext)

    best = (None, -np.inf)
    # paths over lattice states: monotone s with steps {0,1,2}, skip rules
    def rec(t, s, path, score):
        nonlocal best
        score = score + logp[t, ext[s]]
        if t == T - 1:
            if s >= S - 2:
                if score > best[1]:
                    best = (list(path) + [s], score)
            return
        for ds in (0, 1, 2):
            ns = s + ds
            if ns >= S:
                continue
            if ds == 2 and (ext[ns] == blank or ext[ns] == ext[ns - 2]):
                continue
            rec(t + 1, ns, path + [s], score)

    for s0 in (0, 1) if S > 1 else (0,):
        rec(0, s0, [], 0.0)
    return best


def _rand_logp(T, V, seed):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((T, V)).astype(np.float32)
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


@pytest.mark.parametrize("seed", range(4))
def test_forced_align_matches_bruteforce(seed):
    V, T = 4, 6
    rng = np.random.default_rng(100 + seed)
    L = int(rng.integers(1, 3))
    tokens = rng.integers(1, V, size=L)
    if L == 2 and tokens[0] == tokens[1] and T < 2 * L + 1:
        tokens[1] = tokens[1] % (V - 1) + 1
    logp = _rand_logp(T, V, seed)

    _, oracle_score = _oracle(logp, T, list(tokens))
    out = ctc_forced_align(
        jnp.asarray(logp[None]), jnp.asarray([T]),
        jnp.asarray(tokens[None].astype(np.int32)), jnp.asarray([L]))
    np.testing.assert_allclose(float(out["score"][0]), oracle_score,
                               rtol=1e-5, atol=1e-5)
    # collapsing the frame labels must reproduce the token sequence
    lab = np.asarray(out["frame_label"][0])
    collapsed = []
    prev = -1
    for v in lab:
        if v != prev and v != 0 and v >= 0:
            collapsed.append(int(v))
        prev = v
    assert collapsed == list(tokens), (lab, tokens)


def test_forced_align_batched_and_spans():
    V, T = 6, 12
    logp0 = _rand_logp(T, V, 0)
    logp1 = _rand_logp(T, V, 1)
    toks = np.zeros((2, 3), np.int32)
    toks[0, :3] = [2, 3, 2]
    toks[1, :2] = [1, 1]
    tl = np.asarray([3, 2], np.int32)
    ll = np.asarray([T, T - 4], np.int32)
    out = ctc_forced_align(jnp.asarray(np.stack([logp0, logp1])),
                           jnp.asarray(ll), jnp.asarray(toks), jnp.asarray(tl))
    starts, ends = np.asarray(out["starts"]), np.asarray(out["ends"])
    for b in range(2):
        L = tl[b]
        # spans ordered, non-empty, within the utterance
        for i in range(L):
            assert 0 <= starts[b, i] < ends[b, i] <= ll[b]
            if i:
                assert starts[b, i] >= ends[b, i - 1] - 1
        # padded token rows have empty spans
        assert (starts[b, L:] == 0).all() and (ends[b, L:] == 0).all()
        # frames past logit_len are -1
        assert (np.asarray(out["frame_state"])[b, ll[b]:] == -1).all()

    # each utterance's result must equal its single-row run (batch independence)
    solo = ctc_forced_align(jnp.asarray(logp1[None]), jnp.asarray(ll[1:]),
                            jnp.asarray(toks[1:]), jnp.asarray(tl[1:]))
    np.testing.assert_array_equal(np.asarray(solo["frame_label"])[0],
                                  np.asarray(out["frame_label"])[1])
