"""Hashed n-gram tables: large-vocabulary LM shallow fusion (SURVEY.md:145).

The dense table of ``decoding.lm.tensorize`` is V^(n-1) x V — perfect for the
31-char vocab (a 4-gram is 2.8 MB), impossible for the BPE vocabs this repo
trains (``data/bpe.py``): a 1k-piece trigram would be 10^9 floats.  SURVEY.md
§2.2 (KenLM row) contracts a fallback for LMs too large/irregular for dense
expansion; this is it — the TPU-native analogue of KenLM's probing hash table
(KenLM is the C++ component the reference binds):

  * one open-addressing table per n-gram order (keys = two independent
    32-bit FNV-1a hashes of the id sequence, linear probing, load <= 0.5),
    plus dense (V,) arrays for unigram probs / single-token backoffs;
  * all tables are device arrays in HBM; the FULL Katz backoff recursion
    evaluates on device, vectorized over (B, K, V) extension candidates —
    no host round-trips, matching the BASELINE north-star requirement that
    LM state stay device-resident;
  * the beam carries the last (order-1) token ids per hypothesis (a context
    WINDOW, not the dense rolled id, so any vocab size works).

Score recursion (bottom-up, equivalent to BackoffLM.score's top-down walk):

    s_1(c)   = uni[c]                      (absent unigrams = -20, as host)
    s_n(c)   = hit_n ? P_n(ctx_{n-1}, c) : backoff(ctx_{n-1}) + s_{n-1}(c)
    score    = s_order(c)

Exactness: tests pin logp_rows == BackoffLM.score to f32 rounding, and beam
fusion parity vs both the dense table and the host oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.decoding.lm import BackoffLM

# FNV-1a 32-bit, two independent streams (different basis/prime pairs); keys
# are the pair (h1, h2) so a false hit needs a simultaneous 64-bit collision.
_BASIS1, _PRIME1 = np.uint32(0x811C9DC5), np.uint32(0x01000193)
_BASIS2, _PRIME2 = np.uint32(0x9747B28C), np.uint32(0x85EBCA6B)
_EMPTY = np.int32(-2147483648)     # empty-slot key sentinel (both halves)
_UNK_LOGP = -20.0                  # host BackoffLM's missing-unigram score
MAX_PROBES = 8


class HashTable(NamedTuple):
    """Open-addressing table: (h1, h2) int32 keys -> f32 value."""
    k1: jax.Array      # (S,) int32
    k2: jax.Array      # (S,) int32
    val: jax.Array     # (S,) f32


class HashedNgramLM(NamedTuple):
    """Device-resident backoff LM.  probs[i] serves order i+2 n-grams;
    backoffs[i] serves contexts of length i+2.  Unigram level is dense."""
    uni: jax.Array                     # (V,) f32 log P(c)
    uni_backoff: jax.Array             # (V,) f32 backoff of len-1 contexts
    probs: tuple                       # tuple[HashTable], orders 2..N
    backoffs: tuple                    # tuple[HashTable], ctx lens 2..N-1

    @property
    def order(self) -> int:
        return len(self.probs) + 1

    @property
    def vocab_size(self) -> int:
        return self.uni.shape[0]


def _hash_pair_np(ids: tuple) -> tuple[np.uint32, np.uint32]:
    # Python-int math masked to 32 bits (numpy scalar uint32 * raises on
    # overflow under numpy 2); must match _fold's jnp.uint32 wraparound.
    h1, h2 = int(_BASIS1), int(_BASIS2)
    p1, p2 = int(_PRIME1), int(_PRIME2)
    for x in ids:
        x = int(x) & 0xFFFFFFFF
        h1 = ((h1 ^ x) * p1) & 0xFFFFFFFF
        h2 = ((h2 ^ x) * p2) & 0xFFFFFFFF
    return np.uint32(h1), np.uint32(h2)


def _build_table(entries: dict[tuple, float]) -> HashTable:
    n = max(len(entries), 1)
    size = 1
    while size < 4 * n:               # load factor <= 0.25
        size *= 2
    mask = size - 1
    k1 = np.full((size,), _EMPTY, np.int32)
    k2 = np.full((size,), _EMPTY, np.int32)
    val = np.zeros((size,), np.float32)
    for ng, v in entries.items():
        h1, h2 = _hash_pair_np(ng)
        s1, s2 = np.int32(h1), np.int32(h2)
        slot = int(h1) & mask
        for probe in range(MAX_PROBES + 1):
            if probe == MAX_PROBES:
                raise ValueError(
                    f"hash table probe overflow at load {n}/{size}")
            cur = (slot + probe) & mask
            if k1[cur] == _EMPTY and k2[cur] == _EMPTY:
                k1[cur], k2[cur], val[cur] = s1, s2, np.float32(v)
                break
            if k1[cur] == s1 and k2[cur] == s2:
                raise ValueError(f"64-bit hash collision for ngram {ng}")
    return HashTable(jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(val))


def build_hashed_lm(lm: BackoffLM, vocab_size: int) -> HashedNgramLM:
    """Compile a BackoffLM into device hash tables (host-side, once)."""
    uni = np.full((vocab_size,), _UNK_LOGP, np.float32)
    uni_bo = np.zeros((vocab_size,), np.float32)
    probs: list[dict] = [dict() for _ in range(max(lm.order - 1, 0))]
    backoffs: list[dict] = [dict() for _ in range(max(lm.order - 2, 0))]
    for ng, lp in lm.logprobs.items():
        if len(ng) == 1:
            if 0 <= ng[0] < vocab_size:
                uni[ng[0]] = lp
        elif len(ng) <= lm.order:
            probs[len(ng) - 2][ng] = lp
    for ctx, bo in lm.backoffs.items():
        if len(ctx) == 1:
            if 0 <= ctx[0] < vocab_size:
                uni_bo[ctx[0]] = bo
        elif len(ctx) <= lm.order - 1:
            backoffs[len(ctx) - 2][ctx] = bo
    return HashedNgramLM(
        uni=jnp.asarray(uni), uni_backoff=jnp.asarray(uni_bo),
        probs=tuple(_build_table(p) for p in probs),
        backoffs=tuple(_build_table(b) for b in backoffs))


# --------------------------------------------------------------- device side
def _fold(h1, h2, x):
    x = x.astype(jnp.uint32)
    p1 = jnp.uint32(int(_PRIME1))   # literals > int32 max must be typed
    p2 = jnp.uint32(int(_PRIME2))
    return (h1 ^ x) * p1, (h2 ^ x) * p2


def _lookup(table: HashTable, h1, h2):
    """(found, value) for hash pairs of any shape; MAX_PROBES linear probes."""
    size = table.k1.shape[0]
    mask = jnp.uint32(size - 1)
    s1 = h1.astype(jnp.int32)
    s2 = h2.astype(jnp.int32)
    base = h1 & mask
    found = jnp.zeros(h1.shape, bool)
    value = jnp.zeros(h1.shape, jnp.float32)
    for probe in range(MAX_PROBES):
        slot = ((base + probe) & mask).astype(jnp.int32)
        hit = (table.k1[slot] == s1) & (table.k2[slot] == s2) & ~found
        value = jnp.where(hit, table.val[slot], value)
        found = found | hit
    return found, value


def hashed_lm_logp_rows(lm: HashedNgramLM, ctx: jax.Array) -> jax.Array:
    """log P(c | ctx) for ALL c — ctx (..., C) int32 (C = order-1, oldest
    first, 0 = no history like the dense table) -> (..., V) f32."""
    V = lm.vocab_size
    C = ctx.shape[-1]
    N = lm.order
    cands = jnp.arange(V, dtype=jnp.int32)
    shape = ctx.shape[:-1]

    # Bottom-up recursion; level 1 is the dense unigram row.
    score = jnp.broadcast_to(lm.uni, shape + (V,))
    for n in range(2, N + 1):
        m = n - 1                                    # context length used
        suffix = ctx[..., C - m:]                    # (..., m)
        valid = jnp.all(suffix != 0, axis=-1)        # shorter history -> skip
        # hash of the context prefix, then fold each candidate token
        h1 = jnp.full(shape, int(_BASIS1), jnp.uint32)
        h2 = jnp.full(shape, int(_BASIS2), jnp.uint32)
        for j in range(m):
            h1, h2 = _fold(h1, h2, suffix[..., j])
        # backoff weight of this context (applied when the n-gram misses)
        if m == 1:
            bo = lm.uni_backoff[jnp.clip(suffix[..., 0], 0, V - 1)]
            bo_found = jnp.ones(shape, bool)
        else:
            bo_found, bo = _lookup(lm.backoffs[m - 2], h1, h2)
        bo = jnp.where(valid & bo_found, bo, 0.0)
        ch1, ch2 = _fold(h1[..., None], h2[..., None], cands)
        found, val = _lookup(lm.probs[n - 2], ch1, ch2)
        found = found & valid[..., None]
        score = jnp.where(found, val, bo[..., None] + score)
    return score


def roll_context_window(ctx: jax.Array, c: jax.Array) -> jax.Array:
    """Append c to a (..., C) context window (shift left, drop oldest)."""
    return jnp.concatenate([ctx[..., 1:], c[..., None]], axis=-1)
