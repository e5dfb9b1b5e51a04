"""Hashed n-gram tables: large-vocabulary LM shallow fusion (SURVEY.md:145).

The dense table of ``decoding.lm.tensorize`` is V^(n-1) x V — perfect for the
31-char vocab (a 4-gram is 2.8 MB), impossible for the BPE vocabs this repo
trains (``data/bpe.py``): a 1k-piece trigram would be 10^9 floats.  SURVEY.md
§2.2 (KenLM row) contracts a fallback for LMs too large/irregular for dense
expansion; this is it — the TPU-native analogue of KenLM's probing hash table
(KenLM is the C++ component the reference binds):

  * one 8-way set-associative table per n-gram order (keys = two
    independent 32-bit FNV-1a hashes of the id sequence; one packed row
    gather per lookup — see HashTable), plus dense (V,) arrays for unigram
    probs / single-token backoffs;
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
BUCKET = 8                         # ways per bucket (one sublane row)
MAX_PROBES = BUCKET                # kept for external references


class HashTable(NamedTuple):
    """8-way set-associative table: ONE packed row gather per lookup.

    Round-2 measured the linear-probing layout at 3.2 ms/frame in the beam
    (30x the acoustic scan): 8 probes x 3 scalar gathers per level dominate.
    This layout gathers a single (32,)-lane row per query — bucket
    ``h1 & mask`` holds all candidate ways — and resolves the match in
    vector registers: 24 gathers/level -> 1.

    ``data[b] = [k1 x8 | k2 x8 | val x8 | pad x8]`` with int32 keys BITCAST
    into the f32 lanes (bit patterns survive gathers untouched).
    """
    data: jax.Array    # (n_buckets, 32) f32


# A dense (V, V) bigram level costs V^2 floats; worth it below this budget
# (64 MB -> V <= 4096): one (V,)-row gather per BEAM replaces one packed-row
# hash gather per CANDIDATE — the per-candidate gathers are the measured
# decode bottleneck at BPE vocabs (3.5 ms/frame standalone at V=1024).
_BI_DENSE_BUDGET = 64 << 20


class HashedNgramLM(NamedTuple):
    """Device-resident backoff LM.  probs[i] serves order i+2 n-grams;
    backoffs[i] serves contexts of length i+2.  Unigram level is dense;
    the bigram level is ALSO dense when V^2 fits the budget (bi_dense,
    missing entries NaN) — hash lookups then only serve orders >= 3."""
    uni: jax.Array                     # (V,) f32 log P(c)
    uni_backoff: jax.Array             # (V,) f32 backoff of len-1 contexts
    probs: tuple                       # tuple[HashTable], orders 2..N
    backoffs: tuple                    # tuple[HashTable], ctx lens 2..N-1
    bi_dense: jax.Array | None = None  # (V, V) f32 log P(c|w), NaN = absent

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
    n_buckets = 1
    while n_buckets * BUCKET < 4 * n:        # load factor <= 0.25
        n_buckets *= 2
    while True:
        mask = n_buckets - 1
        k1 = np.full((n_buckets, BUCKET), _EMPTY, np.int32)
        k2 = np.full((n_buckets, BUCKET), _EMPTY, np.int32)
        val = np.zeros((n_buckets, BUCKET), np.float32)
        fill = np.zeros((n_buckets,), np.int32)
        ok = True
        for ng, v in entries.items():
            h1, h2 = _hash_pair_np(ng)
            s1, s2 = np.int32(h1), np.int32(h2)
            b = int(h1) & mask
            ways = fill[b]
            if np.any((k1[b, :ways] == s1) & (k2[b, :ways] == s2)):
                raise ValueError(f"64-bit hash collision for ngram {ng}")
            if ways == BUCKET:               # bucket overflow: grow + rebuild
                ok = False
                break
            k1[b, ways], k2[b, ways], val[b, ways] = s1, s2, np.float32(v)
            fill[b] = ways + 1
        if ok:
            break
        n_buckets *= 2
    data = np.concatenate(
        [k1.view(np.float32), k2.view(np.float32), val,
         np.zeros((n_buckets, BUCKET), np.float32)], axis=1)
    return HashTable(jnp.asarray(data))


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
    bi_dense = None
    if probs and vocab_size * vocab_size * 4 <= _BI_DENSE_BUDGET:
        bi = np.full((vocab_size, vocab_size), np.nan, np.float32)
        for (w, c), lp in probs[0].items():
            if 0 <= w < vocab_size and 0 <= c < vocab_size:
                bi[w, c] = lp
        bi_dense = jnp.asarray(bi)
    return HashedNgramLM(
        uni=jnp.asarray(uni), uni_backoff=jnp.asarray(uni_bo),
        probs=tuple(_build_table(p) for p in probs),
        backoffs=tuple(_build_table(b) for b in backoffs),
        bi_dense=bi_dense)


# --------------------------------------------------------------- device side
def _fold(h1, h2, x):
    x = x.astype(jnp.uint32)
    p1 = jnp.uint32(int(_PRIME1))   # literals > int32 max must be typed
    p2 = jnp.uint32(int(_PRIME2))
    return (h1 ^ x) * p1, (h2 ^ x) * p2


def _lookup(table: HashTable, h1, h2):
    """(found, value) for hash pairs of any shape: one packed row gather,
    match resolved across the bucket's 8 ways in vector registers."""
    n_buckets = table.data.shape[0]
    mask = jnp.uint32(n_buckets - 1)
    rows = table.data[(h1 & mask).astype(jnp.int32)]         # (..., 4*BUCKET)
    k1 = jax.lax.bitcast_convert_type(rows[..., :BUCKET], jnp.int32)
    k2 = jax.lax.bitcast_convert_type(rows[..., BUCKET:2 * BUCKET], jnp.int32)
    val = rows[..., 2 * BUCKET:3 * BUCKET]
    hit = (k1 == h1.astype(jnp.int32)[..., None]) \
        & (k2 == h2.astype(jnp.int32)[..., None])            # (..., BUCKET)
    # keys are unique within a bucket -> at most one way hits
    return jnp.any(hit, axis=-1), jnp.sum(jnp.where(hit, val, 0.0), axis=-1)


def _context_level(lm: HashedNgramLM, ctx: jax.Array, n: int):
    """(valid, bo, h1, h2) for order-n lookups of a (..., C) context."""
    C = ctx.shape[-1]
    V = lm.vocab_size
    m = n - 1                                        # context length used
    suffix = ctx[..., C - m:]                        # (..., m)
    valid = jnp.all(suffix != 0, axis=-1)            # shorter history -> skip
    shape = ctx.shape[:-1]
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
    return valid, jnp.where(valid & bo_found, bo, 0.0), h1, h2


def hashed_lm_logp_rows(lm: HashedNgramLM, ctx: jax.Array,
                        cands: jax.Array | None = None) -> jax.Array:
    """log P(c | ctx) — ctx (..., C) int32 (C = order-1, oldest first,
    0 = no history like the dense table).

    ``cands`` None: score ALL tokens -> (..., V).  Otherwise an int32
    (..., A) candidate subset -> (..., A) (the acoustic-pruned fusion path:
    table gathers scale with A, not V)."""
    V = lm.vocab_size
    N = lm.order
    all_cands = cands is None
    if all_cands:
        cands = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32),
                                 ctx.shape[:-1] + (V,))

    # Bottom-up recursion; level 1 is the dense unigram row.
    score = lm.uni[jnp.clip(cands, 0, V - 1)]
    for n in range(2, N + 1):
        valid, bo, h1, h2 = _context_level(lm, ctx, n)
        if n == 2 and lm.bi_dense is not None and all_cands:
            # Dense bigram level (all-candidates path only): ONE (V,)-row
            # gather per beam instead of a packed hash-row gather per
            # candidate — measured 3.85 -> 2.85 ms/frame exact at V=1024.
            # Candidate SUBSETS keep the hash lookups: re-gathering the
            # dense row at the subset indices measured slower than the A
            # hash lookups it would replace.
            rows = lm.bi_dense[jnp.clip(ctx[..., -1], 0, V - 1)]  # (..., V)
            found = ~jnp.isnan(rows) & valid[..., None]
            val = jnp.where(found, rows, 0.0)
        else:
            ch1, ch2 = _fold(h1[..., None], h2[..., None], cands)
            found, val = _lookup(lm.probs[n - 2], ch1, ch2)
            found = found & valid[..., None]
        score = jnp.where(found, val, bo[..., None] + score)
    return score


def hashed_lm_allmiss_rows(lm: HashedNgramLM, ctx: jax.Array) -> jax.Array:
    """The every-level-miss approximation: stacked context backoffs + the
    unigram row.  Exact for any candidate absent from every higher-order
    table — the overwhelmingly common case — at per-CONTEXT (not
    per-candidate) lookup cost.  Fills the non-top-A rows in acoustic-pruned
    fusion (see prefix_beam lm_top_k)."""
    score = jnp.broadcast_to(lm.uni, ctx.shape[:-1] + (lm.vocab_size,))
    for n in range(2, lm.order + 1):
        _, bo, _, _ = _context_level(lm, ctx, n)
        score = bo[..., None] + score
    return score


def roll_context_window(ctx: jax.Array, c: jax.Array) -> jax.Array:
    """Append c to a (..., C) context window (shift left, drop oldest)."""
    return jnp.concatenate([ctx[..., 1:], c[..., None]], axis=-1)
