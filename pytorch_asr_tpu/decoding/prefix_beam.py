"""Batched on-device CTC prefix beam search with LM shallow fusion.

Replaces the reference's host Python/FST loop (SURVEY.md §2.1 'CTC prefix beam
search' row -- the XL component; cf. FlexCTC, PAPERS.md).  Design:

  * ALL state is fixed-shape device tensors over (batch B, beam K): prefix
    token buffers, (p_blank, p_nonblank) in log space, rolling prefix hash,
    LM context id, accumulated fusion score.  One ``lax.scan`` over time.
  * Each step forms K stay-candidates + K*(V-1) extension-candidates,
    absorbs duplicate prefixes by rolling hash with an O(K^2) match matrix
    (ext-ext duplicates are structurally impossible -- see _merge_topk), and
    keeps the top-K by fused score.
  * LM fusion reads a dense device-resident table P(c|ctx) built by
    decoding.lm.tensorize -- no host round trips (SURVEY.md §2.2 KenLM row).

Parity: tests vs prefix_beam_ref.py (host oracle) with and without LM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30
HASH_MULT = 1000003


class BeamState(NamedTuple):
    tokens: jax.Array      # (B, K, L) int32
    length: jax.Array      # (B, K) int32
    pb: jax.Array          # (B, K) f32 log P(prefix, ends blank)
    pnb: jax.Array         # (B, K) f32 log P(prefix, ends non-blank)
    lm_s: jax.Array        # (B, K) f32 accumulated fusion score
    hash: jax.Array        # (B, K) int32 rolling prefix hash
    ctx: jax.Array         # (B, K) int32 LM context id
    last: jax.Array        # (B, K) int32 last char (-1 for empty)


def _lse(a, b):
    return jnp.logaddexp(a, b)


def _init_state(B: int, K: int, L: int, ctx_width: int = 0) -> BeamState:
    """ctx_width 0: dense rolled context id (B, K); >0: a token WINDOW
    (B, K, ctx_width) of the last ids for hashed-LM fusion (0 = no history)."""
    ctx_shape = (B, K) if ctx_width == 0 else (B, K, ctx_width)
    return BeamState(
        tokens=jnp.zeros((B, K, L), jnp.int32),
        length=jnp.zeros((B, K), jnp.int32),
        pb=jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF) * jnp.ones((B, 1)),
        pnb=jnp.full((B, K), NEG_INF),
        lm_s=jnp.zeros((B, K), jnp.float32),
        hash=-(jnp.arange(K, dtype=jnp.int32) + 1)[None, :] * jnp.ones((B, 1), jnp.int32),
        ctx=jnp.zeros(ctx_shape, jnp.int32),
        last=jnp.full((B, K), -1, jnp.int32),
    )


def _stay_candidates(state: BeamState, logp_t, blank: int, K: int,
                     parent_offset: int = 0):
    """(total, stay dict): each beam continued without appending.  Shared by
    the full-vocab and restricted-candidate builders."""
    total = _lse(state.pb, state.pnb)                      # (B, K)
    lp_blank = logp_t[:, None, blank]                      # (B, 1)
    lp_last = jnp.take_along_axis(
        logp_t[:, None, :].repeat(K, 1), jnp.maximum(state.last, 0)[..., None],
        axis=2)[..., 0]                                    # (B, K)
    stay_pb = total + lp_blank
    stay_pnb = jnp.where(state.last >= 0, state.pnb + lp_last, NEG_INF)
    B = logp_t.shape[0]
    pid = jnp.arange(K, dtype=jnp.int32) + parent_offset
    stay = {
        "pb": stay_pb, "pnb": stay_pnb, "lm": state.lm_s, "hash": state.hash,
        "ctx": state.ctx, "last": state.last,
        "parent": jnp.broadcast_to(pid[None, :], (B, K)),
        "append": jnp.full((B, K), -1, jnp.int32),
    }
    return total, stay


def _ext_ctx(state: BeamState, chars_bc, vocab: int, lm_table,
             ctx_window: bool):
    """Per-extension LM context: window shift (hashed fusion), dense roll
    (table fusion), or carried unchanged.  ``chars_bc`` is the (B, K, N)
    append-char array.  Shared by both candidate builders."""
    B, K, N = chars_bc.shape
    if ctx_window:
        # hashed-LM mode: the context is a token window (B, K, C); each
        # extension shifts in its char -> (B, K, N, C).
        C = state.ctx.shape[-1]
        base_ctx = jnp.broadcast_to(state.ctx[:, :, None, 1:],
                                    (B, K, N, C - 1)) if C > 1 else \
            jnp.zeros((B, K, N, 0), jnp.int32)
        return jnp.concatenate([base_ctx, chars_bc[..., None]], axis=-1)
    if lm_table is not None:
        n_ctx = lm_table.shape[0]
        return (state.ctx[..., None] * vocab + chars_bc) % n_ctx
    return jnp.broadcast_to(state.ctx[..., None], (B, K, N))


def _build_candidates(state: BeamState, logp_t, *, blank, vocab, lm_table,
                      lm_alpha, lm_beta, K, L, parent_offset: int = 0,
                      lm_rows=None, ctx_window: bool = False):
    """Stay + extension candidates for K beams.

    Returns (stay, ext): stay fields are (B, K) -- each beam continued
    without appending; ext fields are (B, K, V-1) -- each beam extended by
    each non-blank char.  The structure (rather than one flat concat) is what
    lets the merge run in O(K^2) (see _merge_topk).

    ``lm_rows`` (B, K, V): per-beam log P(c | prefix) from a neural LM whose
    state is carried outside BeamState; when given it replaces the n-gram
    table gather as the fusion source.
    """
    B = logp_t.shape[0]
    nb = vocab - 1                                         # non-blank count
    total, stay = _stay_candidates(state, logp_t, blank, K, parent_offset)

    # --- extension candidates (B, K, nb) -----------------------------------
    chars = jnp.arange(1, vocab, dtype=jnp.int32)          # non-blank ids
    chars_bc = jnp.broadcast_to(chars[None, None, :], (B, K, nb))
    lp_c = logp_t[:, None, 1:]                             # (B, 1, nb)
    is_repeat = chars[None, None, :] == state.last[..., None]
    base = jnp.where(is_repeat, state.pb[..., None], total[..., None])
    ext_pnb = base + lp_c
    full = state.length >= L
    ext_pnb = jnp.where(full[..., None], NEG_INF, ext_pnb)
    if lm_rows is not None:
        lm_add = lm_alpha * lm_rows[..., 1:] + lm_beta
        ext_lm = state.lm_s[..., None] + lm_add
        ext_ctx = _ext_ctx(state, chars_bc, vocab, None, ctx_window)
    elif lm_table is not None:
        lm_row = lm_table[state.ctx]                       # (B, K, V)
        lm_add = lm_alpha * lm_row[..., 1:] + lm_beta
        ext_lm = state.lm_s[..., None] + lm_add
        ext_ctx = _ext_ctx(state, chars_bc, vocab, lm_table, False)
    else:
        ext_lm = jnp.broadcast_to(state.lm_s[..., None], ext_pnb.shape)
        ext_ctx = _ext_ctx(state, chars_bc, vocab, None, False)
    ext_hash = state.hash[..., None] * HASH_MULT + chars[None, None, :]

    ext = {
        "pnb": ext_pnb, "lm": ext_lm, "hash": ext_hash, "ctx": ext_ctx,
        "last": chars_bc,
        "parent": jnp.broadcast_to(
            (jnp.arange(K, dtype=jnp.int32) + parent_offset)[None, :, None],
            (B, K, nb)),
        "append": chars_bc,
    }
    return stay, ext


def _build_candidates_topa(state: BeamState, logp_t, *, blank, vocab,
                           lm_table, lm_alpha, lm_beta, K, L, A,
                           lm_rows=None, hash_lm=None, ctx_window=False):
    """Extension candidates restricted to the frame's top-A acoustic set.

    The V-wide candidate axis is the cost driver of large-vocab fusion (the
    per-candidate hash-table gather is (B, K, V, 32) floats per frame); this
    builds ext fields (B, K, A) over the SHARED top-A chars of logp_t
    instead.  The search changes only when the beam would extend by a char
    outside the frame's top A — at A=128/V=1024 that char trails the 128th
    acoustic score, so it essentially never survives the merge (WER-parity
    tested).  Unlike ``lm_top_k`` (which approximates off-set scores with
    stacked backoffs), every candidate the search CAN take carries its exact
    LM score; n-gram lookup volume scales with A.

    Returns (stay, ext) where ext carries explicit ``chars`` (= append ids);
    merge with ``_merge_topk(..., sparse=True)``.
    """
    B = logp_t.shape[0]
    total, stay = _stay_candidates(state, logp_t, blank, K)

    lp_top, top_idx = jax.lax.top_k(logp_t, A)             # (B, A)
    chars = jnp.broadcast_to(top_idx[:, None, :], (B, K, A))
    lp_c = lp_top[:, None, :]
    is_repeat = chars == state.last[..., None]
    base = jnp.where(is_repeat, state.pb[..., None], total[..., None])
    ext_pnb = base + lp_c
    ext_pnb = jnp.where(state.length[..., None] >= L, NEG_INF, ext_pnb)
    ext_pnb = jnp.where(chars == blank, NEG_INF, ext_pnb)

    if hash_lm is not None:
        from pytorch_asr_tpu.decoding.lm_hashed import hashed_lm_logp_rows

        rows_a = hashed_lm_logp_rows(hash_lm, state.ctx, cands=chars)
        lm_add = lm_alpha * rows_a + lm_beta
        ext_lm = state.lm_s[..., None] + lm_add
    elif lm_rows is not None:                              # RNN-LM carry
        rows_a = jnp.take_along_axis(lm_rows, chars, axis=2)
        ext_lm = state.lm_s[..., None] + lm_alpha * rows_a + lm_beta
    elif lm_table is not None:
        lm_row = lm_table[state.ctx]                       # (B, K, V)
        rows_a = jnp.take_along_axis(lm_row, chars, axis=2)
        ext_lm = state.lm_s[..., None] + lm_alpha * rows_a + lm_beta
    else:
        ext_lm = jnp.broadcast_to(state.lm_s[..., None], ext_pnb.shape)

    ext_ctx = _ext_ctx(state, chars, vocab,
                       lm_table if not ctx_window else None, ctx_window)

    ext_hash = state.hash[..., None] * HASH_MULT + chars
    pid = jnp.arange(K, dtype=jnp.int32)
    ext = {
        "pnb": ext_pnb, "lm": ext_lm, "hash": ext_hash, "ctx": ext_ctx,
        "last": chars, "chars": chars,
        "parent": jnp.broadcast_to(pid[None, :, None], (B, K, A)),
        "append": chars,
    }
    return stay, ext


def _merge_topk(stay: dict, ext: dict, K: int, sparse: bool = False):
    """Absorb duplicate prefixes, keep top-K.  Returns (score, fields).

    Two candidates denote the same prefix iff their rolling hashes match,
    and live beams always have distinct hashes, so the only possible
    duplicates are structured:

      * stay-stay: impossible (dead beams carry no mass and are re-hashed
        to sentinels on selection);
      * ext-ext: ext(k, c) collides with ext(k', c') only if
        (h_k - h_k') * HASH_MULT == c' - c (mod 2^32) -- for distinct parent
        hashes that is a 32-bit hash collision, the same failure assumption
        hash-equality merging always makes;
      * ext(k, c) duplicates stay k' iff h_k' == h_k * HASH_MULT + c -- at
        most Kc*Ks pairs, found by a (B, Kc, Ks) match matrix.

    The previous implementation sorted all N = K(1+nb) candidates by hash
    and ran an O(N^2) segment-logsumexp: measured 700 us PER SCAN STEP at
    B=16 K=16 V=32 on v5e (XLA variadic sort + two (B, N, N) masked
    reductions), 30x the cost of all remaining per-step work.  This O(K^2)
    absorption computes the identical distribution.

    Measured non-lever: selecting the FLOAT fields below via a one-hot
    (B, K, N) contraction (the trick that bought 16x on the LM-carry
    reorder, _gather_lm) moved the full search only 104.6 -> 98.6 ms at the
    bench shape — within tunnel variance; the integer-field gathers and
    token rebuild dominate ``take``.  Kept as take_along_axis.
    """
    B, Ks = stay["hash"].shape
    nb = ext["pnb"].shape[2]
    alive = _lse(stay["pb"], stay["pnb"]) > NEG_INF / 2    # (B, Ks)
    if sparse:
        # Restricted-candidate mode (_build_candidates_topa): ext chars are
        # an arbitrary per-frame subset, so duplicates are found by DIRECT
        # hash equality against the stays (the identical 32-bit-collision
        # assumption the cmat path makes, minus its positional indexing).
        m4 = (ext["hash"][..., None] == stay["hash"][:, None, None, :]) \
            & alive[:, None, None, :] & (ext["chars"][..., None] >= 1)
        em4 = jnp.where(m4, ext["pnb"][..., None], NEG_INF)  # (B, Kc, A, Ks)
        m = jnp.max(em4, axis=(1, 2))                        # (B, Ks)
        add = jnp.where(
            m > NEG_INF / 2,
            m + jnp.log(jnp.sum(
                jnp.exp(em4 - jnp.maximum(m, NEG_INF)[:, None, None, :]),
                axis=(1, 2))),
            NEG_INF)
        stay_pnb = _lse(stay["pnb"], add)
        absorbed = jnp.any(m4, axis=3)                       # (B, Kc, A)
    else:
        # Char by which parent k's prefix would extend to stay k''s prefix.
        # int32 wraparound matches the rolling-hash update exactly.
        cmat = stay["hash"][:, None, :] - HASH_MULT * stay["hash"][:, :, None]
        match = (cmat >= 1) & (cmat <= nb) & alive[:, None, :]  # (B, Kc, Ks)
        em = jnp.take_along_axis(ext["pnb"], jnp.clip(cmat - 1, 0, nb - 1),
                                 axis=2)
        em = jnp.where(match, em, NEG_INF)                 # (B, Kc, Ks)
        m = jnp.max(em, axis=1)                            # (B, Ks)
        add = jnp.where(
            m > NEG_INF / 2,
            m + jnp.log(jnp.sum(
                jnp.exp(em - jnp.maximum(m, NEG_INF)[:, None, :]), axis=1)),
            NEG_INF)
        stay_pnb = _lse(stay["pnb"], add)
        # Absorbed exts must not be selected again (their mass now lives in
        # the stay): scatter the match back onto the (k, c) grid.
        hit = match[..., None] & (jax.nn.one_hot(
            jnp.clip(cmat - 1, 0, nb - 1), nb, dtype=bool))  # (B, Kc, Ks, nb)
        absorbed = jnp.any(hit, axis=2)                    # (B, Kc, nb)

    stay_score = _lse(stay["pb"], stay_pnb) + stay["lm"]
    ext_score = jnp.where(absorbed, NEG_INF, ext["pnb"] + ext["lm"])

    def flat(s, e):
        # stay (B, Ks, *rest) + ext (B, Kc, nb, *rest) -> (B, Ks + Kc*nb, *rest)
        return jnp.concatenate(
            [s, e.reshape((B, -1) + e.shape[3:])], axis=1)

    score = flat(stay_score, ext_score)
    top_score, top_idx = jax.lax.top_k(score, K)           # (B, K)

    def take(s, e):
        arr = flat(s, e)
        idx = top_idx.reshape((B, K) + (1,) * (arr.ndim - 2))
        return jnp.take_along_axis(
            arr, jnp.broadcast_to(idx, (B, K) + arr.shape[2:]), axis=1)
    dead = top_score <= NEG_INF / 2
    fields = {
        # Kill filler selections outright (beams with no surviving mass):
        # a dead filler may share a live beam's hash, and keeping its merged
        # fields would double-count that prefix on the next step.
        "pb": jnp.where(dead, NEG_INF,
                        take(stay["pb"], jnp.full(ext["pnb"].shape, NEG_INF))),
        "pnb": jnp.where(dead, NEG_INF, take(stay_pnb, ext["pnb"])),
        "lm": take(stay["lm"], ext["lm"]),
        "hash": jnp.where(dead, -(jnp.arange(K, dtype=jnp.int32) + 1)[None, :],
                          take(stay["hash"], ext["hash"])),
        "ctx": take(stay["ctx"], ext["ctx"]),
        "last": take(stay["last"], ext["last"]),
        "parent": take(stay["parent"], ext["parent"]),
        "append": take(stay["append"], ext["append"]),
    }
    return top_score, fields


def _apply_tokens(tokens, length, parent, append, L):
    """Rebuild token buffers/lengths after a merge step (parent is global)."""
    parent_tokens = jnp.take_along_axis(tokens, parent[..., None], axis=1)
    parent_len = jnp.take_along_axis(length, parent, axis=1)
    pos = jnp.arange(L)[None, None, :] == parent_len[..., None]
    ext_mask = (append >= 0)[..., None]
    new_tokens = jnp.where(pos & ext_mask, append[..., None], parent_tokens)
    new_len = parent_len + (append >= 0).astype(jnp.int32)
    return new_tokens, new_len


class LMCarry(NamedTuple):
    """Per-beam neural-LM state carried alongside BeamState."""
    h: jax.Array       # (layers, B, K, H)
    c: jax.Array       # (layers, B, K, H)
    logp: jax.Array    # (B, K, V) log P(next char | prefix)


def _gather_lm(carry: LMCarry, parent) -> LMCarry:
    """Reorder per-beam LM state by parent index via a one-hot contraction.

    ``take_along_axis`` here was THE RNN-fusion bottleneck: inside the beam
    scan XLA lowered the batched gather into a form costing ~1.7 ms/step
    (13x its standalone cost; measured v5e, B=16 K=16 H=256).  The K-way
    reorder as an explicit (B, K, K) one-hot einsum is a tiny MXU matmul
    the scheduler fuses cleanly: full RNN-fusion decode 1844 -> ~200 ms at
    T=1000 (scripts/bench_prefix_beam.py)."""
    onehot = jax.nn.one_hot(parent, carry.logp.shape[1],
                            dtype=jnp.float32)             # (B, K, Kp)

    def g(x):                                              # (B, K, ...) leaves
        return jnp.einsum("bkj,bj...->bk...", onehot, x)

    return LMCarry(h=jax.vmap(g)(carry.h), c=jax.vmap(g)(carry.c),
                   logp=g(carry.logp))


def _step(state: BeamState, logp_t, active, *, blank, vocab, lm_table,
          lm_alpha, lm_beta, lm_order, K, L, rnn_lm=None, rnn_lm_params=None,
          lm_carry: LMCarry | None = None, hash_lm=None, lm_top_k: int = 0,
          ext_top_a: int = 0):
    B = logp_t.shape[0]
    lm_rows = lm_carry.logp if lm_carry is not None else None
    if 0 < ext_top_a < vocab:
        # Restricted-candidate search: ext candidates = the frame's top-A
        # acoustic chars, exact LM everywhere the search can go (the
        # large-vocab fusion fast path; see _build_candidates_topa).
        stay, ext = _build_candidates_topa(
            state, logp_t, blank=blank, vocab=vocab, lm_table=lm_table,
            lm_alpha=lm_alpha, lm_beta=lm_beta, K=K, L=L, A=ext_top_a,
            lm_rows=lm_rows, hash_lm=hash_lm,
            ctx_window=hash_lm is not None)
        top_score, f = _merge_topk(stay, ext, K, sparse=True)
        return _finish_step(state, f, active, B, K, L, vocab,
                            rnn_lm, rnn_lm_params, lm_carry)
    if hash_lm is not None:
        # Hashed backoff n-gram (large-vocab fusion): score rows are a pure
        # function of the context window carried in state.ctx.
        from pytorch_asr_tpu.decoding.lm_hashed import (
            hashed_lm_allmiss_rows, hashed_lm_logp_rows)

        if 0 < lm_top_k < vocab:
            # Acoustic-pruned fusion (BPE-scale vocabs): exact table lookups
            # only for this frame's top-A acoustic candidates (shared across
            # beams); everything else gets the stacked-backoff approximation
            # — exact unless a low-acoustic candidate hits a higher-order
            # n-gram, and such candidates essentially never enter the beam.
            # Table-gather volume scales with A instead of V.  Measured
            # breakdown at V=1024 A=128 (991 us/frame total vs 165 no-LM):
            # ~450 us exact lookups, ~320 us the put_along_axis scatter +
            # top_k, ~60 us allmiss — the scatter is the next lever if this
            # path ever needs more (restricting the beam's ext candidates to
            # the top-A set would remove it, but changes the search itself).
            _, top_idx = jax.lax.top_k(logp_t, lm_top_k)       # (B, A)
            cands = jnp.broadcast_to(top_idx[:, None, :],
                                     (B, K, lm_top_k))
            exact = hashed_lm_logp_rows(hash_lm, state.ctx, cands=cands)
            lm_rows = jnp.put_along_axis(
                hashed_lm_allmiss_rows(hash_lm, state.ctx), cands, exact,
                axis=-1, inplace=False)
        else:
            lm_rows = hashed_lm_logp_rows(hash_lm, state.ctx)  # (B, K, V)
    stay, ext = _build_candidates(
        state, logp_t, blank=blank, vocab=vocab, lm_table=lm_table,
        lm_alpha=lm_alpha, lm_beta=lm_beta, K=K, L=L,
        lm_rows=lm_rows, ctx_window=hash_lm is not None)
    top_score, f = _merge_topk(stay, ext, K)
    return _finish_step(state, f, active, B, K, L, vocab,
                        rnn_lm, rnn_lm_params, lm_carry)


def _finish_step(state: BeamState, f: dict, active, B, K, L, vocab,
                 rnn_lm, rnn_lm_params, lm_carry: LMCarry | None):
    """Token rebuild, freeze, and RNN-LM carry advance after a merge."""
    parent, append = f["parent"], f["append"]
    new_pb, new_pnb = f["pb"], f["pnb"]

    new_tokens, new_len = _apply_tokens(state.tokens, state.length,
                                        parent, append, L)

    new_state = BeamState(
        tokens=new_tokens, length=new_len, pb=new_pb, pnb=new_pnb,
        lm_s=f["lm"], hash=f["hash"], ctx=f["ctx"], last=f["last"])

    # frozen rows (t >= logit_len) keep their old state
    keep = active[:, None]

    def freeze(new, old):
        return jnp.where(
            keep.reshape((B,) + (1,) * (new.ndim - 1)).astype(bool), new, old)

    merged = jax.tree.map(freeze, new_state, state)

    new_carry = None
    if lm_carry is not None:
        # LM state is a pure function of the prefix: gather by parent, then
        # advance only the beams that appended a char this step.
        from pytorch_asr_tpu.models.lm_rnn import LMState, lm_step_logp

        g = _gather_lm(lm_carry, parent)
        Lc, _, _, H = g.h.shape
        y = jnp.maximum(append, 0).reshape(B * K)
        stepped_logp, stepped = lm_step_logp(
            rnn_lm, rnn_lm_params, y,
            LMState(g.h.reshape(Lc, B * K, H), g.c.reshape(Lc, B * K, H)))
        ext = append >= 0                                  # (B, K)
        new_h = jnp.where(ext[None, :, :, None],
                          stepped.h.reshape(Lc, B, K, H), g.h)
        new_c = jnp.where(ext[None, :, :, None],
                          stepped.c.reshape(Lc, B, K, H), g.c)
        new_logp = jnp.where(ext[..., None],
                             stepped_logp.reshape(B, K, vocab), g.logp)
        act = active[:, None, None]
        new_carry = LMCarry(
            h=jnp.where(act[None, ..., 0:1], new_h, lm_carry.h),
            c=jnp.where(act[None, ..., 0:1], new_c, lm_carry.c),
            logp=jnp.where(act, new_logp, lm_carry.logp),
        )
    return merged, new_carry


@partial(jax.jit, static_argnames=("beam_size", "blank", "lm_alpha", "lm_beta",
                                   "lm_order", "max_len", "rnn_lm", "sos_id",
                                   "use_fused", "lm_top_k", "ext_top_a"))
def prefix_beam_search(
    logits: jax.Array,           # (B, T, V)
    logit_len: jax.Array,        # (B,)
    beam_size: int = 16,
    blank: int = 0,
    lm_table: jax.Array | None = None,
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    lm_order: int = 3,
    max_len: int = 256,
    rnn_lm=None,                 # CharRNNLM module (static) for neural fusion
    rnn_lm_params=None,
    sos_id: int = 29,
    hash_lm=None,                # lm_hashed.HashedNgramLM for large vocabs
    use_fused: bool | None = None,   # None: auto -- the lane-parallel fused
                                     # Pallas kernels for no-LM, dense-table,
                                     # and ext_top_a searches (no-LM, dense
                                     # +top-A, and in-kernel RNN-LM fusion,
                                     # round 5) on a real TPU at
                                     # kernel-validated sizes (lanes
                                     # <= 2048, B <= 64 -- rolled inner
                                     # loops past B=16 keep Mosaic compile
                                     # ~5 s; 1.9-7.7x the scan on v5e, see
                                     # ops/beam_pallas.py);
                                     # True: force them (any batch);
                                     # False: scan
    lm_top_k: int = 0,           # acoustic-pruned hashed fusion (see _step)
    ext_top_a: int = 0,          # restrict ext candidates to the frame's
                                 # top-A acoustic chars, exact LM on all of
                                 # them (_build_candidates_topa) -- the
                                 # recommended BPE/large-vocab mode
):
    """Returns (tokens (B, L), lengths (B,), scores (B,)) -- best beam per row.

    Fusion sources (mutually exclusive): ``lm_table`` — dense n-gram table
    gathered by rolling context id (small vocabs); ``hash_lm`` — hashed
    backoff tables evaluated on device (BPE/large vocabs, lm_hashed.py);
    ``rnn_lm`` + ``rnn_lm_params`` — neural char LM whose (h, c) state rides
    with each beam hypothesis on device.
    """
    B, T, V = logits.shape
    no_lm = (lm_table is None and rnn_lm is None and hash_lm is None
             and not ext_top_a)
    # Dense-table fusion runs inside the fused kernel too (round 4: table
    # VMEM-resident, one-hot MXU row gathers; 2.6x the scan-dense path on
    # v5e at B=16 K=16 V=32 n_ctx=1024 — 42 vs 111 us/frame).  Gate the
    # table to VMEM-safe sizes (<= 4096 contexts, <= 8 MB).
    dense_only = (lm_table is not None and rnn_lm is None and hash_lm is None
                  and not ext_top_a and not lm_top_k
                  and lm_table.shape[0] <= 4096
                  and lm_table.shape[0] * V * 4 <= 8 * 1024 * 1024)
    # Restricted-candidate search without LM sources: the top-A lane kernel
    # (round 4) runs the identical search (bit-equal scores on v5e) at 1.9x
    # the restricted scan / 4x the full scan (40.5 vs 77.3 / 163.9 us/frame
    # at B=16 K=16 V=1024 A=128) -- the production no-LM BPE decode path.
    # ext_top_a >= V means unrestricted in the scan (_step's guard), so it
    # must not dispatch the restricted kernel.
    topa_only = (0 < ext_top_a < V and lm_table is None and rnn_lm is None
                 and hash_lm is None and not lm_top_k)
    # Round 5: the restricted lane kernel also fuses a VMEM-safe dense table
    # (the BPE n-gram route -- dense_only's full-vocab lanes are refuted at
    # K*V = 16384) and the FULL neural LM (per-beam (h, c) + logp rows
    # resident in VMEM scratch, advanced in kernel).  Hashed backoff tables
    # are the recorded refutation: they are HBM-resident by design (tens of
    # MB) and a Mosaic one-hot gather's cost scales with table rows, so
    # in-kernel hashed fusion loses to the scan's native dynamic gather.
    dense_topa = (0 < ext_top_a < V and lm_table is not None
                  and rnn_lm is None and hash_lm is None and not lm_top_k
                  and lm_table.shape[0] <= 4096
                  and lm_table.shape[0] * V * 4 <= 8 * 1024 * 1024)
    rnn_topa = (0 < ext_top_a < V and rnn_lm is not None
                and lm_table is None and hash_lm is None and not lm_top_k)
    # Unrestricted RNN fusion (char-scale vocabs): the same kernel with
    # candidate lanes = all chars (top_a == V), gated by the K*V lane bound.
    rnn_full = (not ext_top_a and rnn_lm is not None and lm_table is None
                and hash_lm is None and not lm_top_k)
    if use_fused is None:
        # Auto: the lane-parallel fused kernel (ops/beam_pallas.py,
        # prefix_beam_fused_lanes) wins 3.5x over this scan on v5e at the
        # production decode shape (30 vs 106 us/frame, B=16 K=16 V=32,
        # round 4), and 2.6x with dense-table fusion.  Gated to no-LM or
        # dense-table searches on a real TPU at sizes the kernel layout was
        # validated at (candidate lanes <= 2048).
        is_topa = topa_only or dense_topa or rnn_topa
        lanes = beam_size * (ext_top_a if is_topa else V)
        # Batch gate (round 5): past B=16 the kernels auto-switch to ROLLED
        # inner loops (ops/beam_pallas.py::_use_rolled), which caps Mosaic
        # compile at ~5 s up to B=64 AND runs faster there (55.5 vs 99.9
        # us/frame at B=64; the unrolled body's 172 s compile was the old
        # blocker) -- auto now takes the kernel to B <= 64, the studied
        # bound; force use_fused=True beyond.  Gate on GLOBAL B (per-shard
        # B under a data mesh is only smaller), keeping the auto decision a
        # pure function of shapes+statics -- the jit cache key -- rather
        # than of the ambient mesh context at trace time.
        # The LM-fused top-A routes keep the round-4 B <= 16 cap: their
        # candidate-row gather (_gather_rows_topa) unrolls over B, so the
        # rolled-loop compile win does not apply (measured 121.9 s at B=64
        # for the RNN kernel) -- and at B=64 x T=50 the cross-algorithm LM
        # score drift (~1e-5) flips ~2e-4 of top-K decisions, so large-
        # batch LM-fused decode stays on the scan unless forced.
        b_cap = 16 if (dense_topa or rnn_topa or rnn_full) else 64
        use_fused = ((no_lm or dense_only or topa_only or dense_topa
                      or rnn_topa or rnn_full)
                     and jax.default_backend() == "tpu" and lanes <= 2048
                     and B <= b_cap)
    if use_fused:
        # Under an active data mesh the kernel runs per shard via shard_map,
        # which needs the batch divisible by the data axis; fall back to the
        # scan (which GSPMD partitions freely) instead of erroring.
        # CACHE CAVEAT: this reads the AMBIENT mesh at trace time, and the
        # mesh is not part of the jit cache key -- a trace cached outside
        # use_mesh() is reused under a later mesh (and vice versa), so this
        # fallback is only guaranteed on the first call per shape/static
        # combination.  Callers mixing meshed and unmeshed calls at the same
        # shapes should pass use_fused explicitly.
        from pytorch_asr_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        if mesh is not None and B % mesh.shape["data"] != 0:
            use_fused = False
    if use_fused and (topa_only or dense_topa):
        from jax.sharding import PartitionSpec as P

        from pytorch_asr_tpu.ops.beam_pallas import (
            prefix_beam_fused_lanes_topa)
        from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

        if dense_topa:
            fn = lambda lg, ln, tab: prefix_beam_fused_lanes_topa(  # noqa: E731
                lg, ln, beam_size, blank, max_len, ext_top_a,
                lm_table=tab, lm_alpha=lm_alpha, lm_beta=lm_beta)
            fn = maybe_data_shard_map(fn, in_specs=(P("data"), P("data"), P()),
                                      out_specs=(P("data"),) * 3)
            return fn(logits, logit_len, lm_table)
        fn = lambda lg, ln: prefix_beam_fused_lanes_topa(  # noqa: E731
            lg, ln, beam_size, blank, max_len, ext_top_a)
        fn = maybe_data_shard_map(fn, in_specs=(P("data"), P("data")),
                                  out_specs=(P("data"),) * 3)
        return fn(logits, logit_len)
    if use_fused and (rnn_topa or rnn_full):
        from jax.sharding import PartitionSpec as P

        from pytorch_asr_tpu.ops.beam_pallas import (
            prefix_beam_fused_lanes_topa_rnn)
        from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

        a_eff = ext_top_a if rnn_topa else V
        fn = lambda lg, ln, pp: prefix_beam_fused_lanes_topa_rnn(  # noqa: E731
            lg, ln, rnn_lm, pp, beam_size, blank, max_len, a_eff,
            lm_alpha=lm_alpha, lm_beta=lm_beta, sos_id=sos_id)
        fn = maybe_data_shard_map(
            fn, in_specs=(P("data"), P("data"),
                          jax.tree.map(lambda _: P(), rnn_lm_params)),
            out_specs=(P("data"),) * 3)
        return fn(logits, logit_len, rnn_lm_params)
    if use_fused and (no_lm or dense_only):
        from jax.sharding import PartitionSpec as P

        from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused_lanes
        from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

        fn = lambda lg, ln: prefix_beam_fused_lanes(  # noqa: E731
            lg, ln, beam_size, blank, max_len,
            lm_table=lm_table, lm_alpha=lm_alpha, lm_beta=lm_beta)
        fn = maybe_data_shard_map(fn, in_specs=(P("data"), P("data")),
                                  out_specs=(P("data"),) * 3)
        return fn(logits, logit_len)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    K, L = beam_size, max_len
    state = _init_state(B, K, L,
                        ctx_width=hash_lm.order - 1 if hash_lm is not None else 0)
    lm_carry = None
    if rnn_lm is not None:
        lm_carry = rnn_lm_carry_init(rnn_lm, rnn_lm_params, B, K, V, sos_id)
    step = partial(_step, blank=blank, vocab=V, lm_table=lm_table,
                   lm_alpha=lm_alpha, lm_beta=lm_beta, lm_order=lm_order,
                   K=K, L=L, rnn_lm=rnn_lm, rnn_lm_params=rnn_lm_params,
                   hash_lm=hash_lm, lm_top_k=lm_top_k, ext_top_a=ext_top_a)

    def scan_fn(carry, inp):
        state, lm_carry = carry
        t, logp_t = inp
        return step(state, logp_t, t < logit_len, lm_carry=lm_carry), None

    (state, _), _ = jax.lax.scan(
        scan_fn, (state, lm_carry), (jnp.arange(T), jnp.swapaxes(logp, 0, 1)))
    final = _lse(state.pb, state.pnb) + state.lm_s
    best = jnp.argmax(final, axis=1)                       # (B,)
    tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(state.length, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return tokens, lengths, scores


# ------------------------------------------------------------- streaming API
def rnn_lm_carry_init(rnn_lm, rnn_lm_params, B: int, K: int, V: int,
                      sos_id: int) -> LMCarry:
    """Per-beam neural-LM carry primed with <sos> (shared by the offline
    search and the streaming beam — the carry rides across chunks)."""
    from pytorch_asr_tpu.models.lm_rnn import lm_step_logp

    st0 = rnn_lm.apply({"params": rnn_lm_params}, B * K,
                       method=rnn_lm.init_state)
    logp0, st1 = lm_step_logp(
        rnn_lm, rnn_lm_params, jnp.full((B * K,), sos_id, jnp.int32), st0)
    Lc, _, H = st1.h.shape
    return LMCarry(h=st1.h.reshape(Lc, B, K, H),
                   c=st1.c.reshape(Lc, B, K, H),
                   logp=logp0.reshape(B, K, V))


def prefix_beam_init(B: int, beam_size: int, max_len: int,
                     ctx_width: int = 0) -> BeamState:
    """Fresh beam state for ``prefix_beam_continue`` (streaming decode).

    ``ctx_width``: hashed-LM context window width (order - 1) when streaming
    with hashed backoff fusion; 0 for no-LM / dense-table / RNN fusion.
    """
    return _init_state(B, beam_size, max_len, ctx_width=ctx_width)


def prefix_beam_continue(state: BeamState, logp: jax.Array,
                         n_valid: jax.Array, *, blank: int = 0,
                         lm_table: jax.Array | None = None,
                         lm_alpha: float = 0.0, lm_beta: float = 0.0,
                         hash_lm=None, rnn_lm=None, rnn_lm_params=None,
                         lm_carry: LMCarry | None = None,
                         lm_top_k: int = 0, ext_top_a: int = 0,
                         ) -> tuple[BeamState, LMCarry | None]:
    """Advance the beam over ONE chunk of (B, Tc, V) log-softmax frames.

    ``n_valid`` (B,): frames of this chunk to consume per row (trailing
    frames are frozen).  Because the offline search is a lax.scan of the
    SAME step function, feeding an utterance chunk-by-chunk through this is
    bitwise identical to ``prefix_beam_search`` on the concatenation — the
    streaming-beam parity contract (decoding/streaming.py, beam mode) — and
    that now includes every fusion source: the dense-table context id and
    hashed-LM context window ride ``state.ctx``; the RNN-LM (h, c) rides the
    returned ``lm_carry`` (initialize with ``rnn_lm_carry_init``, thread it
    through every chunk).  Returns (new state, new lm_carry).
    """
    B, Tc, V = logp.shape
    K = state.pb.shape[1]
    L = state.tokens.shape[2]
    step = partial(_step, blank=blank, vocab=V, lm_table=lm_table,
                   lm_alpha=lm_alpha, lm_beta=lm_beta, lm_order=3, K=K, L=L,
                   rnn_lm=rnn_lm, rnn_lm_params=rnn_lm_params,
                   hash_lm=hash_lm, lm_top_k=lm_top_k, ext_top_a=ext_top_a)

    def scan_fn(carry, inp):
        st, lmc = carry
        t, logp_t = inp
        return step(st, logp_t, t < n_valid, lm_carry=lmc), None

    (state, lm_carry), _ = jax.lax.scan(
        scan_fn, (state, lm_carry), (jnp.arange(Tc), jnp.swapaxes(logp, 0, 1)))
    return state, lm_carry


def beam_best(state: BeamState):
    """(tokens (B, L), lengths (B,), scores (B,)) of the current best beam."""
    final = _lse(state.pb, state.pnb) + state.lm_s
    best = jnp.argmax(final, axis=1)
    tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(state.length, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return tokens, lengths, scores
