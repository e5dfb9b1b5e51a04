"""Fully-fused Pallas CTC prefix beam search (BASELINE north star: "batched
prefix beam search ... with Pallas kernels for the prefix-beam-search inner
loops").

This kernel runs the ENTIRE decode as ONE Pallas program: all beam state
(token buffers included) lives in VMEM scratch for the whole utterance
batch, the grid streams (tc, B, V) log-prob chunks from HBM, and each
frame's candidate-build / hash-absorb merge / top-K / token-append runs
inside the kernel with zero HBM round-trips.

Algorithm: identical to decoding/prefix_beam.py (parity tests compare
token-for-token against it, and transitively against the host oracle) --
stay/extension candidates, O(K^2) hash-absorption of duplicate prefixes,
top-K with dead-filler kill.  Gathers are one-hot contractions (values) and
masked sums (int32 fields -- hashes don't fit f32); top-K is K rounds of
paired argmax over the structured (stay, ext) candidates (a (B, K, V) ->
(B, K*V) flatten is an unsupported Mosaic shape cast).

TWO kernels live here:

  * ``prefix_beam_fused`` -- the round-2 SCALARIZED layout: beam state kept
    (B, K) = 16x16 shaped, token buffers rebuilt in VMEM each frame via
    batched one-hot contractions.  Exact (bit-identical scores on v5e) but
    ~64 ms/frame vs the XLA scan's 176 us: every one of the ~50 ops per
    frame occupies 1/64 of the VPU and Mosaic scalarizes the small batched
    dot_generals that XLA fuses into a handful of wide kernels.  Kept as the
    measured refutation of that layout.

  * ``prefix_beam_fused_lanes`` -- the LANE-PARALLEL layout (round 4): all
    K*V extension candidates live in ONE flat (B, K*V) array whose lane
    axis fills the 8x128 VPU (512 lanes at K=16 V=32), per-beam fields are
    expanded to candidate lanes by static-slice broadcasts (no batched
    dot_generals anywhere), and the token buffers are gone entirely -- the
    kernel emits per-frame (parent, append) backpointers and the final
    token strings are reconstructed by one cheap XLA backtrace scan over
    the recorded (T, B, K) arrays.  This removes both scalarization sources
    of the first kernel: wide flat ops instead of (B, K)-shaped ones, and
    masked lane-reductions instead of one-hot matmul gathers.

    Dense n-gram shallow fusion runs INSIDE the lane kernel (round 4): the
    (n_ctx, V) table is VMEM-resident for the whole decode, per-beam rows
    P(c | ctx) are gathered by K one-hot MXU matmuls laid out straight into
    the flat candidate lanes, the rolled context id and accumulated fusion
    score ride in scratch, and candidates are ranked by the fused score --
    the complete LM-fused search with zero HBM round-trips per frame.
    Measured 2.6x the scan-dense path on v5e (42 vs 111 us/frame at B=16
    K=16 V=32 n_ctx=1024), token bit-parity on hardware.

    MEASURED BOUND of the flat-lane layout (round 4): at BPE scale the
    full-vocab lane array stops fitting the machine -- K*V = 16384 lanes at
    V=1024 measured 279 us/frame no-LM (vs the scan's ~105) with a 278 s
    Mosaic compile: the K top-K rounds and the K-wide absorb loop each scan
    ALL lanes, so per-frame work grows ~linearly in K*V while the VPU is
    already saturated past ~2048 lanes.  The use_fused auto gate therefore
    stays at K*V <= 2048.  The large-vocab answer is the RESTRICTED lane
    kernel below (``prefix_beam_fused_lanes_topa``): candidate lanes = the
    frame's top-A acoustic chars (K*A lanes; the exact same search as the
    scan's ``ext_top_a`` restricted-candidate mode), which puts BPE vocabs
    back in the lane regime where the layout wins.

ROUND 5 -- LM fusion inside the restricted (top-A) kernel.  Both large-
vocab fusion sources now run entirely in kernel, with all per-beam LM
state resident in VMEM scratch as b-major (B*K, .) 2-D arrays (row
r = b*K + k), so every reorder/lookup is rank-2 iota arithmetic plus
one-hot MXU matmuls -- the layout that sidesteps every Mosaic
scalarization/reshape limit the round-2 kernel hit:

  * ``prefix_beam_fused_lanes_topa(lm_table=...)`` -- dense n-gram rows
    gathered per frame by ONE (B*K, n_ctx) one-hot matmul + the shared
    candidate-lane gather.  Measured v5e B=16 K=16 V=1024 A=128
    n_ctx=1024 T=1000: 65.4 us/frame vs 502.7 for the like-for-like
    ext_top_a scan (7.7x) and 170.2 for the full-vocab dense scan (2.6x).
  * ``prefix_beam_fused_lanes_topa_rnn`` -- the FULL neural-LM step
    (embed one-hot matmul, LSTM layers, output projection, log-softmax)
    advances inside the kernel; per-beam (h, c) and logp rows ride
    scratch, reordered by parent via a (BK, BK) one-hot permutation
    matmul.  Measured v5e same shape, H=256 E=128 2 layers: 81.8 us/frame
    vs 501.7 for the ext_top_a + rnn scan (6.1x) and 170.8 for the
    full-vocab rnn scan (2.1x) -- the BASELINE "device-resident LM state"
    north star with zero HBM round-trips per frame.  TIME_CHUNK sweep for
    THIS kernel's heavier body (fresh process per point): tc=4 80.1
    us/frame (a wash vs tc=8's 81.8, within tunnel variance; 72 s
    compile), tc=16 compile exceeded 25 min -- tc=8 retained.  With
    ``top_a == V``
    the same kernel runs the UNRESTRICTED search (identity candidate
    one-hot, lane order == the scan's merge order): 46.7 vs 110.8 us/frame
    (2.4x) against the unrestricted rnn scan at char vocab (V=32 B=16
    K=16 H=256 1 layer).

  Hashed backoff tables remain the recorded REFUTATION for in-kernel
  fusion: they are HBM-resident by design (tens of MB of packed buckets)
  and a Mosaic gather must be a one-hot contraction whose cost scales
  with table rows -- at >= 2^17 rows that matmul alone dwarfs the scan's
  native dynamic gather, so hashed fusion stays on the scan path
  (lm_top_k / ext_top_a pruning, decoding/lm_hashed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.ops.runtime import pallas_interpret

NEG_INF = -1.0e30
HASH_MULT = 1000003
# Grid time-chunk (frames per kernel body iteration).  Swept on v5e at the
# bench shape (B=16 K=16 V=32 T=1000, round 4): tc=4 33.6 us/frame (6 s
# compile), tc=8 30.8 (14 s), tc=16 31.2 (40 s) -- 8 balances per-chunk
# grid overhead against unrolled-body compile cost; retained on evidence.
TIME_CHUNK = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _onehot_rows(idx, n):
    """(..., ) int32 -> (..., n) f32 one-hot (2-D+ iota; TPU-safe)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (n,), idx.ndim)
    return (lanes == idx[..., None]).astype(jnp.float32)


def _beam_kernel(logp_ref, len_ref,
                 tokens_out, len_out, score_out,
                 tokens_sc, length_sc, pb_sc, pnb_sc, hash_sc, last_sc,
                 *, tc: int, K: int, V: int, L: int, blank: int):
    ic = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    B = len_ref.shape[0]
    nb = V - 1
    # Extension candidates are V-wide (char 0 = blank permanently NEG_INF):
    # Mosaic cannot lane-slice logp at offset 1, and a dead slot preserves
    # the stay-then-ext candidate ordering (tie-breaking parity with XLA).
    kf = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)

    @pl.when(ic == 0)
    def _():
        tokens_sc[:] = jnp.zeros((B, K, L), jnp.int32)
        length_sc[:] = jnp.zeros((B, K), jnp.int32)
        pb_sc[:] = jnp.where(kf == 0, 0.0, NEG_INF)
        pnb_sc[:] = jnp.full((B, K), NEG_INF)
        hash_sc[:] = -(kf + 1)
        last_sc[:] = jnp.full((B, K), -1, jnp.int32)

    lens = len_ref[:]                            # (B, 1)

    for j in range(tc):
        t = ic * tc + j
        logp_t = logp_ref[j]                     # (B, V)
        pb, pnb = pb_sc[:], pnb_sc[:]
        hsh, last = hash_sc[:], last_sc[:]
        length = length_sc[:]
        total = jnp.logaddexp(pb, pnb)           # (B, K)

        # ---- stay candidates ------------------------------------------------
        lp_blank = logp_t[:, blank][:, None]     # (B, 1)
        oh_last = _onehot_rows(jnp.maximum(last, 0), V)       # (B, K, V)
        lp_last = jax.lax.dot_general(
            oh_last, logp_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)               # (B, K)
        stay_pb = total + lp_blank
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # ---- extension candidates (B, K, V); char 0 (blank) masked dead -----
        chars = jax.lax.broadcasted_iota(jnp.int32, (B, K, V), 2)
        lp_c = logp_t[:, None, :]
        is_rep = chars == last[..., None]
        base = jnp.where(is_rep, pb[..., None], total[..., None])
        ext_pnb = base + lp_c
        # (bool[..., None] reshapes are unsupported in Mosaic: compare at rank)
        ext_pnb = jnp.where(length[..., None] >= L, NEG_INF, ext_pnb)
        ext_pnb = jnp.where(chars == blank, NEG_INF, ext_pnb)

        # ---- O(K^2) hash absorption (prefix_beam._merge_topk) ---------------
        cmat = hsh[:, None, :] - HASH_MULT * hsh[:, :, None]  # (B, Kc, Ks)
        alive = jnp.logaddexp(stay_pb, stay_pnb) > NEG_INF / 2
        match = (cmat >= 1) & (cmat <= nb) & alive[:, None, :]
        oh_c = _onehot_rows(jnp.clip(cmat, 0, V - 1), V)      # (B,Kc,Ks,V)
        # em[b,k,k'] = ext_pnb[b,k,cmat] via one-hot contraction over V
        em = jax.lax.dot_general(
            oh_c.reshape(B * K, K, V), ext_pnb.reshape(B * K, V),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(B, K, K)
        em = jnp.where(match, em, NEG_INF)
        m = jnp.max(em, axis=1)                               # (B, Ks)
        add = jnp.where(
            m > NEG_INF / 2,
            m + jnp.log(jnp.sum(jnp.exp(em - jnp.maximum(m, NEG_INF)[:, None, :]),
                                axis=1)),
            NEG_INF)
        stay_pnb_m = jnp.logaddexp(stay_pnb, add)
        absorbed = jnp.sum(oh_c * match.astype(jnp.float32)[..., None],
                           axis=2) > 0.5                      # (B, Kc, V)

        stay_score = jnp.logaddexp(stay_pb, stay_pnb_m)
        ext_score = jnp.where(absorbed, NEG_INF, ext_pnb)

        # ---- top-K over (stays (B, K), exts (B, K, V)) ----------------------
        # No flattening: a (B, K, V) -> (B, K*V) reshape is an unsupported
        # Mosaic shape cast.  K rounds of paired argmax, selecting stays on
        # ties (stays precede exts in the canonical flat order, so this
        # reproduces lax.top_k tie-breaking of the XLA beam exactly).
        flat3 = kf[..., None] * V + chars                         # (B, K, V)
        work_s = stay_score
        work_e = ext_score
        sel_par, sel_app, sel_sc, sel_st = [], [], [], []
        for _ in range(K):
            bs = jnp.max(work_s, axis=1)                          # (B,)
            be = jnp.max(jnp.max(work_e, axis=2), axis=1)         # (B,)
            ts = jnp.where(bs >= be, 1, 0)                        # i32 (B,)
            s_idx = jnp.min(jnp.where(work_s == bs[:, None], kf, K), axis=1)
            e_flat = jnp.min(jnp.min(
                jnp.where(work_e == be[:, None, None], flat3, K * V),
                axis=2), axis=1)                                  # (B,)
            par = jnp.where(ts == 1, s_idx, e_flat // V)
            app = jnp.where(ts == 1, -1, e_flat % V)
            sel_par.append(par[:, None])
            sel_app.append(app[:, None])
            sel_sc.append(jnp.maximum(bs, be)[:, None])
            sel_st.append(ts[:, None])
            work_s = jnp.where((kf == s_idx[:, None]) & (ts[:, None] == 1),
                               NEG_INF, work_s)
            work_e = jnp.where((flat3 == e_flat[:, None, None])
                               & (ts[:, None, None] == 0), NEG_INF, work_e)
        parent = jnp.concatenate(sel_par, axis=1)                 # (B, K)
        append = jnp.concatenate(sel_app, axis=1)
        top_score = jnp.concatenate(sel_sc, axis=1)
        is_stay = jnp.concatenate(sel_st, axis=1) == 1
        dead = top_score <= NEG_INF / 2

        # ---- gather fields by parent ----------------------------------------
        ohp = _onehot_rows(parent, K)                             # (B, K, K)

        def by_parent_f32(x):                                     # (B, K) f32
            return jax.lax.dot_general(
                ohp, x, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        def by_parent_i32(x):                                     # (B, K) i32
            return jnp.sum(jnp.where(ohp > 0.5, x[:, None, :], 0), axis=2)

        g_pb = by_parent_f32(stay_pb)
        g_pnb_stay = by_parent_f32(stay_pnb_m)
        # ext pnb of the selected char: ext_pnb[b, parent, append-1]
        oh_a = _onehot_rows(jnp.clip(append, 0, V - 1), V)        # (B, K, V)
        g_ext_all = jax.lax.dot_general(                          # (B, K, V)
            ohp, ext_pnb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        g_pnb_ext = jnp.sum(g_ext_all * oh_a, axis=2)
        new_pb = jnp.where(dead, NEG_INF, jnp.where(is_stay, g_pb, NEG_INF))
        new_pnb = jnp.where(dead, NEG_INF,
                            jnp.where(is_stay, g_pnb_stay, g_pnb_ext))
        g_hash = by_parent_i32(hsh)
        g_last = by_parent_i32(last)
        g_len = by_parent_i32(length)
        new_hash = jnp.where(dead, -(kf + 1),
                             jnp.where(is_stay, g_hash,
                                       g_hash * HASH_MULT + append))
        new_last = jnp.where(is_stay, g_last, append)
        new_len = g_len + jnp.where(is_stay, 0, 1)

        # ---- token buffers: parent gather (one-hot MXU matmul; token ids
        # < V << 2^24 so f32 is exact) + append write --------------------------
        toks = tokens_sc[:]                                       # (B, K, L)
        g_toks_f = jax.lax.dot_general(
            ohp, toks.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)                   # (B, K, L)
        g_toks = jnp.round(g_toks_f).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, K, L), 2)
        ext_i = jnp.where(is_stay, 0, 1)[..., None]           # i32, rank-3 born
        wr = (pos == g_len[..., None]) & (ext_i == 1)
        new_toks = jnp.where(wr, append[..., None], g_toks)

        # ---- freeze rows past their length -----------------------------------
        act = (t < lens)                                          # (B, 1)
        act3 = lens[..., None] > t                                # (B, 1, 1)
        tokens_sc[:] = jnp.where(act3, new_toks, toks)
        length_sc[:] = jnp.where(act, new_len, length)
        pb_sc[:] = jnp.where(act, new_pb, pb)
        pnb_sc[:] = jnp.where(act, new_pnb, pnb)
        hash_sc[:] = jnp.where(act, new_hash, hsh)
        last_sc[:] = jnp.where(act, new_last, last)

    @pl.when(ic == n_chunks - 1)
    def _():
        final = jnp.logaddexp(pb_sc[:], pnb_sc[:])                # (B, K)
        best = jnp.max(final, axis=1, keepdims=True)
        kk = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        bidx = jnp.min(jnp.where(final == best, kk, K), axis=1)   # (B,)
        ohb = _onehot_rows(bidx, K)                               # (B, K)
        sel = jax.lax.dot_general(
            ohb[:, None, :], tokens_sc[:].astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)[:, 0, :]          # (B, L)
        tokens_out[:] = jnp.round(sel).astype(jnp.int32)
        len_out[:] = jnp.sum(jnp.where(ohb > 0.5, length_sc[:], 0),
                             axis=1, keepdims=True)
        score_out[:] = best


def prefix_beam_fused(logits, logit_len, beam_size: int = 16, blank: int = 0,
                      max_len: int = 256):
    """One-kernel CTC prefix beam search (no LM fusion -- see module doc).

    Returns (tokens (B, L), lengths (B,), scores (B,)), matching
    decoding.prefix_beam.prefix_beam_search(lm_table=None) exactly.
    """
    B, T, V = logits.shape
    K, L = beam_size, max_len
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tc = TIME_CHUNK
    t_pad = _round_up(T, tc)
    n_chunks = t_pad // tc
    logp_tbv = jnp.swapaxes(
        jnp.pad(logp, ((0, 0), (0, t_pad - T), (0, 0))), 0, 1)
    kern = functools.partial(_beam_kernel, tc=tc, K=K, V=V, L=L,
                             blank=blank)
    tokens, lens, scores = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, B, V), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # logit_len (B, 1)
        ],
        out_specs=[
            pl.BlockSpec((B, L), lambda i: (0, 0)),
            pl.BlockSpec((B, 1), lambda i: (0, 0)),
            pl.BlockSpec((B, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K, L), jnp.int32),             # token buffers
            pltpu.VMEM((B, K), jnp.int32),                # lengths
            pltpu.VMEM((B, K), jnp.float32),              # pb
            pltpu.VMEM((B, K), jnp.float32),              # pnb
            pltpu.VMEM((B, K), jnp.int32),                # rolling hash
            pltpu.VMEM((B, K), jnp.int32),                # last char
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(logp_tbv, logit_len.astype(jnp.int32)[:, None])
    return tokens, lens[:, 0], scores[:, 0]


# ---------------------------------------------------------------------------
# Lane-parallel fused beam (round 4) -- see module docstring.
# ---------------------------------------------------------------------------

_I32_BIG = 2**31 - 1


def _expand_beam_field(x, K: int, V: int):
    """(B, K) -> (B, K*V): beam k's value repeated over its V candidate
    lanes.  Static lane slices + broadcasts + one concat: no gathers, no
    dot_generals, nothing for Mosaic to scalarize."""
    B = x.shape[0]
    return jnp.concatenate(
        [jnp.broadcast_to(x[:, k:k + 1], (B, V)) for k in range(K)], axis=1)


def _absorb(hsh, alive, ext_hash, ext_pnb, c_flat, blank: int, K: int,
            rank3: bool = False):
    """Hash absorption over flat candidate lanes: ext lanes whose extended
    prefix equals stay k' merge their acoustic mass into that stay.

    Returns (add (B, K) log-mass to logaddexp into stay_pnb, abs_m (B, N)
    absorbed-lane mask).  Two layouts:

      * loop (default): K iterations, each one full-lane compare + masked
        logsumexp over (B, N) -- ~6 rank-2 ops per target stay.
      * rank3: all K targets at once on (B, K, N) arrays -- ~8 rank-3 ops
        total (bool masks lifted to int32: i1 rank-expansion is unsupported
        in Mosaic).  Measured a WASH on v5e at the bench shape (two
        alternated runs: 32.1/30.3 then 30.6/30.4 ms vs the loop) -- the
        op-count saving is repaid in (B, K, N) VPU/VMEM traffic.  The loop
        stays default (simpler, known-good across all lane kernels); the
        variant is kept as the recorded study.
    """
    if rank3:
        # (bool (i1) rank-expansion is unsupported in Mosaic: lift the
        # rank-2 masks to int32 before inserting dims, compare at rank 3)
        lane_ok_i = jnp.where((c_flat >= 1) & (c_flat != blank), 1, 0)
        alive_i = jnp.where(alive, 1, 0)                        # (B, K) i32
        m3 = ((ext_hash[:, None, :] == hsh[:, :, None])
              & (lane_ok_i[:, None, :] > 0)
              & (alive_i[:, :, None] > 0))                      # (B, K, N)
        vals3 = jnp.where(m3, ext_pnb[:, None, :], NEG_INF)
        mx = jnp.max(vals3, axis=2)                             # (B, K)
        s = jnp.sum(jnp.exp(vals3 - mx[:, :, None]), axis=2)
        add = jnp.where(mx > NEG_INF / 2, mx + jnp.log(s), NEG_INF)
        return add, jnp.any(m3, axis=1)
    if _use_rolled(hsh.shape[0]):
        B = hsh.shape[0]
        kf = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        return _absorb_rolled(hsh, alive, ext_hash, ext_pnb, c_flat, blank,
                              K, kf)
    abs_m = c_flat < 0                                          # all-False
    add_cols = []
    for k2 in range(K):
        m = ((ext_hash == hsh[:, k2:k2 + 1]) & (c_flat >= 1)
             & (c_flat != blank) & alive[:, k2:k2 + 1])
        vals = jnp.where(m, ext_pnb, NEG_INF)
        mx = jnp.max(vals, axis=1)                              # (B,)
        s = jnp.sum(jnp.exp(vals - mx[:, None]), axis=1)
        add_cols.append(jnp.where(mx > NEG_INF / 2, mx + jnp.log(s),
                                  NEG_INF)[:, None])
        abs_m = abs_m | m
    return jnp.concatenate(add_cols, axis=1), abs_m


ABSORB_RANK3 = False

# Rolled inner loops (round 5, the Mosaic COMPILE-TIME axis): when True the
# K-round top-K selection and the K-target absorb run as lax.fori_loop
# bodies (one traced body instead of K unrolled copies), shrinking the
# kernel IR ~K-fold at the cost of loop carries.  Same math, bit-identical
# selection (parity-pinned).  MEASURED on v5e (scripts/bench_beam_compile.py,
# no-LM lanes kernel, K=16 V=32 T=1000, each setting in its own process --
# the jit cache does not key on this flag):
#
#     B   unrolled compile/run      rolled compile/run
#     16      15.2 s / 34.1 us         2.5 s / 37.8 us
#     32      36.2 s / 66.5 us         2.9 s / 42.2 us
#     64     106.8 s / 99.9 us         5.4 s / 55.5 us
#
# Rolled compiles ~20x faster at B=64 AND runs 1.8x faster there (0.87
# us/utt-frame, the best point measured); only B=16 pays ~11% runtime.
# The kernels therefore AUTO-pick: unrolled at B <= 16 (the round-4
# headline layout), rolled beyond -- which lifts the use_fused auto gate
# from B <= 16 to B <= 64 (decoding/prefix_beam.py).  This global forces
# rolled everywhere when True (used by the study script).
ROLLED_INNER = False


def _use_rolled(B: int) -> bool:
    return ROLLED_INNER or B > 16


def _absorb_rolled(hsh, alive, ext_hash, ext_pnb, c_flat, blank: int,
                   K: int, kf):
    """lax.fori_loop form of _absorb: one traced body, K iterations.
    Per-target stay fields are extracted by masked lane reductions (dynamic
    lane slicing is unsupported in Mosaic)."""
    B = hsh.shape[0]
    alive_i = jnp.where(alive, 1, 0)

    # Loop carries stay f32/i32: Mosaic cannot legalize scf.for with i1
    # (bool) carried vectors (measured: "failed to legalize 'scf.for'"),
    # so the absorbed mask rides as int32 and converts on exit.
    def body(k2, carry):
        add_acc, abs_i = carry
        col = kf == k2                                      # (B, K)
        h_k2 = jnp.sum(jnp.where(col, hsh, 0), axis=1, keepdims=True)
        a_k2 = jnp.sum(jnp.where(col, alive_i, 0), axis=1,
                       keepdims=True) > 0
        m = ((ext_hash == h_k2) & (c_flat >= 1) & (c_flat != blank) & a_k2)
        vals = jnp.where(m, ext_pnb, NEG_INF)
        mx = jnp.max(vals, axis=1)
        s = jnp.sum(jnp.exp(vals - mx[:, None]), axis=1)
        add_col = jnp.where(mx > NEG_INF / 2, mx + jnp.log(s), NEG_INF)
        return (jnp.where(col, add_col[:, None], add_acc),
                jnp.where(m, 1, abs_i))

    add0 = jnp.full((B, K), NEG_INF)
    abs0 = jnp.zeros(c_flat.shape, jnp.int32)
    add, abs_i = jax.lax.fori_loop(0, K, body, (add0, abs0))
    return add, abs_i > 0


def _paired_topk_select_rolled(K, kf, flat_idx, stay_score, ext_score,
                               c_flat, par_flat, fields):
    """lax.fori_loop form of _paired_topk_select: one traced round body,
    K iterations, per-round results written into (B, K) accumulator columns
    by iota masks.  Selection order and tie-breaking identical."""
    B, N = ext_score.shape

    def body(r, carry):
        work_s, work_e, par_a, app_a, sc_a, f_accs = carry
        bs = jnp.max(work_s, axis=1)
        be = jnp.max(work_e, axis=1)
        is_stay = bs >= be
        s_idx = jnp.min(jnp.where(work_s == bs[:, None], kf, K), axis=1)
        e_idx = jnp.min(jnp.where(work_e == be[:, None], flat_idx, N),
                        axis=1)
        m_s = kf == s_idx[:, None]
        m_e = flat_idx == e_idx[:, None]

        def exs(x, kind):
            if kind == "f":
                return jnp.max(jnp.where(m_s, x, NEG_INF), axis=1)
            return jnp.min(jnp.where(m_s, x, _I32_BIG), axis=1)

        def exe(x, kind):
            if kind == "f":
                return jnp.max(jnp.where(m_e, x, NEG_INF), axis=1)
            return jnp.min(jnp.where(m_e, x, _I32_BIG), axis=1)

        col = kf == r
        par_r = jnp.where(is_stay, s_idx, exe(par_flat, "i"))
        app_r = jnp.where(is_stay, -1, exe(c_flat, "i"))
        new_f = []
        for acc, (st, ex, kind) in zip(f_accs, fields):
            e_val = (jnp.full_like(bs, NEG_INF) if ex is None
                     else exe(ex, kind))
            v = jnp.where(is_stay, exs(st, kind), e_val)
            new_f.append(jnp.where(col, v[:, None], acc))
        return (jnp.where(m_s & is_stay[:, None], NEG_INF, work_s),
                jnp.where(m_e & (~is_stay)[:, None], NEG_INF, work_e),
                jnp.where(col, par_r[:, None], par_a),
                jnp.where(col, app_r[:, None], app_a),
                jnp.where(col, jnp.maximum(bs, be)[:, None], sc_a),
                tuple(new_f))

    f0 = tuple(
        jnp.zeros((B, K), jnp.float32 if kind == "f" else jnp.int32)
        for _, _, kind in fields)
    init = (stay_score, ext_score, jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B, K), jnp.int32), jnp.zeros((B, K), jnp.float32),
            f0)
    (_, _, parent, append, top_score, f_accs) = jax.lax.fori_loop(
        0, K, body, init)
    return parent, append, top_score, list(f_accs)


def _paired_topk_select(K, kf, flat_idx, stay_score, ext_score, c_flat,
                        par_flat, fields):
    """K rounds of paired argmax over stays (B, K) + flat ext lanes (B, N).

    Shared by the lane kernels.  Stays win ties (they precede exts in the
    canonical flat order, reproducing lax.top_k tie-breaking of the XLA
    merge); among exts the lowest flat index wins.  Selected rows' fields
    are extracted at selection time by masked lane reductions.

    ``fields``: list of (stay_arr (B, K), ext_arr (B, N) | None, kind)
    where kind is 'f' (float, NEG_INF fill) or 'i' (int32, big fill); an
    ext_arr of None selects NEG_INF for ext picks (e.g. pb).

    Returns (parent, append, top_score, selected) with every output
    (B, K) and ``selected`` ordered like ``fields``.
    """
    if _use_rolled(stay_score.shape[0]):
        return _paired_topk_select_rolled(K, kf, flat_idx, stay_score,
                                          ext_score, c_flat, par_flat,
                                          fields)
    N = ext_score.shape[1]
    work_s, work_e = stay_score, ext_score
    sp, sa, ss = [], [], []
    sel = [[] for _ in fields]
    for _ in range(K):
        bs = jnp.max(work_s, axis=1)
        be = jnp.max(work_e, axis=1)
        is_stay = bs >= be                                 # stays win ties
        s_idx = jnp.min(jnp.where(work_s == bs[:, None], kf, K), axis=1)
        e_idx = jnp.min(jnp.where(work_e == be[:, None], flat_idx, N),
                        axis=1)
        m_s = kf == s_idx[:, None]                         # (B, K)
        m_e = flat_idx == e_idx[:, None]                   # (B, N)

        def exs(x, kind, m_s=m_s):
            if kind == "f":
                return jnp.max(jnp.where(m_s, x, NEG_INF), axis=1)
            return jnp.min(jnp.where(m_s, x, _I32_BIG), axis=1)

        def exe(x, kind, m_e=m_e):
            if kind == "f":
                return jnp.max(jnp.where(m_e, x, NEG_INF), axis=1)
            return jnp.min(jnp.where(m_e, x, _I32_BIG), axis=1)

        app_r = jnp.where(is_stay, -1, exe(c_flat, "i"))
        sp.append(jnp.where(is_stay, s_idx, exe(par_flat, "i"))[:, None])
        sa.append(app_r[:, None])
        ss.append(jnp.maximum(bs, be)[:, None])
        for out, (st, ex, kind) in zip(sel, fields):
            e_val = (jnp.full_like(bs, NEG_INF) if ex is None
                     else exe(ex, kind))
            out.append(jnp.where(is_stay, exs(st, kind), e_val)[:, None])
        work_s = jnp.where(m_s & is_stay[:, None], NEG_INF, work_s)
        work_e = jnp.where(m_e & (~is_stay)[:, None], NEG_INF, work_e)
    return (jnp.concatenate(sp, axis=1), jnp.concatenate(sa, axis=1),
            jnp.concatenate(ss, axis=1),
            [jnp.concatenate(o, axis=1) for o in sel])


def _beam_kernel_lanes(logp_ref, len_ref, lm_ref, par_out, app_out,
                       score_out, len_out,
                       pb_sc, pnb_sc, hash_sc, last_sc, length_sc,
                       lms_sc, ctx_sc,
                       *, tc: int, K: int, V: int, L: int, blank: int,
                       lm: bool, n_ctx: int, lm_alpha: float, lm_beta: float):
    ic = pl.program_id(0)
    B = len_ref.shape[0]
    KV = K * V
    kf = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    c_flat = jnp.concatenate([iota_v] * K, axis=1)             # (B, KV)
    par_flat = jnp.concatenate(
        [jnp.full((B, V), k, jnp.int32) for k in range(K)], axis=1)
    flat_idx = jax.lax.broadcasted_iota(jnp.int32, (B, KV), 1)  # k*V + c
    if lm:
        iota_ctx = jax.lax.broadcasted_iota(jnp.int32, (B, n_ctx), 1)
        lm_tab = lm_ref[:]                                     # (n_ctx, V)

    @pl.when(ic == 0)
    def _():
        pb_sc[:] = jnp.where(kf == 0, 0.0, NEG_INF)
        pnb_sc[:] = jnp.full((B, K), NEG_INF)
        hash_sc[:] = -(kf + 1)
        last_sc[:] = jnp.full((B, K), -1, jnp.int32)
        length_sc[:] = jnp.zeros((B, K), jnp.int32)
        lms_sc[:] = jnp.zeros((B, K), jnp.float32)
        ctx_sc[:] = jnp.zeros((B, K), jnp.int32)

    lens = len_ref[:]                                          # (B, 1)

    for j in range(tc):
        t = ic * tc + j
        logp_t = logp_ref[j]                                   # (B, V)
        lp_flat = jnp.concatenate([logp_t] * K, axis=1)        # (B, KV)
        pb, pnb = pb_sc[:], pnb_sc[:]
        hsh, last, length = hash_sc[:], last_sc[:], length_sc[:]
        lms, ctx = lms_sc[:], ctx_sc[:]
        total = jnp.logaddexp(pb, pnb)

        # ---- stay candidates (B, K) ----------------------------------------
        lp_blank = logp_t[:, blank][:, None]
        lp_last = jnp.concatenate(
            [jnp.sum(jnp.where(iota_v == last[:, k:k + 1], logp_t, 0.0),
                     axis=1)[:, None] for k in range(K)], axis=1)
        stay_pb = total + lp_blank
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # ---- extension candidates, flat over lanes (B, KV) -----------------
        is_rep = c_flat == _expand_beam_field(last, K, V)
        base = jnp.where(is_rep, _expand_beam_field(pb, K, V),
                         _expand_beam_field(total, K, V))
        len_f = _expand_beam_field(length, K, V)
        ext_pnb = base + lp_flat
        ext_pnb = jnp.where(len_f >= L, NEG_INF, ext_pnb)
        ext_pnb = jnp.where(c_flat == blank, NEG_INF, ext_pnb)
        ext_hash = _expand_beam_field(hsh, K, V) * HASH_MULT + c_flat

        # ---- dense-LM fusion (static branch): per-beam rows P(c | ctx_k)
        # gathered from the VMEM-resident (n_ctx, V) table by K one-hot MXU
        # matmuls (exact: one-hot rows select a single table row), laid out
        # straight into flat candidate lanes -- no (B, K, V) intermediates,
        # so nothing for Mosaic to scalarize or reshape -----------------------
        if lm:
            row_cols = []
            for k in range(K):
                oh_k = (iota_ctx == ctx[:, k:k + 1]).astype(jnp.float32)
                row_cols.append(jax.lax.dot_general(
                    oh_k, lm_tab,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32))       # (B, V)
            rows_flat = jnp.concatenate(row_cols, axis=1)      # (B, KV)
            # same association order as the scan path (_build_candidates):
            # ext_lm = lm_s + (alpha * row + beta)
            ext_lm = _expand_beam_field(lms, K, V) \
                + (lm_alpha * rows_flat + lm_beta)
            # Floored mod (NOT lax.rem, which is truncated): if ctx*V + c
            # wraps int32 negative at a very large table, truncated rem
            # yields a negative context id whose one-hot gather silently
            # matches no table row, while the scan's `%` wraps to a valid
            # row -- floored mod keeps bit-parity even under wraparound.
            raw = _expand_beam_field(ctx, K, V) * V + c_flat
            r = jax.lax.rem(raw, jnp.int32(n_ctx))
            ctx_lane = jnp.where(r < 0, r + n_ctx, r)          # (B, KV)
        else:
            ext_lm = _expand_beam_field(lms, K, V)
            ctx_lane = _expand_beam_field(ctx, K, V)

        # ---- hash absorption: ext(k, c) whose prefix equals stay k' --------
        # (same O(K^2) family as the XLA merge; see _absorb for the layout
        # study)
        alive = jnp.logaddexp(stay_pb, stay_pnb) > NEG_INF / 2  # (B, K)
        add, abs_m = _absorb(hsh, alive, ext_hash, ext_pnb, c_flat, blank, K,
                             rank3=ABSORB_RANK3)
        stay_pnb_m = jnp.logaddexp(stay_pnb, add)

        # Rank by the FUSED score (acoustic + accumulated LM), exactly like
        # _merge_topk: stay rank = lse(pb, pnb_merged) + lm_s; ext rank =
        # ext_pnb + ext_lm (NEG_INF for absorbed lanes).
        if lm:
            stay_score = jnp.logaddexp(stay_pb, stay_pnb_m) + lms
            ext_score = jnp.where(abs_m, NEG_INF, ext_pnb + ext_lm)
        else:
            stay_score = jnp.logaddexp(stay_pb, stay_pnb_m)
            ext_score = jnp.where(abs_m, NEG_INF, ext_pnb)

        # ---- top-K: K rounds of paired argmax; fields extracted at
        # selection time by masked lane reductions (no parent gathers) ------
        parent, append, top_score, picked = _paired_topk_select(
            K, kf, flat_idx, stay_score, ext_score, c_flat, par_flat,
            [(stay_pb, None, "f"), (stay_pnb_m, ext_pnb, "f"),
             (hsh, ext_hash, "i"), (last, c_flat, "i"),
             (length, len_f + 1, "i"), (lms, ext_lm, "f"),
             (ctx, ctx_lane, "i")])
        g_pb, g_pnb, g_hash, new_last, new_len, new_lms, new_ctx = picked
        dead = top_score <= NEG_INF / 2
        new_pb = jnp.where(dead, NEG_INF, g_pb)
        new_pnb = jnp.where(dead, NEG_INF, g_pnb)
        new_hash = jnp.where(dead, -(kf + 1), g_hash)
        # new_lms/new_ctx: no dead reset (scan parity)

        # ---- freeze rows past their length; record backpointers ------------
        act = t < lens                                          # (B, 1)
        pb_sc[:] = jnp.where(act, new_pb, pb)
        pnb_sc[:] = jnp.where(act, new_pnb, pnb)
        hash_sc[:] = jnp.where(act, new_hash, hsh)
        last_sc[:] = jnp.where(act, new_last, last)
        length_sc[:] = jnp.where(act, new_len, length)
        lms_sc[:] = jnp.where(act, new_lms, lms)
        ctx_sc[:] = jnp.where(act, new_ctx, ctx)
        par_out[j] = jnp.where(act, parent, kf)
        app_out[j] = jnp.where(act, append, -1)

    score_out[:] = jnp.logaddexp(pb_sc[:], pnb_sc[:]) + lms_sc[:]
    len_out[:] = length_sc[:]


def _backtrace(parents, appends, best, L: int):
    """Token strings from per-frame backpointers: follow the best beam's
    parent chain backward collecting appended chars, then left-pack."""
    def step(k_cur, pa):
        par_t, app_t = pa
        tok = jnp.take_along_axis(app_t, k_cur[:, None], axis=1)[:, 0]
        k_prev = jnp.take_along_axis(par_t, k_cur[:, None], axis=1)[:, 0]
        return k_prev, tok

    _, toks_rev = jax.lax.scan(step, best, (parents[::-1], appends[::-1]))
    fwd = toks_rev[::-1]                                        # (T, B)
    valid = fwd >= 0
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=0) - 1       # (T, B)
    oh = (pos[..., None] == jnp.arange(L)[None, None, :]) & valid[..., None]
    return jnp.sum(jnp.where(oh, fwd[..., None], 0), axis=0).astype(jnp.int32)


def prefix_beam_fused_lanes(logits, logit_len, beam_size: int = 16,
                            blank: int = 0, max_len: int = 256,
                            lm_table=None, lm_alpha: float = 0.0,
                            lm_beta: float = 0.0):
    """Lane-parallel one-kernel CTC prefix beam search.

    Returns (tokens (B, L), lengths (B,), scores (B,)), matching
    decoding.prefix_beam.prefix_beam_search exactly -- including dense
    n-gram shallow fusion when ``lm_table`` (n_ctx, V) is given: the table
    lives VMEM-resident for the whole decode, per-beam rows P(c | ctx) are
    gathered by one-hot MXU matmuls straight into the flat candidate lanes,
    and the rolled context id + accumulated fusion score ride in scratch
    alongside the acoustic beam state.  The full LM-fused search runs with
    zero HBM round-trips per frame.
    """
    B, T, V = logits.shape
    K, L = beam_size, max_len
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tc = TIME_CHUNK
    t_pad = _round_up(T, tc)
    n_chunks = t_pad // tc
    logp_tbv = jnp.swapaxes(
        jnp.pad(logp, ((0, 0), (0, t_pad - T), (0, 0))), 0, 1)
    use_lm = lm_table is not None
    if use_lm:
        if lm_table.shape[1] != V:
            raise ValueError(f"lm_table {lm_table.shape} vs vocab {V}")
        tab = lm_table.astype(jnp.float32)
    else:
        tab = jnp.zeros((1, V), jnp.float32)                  # dummy ref
    kern = functools.partial(_beam_kernel_lanes, tc=tc, K=K, V=V, L=L,
                             blank=blank, lm=use_lm, n_ctx=tab.shape[0],
                             lm_alpha=float(lm_alpha), lm_beta=float(lm_beta))
    parents, appends, scores, lengths = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, B, V), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # logit_len (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),        # lm table (n_ctx, V)
        ],
        out_specs=[
            pl.BlockSpec((tc, B, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((tc, B, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((B, K), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, B, K), jnp.int32),   # parents
            jax.ShapeDtypeStruct((t_pad, B, K), jnp.int32),   # appends
            jax.ShapeDtypeStruct((B, K), jnp.float32),        # final scores
            jax.ShapeDtypeStruct((B, K), jnp.int32),          # final lengths
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K), jnp.float32),              # pb
            pltpu.VMEM((B, K), jnp.float32),              # pnb
            pltpu.VMEM((B, K), jnp.int32),                # rolling hash
            pltpu.VMEM((B, K), jnp.int32),                # last char
            pltpu.VMEM((B, K), jnp.int32),                # lengths
            pltpu.VMEM((B, K), jnp.float32),              # accumulated lm
            pltpu.VMEM((B, K), jnp.int32),                # lm context id
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(logp_tbv, logit_len.astype(jnp.int32)[:, None], tab)
    best = jnp.argmax(scores, axis=1)                          # (B,)
    tokens = _backtrace(parents, appends, best, L)
    final_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    final_sc = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return tokens, final_len, final_sc


# ---------------------------------------------------------------------------
# STUDY (round 5, VERDICT r4 item 3): the lane search split into ONE
# pallas_call PER FRAME with beam state carried through HBM.  This is the
# structure any beam-sharded fused step is forced into -- the sharded
# search's per-frame all_gather merge boundary (prefix_beam_sharded.py)
# means a monolithic whole-utterance kernel cannot span the mesh, so the
# best case for "fused under the sharded beam" is a per-frame kernel with
# state round-tripping HBM between launches (a real sharded step then ADDS
# the ICI exchange on top).  Measuring this stand-in against the monolithic
# kernel and the XLA scan decides the routing question with data.
# ---------------------------------------------------------------------------


def _beam_kernel_lanes_onestep(logp_ref, pb_ref, pnb_ref, hash_ref,
                               last_ref, length_ref, act_ref,
                               npb_out, npnb_out, nhash_out, nlast_out,
                               nlen_out, par_out, app_out,
                               *, K: int, V: int, L: int, blank: int):
    B = logp_ref.shape[0]
    KV = K * V
    kf = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    c_flat = jnp.concatenate([iota_v] * K, axis=1)
    par_flat = jnp.concatenate(
        [jnp.full((B, V), k, jnp.int32) for k in range(K)], axis=1)
    flat_idx = jax.lax.broadcasted_iota(jnp.int32, (B, KV), 1)

    logp_t = logp_ref[:]
    lp_flat = jnp.concatenate([logp_t] * K, axis=1)
    pb, pnb = pb_ref[:], pnb_ref[:]
    hsh, last, length = hash_ref[:], last_ref[:], length_ref[:]
    total = jnp.logaddexp(pb, pnb)

    lp_blank = logp_t[:, blank][:, None]
    lp_last = jnp.concatenate(
        [jnp.sum(jnp.where(iota_v == last[:, k:k + 1], logp_t, 0.0),
                 axis=1)[:, None] for k in range(K)], axis=1)
    stay_pb = total + lp_blank
    stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

    is_rep = c_flat == _expand_beam_field(last, K, V)
    base = jnp.where(is_rep, _expand_beam_field(pb, K, V),
                     _expand_beam_field(total, K, V))
    len_f = _expand_beam_field(length, K, V)
    ext_pnb = base + lp_flat
    ext_pnb = jnp.where(len_f >= L, NEG_INF, ext_pnb)
    ext_pnb = jnp.where(c_flat == blank, NEG_INF, ext_pnb)
    ext_hash = _expand_beam_field(hsh, K, V) * HASH_MULT + c_flat

    alive = jnp.logaddexp(stay_pb, stay_pnb) > NEG_INF / 2
    add, abs_m = _absorb(hsh, alive, ext_hash, ext_pnb, c_flat, blank, K)
    stay_pnb_m = jnp.logaddexp(stay_pnb, add)
    stay_score = jnp.logaddexp(stay_pb, stay_pnb_m)
    ext_score = jnp.where(abs_m, NEG_INF, ext_pnb)

    parent, append, top_score, picked = _paired_topk_select(
        K, kf, flat_idx, stay_score, ext_score, c_flat, par_flat,
        [(stay_pb, None, "f"), (stay_pnb_m, ext_pnb, "f"),
         (hsh, ext_hash, "i"), (last, c_flat, "i"),
         (length, len_f + 1, "i")])
    g_pb, g_pnb, g_hash, new_last, new_len = picked
    dead = top_score <= NEG_INF / 2
    new_pb = jnp.where(dead, NEG_INF, g_pb)
    new_pnb = jnp.where(dead, NEG_INF, g_pnb)
    new_hash = jnp.where(dead, -(kf + 1), g_hash)

    act = act_ref[:] > 0                                   # (B, 1)
    npb_out[:] = jnp.where(act, new_pb, pb)
    npnb_out[:] = jnp.where(act, new_pnb, pnb)
    nhash_out[:] = jnp.where(act, new_hash, hsh)
    nlast_out[:] = jnp.where(act, new_last, last)
    nlen_out[:] = jnp.where(act, new_len, length)
    par_out[:] = jnp.where(act, parent, kf)
    app_out[:] = jnp.where(act, append, -1)


def prefix_beam_lanes_stepwise(logits, logit_len, beam_size: int = 16,
                               blank: int = 0, max_len: int = 256):
    """One pallas_call per frame, state carried through HBM (see the study
    note above).  Token-identical to prefix_beam_fused_lanes (no LM)."""
    B, T, V = logits.shape
    K, L = beam_size, max_len
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp_tbv = jnp.swapaxes(logp, 0, 1)
    kern = functools.partial(_beam_kernel_lanes_onestep, K=K, V=V, L=L,
                             blank=blank)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.float32),    # pb
            jax.ShapeDtypeStruct((B, K), jnp.float32),    # pnb
            jax.ShapeDtypeStruct((B, K), jnp.int32),      # hash
            jax.ShapeDtypeStruct((B, K), jnp.int32),      # last
            jax.ShapeDtypeStruct((B, K), jnp.int32),      # length
            jax.ShapeDtypeStruct((B, K), jnp.int32),      # parent
            jax.ShapeDtypeStruct((B, K), jnp.int32),      # append
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )
    kf = jnp.arange(K, dtype=jnp.int32)[None, :] * jnp.ones((B, 1), jnp.int32)
    state0 = (jnp.where(kf == 0, 0.0, NEG_INF).astype(jnp.float32),
              jnp.full((B, K), NEG_INF, jnp.float32),
              -(kf + 1),
              jnp.full((B, K), -1, jnp.int32),
              jnp.zeros((B, K), jnp.int32))

    def scan_fn(carry, inp):
        t, logp_t = inp
        act = (t < logit_len).astype(jnp.int32)[:, None]
        pb, pnb, hsh, last, ln = carry
        npb, npnb, nh, nl, nln, par, app = call(
            logp_t, pb, pnb, hsh, last, ln, act)
        return (npb, npnb, nh, nl, nln), (par, app)

    (pb, pnb, _, _, lengths), (parents, appends) = jax.lax.scan(
        scan_fn, state0, (jnp.arange(T), logp_tbv))
    scores = jnp.logaddexp(pb, pnb)
    best = jnp.argmax(scores, axis=1)
    tokens = _backtrace(parents, appends, best, L)
    final_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    final_sc = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return tokens, final_len, final_sc


# ---------------------------------------------------------------------------
# Fused merge+top-K for the BEAM-SHARDED search (round 5, VERDICT r4 item
# 3).  The sharded search (decoding/prefix_beam_sharded.py) must exchange
# candidates over ICI every frame, so a whole-utterance kernel cannot span
# the mesh -- but the per-frame stepwise study above measured the per-frame
# pallas_call structure at 36.2 us/frame vs the XLA scan's 106 (v5e, B=16
# K=16 V=32): kernel relaunch + HBM state round-trips are CHEAP, refuting
# the presumed refutation.  This kernel is therefore the merge half of the
# lane search operating on GATHERED candidate arrays: each device expands
# its K/P beams (XLA, trivial), one all_gather assembles (B, K) stays +
# (B, K*nb) ext lanes, and the replicated merge -- absorb + K-round paired
# top-K + field selection, the 150 us/step hot loop of the sharded scan --
# runs as ONE Pallas program per frame.
# ---------------------------------------------------------------------------


def _merge_kernel(*refs, K: int, NL: int, n_ctx_cols: int):
    (s_pb_ref, s_pnb_ref, s_lm_ref, s_hash_ref, s_last_ref, s_par_ref,
     e_pnb_ref, e_lm_ref, e_hash_ref, e_par_ref, c_ref) = refs[:11]
    s_ctx_refs = refs[11:11 + n_ctx_cols]
    e_ctx_refs = refs[11 + n_ctx_cols:11 + 2 * n_ctx_cols]
    outs = refs[11 + 2 * n_ctx_cols:]
    (score_out, pb_out, pnb_out, lm_out, hash_out, last_out, par_out,
     app_out) = outs[:8]
    ctx_outs = outs[8:]

    B = s_pb_ref.shape[0]
    kf = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    flat_idx = jax.lax.broadcasted_iota(jnp.int32, (B, NL), 1)
    stay_pb, stay_pnb = s_pb_ref[:], s_pnb_ref[:]
    stay_lm, hsh = s_lm_ref[:], s_hash_ref[:]
    stay_last, stay_par = s_last_ref[:], s_par_ref[:]
    ext_pnb, ext_lm = e_pnb_ref[:], e_lm_ref[:]
    ext_hash, ext_par = e_hash_ref[:], e_par_ref[:]
    c_flat = c_ref[:]

    # blank never appears in the ext lanes (_build_candidates emits chars
    # 1..V-1), so absorb's c>=1 guard is the only char condition needed.
    alive = jnp.logaddexp(stay_pb, stay_pnb) > NEG_INF / 2
    add, abs_m = _absorb(hsh, alive, ext_hash, ext_pnb, c_flat, 0, K)
    stay_pnb_m = jnp.logaddexp(stay_pnb, add)
    stay_score = jnp.logaddexp(stay_pb, stay_pnb_m) + stay_lm
    ext_score = jnp.where(abs_m, NEG_INF, ext_pnb + ext_lm)

    fields = [(stay_pb, None, "f"), (stay_pnb_m, ext_pnb, "f"),
              (stay_lm, ext_lm, "f"), (hsh, ext_hash, "i"),
              (stay_last, c_flat, "i"), (stay_par, ext_par, "i")]
    for sc, ec in zip(s_ctx_refs, e_ctx_refs):
        fields.append((sc[:], ec[:], "i"))
    parent, append, top_score, picked = _paired_topk_select(
        K, kf, flat_idx, stay_score, ext_score, c_flat, ext_par, fields)
    g_pb, g_pnb, g_lm, g_hash, g_last, g_par = picked[:6]
    dead = top_score <= NEG_INF / 2
    # NOTE ``parent`` from the select is the POSITIONAL stay index; the
    # sharded merge needs the GLOBAL parent id field (stay_par/ext_par),
    # which rides the field list instead.  ``append`` = -1 for stays /
    # char for exts, exactly _merge_topk's convention.
    score_out[:] = top_score
    pb_out[:] = jnp.where(dead, NEG_INF, g_pb)
    pnb_out[:] = jnp.where(dead, NEG_INF, g_pnb)
    lm_out[:] = g_lm
    hash_out[:] = jnp.where(dead, -(kf + 1), g_hash)
    last_out[:] = g_last
    par_out[:] = g_par
    app_out[:] = append
    for o, v in zip(ctx_outs, picked[6:]):
        o[:] = v


def merge_topk_fused(stay: dict, ext: dict, K: int):
    """Drop-in fused replacement for decoding.prefix_beam._merge_topk
    (non-sparse form): same (top_score, fields) contract, same absorb /
    ranking / tie-break / dead-filler semantics (parity-tested).  ``ext``
    fields arrive (B, Kc, nb) and are flattened to candidate lanes here;
    ``ctx`` may be (B, K) or a (B, K, C) window -- C static columns ride
    the select as extra int fields."""
    B, Ks = stay["hash"].shape
    nb = ext["pnb"].shape[2]
    NL = Ks * nb
    ctx = stay["ctx"]
    n_ctx_cols = 0 if ctx.ndim == 2 else ctx.shape[-1]

    def lanes(x):                                     # (B, K, nb) -> (B, NL)
        return x.reshape(B, NL)

    ins = [stay["pb"], stay["pnb"], stay["lm"], stay["hash"],
           stay["last"], stay["parent"],
           lanes(ext["pnb"]), lanes(ext["lm"]), lanes(ext["hash"]),
           lanes(ext["parent"]), lanes(ext["append"])]
    if n_ctx_cols:
        ins += [stay["ctx"][..., c] for c in range(n_ctx_cols)]
        ins += [lanes(ext["ctx"][..., c]) for c in range(n_ctx_cols)]
    else:
        ins += [stay["ctx"], lanes(ext["ctx"])]
    ncc = n_ctx_cols or 1
    kern = functools.partial(_merge_kernel, K=K, NL=NL,
                             n_ctx_cols=ncc)
    f32, i32 = jnp.float32, jnp.int32
    out_shape = ([jax.ShapeDtypeStruct((B, K), f32)] * 4
                 + [jax.ShapeDtypeStruct((B, K), i32)] * 4
                 + [jax.ShapeDtypeStruct((B, K), i32)] * ncc)
    outs = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(*[x.astype(f32) if d == "f" else x.astype(i32)
        for x, d in zip(ins, "fff" "ii" "i" "ff" "i" "ii" + "i" * 2 * ncc)])
    (top_score, pb, pnb, lm, hsh, last, par, app) = outs[:8]
    ctx_cols = outs[8:]
    if n_ctx_cols:
        new_ctx = jnp.stack(ctx_cols, axis=-1)
    else:
        new_ctx = ctx_cols[0]
    fields = {"pb": pb, "pnb": pnb, "lm": lm, "hash": hsh, "ctx": new_ctx,
              "last": last, "parent": par, "append": app}
    return top_score, fields


# ---------------------------------------------------------------------------
# Restricted-candidate lane kernel (round 4): ext candidates = the frame's
# top-A acoustic chars.  Same search as decoding/prefix_beam.py ext_top_a
# (_build_candidates_topa + sparse merge); parity-tested against it.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Shared b-major (B*K)-row helpers for per-beam LM state carried IN KERNEL
# (round 5): neural-LM (h, c, logp) and dense-table rows live as plain 2-D
# (B*K, ...) VMEM arrays, row r = b*K + k.  Every reorder/lookup is rank-2
# iota arithmetic + one-hot MXU matmuls -- no batched dot_generals, no
# rank-3 intermediates, nothing for Mosaic to scalarize.
# ---------------------------------------------------------------------------


def _dot2(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=((((1,), (0,))), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _field_to_bk(x, B: int, K: int):
    """(B, K) -> (B*K, 1) f32, row r = b*K + k (values must be exact in f32,
    i.e. small ints or floats).  One one-hot matmul + one masked reduce."""
    BK = B * K
    m1 = (jax.lax.broadcasted_iota(jnp.int32, (BK, B), 1)
          == jax.lax.broadcasted_iota(jnp.int32, (BK, B), 0) // K
          ).astype(jnp.float32)                           # selects row b
    part = _dot2(m1, x.astype(jnp.float32))               # (BK, K) = x[b, :]
    colm = (jax.lax.broadcasted_iota(jnp.int32, (BK, K), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (BK, K), 0) % K)
    return jnp.sum(jnp.where(colm, part, 0.0), axis=1, keepdims=True)


def _parent_perm(parent, B: int, K: int):
    """One-hot permutation P (BK, BK) f32 with P[b*K+k, b*K+parent[b,k]]=1:
    ``P @ state`` reorders per-beam LM state rows by parent index."""
    BK = B * K
    pv = _field_to_bk(parent, B, K)                       # (BK, 1) f32
    r0 = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 0)
    c0 = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1)
    return ((r0 // K == c0 // K)
            & (c0 % K == pv.astype(jnp.int32))).astype(jnp.float32)


def _gather_rows_topa(rows_bk, ti_t, B: int, K: int, A: int, V: int):
    """Candidate-lane gather: rows_bk (B*K, V) b-major per-beam score rows,
    ti_t (B, A) this frame's shared top-A char ids -> (B, K*A) with
    out[b, k*A + a] = rows_bk[b*K + k, ti_t[b, a]].

    Per utterance b: ONE (K, V) @ (V, A) one-hot MXU matmul (the (V, A)
    one-hot selects candidate columns exactly); the per-beam lane blocks are
    then re-assembled by K tiny (B, BK) selection matmuls.  Total ~134
    MFLOP/frame at B=16 K=16 V=1024 A=128 -- 8x less than the single
    (BK, V) @ (V, B*A) "wide" formulation, whose cross-batch columns are
    15/16 wasted work."""
    BK = B * K
    iota_va0 = jax.lax.broadcasted_iota(jnp.int32, (V, A), 0)
    g_rows = []
    for b in range(B):
        ohb = (iota_va0 == ti_t[b:b + 1, :]).astype(jnp.float32)   # (V, A)
        g_rows.append(_dot2(rows_bk[b * K:(b + 1) * K, :], ohb))   # (K, A)
    g_all = jnp.concatenate(g_rows, axis=0)                        # (BK, A)
    r0 = jax.lax.broadcasted_iota(jnp.int32, (B, BK), 1)
    lane_cols = []
    for k in range(K):
        sel_k = (r0 == jax.lax.broadcasted_iota(jnp.int32, (B, BK), 0) * K
                 + k).astype(jnp.float32)                          # (B, BK)
        lane_cols.append(_dot2(sel_k, g_all))                      # (B, A)
    return jnp.concatenate(lane_cols, axis=1)                      # (B, K*A)


def _beam_kernel_lanes_topa(logp_ref, tv_ref, ti_ref, len_ref, lm_ref,
                            par_out, app_out, score_out, len_out,
                            pb_sc, pnb_sc, hash_sc, last_sc, length_sc,
                            lms_sc, ctx_sc,
                            *, tc: int, K: int, A: int, V: int, L: int,
                            blank: int, lm: bool, n_ctx: int,
                            lm_alpha: float, lm_beta: float):
    ic = pl.program_id(0)
    B = len_ref.shape[0]
    BK = B * K
    KA = K * A
    kf = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    par_flat = jnp.concatenate(
        [jnp.full((B, A), k, jnp.int32) for k in range(K)], axis=1)
    flat_idx = jax.lax.broadcasted_iota(jnp.int32, (B, KA), 1)  # k*A + a
    if lm:
        lm_tab = lm_ref[:]                                 # (n_ctx, V)
        iota_ctx = jax.lax.broadcasted_iota(jnp.int32, (BK, n_ctx), 1)

    @pl.when(ic == 0)
    def _():
        pb_sc[:] = jnp.where(kf == 0, 0.0, NEG_INF)
        pnb_sc[:] = jnp.full((B, K), NEG_INF)
        hash_sc[:] = -(kf + 1)
        last_sc[:] = jnp.full((B, K), -1, jnp.int32)
        length_sc[:] = jnp.zeros((B, K), jnp.int32)
        lms_sc[:] = jnp.zeros((B, K), jnp.float32)
        ctx_sc[:] = jnp.zeros((B, K), jnp.int32)

    lens = len_ref[:]                                          # (B, 1)

    for j in range(tc):
        t = ic * tc + j
        logp_t = logp_ref[j]                                   # (B, V)
        top_val = tv_ref[j]                                    # (B, A)
        top_idx = ti_ref[j]                                    # (B, A) i32
        c_flat = jnp.concatenate([top_idx] * K, axis=1)        # (B, KA)
        lp_flat = jnp.concatenate([top_val] * K, axis=1)
        pb, pnb = pb_sc[:], pnb_sc[:]
        hsh, last, length = hash_sc[:], last_sc[:], length_sc[:]
        lms, ctx = lms_sc[:], ctx_sc[:]
        total = jnp.logaddexp(pb, pnb)

        # ---- stay candidates (B, K): full-vocab gathers (last may lie
        # outside this frame's top-A set) --------------------------------
        lp_blank = logp_t[:, blank][:, None]
        lp_last = jnp.concatenate(
            [jnp.sum(jnp.where(iota_v == last[:, k:k + 1], logp_t, 0.0),
                     axis=1)[:, None] for k in range(K)], axis=1)
        stay_pb = total + lp_blank
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # ---- restricted extension candidates (B, K*A) ------------------
        is_rep = c_flat == _expand_beam_field(last, K, A)
        base = jnp.where(is_rep, _expand_beam_field(pb, K, A),
                         _expand_beam_field(total, K, A))
        len_f = _expand_beam_field(length, K, A)
        ext_pnb = base + lp_flat
        ext_pnb = jnp.where(len_f >= L, NEG_INF, ext_pnb)
        ext_pnb = jnp.where(c_flat == blank, NEG_INF, ext_pnb)
        ext_hash = _expand_beam_field(hsh, K, A) * HASH_MULT + c_flat

        # ---- dense-table fusion on the restricted candidates (round 5):
        # per-beam table rows by ONE b-major (BK, n_ctx) one-hot MXU
        # matmul, then the shared candidate-lane gather.  MXU-gather cost
        # scales with BK*n_ctx*V -- the dispatch gates the table to
        # VMEM-safe sizes; larger (hashed) tables are the recorded
        # refutation (HBM-resident, no Mosaic gather) ---------------------
        if lm:
            ctx_bk = _field_to_bk(ctx, B, K).astype(jnp.int32)
            rows_bk = _dot2((iota_ctx == ctx_bk).astype(jnp.float32),
                            lm_tab)                            # (BK, V)
            rows_flat = _gather_rows_topa(rows_bk, top_idx, B, K, A, V)
            ext_lm = _expand_beam_field(lms, K, A) \
                + (lm_alpha * rows_flat + lm_beta)
            # floored mod (scan's `%`), exact even under int32 wraparound
            raw = _expand_beam_field(ctx, K, A) * V + c_flat
            r = jax.lax.rem(raw, jnp.int32(n_ctx))
            ctx_lane = jnp.where(r < 0, r + n_ctx, r)          # (B, KA)

        # ---- hash absorption (direct equality == the sparse merge) -----
        alive = jnp.logaddexp(stay_pb, stay_pnb) > NEG_INF / 2
        add, abs_m = _absorb(hsh, alive, ext_hash, ext_pnb, c_flat, blank, K,
                             rank3=ABSORB_RANK3)
        stay_pnb_m = jnp.logaddexp(stay_pnb, add)

        if lm:
            stay_score = jnp.logaddexp(stay_pb, stay_pnb_m) + lms
            ext_score = jnp.where(abs_m, NEG_INF, ext_pnb + ext_lm)
        else:
            stay_score = jnp.logaddexp(stay_pb, stay_pnb_m)
            ext_score = jnp.where(abs_m, NEG_INF, ext_pnb)

        # ---- top-K: K rounds of paired argmax --------------------------
        fields = [(stay_pb, None, "f"), (stay_pnb_m, ext_pnb, "f"),
                  (hsh, ext_hash, "i"), (last, c_flat, "i"),
                  (length, len_f + 1, "i")]
        if lm:
            fields += [(lms, ext_lm, "f"), (ctx, ctx_lane, "i")]
        parent, append, top_score, picked = _paired_topk_select(
            K, kf, flat_idx, stay_score, ext_score, c_flat, par_flat, fields)
        if lm:
            (g_pb, g_pnb, g_hash, new_last, new_len,
             new_lms, new_ctx) = picked
        else:
            g_pb, g_pnb, g_hash, new_last, new_len = picked
        dead = top_score <= NEG_INF / 2
        new_pb = jnp.where(dead, NEG_INF, g_pb)
        new_pnb = jnp.where(dead, NEG_INF, g_pnb)
        new_hash = jnp.where(dead, -(kf + 1), g_hash)
        # new_lms/new_ctx: no dead reset (scan parity)

        # ---- freeze rows past their length; record backpointers --------
        act = t < lens
        pb_sc[:] = jnp.where(act, new_pb, pb)
        pnb_sc[:] = jnp.where(act, new_pnb, pnb)
        hash_sc[:] = jnp.where(act, new_hash, hsh)
        last_sc[:] = jnp.where(act, new_last, last)
        length_sc[:] = jnp.where(act, new_len, length)
        if lm:
            lms_sc[:] = jnp.where(act, new_lms, lms)
            ctx_sc[:] = jnp.where(act, new_ctx, ctx)
        par_out[j] = jnp.where(act, parent, kf)
        app_out[j] = jnp.where(act, append, -1)

    if lm:
        score_out[:] = jnp.logaddexp(pb_sc[:], pnb_sc[:]) + lms_sc[:]
    else:
        score_out[:] = jnp.logaddexp(pb_sc[:], pnb_sc[:])
    len_out[:] = length_sc[:]


def _beam_kernel_lanes_topa_rnn(logp_ref, tv_ref, ti_ref, len_ref,
                                h0_ref, c0_ref, lmp0_ref,
                                emb_ref, wout_ref, bout_ref,
                                *rest,
                                tc: int, K: int, A: int, V: int, L: int,
                                blank: int, nl: int, H: int,
                                lm_alpha: float, lm_beta: float):
    """Restricted-candidate lane beam with the FULL RNN-LM step fused in.

    The neural-LM state of every beam hypothesis -- per-layer (h, c) and the
    current log P(. | prefix) row -- lives in VMEM scratch as b-major
    (B*K, .) 2-D arrays for the whole decode.  Each frame: candidate LM
    scores are gathered from the resident logp rows (_gather_rows_topa),
    candidates are ranked by the fused score, and the LM advances INSIDE the
    kernel -- parent reorder as one (BK, BK) one-hot MXU matmul
    (_parent_perm), embed lookup as a one-hot matmul, the LSTM layers and
    output projection as plain 2-D matmuls, log-softmax as rank-2 rowwise
    reductions.  Zero HBM round-trips per frame; the search is identical to
    decoding/prefix_beam.py's ext_top_a + rnn_lm scan (parity-tested)."""
    wx = rest[0:nl]
    wh = rest[nl:2 * nl]
    bl = rest[2 * nl:3 * nl]
    par_out, app_out, score_out, len_out = rest[3 * nl:3 * nl + 4]
    (pb_sc, pnb_sc, hash_sc, last_sc, length_sc, lms_sc,
     h_sc, c_sc, lmp_sc) = rest[3 * nl + 4:]

    ic = pl.program_id(0)
    B = len_ref.shape[0]
    BK = B * K
    KA = K * A
    kf = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    par_flat = jnp.concatenate(
        [jnp.full((B, A), k, jnp.int32) for k in range(K)], axis=1)
    flat_idx = jax.lax.broadcasted_iota(jnp.int32, (B, KA), 1)  # k*A + a

    @pl.when(ic == 0)
    def _():
        pb_sc[:] = jnp.where(kf == 0, 0.0, NEG_INF)
        pnb_sc[:] = jnp.full((B, K), NEG_INF)
        hash_sc[:] = -(kf + 1)
        last_sc[:] = jnp.full((B, K), -1, jnp.int32)
        length_sc[:] = jnp.zeros((B, K), jnp.int32)
        lms_sc[:] = jnp.zeros((B, K), jnp.float32)
        h_sc[:] = h0_ref[:]
        c_sc[:] = c0_ref[:]
        lmp_sc[:] = lmp0_ref[:]

    lens = len_ref[:]                                          # (B, 1)
    # lens replicated to b-major (BK, 1) rows once: act_bk = t < lens_bk.
    m1 = (jax.lax.broadcasted_iota(jnp.int32, (BK, B), 1)
          == jax.lax.broadcasted_iota(jnp.int32, (BK, B), 0) // K
          ).astype(jnp.float32)
    lens_bk = _dot2(m1, lens.astype(jnp.float32)).astype(jnp.int32)

    for j in range(tc):
        t = ic * tc + j
        logp_t = logp_ref[j]                                   # (B, V)
        top_val = tv_ref[j]                                    # (B, A)
        top_idx = ti_ref[j]                                    # (B, A) i32
        c_flat = jnp.concatenate([top_idx] * K, axis=1)        # (B, KA)
        lp_flat = jnp.concatenate([top_val] * K, axis=1)
        pb, pnb = pb_sc[:], pnb_sc[:]
        hsh, last, length = hash_sc[:], last_sc[:], length_sc[:]
        lms = lms_sc[:]
        total = jnp.logaddexp(pb, pnb)

        # ---- stay candidates (B, K) ------------------------------------
        lp_blank = logp_t[:, blank][:, None]
        lp_last = jnp.concatenate(
            [jnp.sum(jnp.where(iota_v == last[:, k:k + 1], logp_t, 0.0),
                     axis=1)[:, None] for k in range(K)], axis=1)
        stay_pb = total + lp_blank
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # ---- restricted extension candidates (B, K*A) ------------------
        is_rep = c_flat == _expand_beam_field(last, K, A)
        base = jnp.where(is_rep, _expand_beam_field(pb, K, A),
                         _expand_beam_field(total, K, A))
        len_f = _expand_beam_field(length, K, A)
        ext_pnb = base + lp_flat
        ext_pnb = jnp.where(len_f >= L, NEG_INF, ext_pnb)
        ext_pnb = jnp.where(c_flat == blank, NEG_INF, ext_pnb)
        ext_hash = _expand_beam_field(hsh, K, A) * HASH_MULT + c_flat

        # ---- neural-LM candidate scores from the resident logp rows ----
        rows_flat = _gather_rows_topa(lmp_sc[:], top_idx, B, K, A, V)
        ext_lm = _expand_beam_field(lms, K, A) \
            + (lm_alpha * rows_flat + lm_beta)

        # ---- hash absorption + fused-score ranking ---------------------
        alive = jnp.logaddexp(stay_pb, stay_pnb) > NEG_INF / 2
        add, abs_m = _absorb(hsh, alive, ext_hash, ext_pnb, c_flat, blank, K,
                             rank3=ABSORB_RANK3)
        stay_pnb_m = jnp.logaddexp(stay_pnb, add)
        stay_score = jnp.logaddexp(stay_pb, stay_pnb_m) + lms
        ext_score = jnp.where(abs_m, NEG_INF, ext_pnb + ext_lm)

        parent, append, top_score, picked = _paired_topk_select(
            K, kf, flat_idx, stay_score, ext_score, c_flat, par_flat,
            [(stay_pb, None, "f"), (stay_pnb_m, ext_pnb, "f"),
             (hsh, ext_hash, "i"), (last, c_flat, "i"),
             (length, len_f + 1, "i"), (lms, ext_lm, "f")])
        g_pb, g_pnb, g_hash, new_last, new_len, new_lms = picked
        dead = top_score <= NEG_INF / 2
        new_pb = jnp.where(dead, NEG_INF, g_pb)
        new_pnb = jnp.where(dead, NEG_INF, g_pnb)
        new_hash = jnp.where(dead, -(kf + 1), g_hash)
        # new_lms: no dead reset (scan parity)

        # ---- in-kernel RNN-LM advance (scan _finish_step parity) -------
        perm = _parent_perm(parent, B, K)                  # (BK, BK) f32
        av = _field_to_bk(jnp.maximum(append, 0), B, K)    # (BK, 1) f32
        ext_col = _field_to_bk((append >= 0).astype(jnp.float32),
                               B, K) > 0.5                 # (BK, 1) bool
        g_lmp = _dot2(perm, lmp_sc[:])                     # (BK, V)
        x = _dot2((jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
                   == av.astype(jnp.int32)).astype(jnp.float32),
                  emb_ref[:])                              # (BK, E)
        new_h, new_c, old_h, old_c = [], [], [], []
        for l in range(nl):
            h_l = h_sc[l * BK:(l + 1) * BK, :]
            c_l = c_sc[l * BK:(l + 1) * BK, :]
            gh = _dot2(perm, h_l)
            gc = _dot2(perm, c_l)
            gates = _dot2(x, wx[l][:]) + _dot2(gh, wh[l][:]) + bl[l][:]
            gi = gates[:, 0:H]
            gf = gates[:, H:2 * H]
            gg = gates[:, 2 * H:3 * H]
            go = gates[:, 3 * H:4 * H]
            c_n = (jax.nn.sigmoid(gf + 1.0) * gc
                   + jax.nn.sigmoid(gi) * jnp.tanh(gg))
            h_n = jax.nn.sigmoid(go) * jnp.tanh(c_n)
            new_h.append(jnp.where(ext_col, h_n, gh))
            new_c.append(jnp.where(ext_col, c_n, gc))
            old_h.append(h_l)
            old_c.append(c_l)
            x = h_n
        logits_lm = _dot2(x, wout_ref[:]) + bout_ref[:]    # (BK, V)
        mx = jnp.max(logits_lm, axis=1, keepdims=True)
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits_lm - mx), axis=1,
                                   keepdims=True))
        new_lmp = jnp.where(ext_col, logits_lm - lse, g_lmp)

        # ---- freeze rows past their length; record backpointers --------
        act = t < lens                                     # (B, 1)
        act_bk = t < lens_bk                               # (BK, 1)
        for l in range(nl):
            h_sc[l * BK:(l + 1) * BK, :] = jnp.where(act_bk, new_h[l],
                                                     old_h[l])
            c_sc[l * BK:(l + 1) * BK, :] = jnp.where(act_bk, new_c[l],
                                                     old_c[l])
        lmp_sc[:] = jnp.where(act_bk, new_lmp, lmp_sc[:])
        pb_sc[:] = jnp.where(act, new_pb, pb)
        pnb_sc[:] = jnp.where(act, new_pnb, pnb)
        hash_sc[:] = jnp.where(act, new_hash, hsh)
        last_sc[:] = jnp.where(act, new_last, last)
        length_sc[:] = jnp.where(act, new_len, length)
        lms_sc[:] = jnp.where(act, new_lms, lms)
        par_out[j] = jnp.where(act, parent, kf)
        app_out[j] = jnp.where(act, append, -1)

    score_out[:] = jnp.logaddexp(pb_sc[:], pnb_sc[:]) + lms_sc[:]
    len_out[:] = length_sc[:]


def prefix_beam_fused_lanes_topa_rnn(logits, logit_len, rnn_lm,
                                     rnn_lm_params, beam_size: int = 16,
                                     blank: int = 0, max_len: int = 256,
                                     top_a: int = 128,
                                     lm_alpha: float = 0.0,
                                     lm_beta: float = 0.0,
                                     sos_id: int = 29):
    """Restricted-candidate lane kernel with IN-KERNEL neural-LM fusion.

    The exact search of decoding.prefix_beam.prefix_beam_search(
    rnn_lm=..., ext_top_a=top_a, use_fused=False): per-beam LM state
    (per-layer (h, c) and the logp row) rides in VMEM scratch and advances
    inside the kernel each frame -- the "device-resident LM state" of the
    BASELINE north star with zero HBM round-trips per frame.  The <sos>
    priming step runs once outside (all beams start identical).

    ``top_a == V`` runs the UNRESTRICTED search (candidate lanes = every
    char in id order, exactly the scan's unrestricted merge order; the
    candidate-lane gather degenerates to an identity one-hot) -- the fused
    char-vocab RNN fusion path, parity vs prefix_beam_search(rnn_lm=...)
    with no ext_top_a.

    Returns (tokens (B, L), lengths (B,), scores (B,)).
    """
    B, T, V = logits.shape
    K, L, A = beam_size, max_len, int(top_a)
    if A > V:
        raise ValueError(f"top_a {A} must be <= vocab {V}")
    cfg = rnn_lm.cfg
    nl, H, E = cfg.num_layers, cfg.hidden_dim, cfg.embed_dim
    BK = B * K
    p = rnn_lm_params

    from pytorch_asr_tpu.models.lm_rnn import lm_step_logp

    st0 = rnn_lm.apply({"params": p}, 1, method=rnn_lm.init_state)
    logp0, st1 = lm_step_logp(
        rnn_lm, p, jnp.full((1,), sos_id, jnp.int32), st0)
    h0 = jnp.reshape(jnp.broadcast_to(st1.h[:, 0:1, :], (nl, BK, H)),
                     (nl * BK, H))
    c0 = jnp.reshape(jnp.broadcast_to(st1.c[:, 0:1, :], (nl, BK, H)),
                     (nl * BK, H))
    lmp0 = jnp.broadcast_to(logp0, (BK, V))

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tc = TIME_CHUNK
    t_pad = _round_up(T, tc)
    n_chunks = t_pad // tc
    logp_p = jnp.pad(logp, ((0, 0), (0, t_pad - T), (0, 0)))
    if A == V:
        # Unrestricted: lanes = all chars in id order (scan merge order).
        top_val = logp_p
        top_idx = jnp.broadcast_to(
            jnp.arange(V, dtype=jnp.int32)[None, None, :], logp_p.shape)
    else:
        top_val, top_idx = jax.lax.top_k(logp_p, A)          # (B, Tp, A)
    logp_tbv = jnp.swapaxes(logp_p, 0, 1)
    tv_tba = jnp.swapaxes(top_val, 0, 1)
    ti_tba = jnp.swapaxes(top_idx, 0, 1).astype(jnp.int32)
    lm_arrays = ([p["embed"], p["w_out"], p["b_out"][None, :]]
                 + [p[f"lstm{l}_wx"] for l in range(nl)]
                 + [p[f"lstm{l}_wh"] for l in range(nl)]
                 + [p[f"lstm{l}_b"][None, :] for l in range(nl)])
    kern = functools.partial(_beam_kernel_lanes_topa_rnn, tc=tc, K=K, A=A,
                             V=V, L=L, blank=blank, nl=nl, H=H,
                             lm_alpha=float(lm_alpha),
                             lm_beta=float(lm_beta))
    parents, appends, scores, lengths = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, B, V), lambda i: (i, 0, 0)),
            pl.BlockSpec((tc, B, A), lambda i: (i, 0, 0)),
            pl.BlockSpec((tc, B, A), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # logit_len (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),        # h0
            pl.BlockSpec(memory_space=pltpu.VMEM),        # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),        # lmp0
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 3 * nl),
        out_specs=[
            pl.BlockSpec((tc, B, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((tc, B, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((B, K), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, B, K), jnp.int32),   # parents
            jax.ShapeDtypeStruct((t_pad, B, K), jnp.int32),   # appends
            jax.ShapeDtypeStruct((B, K), jnp.float32),        # final scores
            jax.ShapeDtypeStruct((B, K), jnp.int32),          # final lengths
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K), jnp.float32),              # pb
            pltpu.VMEM((B, K), jnp.float32),              # pnb
            pltpu.VMEM((B, K), jnp.int32),                # rolling hash
            pltpu.VMEM((B, K), jnp.int32),                # last char
            pltpu.VMEM((B, K), jnp.int32),                # lengths
            pltpu.VMEM((B, K), jnp.float32),              # accumulated lm
            pltpu.VMEM((nl * BK, H), jnp.float32),        # lstm h (b-major)
            pltpu.VMEM((nl * BK, H), jnp.float32),        # lstm c (b-major)
            pltpu.VMEM((BK, V), jnp.float32),             # lm logp rows
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(logp_tbv, tv_tba, ti_tba, logit_len.astype(jnp.int32)[:, None],
      h0, c0, lmp0, *[a.astype(jnp.float32) for a in lm_arrays])
    best = jnp.argmax(scores, axis=1)                          # (B,)
    tokens = _backtrace(parents, appends, best, L)
    final_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    final_sc = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return tokens, final_len, final_sc


def prefix_beam_fused_lanes_topa(logits, logit_len, beam_size: int = 16,
                                 blank: int = 0, max_len: int = 256,
                                 top_a: int = 128, lm_table=None,
                                 lm_alpha: float = 0.0,
                                 lm_beta: float = 0.0):
    """Restricted-candidate lane kernel for large vocabs.

    The exact search of decoding.prefix_beam.prefix_beam_search(
    ext_top_a=top_a, use_fused=False): per frame, extension candidates are
    the frame's top-A acoustic chars (lax.top_k OUTSIDE the kernel, streamed
    in as (tc, B, A) value/index chunks alongside the full logp rows the
    stay path gathers from).  K*A candidate lanes keep BPE vocabs inside
    the <= 2048-lane regime where the flat layout wins.

    ``lm_table`` (n_ctx, V) adds dense n-gram shallow fusion INSIDE the
    kernel (round 5): the table is VMEM-resident for the whole decode,
    per-beam rows are gathered by one b-major (B*K, n_ctx) one-hot MXU
    matmul, candidate scores by the shared lane gather (_gather_rows_topa)
    -- the fused BPE n-gram route the full-vocab lane layout cannot serve
    (refuted at K*V = 16384 lanes).  Matches prefix_beam_search(
    lm_table=..., ext_top_a=top_a, use_fused=False) exactly.

    Returns (tokens (B, L), lengths (B,), scores (B,)).
    """
    B, T, V = logits.shape
    K, L, A = beam_size, max_len, int(top_a)
    if A >= V:
        raise ValueError(f"top_a {A} must be < vocab {V}")
    use_lm = lm_table is not None
    if use_lm:
        if lm_table.shape[1] != V:
            raise ValueError(f"lm_table {lm_table.shape} vs vocab {V}")
        tab = lm_table.astype(jnp.float32)
    else:
        tab = jnp.zeros((1, V), jnp.float32)                  # dummy ref
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tc = TIME_CHUNK
    t_pad = _round_up(T, tc)
    n_chunks = t_pad // tc
    logp_p = jnp.pad(logp, ((0, 0), (0, t_pad - T), (0, 0)))
    top_val, top_idx = jax.lax.top_k(logp_p, A)              # (B, Tp, A)
    logp_tbv = jnp.swapaxes(logp_p, 0, 1)
    tv_tba = jnp.swapaxes(top_val, 0, 1)
    ti_tba = jnp.swapaxes(top_idx, 0, 1).astype(jnp.int32)
    kern = functools.partial(_beam_kernel_lanes_topa, tc=tc, K=K, A=A, V=V,
                             L=L, blank=blank, lm=use_lm,
                             n_ctx=tab.shape[0], lm_alpha=float(lm_alpha),
                             lm_beta=float(lm_beta))
    parents, appends, scores, lengths = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, B, V), lambda i: (i, 0, 0)),
            pl.BlockSpec((tc, B, A), lambda i: (i, 0, 0)),
            pl.BlockSpec((tc, B, A), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # logit_len (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),        # lm table
        ],
        out_specs=[
            pl.BlockSpec((tc, B, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((tc, B, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((B, K), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, B, K), jnp.int32),   # parents
            jax.ShapeDtypeStruct((t_pad, B, K), jnp.int32),   # appends
            jax.ShapeDtypeStruct((B, K), jnp.float32),        # final scores
            jax.ShapeDtypeStruct((B, K), jnp.int32),          # final lengths
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K), jnp.float32),              # pb
            pltpu.VMEM((B, K), jnp.float32),              # pnb
            pltpu.VMEM((B, K), jnp.int32),                # rolling hash
            pltpu.VMEM((B, K), jnp.int32),                # last char
            pltpu.VMEM((B, K), jnp.int32),                # lengths
            pltpu.VMEM((B, K), jnp.float32),              # accumulated lm
            pltpu.VMEM((B, K), jnp.int32),                # lm context id
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(logp_tbv, tv_tba, ti_tba, logit_len.astype(jnp.int32)[:, None], tab)
    best = jnp.argmax(scores, axis=1)                          # (B,)
    tokens = _backtrace(parents, appends, best, L)
    final_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    final_sc = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return tokens, final_len, final_sc
