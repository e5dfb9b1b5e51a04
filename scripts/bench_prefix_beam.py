"""Measure the prefix-beam decode step on the real chip (VERDICT r1 item 4).

Reports per-utterance-step wall time of the full scan and the implied RTF,
plus a microbenchmark of the merge+top-K inner loop alone (the piece the
north star names for a Pallas kernel), so the kernel-or-refute decision is
grounded in a measurement.

    JAX_PLATFORMS='' python scripts/bench_prefix_beam.py [B=16 T=1000 K=16]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(kv.get("B", 16))
    T = int(kv.get("T", 1000))       # 10 s of audio at 100 fps
    K = int(kv.get("K", 16))
    V = int(kv.get("V", 32))
    iters = int(kv.get("iters", 5))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_asr_tpu.decoding import prefix_beam as pb

    print(f"backend: {jax.default_backend()} B={B} T={T} K={K} V={V}")
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)

    # ---- full search (XLA scan and, on TPU, the fused Pallas kernel) -------
    frames_per_s = 100.0
    audio_s = B * T / frames_per_s

    def measure(name, fn):
        np.asarray(fn()[0])  # warm; host fetch forces real completion (the
        # axon tunnel's block_until_ready returns before execution finishes)
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn()[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms  per-step {dt/T*1e6:.1f} us  "
              f"RTF {dt/audio_s:.6f}  (batch RTF over {audio_s:.0f} audio-s)")

    measure("xla scan  ", lambda: pb.prefix_beam_search(
        logits, lens, beam_size=K, use_fused=False))

    # ---- LM-fusion arms (VERDICT r2 item 5: decode RTF per fusion source) --
    if kv.get("lm", "1") == "1":
        # dense table at this vocab (char-scale contexts)
        n_ctx = min(V * V, 4096)
        table = jnp.asarray(
            np.log(rng.dirichlet(np.ones(V), size=n_ctx)).astype(np.float32))
        measure("dense LM  ", lambda: pb.prefix_beam_search(
            logits, lens, beam_size=K, lm_table=table,
            lm_alpha=0.5, lm_beta=1.0, use_fused=False))

        # hashed backoff tables (the BPE/large-vocab production path):
        # synthetic 3-gram tables sized like a real KN model at this vocab.
        from pytorch_asr_tpu.decoding.lm_hashed import (
            HashedNgramLM, _build_table)

        def synth_entries(n_entries, order):
            grams = rng.integers(1, V, size=(n_entries, order))
            return {tuple(map(int, g)): float(rng.standard_normal())
                    for g in grams}

        bigrams = synth_entries(8 * V, 2)
        bi = np.full((V, V), np.nan, np.float32)
        for (w, c), lp in bigrams.items():
            bi[w, c] = lp
        hl = HashedNgramLM(
            uni=jnp.asarray(np.log(rng.dirichlet(np.ones(V))).astype(np.float32)),
            uni_backoff=jnp.zeros((V,), jnp.float32),
            probs=(_build_table(bigrams),
                   _build_table(synth_entries(32 * V, 3))),
            backoffs=(_build_table(synth_entries(8 * V, 2)),),
            bi_dense=jnp.asarray(bi))
        if kv.get("hashed", "1") == "1":
            measure("hashed LM ", lambda: pb.prefix_beam_search(
                logits, lens, beam_size=K, hash_lm=hl,
                lm_alpha=0.5, lm_beta=1.0, use_fused=False))
        if V >= 256 and kv.get("hashed", "1") == "1":
            A = int(kv.get("lm_top_k", 128))
            measure(f"hashed A={A}", lambda: pb.prefix_beam_search(
                logits, lens, beam_size=K, hash_lm=hl,
                lm_alpha=0.5, lm_beta=1.0, use_fused=False, lm_top_k=A))
            # restricted-candidate search: exact LM on the frame's top-A
            # acoustic ext candidates (round 4; _build_candidates_topa)
            measure(f"hashed ext_top_a={A}", lambda: pb.prefix_beam_search(
                logits, lens, beam_size=K, hash_lm=hl,
                lm_alpha=0.5, lm_beta=1.0, use_fused=False, ext_top_a=A))
            measure(f"no-LM ext_top_a={A}", lambda: pb.prefix_beam_search(
                logits, lens, beam_size=K, use_fused=False, ext_top_a=A))

        # RNN LM fusion: per-beam (h, c) carried with the hypotheses.
        from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig

        rnn = CharRNNLM(RNNLMConfig(embed_dim=64, hidden_dim=256,
                                    num_layers=1), vocab_size=V)
        rnn_params = rnn.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 4), jnp.int32))["params"]
        measure("rnn LM    ", lambda: pb.prefix_beam_search(
            logits, lens, beam_size=K, rnn_lm=rnn, rnn_lm_params=rnn_params,
            lm_alpha=0.5, lm_beta=1.0, sos_id=V - 1, use_fused=False))

    if kv.get("fused", "0") == "1":
        # opt-in: exact but ~360x slower than the scan on v5e today
        # (see ops/beam_pallas.py STATUS note)
        from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused

        measure("fused beam", lambda: prefix_beam_fused(
            logits, lens, beam_size=K))

    if kv.get("lanes", "1") == "1" and V * K <= 2048:
        # lane-parallel fused kernel (round 4): flat (B, K*V) candidate
        # lanes + backpointer outputs (see ops/beam_pallas.py); V*K gate:
        # the full-vocab layout is measured-refuted past ~2048 lanes
        from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused_lanes

        measure("lanes beam", lambda: jax.jit(
            prefix_beam_fused_lanes, static_argnums=(2, 3, 4))(
            logits, lens, K, 0, 256))

        # dense-LM fusion INSIDE the kernel (round 4): (n_ctx, V) table
        # VMEM-resident, one-hot MXU row gathers, ctx + lm score in scratch
        n_ctx = min(V * V, 4096)
        table_l = jnp.asarray(
            np.log(rng.dirichlet(np.ones(V), size=n_ctx)).astype(np.float32))
        measure("lanes+dense", lambda: jax.jit(
            prefix_beam_fused_lanes, static_argnums=(2, 3, 4, 6, 7))(
            logits, lens, K, 0, 256, table_l, 0.5, 1.0))

        if kv.get("lm", "1") == "1":
            # round 5: UNRESTRICTED in-kernel RNN fusion (top_a == V) at
            # char-scale vocabs, vs the rnn scan above.
            from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig
            from pytorch_asr_tpu.ops.beam_pallas import (
                prefix_beam_fused_lanes_topa_rnn)

            rnn_f = CharRNNLM(RNNLMConfig(embed_dim=64, hidden_dim=256,
                                          num_layers=1), vocab_size=V)
            rp_f = rnn_f.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 4), jnp.int32))["params"]
            measure("lanes rnn full-vocab", lambda: jax.jit(
                prefix_beam_fused_lanes_topa_rnn,
                static_argnums=(2, 4, 5, 6, 7, 8, 9, 10))(
                logits, lens, rnn_f, rp_f, K, 0, 256, V, 0.5, 1.0, V - 1))
    elif kv.get("lanes", "1") == "1" and V >= 256:
        # BPE-scale: the full-vocab lane layout is refuted (279 us/frame at
        # K*V=16384, see ops/beam_pallas.py); the restricted-candidate lane
        # kernel is the fused path (bit-equal to the ext_top_a scan).
        from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused_lanes_topa

        # ext_top_a is the candidate-restriction width (top-A lanes); it is
        # a different knob from lm_top_k (hashed-fusion lookup pruning) --
        # the old lm_top_k spelling is kept as a fallback for back-compat.
        A = int(kv.get("ext_top_a", kv.get("lm_top_k", 128)))
        measure(f"lanes topA={A}", lambda: jax.jit(
            prefix_beam_fused_lanes_topa, static_argnums=(2, 3, 4, 5))(
            logits, lens, K, 0, 256, A))

        if kv.get("lm", "1") == "1":
            # round 5: dense+top-A fused route (VMEM-resident table) and
            # in-kernel RNN fusion -- the BPE fusion sources, head-to-head
            # against their restricted scans.
            n_ctx_t = int(kv.get("n_ctx", 1024))
            table_t = jnp.asarray(np.log(
                rng.dirichlet(np.ones(V), size=n_ctx_t)).astype(np.float32))
            measure(f"scan dense topA={A}", lambda: pb.prefix_beam_search(
                logits, lens, beam_size=K, lm_table=table_t, lm_alpha=0.5,
                lm_beta=1.0, ext_top_a=A, use_fused=False))
            measure(f"lanes dense topA={A} n_ctx={n_ctx_t}",
                    lambda: jax.jit(
                        prefix_beam_fused_lanes_topa,
                        static_argnums=(2, 3, 4, 5, 7, 8))(
                        logits, lens, K, 0, 256, A, table_t, 0.5, 1.0))

            from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig
            from pytorch_asr_tpu.ops.beam_pallas import (
                prefix_beam_fused_lanes_topa_rnn)

            nl_r = int(kv.get("rnn_layers", 2))
            rnn_t = CharRNNLM(RNNLMConfig(embed_dim=128, hidden_dim=256,
                                          num_layers=nl_r), vocab_size=V)
            rp_t = rnn_t.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 4), jnp.int32))["params"]
            measure(f"scan rnn topA={A}", lambda: pb.prefix_beam_search(
                logits, lens, beam_size=K, rnn_lm=rnn_t, rnn_lm_params=rp_t,
                lm_alpha=0.5, lm_beta=1.0, sos_id=V - 1, ext_top_a=A,
                use_fused=False))
            measure(f"lanes rnn topA={A} H=256 nl={nl_r}", lambda: jax.jit(
                prefix_beam_fused_lanes_topa_rnn,
                static_argnums=(2, 4, 5, 6, 7, 8, 9, 10))(
                logits, lens, rnn_t, rp_t, K, 0, 256, A, 0.5, 1.0, V - 1))

    # ---- merge+topk alone (scan over the same candidate work) --------------
    state = pb._init_state(B, K, 256)
    logp = jax.nn.log_softmax(logits, axis=-1)

    @jax.jit
    def merge_only(logp):
        def scan_fn(state, logp_t):
            stay, ext = pb._build_candidates(
                state, logp_t, blank=0, vocab=V, lm_table=None, lm_alpha=0.0,
                lm_beta=0.0, K=K, L=256)
            top_score, f = pb._merge_topk(stay, ext, K)
            new_state = pb.BeamState(
                tokens=state.tokens, length=state.length, pb=f["pb"],
                pnb=f["pnb"], lm_s=f["lm"], hash=f["hash"], ctx=f["ctx"],
                last=f["last"])
            return new_state, None
        out, _ = jax.lax.scan(scan_fn, state, jnp.swapaxes(logp, 0, 1))
        return out.pb

    np.asarray(merge_only(logp))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(merge_only(logp))
    dm = (time.perf_counter() - t0) / iters
    print(f"cand+merge+topk scan (no token rebuild): {dm*1e3:.2f} ms  "
          f"per-step {dm/T*1e6:.1f} us")


if __name__ == "__main__":
    main()
