"""Mosaic compile-time study for the lane beam kernels (VERDICT r4 item 6)
plus the per-frame-kernel (sharded-fused stand-in) runtime study (item 3).

Measures, for ROLLED_INNER in {False, True} and batch in {16, 32, 64}:
  * Mosaic compile wall time of the no-LM full-vocab lanes kernel (the
    B<=16 auto-gate blocker: 24 s at B=16 -> 172 s at B=64 unrolled, r4);
  * runtime per frame (so a compile win is not bought with a runtime loss).

And, at the production no-LM shape, the stepwise variant (one pallas_call
per frame, state through HBM) against the monolithic kernel and the XLA
scan -- the measured answer to "route the fused kernel under the sharded
beam", whose per-frame all_gather merge boundary forces exactly the
stepwise structure (prefix_beam_sharded.py exchanges candidates every
frame).

    python scripts/bench_beam_compile.py [T=1000 K=16 V=32 batches=16,32,64]
    python scripts/bench_beam_compile.py stepwise=1 rolled=0 batches=16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    T = int(kv.get("T", 1000))
    K = int(kv.get("K", 16))
    V = int(kv.get("V", 32))
    batches = [int(x) for x in kv.get("batches", "16,32,64").split(",")]
    iters = int(kv.get("iters", 3))

    import numpy as np

    import jax
    import jax.numpy as jnp

    from pytorch_asr_tpu.decoding import prefix_beam as pb
    from pytorch_asr_tpu.ops import beam_pallas as bp

    print(f"backend: {jax.default_backend()} T={T} K={K} V={V}")
    rng = np.random.default_rng(0)

    def measure_run(fn, *args):
        np.asarray(fn(*args)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(*args)[0])
        return (time.perf_counter() - t0) / iters

    if kv.get("stepwise", "0") == "1":
        B = batches[0]
        logits = jnp.asarray(
            rng.standard_normal((B, T, V)).astype(np.float32))
        lens = jnp.full((B,), T, jnp.int32)
        for name, fn in (
            ("monolithic lanes",
             jax.jit(bp.prefix_beam_fused_lanes, static_argnums=(2, 3, 4))),
            ("stepwise lanes (per-frame kernel)",
             jax.jit(bp.prefix_beam_lanes_stepwise,
                     static_argnums=(2, 3, 4))),
        ):
            dt = measure_run(fn, logits, lens, K, 0, 256)
            print(f"{name}: {dt*1e3:.2f} ms  per-step {dt/T*1e6:.1f} us")
        dt = measure_run(
            lambda lg, ln: pb.prefix_beam_search(lg, ln, beam_size=K,
                                                 use_fused=False),
            logits, lens)
        print(f"xla scan: {dt*1e3:.2f} ms  per-step {dt/T*1e6:.1f} us")
        return

    if kv.get("merge", "0") == "1":
        # The beam-SHARDED search's replicated per-frame merge, exactly as
        # prefix_beam_sharded runs it (full-vocab candidates from
        # _build_candidates, then merge+top-K) -- XLA vs the fused Pallas
        # merge kernel, single device (the collective rides ICI either way).
        B = batches[0]
        logits = jnp.asarray(
            rng.standard_normal((B, T, V)).astype(np.float32))
        lens = jnp.full((B,), T, jnp.int32)

        def search(fused):
            def fn(lg, ln):
                logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
                state = pb._init_state(B, K, 256)

                def scan_fn(carry, inp):
                    st = carry
                    t, logp_t = inp
                    stay, ext = pb._build_candidates(
                        st, logp_t, blank=0, vocab=V, lm_table=None,
                        lm_alpha=0.0, lm_beta=0.0, K=K, L=256)
                    if fused:
                        ts, f = bp.merge_topk_fused(stay, ext, K)
                    else:
                        ts, f = pb._merge_topk(stay, ext, K)
                    toks, nlen = pb._apply_tokens(
                        st.tokens, st.length, f["parent"], f["append"], 256)
                    new = pb.BeamState(
                        tokens=toks, length=nlen, pb=f["pb"], pnb=f["pnb"],
                        lm_s=f["lm"], hash=f["hash"], ctx=f["ctx"],
                        last=f["last"])
                    keep = (t < ln)[:, None]
                    merged = jax.tree.map(
                        lambda n_, o: jnp.where(
                            keep.reshape((B,) + (1,) * (n_.ndim - 1)),
                            n_, o), new, st)
                    return merged, None

                (st), _ = jax.lax.scan(
                    scan_fn, state,
                    (jnp.arange(T), jnp.swapaxes(logp, 0, 1)))
                fin = jnp.logaddexp(st.pb, st.pnb)
                best = jnp.argmax(fin, axis=1)
                return (jnp.take_along_axis(st.tokens, best[:, None, None],
                                            axis=1)[:, 0],)
            return jax.jit(fn)

        for name, fused in (("xla merge scan   ", False),
                            ("fused merge scan ", True)):
            dt = measure_run(search(fused), logits, lens)
            print(f"{name}: {dt*1e3:.2f} ms  per-step {dt/T*1e6:.1f} us")
        return

    # NOTE: measure each ROLLED_INNER setting in its OWN process --
    # jax.jit's cache key is (function, statics, shapes) and does not see
    # the module flag, so the second setting in one process silently reuses
    # the first setting's executable (compile "0.1 s" = a cache hit, and
    # the runtime measured is the WRONG kernel).  Pass rolled=0 / rolled=1.
    rolled_opts = [False, True]
    if kv.get("rolled", "") in ("0", "1"):
        rolled_opts = [kv["rolled"] == "1"]
    for rolled in rolled_opts:
        bp.ROLLED_INNER = rolled
        for B in batches:
            logits = jnp.asarray(
                rng.standard_normal((B, T, V)).astype(np.float32))
            lens = jnp.full((B,), T, jnp.int32)
            fn = jax.jit(bp.prefix_beam_fused_lanes,
                         static_argnums=(2, 3, 4))
            t0 = time.perf_counter()
            out = fn(logits, lens, K, 0, 256)
            np.asarray(out[0])
            compile_s = time.perf_counter() - t0
            dt = measure_run(fn, logits, lens, K, 0, 256)
            print(f"rolled={int(rolled)} B={B}: compile {compile_s:6.1f} s  "
                  f"run {dt*1e3:8.2f} ms  per-step {dt/T*1e6:6.1f} us  "
                  f"per-utt-frame {dt/T/B*1e6:.2f} us")


if __name__ == "__main__":
    main()
