"""Speed-of-light (roofline) report for every Pallas kernel, on the real chip.

The north star (BASELINE.json:5) asks for "per-chip kernels at speed-of-light";
this script quantifies how close each kernel is.  For each kernel at its
headline-bench shape it reports:

  * measured ms (two-point in-jit repetition: per-iter = (t_2N - t_N) / N,
    cancelling the remote-tunnel dispatch/fetch overhead exactly);
  * executed MXU FLOPs (counting bf16x3-style multi-pass splits as executed
    work) and achieved TFLOP/s vs the matching MXU peak;
  * minimal HBM traffic and achieved GB/s vs HBM peak;
  * speed-of-light time = max(flops/peak, bytes/bw) and the kernel's % of it.

TPU v5e (v5 lite) peaks used: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.  fp32
matmuls are rated at peak/4 (fp32 on the v5e MXU runs as multi-pass bf16).

    JAX_PLATFORMS='' python scripts/roofline.py [iters=N]
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass
from typing import Callable

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BF16_PEAK = 197e12          # TPU v5e MXU, bf16 FLOP/s
FP32_PEAK = BF16_PEAK / 4   # fp32-accumulate multi-pass estimate
HBM_BW = 819e9              # bytes/s


@dataclass
class Case:
    name: str
    make: Callable[[], tuple]   # () -> (fn, args)  fn(*args) -> array pytree
    flops: float                # executed MXU flops per call
    bytes_: float               # minimal HBM traffic per call
    peak: float                 # FLOP/s peak that applies to this kernel
    note: str = ""


def _measure(fn, args, iters: int) -> float:
    """Per-call seconds via two-point in-jit repetition.

    The loop body perturbs the first (array) argument by carry*1e-30 so XLA
    cannot hoist the call out of the fori_loop; the carry chains iterations.
    """
    import jax
    import jax.numpy as jnp

    def rep(n, inner):
        def run(*a):
            def body(_, c):
                first = a[0] + (c * 1e-30).astype(a[0].dtype)
                out = inner(first, *a[1:])
                leaf = jax.tree.leaves(out)[0]
                return c + leaf.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(run)

    def two_point(inner):
        f1, f2 = rep(iters, inner), rep(2 * iters, inner)
        float(f1(*args))  # compile + warm
        float(f2(*args))
        t1 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(f2(*args)); t2 = time.perf_counter() - t2
        return max(t2 - t1, 1e-9) / iters

    # The perturbation materializes a copy of args[0] each iteration; measure
    # that alone (identity inner) and subtract it from the kernel time.
    full = two_point(fn)
    base = two_point(lambda first, *rest: first)
    return max(full - base, 1e-9)


def build_cases() -> list[Case]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_asr_tpu.configs.base import FrontendConfig
    from pytorch_asr_tpu.ops.ctc_pallas import ctc_loss_pallas
    from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_pallas
    from pytorch_asr_tpu.ops.lstm_pallas import lstm_seq
    from pytorch_asr_tpu.ops.stft_pallas import stft_log_mel

    rng = np.random.default_rng(0)
    cases: list[Case] = []

    # ---- STFT log-mel: headline bench frontend, B=128 x 10 s --------------
    fcfg = FrontendConfig()
    B, A = 128, 160000
    frames = A // fcfg.hop_length               # 1000 real frames/utt
    fblk = 128
    nblk = -(-frames // fblk)
    F_exec = B * nblk * fblk                    # padded frames computed
    audio = jnp.asarray(rng.standard_normal((B, A)).astype(np.float32) * 0.1)
    f_pad, m_pad, n_fft = 384, 128, fcfg.n_fft
    stft_flops = F_exec * 2.0 * (n_fft * f_pad * 6 + f_pad * m_pad * 3)
    stft_bytes = B * A * 4 + F_exec * m_pad * 4   # audio in f32, log-mel out
    cases.append(Case(
        "stft_log_mel fwd", lambda: (lambda a: stft_log_mel(a, fcfg), (audio,)),
        stft_flops, stft_bytes, BF16_PEAK,
        f"B={B}x10s, bf16x3 DFT+mel ({F_exec/1e3:.0f}k frames)"))

    # ---- LSTM: one direction of one encoder layer at bench shapes ---------
    # ctc_bilstm_dev1h: H=384; layers 2+ see D=2H=768 bf16 inputs; T=250
    # after /4 conv subsampling of 1000 frames.
    Bl, T, D, H = 128, 250, 768, 384
    x = jnp.asarray(rng.standard_normal((Bl, T, D)).astype(np.float32) * 0.1,
                    dtype=jnp.bfloat16)
    wih = jnp.asarray(rng.standard_normal((D, 4 * H)).astype(np.float32) * 0.05,
                      dtype=jnp.bfloat16)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.05,
                      dtype=jnp.bfloat16)
    bias = jnp.zeros((4 * H,), jnp.float32)
    lens = jnp.full((Bl,), T, jnp.int32)

    fwd_flops = 2.0 * Bl * T * (D + H) * 4 * H
    fwd_bytes = (Bl * T * D * 2 + Bl * T * H * 2 + (D + H) * 4 * H * 2)

    def lstm_fwd(xx):
        return lstm_seq(xx, wih, whh, bias, lens, False, jnp.bfloat16)

    cases.append(Case(
        "lstm fwd (inference)", lambda: (lstm_fwd, (x,)),
        fwd_flops, fwd_bytes, BF16_PEAK,
        f"B={Bl} T={T} D={D} H={H}, one direction"))

    def lstm_train(xx):
        def loss(xi, wi, wh, b):
            return lstm_seq(xi, wi, wh, b, lens, False, jnp.bfloat16).astype(
                jnp.float32).sum()
        return jax.grad(loss, argnums=(0, 1, 2, 3))(xx, wih, whh, bias)

    # bwd matmuls: dgates->dx (4H·D), dgates->dh (4H·H), dWih (D·4H),
    # dWhh (H·4H) == 2x the fwd matmul flops; residuals (gates 4H + cell H)
    # saved bf16 by the fwd and re-read by the bwd.
    res_bytes = Bl * T * (4 * H + H) * 2
    train_flops = 3.0 * fwd_flops
    train_bytes = fwd_bytes + 2 * res_bytes + Bl * T * (D + H) * 2 \
        + 2 * (D + H) * 4 * H * 4
    cases.append(Case(
        "lstm fwd+bwd (train)", lambda: (lstm_train, (x,)),
        train_flops, train_bytes, BF16_PEAK,
        "custom-VJP, bf16 residuals"))

    # ---- CTC loss fwd+bwd at bench shapes ---------------------------------
    Bc, Tc, V, L = 128, 250, 32, 200
    S = 2 * L + 1
    S_pad = 512
    logits = jnp.asarray(rng.standard_normal((Bc, Tc, V)).astype(np.float32))
    logit_len = jnp.full((Bc,), Tc, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 28, (Bc, L)).astype(np.int32))
    label_len = jnp.full((Bc,), L, jnp.int32)

    def ctc_train(lg):
        def loss(z):
            return ctc_loss_pallas(z, logit_len, labels, label_len).sum()
        return jax.grad(loss)(lg)

    # lattice (T,B,S) f32: built once (write), read by fwd, alphas written by
    # fwd and re-read by bwd, plus grad (B,T,V) out; lattice one-hot matmul.
    # NOTE: the kernel is actually bound by the sequential VPU logsumexp
    # recursion, which this MXU/HBM model cannot see -- three redesigns that
    # cut the HBM terms all measured SLOWER (1.33/1.11/1.15 vs 1.02 ms; see
    # the design-investigation note in ops/ctc_pallas.py).  Treat %SOL here
    # as a lower bound on kernel quality.
    lat = Tc * Bc * S_pad * 4
    ctc_bytes = 4 * lat + Bc * Tc * V * 4 * 2
    ctc_flops = 2.0 * Bc * Tc * V * S_pad * 2    # emission + grad scatter matmuls
    cases.append(Case(
        "ctc loss fwd+bwd", lambda: (ctc_train, (logits,)),
        ctc_flops, ctc_bytes, FP32_PEAK,
        f"B={Bc} T={Tc} S={S}->pad{S_pad}; VPU-recursion-bound "
        "(see ops/ctc_pallas.py design note)"))

    # ---- TCN residual block (inference path) ------------------------------
    Bt, Tt, C, K = 16, 1000, 384, 3
    xt = jnp.asarray(rng.standard_normal((Bt, Tt, C)).astype(np.float32) * 0.1)
    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    w_conv = jnp.asarray(
        rng.standard_normal((K, C, 2 * C)).astype(np.float32) * 0.05)
    b_conv = jnp.zeros((2 * C,), jnp.float32)
    w_point = jnp.asarray(
        rng.standard_normal((C, C)).astype(np.float32) * 0.05)
    b_point = jnp.zeros((C,), jnp.float32)

    def tcn(xx):
        return tcn_block_pallas(xx, ln_s, ln_b, w_conv, b_conv, w_point,
                                b_point, dilation=2)

    # Default jax matmul precision rounds f32 operands to bf16 (one MXU
    # pass), so the applicable peak is the bf16 one.
    T_pad = -(-Tt // 512) * 512
    tcn_flops = Bt * T_pad * (2.0 * C * 2 * C * K + 2.0 * C * C)
    tcn_bytes = 2 * Bt * T_pad * C * 4 + (K * C * 2 * C + C * C) * 4
    cases.append(Case(
        "tcn block fwd", lambda: (tcn, (xt,)),
        tcn_flops, tcn_bytes, BF16_PEAK,
        f"B={Bt} T={Tt} C={C} K={K} d=2"))

    # ---- TCN residual block fwd+bwd (training path, custom VJP) -----------
    from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_train

    def tcn_train(xx):
        def loss(xi, s, b, wc, bc, wp, bp):
            return tcn_block_train(xi, s, b, wc, bc, wp, bp, 2).sum()
        return jax.grad(loss, argnums=(0, 3, 5))(
            xx, ln_s, ln_b, w_conv, b_conv, w_point, b_point)

    # fwd matmuls + bwd recompute (conv) + dacc/dxn/dW matmuls ~= 3.3x fwd
    tcn_t_flops = 3.3 * tcn_flops
    # x r/w + xn residual w/r + dy r + dxn slabs w/r + dx w (all f32)
    tcn_t_bytes = 7 * Bt * T_pad * C * 4 + 2 * (K * C * 2 * C + C * C) * 4
    cases.append(Case(
        "tcn block fwd+bwd", lambda: (tcn_train, (xt,)),
        tcn_t_flops, tcn_t_bytes, BF16_PEAK,
        "train path, custom VJP (xn residual, GLU recompute)"))

    # ---- CTC prefix beam search (decode inner loop) ------------------------
    # The per-step work is the O(K^2) hash-absorb merge + top_k over
    # K*V candidates (decoding/prefix_beam.py); the bound is the one-time
    # logp read plus per-step beam-state update traffic, NOT flops -- this
    # row tracks how far the scan step is from that memory bound.
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search

    Bb, Tb_, Vb, Kb, Lb = 16, 250, 32, 16, 256
    blogits = jnp.asarray(
        rng.standard_normal((Bb, Tb_, Vb)).astype(np.float32))
    blens = jnp.full((Bb,), Tb_, jnp.int32)

    def beam(lg):
        toks, lens_, scores = prefix_beam_search(lg, blens, beam_size=Kb,
                                                 max_len=Lb)
        return scores

    # state carried per step: tokens (B,K,L) + ~6 (B,K) fields, r+w each step
    state_bytes = Bb * Kb * (Lb + 8) * 4
    beam_bytes = Bb * Tb_ * Vb * 4 + 2 * Tb_ * state_bytes
    beam_flops = Tb_ * (2.0 * Bb * Kb * Kb * (Vb - 1) + 4.0 * Bb * Kb * Vb)
    cases.append(Case(
        "prefix beam search", lambda: (beam, (blogits,)),
        beam_flops, beam_bytes, FP32_PEAK,
        f"B={Bb} T={Tb_} K={Kb} V={Vb}; latency-bound scan"))

    return cases


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    iters = int(kv.get("iters", 80))
    only = kv.get("only", "")       # substring filter over kernel names

    import jax
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    print(f"peaks: bf16 {BF16_PEAK/1e12:.0f} TFLOP/s, fp32(est) "
          f"{FP32_PEAK/1e12:.0f} TFLOP/s, HBM {HBM_BW/1e9:.0f} GB/s\n")

    hdr = (f"{'kernel':24s} {'ms':>8s} {'TFLOP/s':>8s} {'GB/s':>7s} "
           f"{'bound':>7s} {'SOL ms':>7s} {'%SOL':>6s}  note")
    print(hdr)
    print("-" * len(hdr))
    rows = []
    for c in build_cases():
        if only and only not in c.name:
            continue
        fn, args = c.make()
        sec = _measure(fn, args, iters)
        tflops = c.flops / sec / 1e12
        gbs = c.bytes_ / sec / 1e9
        sol = max(c.flops / c.peak, c.bytes_ / HBM_BW)
        bound = "MXU" if c.flops / c.peak >= c.bytes_ / HBM_BW else "HBM"
        pct = 100.0 * sol / sec
        rows.append((c.name, sec * 1e3, tflops, gbs, bound, sol * 1e3, pct,
                     c.note))
        print(f"{c.name:24s} {sec*1e3:8.3f} {tflops:8.1f} {gbs:7.1f} "
              f"{bound:>7s} {sol*1e3:7.3f} {pct:5.1f}%  {c.note}")


if __name__ == "__main__":
    main()
