"""STFT kernel SOL study (VERDICT r2 item 6: 58.9% -> >=70% or refute).

Sweeps the per-invocation frame block and reports per-call kernel time + SOL
fraction per variant at the headline bench shape (B=128 x 10 s), vs the XLA
rFFT reference.  Timing uses the roofline script's two-point in-jit
repetition ((t_2N - t_N) / N), which cancels the remote-tunnel dispatch
overhead exactly — a plain per-call loop here measures the ~25 ms tunnel
round trip, not the ~3 ms kernel.

    python scripts/bench_stft.py [B=128] [iters=20]
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_roofline():
    spec = importlib.util.spec_from_file_location(
        "roofline_mod", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "roofline.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["roofline_mod"] = mod   # dataclass field resolution needs it
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(kv.get("B", 128))
    iters = int(kv.get("iters", 20))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_asr_tpu.configs.base import FrontendConfig
    from pytorch_asr_tpu.frontend import features
    from pytorch_asr_tpu.ops.stft_pallas import stft_log_mel
    from pytorch_asr_tpu.utils.profiling import V5E_BF16_FLOPS, roofline

    rl = _load_roofline()
    cfg = FrontendConfig()
    A = 160000
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, A)).astype(np.float32) * 0.1)
    frames = A // cfg.hop_length
    print(f"backend: {jax.default_backend()}  B={B} x 10 s  "
          f"(two-point in-jit timing)")

    dt = rl._measure(lambda a: features.log_mel(
        a, jnp.full((B,), A, jnp.int32), FrontendConfig(normalize=False))[0],
        (audio,), iters)
    print(f"{'xla rfft reference':24s} {dt*1e3:7.3f} ms")

    for fblk in (128, 192, 256, 384, 512):
        dt = rl._measure(
            lambda a, fb=fblk: stft_log_mel(a, cfg, frame_block=fb),
            (audio,), iters)
        nblk = -(-frames // fblk)
        F_exec = B * nblk * fblk
        fl = F_exec * 2.0 * (cfg.n_fft * 384 * 6 + 384 * 128 * 3)
        by = B * A * 4 + F_exec * 128 * 4
        r = roofline(fl, by, dt, V5E_BF16_FLOPS)
        print(f"{'pallas fblk=%d' % fblk:24s} {dt*1e3:7.3f} ms  "
              f"SOL {r['sol_fraction']*100:5.1f}%  ({r['bound']}-bound)")


if __name__ == "__main__":
    main()
