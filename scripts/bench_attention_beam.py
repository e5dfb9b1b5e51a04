"""Attention / joint-beam decode RTF on the real chip (BASELINE.json:2).

Builds a tiny-but-real LAS model (the decode cost is dominated by per-step
beam machinery + attention, not encoder size), runs `attention_beam_search`
over random audio-derived encoder states at the bench shape, and reports
per-utterance decode RTF for: plain attention beam, joint CTC/attention
scoring, and RNN-LM fusion.

    python scripts/bench_attention_beam.py [B=16 K=8 U=100 iters=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(kv.get("B", 16))
    K = int(kv.get("K", 8))
    U = int(kv.get("U", 100))
    iters = int(kv.get("iters", 3))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_asr_tpu.configs.base import LASDecoderConfig
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer
    from pytorch_asr_tpu.decoding.attention_beam import attention_beam_search
    from pytorch_asr_tpu.models.asr_model import ASRModel
    from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig

    from pytorch_asr_tpu.configs import get_config

    tok = CharTokenizer()
    V = tok.vocab_size
    cfg = get_config("joint_ctc_attention_960h")
    import dataclasses

    model_cfg = dataclasses.replace(
        cfg.model, decoder=LASDecoderConfig(embed_dim=128, hidden_dim=256,
                                            attention_dim=128,
                                            location_kernel=31,
                                            location_filters=32, dropout=0.0),
        compute_dtype="float32")
    # encoder output for 10 s of audio after /4 subsampling: T=250
    T, D = 250, 2 * cfg.model.encoder.hidden_dim
    model_cfg = dataclasses.replace(model_cfg)
    model = ASRModel(cfg.frontend, model_cfg, vocab_size=V)
    rng = np.random.default_rng(0)
    # init via a short real forward, then decode from synthetic encoder states
    audio = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), audio,
                        jnp.asarray([16000]), targets=jnp.zeros((1, 4), jnp.int32),
                        target_len=jnp.asarray([4]))["params"]
    enc = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32) * 0.5)
    enc_len = jnp.full((B,), T, jnp.int32)
    ctc_logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))

    audio_s = B * 10.0
    print(f"backend: {jax.default_backend()} B={B} K={K} U={U} T={T} D={D}")

    def measure(name, **kw):
        f = jax.jit(lambda e, el: attention_beam_search(
            model, params, e, el, tok.sos_id, tok.eos_id, beam_size=K,
            max_len=U, **kw))
        np.asarray(f(enc, enc_len)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(f(enc, enc_len)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:8.2f} ms  RTF {dt/audio_s:.6f}")

    measure("attention beam      ")
    measure("joint CTC/attention ", ctc_logits=ctc_logits, ctc_weight=0.3)
    rnn = CharRNNLM(RNNLMConfig(embed_dim=64, hidden_dim=256, num_layers=1),
                    vocab_size=V)
    rnn_params = rnn.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 4), jnp.int32))["params"]
    measure("attention + RNN LM  ", rnn_lm=rnn, rnn_lm_params=rnn_params,
            lm_alpha=0.3)


if __name__ == "__main__":
    main()
