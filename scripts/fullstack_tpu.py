"""Full-stack on-TPU validation: train the joint model, decode every way.

Reproduces the round-1 validation recorded in IMPLEMENTATION.md: joint
CTC/attention on the synthetic corpus with scheduled sampling, EMA eval
weights, gradient accumulation and cosine LR, then greedy / prefix-beam(+LM)
/ attention-beam / joint-beam(+RNN-LM+coverage) decodes with WER/CER/RTF.

    JAX_PLATFORMS='' python scripts/fullstack_tpu.py [steps=800] [rnn_lm=true]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    steps = int(kv.get("steps", "800"))
    use_rnn_lm = kv.get("rnn_lm", "true").lower() in ("1", "true", "yes")

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.training.trainer import Trainer

    cfg = get_config("joint_ctc_attention_960h", **{
        "data.batch_size": "16",
        "data.synthetic_num_utts": "128",
        "data.bucket_audio_lens": "64000",
        "data.bucket_label_lens": "64",
        "model.encoder.hidden_dim": "256",
        "model.encoder.num_layers": "2",
        "model.decoder.embed_dim": "64",
        "model.decoder.hidden_dim": "128",
        "model.decoder.attention_dim": "64",
        "model.decoder.scheduled_sampling": "0.25",
        "model.decoder.ss_ramp_steps": str(max(steps // 2, 1)),
        "train.optim.accum_steps": "2",
        "train.ema_decay": "0.999",
        "train.optim.schedule": "cosine",
        "train.optim.peak_lr": "2e-3",
        "train.optim.warmup_steps": "40",
        "train.optim.total_steps": str(steps),
        "train.log_every": "100",
        "train.eval_every": str(steps + 1),
        "decode.beam_size": "8",
        "decode.max_decode_len": "96",
        "decode.coverage_beta": "0.2",
        "decode.lm_alpha": "0.3",
    })
    tr = Trainer(cfg, enable_checkpoints=False)
    tr.train(steps)

    rnn_lm_path = ""
    if use_rnn_lm:
        from pytorch_asr_tpu.data.synthetic import synthetic_texts
        from pytorch_asr_tpu.models.lm_rnn import RNNLMConfig
        from pytorch_asr_tpu.training.lm import save_rnn_lm, train_rnn_lm

        lm_cfg = RNNLMConfig(embed_dim=64, hidden_dim=128, num_layers=1)
        _, lm_params, nll = train_rnn_lm(
            synthetic_texts(512, seed=11), lm_cfg, steps=400, batch_size=32)
        print(json.dumps({"rnn_lm_nll": float(nll)}))
        rnn_lm_path = os.path.join(tempfile.mkdtemp(), "rnn_lm.npz")
        save_rnn_lm(rnn_lm_path, lm_cfg, lm_params)

    from pytorch_asr_tpu.decoding.driver import decode_dataset

    results = {}
    for method, lm_path in [("greedy", ""), ("prefix_beam", ""),
                            ("attention_beam", ""),
                            ("joint_beam", rnn_lm_path)]:
        tr.cfg = dataclasses.replace(
            tr.cfg, decode=dataclasses.replace(tr.cfg.decode, method=method,
                                               lm_path=lm_path))
        res = decode_dataset(tr)
        results[method] = {k: res[k] for k in
                           ("wer", "cer", "decode_rtf", "num_utts")}
        print(json.dumps({"method": method, **results[method]}))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
