"""Forced-alignment CLI: ``python -m pytorch_asr_tpu.align <config> [k=v ...]``.

Aligns each eval utterance's reference transcript to its frames with the CTC
Viterbi pass (decoding/align.py) and writes one segment per line:

    utt<TAB>token<TAB>start_sec<TAB>end_sec

keys: dump_path= (output TSV; default stdout), plus the usual config
overrides.  Frame times account for the frontend hop and encoder subsampling.
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from pytorch_asr_tpu.train import parse_args


def main(argv: list[str] | None = None) -> None:
    cfg, _steps, runtime = parse_args(sys.argv[1:] if argv is None else argv)
    dump_path = runtime.pop("dump_path", None)
    from pytorch_asr_tpu.decoding.align import ctc_forced_align
    from pytorch_asr_tpu.parallel.mesh import shard_batch
    from pytorch_asr_tpu.training.state import eval_params
    from pytorch_asr_tpu.training.trainer import Trainer

    trainer = Trainer(cfg, **runtime)
    model, tok = trainer.model, trainer.tokenizer

    @jax.jit
    def align_step(params, batch):
        out = model.apply({"params": params}, batch["audio"],
                          batch["audio_len"], train=False)
        res = ctc_forced_align(out["ctc_logits"], out["enc_len"],
                               batch["tokens"], batch["token_len"])
        return res["starts"], res["ends"], res["score"]

    # seconds per encoder frame = hop * (input frames / encoder frames)
    hop_sec = cfg.frontend.hop_length / cfg.frontend.sample_rate
    sub = 1
    enc = cfg.model.encoder
    if getattr(enc, "kind", "") == "bilstm":
        for _ in enc.conv_channels:
            sub *= enc.conv_stride[0]
    elif getattr(enc, "kind", "") == "tcn":
        sub = enc.subsample
    frame_sec = hop_sec * sub

    lines = []
    utt = 0
    for host_batch in trainer.eval_dataset.epoch_batches(seed=0):
        batch = shard_batch(trainer.mesh, host_batch)
        starts, ends, score = align_step(eval_params(trainer.state), batch)
        starts, ends = np.asarray(starts), np.asarray(ends)
        for b in np.where(host_batch["audio_len"] > 0)[0]:
            n = int(host_batch["token_len"][b])
            for i in range(n):
                ch = tok.decode([int(host_batch["tokens"][b, i])])
                lines.append(f"utt{utt:06d}\t{ch}\t"
                             f"{starts[b, i] * frame_sec:.3f}\t"
                             f"{ends[b, i] * frame_sec:.3f}")
            utt += 1
    text = "\n".join(lines) + "\n"
    if dump_path:
        with open(dump_path, "w") as fh:
            fh.write(text)
        print(f"wrote {len(lines)} segments ({utt} utts) to {dump_path}")
    else:
        sys.stdout.write(text)


if __name__ == "__main__":
    main()
