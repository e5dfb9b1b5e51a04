"""Training CLI (SURVEY.md layer T7): ``python -m pytorch_asr_tpu.train <config> [k=v ...]``.

Example:
    python -m pytorch_asr_tpu.train ctc_bilstm_dev1h \
        data.librispeech_root=/data/LibriSpeech train.optim.total_steps=20000
"""

from __future__ import annotations

import sys

from pytorch_asr_tpu.configs import get_config


def parse_args(argv: list[str]):
    if not argv or argv[0] in ("-h", "--help"):
        from pytorch_asr_tpu.configs import CONFIGS

        print(__doc__)
        print("configs:", ", ".join(sorted(CONFIGS)))
        raise SystemExit(0)
    name = argv[0]
    overrides = dict(a.split("=", 1) for a in argv[1:])
    steps = int(overrides.pop("steps", "0")) or None
    # Driver-level (non-config) keys:
    #   metrics_path=...   JSONL event log
    #   tb_dir=...         mirror scalar metrics to TensorBoard
    #   init_from_torch=.. initialize encoder+CTC head from a reference
    #                      PyTorch checkpoint (training/torch_import.py)
    runtime = {
        "metrics_path": overrides.pop("metrics_path", None),
        "tensorboard_dir": overrides.pop("tb_dir", None),
        "init_from_torch": overrides.pop("init_from_torch", None),
        "dump_path": overrides.pop("dump_path", None),  # decode CLI only
    }
    return get_config(name, **overrides), steps, runtime


def main(argv: list[str] | None = None) -> None:
    cfg, steps, runtime = parse_args(sys.argv[1:] if argv is None else argv)
    runtime.pop("dump_path", None)
    from pytorch_asr_tpu.training.trainer import Trainer

    trainer = Trainer(cfg, **runtime)
    try:
        total = steps or cfg.train.optim.total_steps
        done = int(trainer.state.step)
        while done < total:
            chunk = min(cfg.train.eval_every, total - done)
            trainer.train(num_steps=chunk)
            trainer.evaluate(max_batches=8)
            done = int(trainer.state.step)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
