"""Decoding/eval CLI (SURVEY.md layer T7, §3.2):
``python -m pytorch_asr_tpu.decode <config> [k=v ...]``.

Restores the latest checkpoint for the config and runs the configured decode
method (greedy | prefix_beam | attention_beam | joint_beam) over the eval set,
reporting corpus WER and decode RTF.
"""

from __future__ import annotations

import sys

from pytorch_asr_tpu.train import parse_args


def main(argv: list[str] | None = None) -> None:
    cfg, _steps, runtime = parse_args(sys.argv[1:] if argv is None else argv)
    dump_path = runtime.pop("dump_path", None)
    from pytorch_asr_tpu.training.trainer import Trainer

    trainer = Trainer(cfg, **runtime)
    result = trainer.decode_eval(dump_path=dump_path)
    print(result)


if __name__ == "__main__":
    main()
