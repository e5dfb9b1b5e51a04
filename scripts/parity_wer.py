"""One-command WER-parity harness (BASELINE.json:2,5; VERDICT r1 item 9).

The moment real LibriSpeech audio and a reference torch checkpoint exist,
this produces the parity comparison table in one command:

    python scripts/parity_wer.py <librispeech_root> <torch_ckpt.pt> \
        [split=test-clean] [out=parity_wer.json] [lm=path.arpa] \
        [beam=16] [lm_alpha=0.5] [lm_beta=1.0] [config k=v overrides...]

* <librispeech_root>: LibriSpeech directory (or the literal ``synthetic`` to
  smoke-test the harness end to end on the synthetic corpus);
* <torch_ckpt.pt>: reference DS2-class checkpoint (state_dict or
  {"state_dict": ...}; training/torch_import.py converts conv subsampler +
  bidirectional LSTM stack + CTC head with bit-level parity tests);
* decodes the split with every decode method the imported model supports
  (greedy CTC, prefix beam, prefix beam + n-gram LM when ``lm=`` is given)
  and writes one JSON with WER/CER/RTF per method.

Config must match the reference architecture; override via k=v, e.g.
``model.encoder.hidden_dim=512 model.encoder.num_layers=4``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    root, ckpt = argv[0], argv[1]
    kv = dict(a.split("=", 1) for a in argv[2:])
    split = kv.pop("split", "test-clean")
    out_path = kv.pop("out", "parity_wer.json")
    lm_path = kv.pop("lm", "")
    beam = int(kv.pop("beam", "16"))
    lm_alpha = float(kv.pop("lm_alpha", "0.5"))
    lm_beta = float(kv.pop("lm_beta", "1.0"))
    max_batches = kv.pop("max_batches", None)
    max_batches = int(max_batches) if max_batches else None

    # config=<name> picks the BASELINE config family: the torch importer
    # dispatches on it (conv+BiLSTM / TCN / LAS / joint — all five configs
    # can be certified the day a reference checkpoint appears).
    config_name = kv.pop("config", "ctc_bilstm_dev1h")

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import apply_overrides
    from pytorch_asr_tpu.training.trainer import Trainer

    cfg = get_config(config_name, **kv)
    data = dataclasses.replace(
        cfg.data,
        librispeech_root="" if root == "synthetic" else root,
        split=split)
    cfg = dataclasses.replace(cfg, data=data)

    trainer = Trainer(cfg, enable_checkpoints=False, init_from_torch=ckpt)

    # Decode methods appropriate to the family: CTC models decode greedy +
    # prefix beam; attention models add their beam; joint adds joint-score.
    if cfg.model.decoder is None:
        methods = [("greedy", {}), ("prefix_beam", {})]
    elif cfg.model.ctc_weight > 0:
        methods = [("greedy", {}), ("prefix_beam", {}), ("joint_beam", {})]
    else:
        methods = [("attention_beam", {})]
    if lm_path:
        methods.append((methods[-1][0].replace("_lm", "") + "_lm",
                        {"lm_path": lm_path}))

    report = {
        "librispeech_root": root,
        "split": split,
        "torch_checkpoint": os.path.abspath(ckpt),
        "beam_size": beam,
        "methods": {},
    }
    for name, extra in methods:
        decode = dataclasses.replace(
            cfg.decode, method=name.replace("_lm", ""), beam_size=beam,
            lm_alpha=lm_alpha, lm_beta=lm_beta, **extra)
        trainer.cfg = dataclasses.replace(trainer.cfg, decode=decode)
        res = trainer.decode_eval(max_batches=max_batches)
        report["methods"][name] = {
            "wer": res["wer"], "cer": res["cer"],
            "num_utts": res["num_utts"], "decode_rtf": res["decode_rtf"],
        }
        print(f"{name:16s} WER {res['wer']:.4f}  CER {res['cer']:.4f}  "
              f"RTF {res['decode_rtf']:.5f}  ({res['num_utts']} utts)")

    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"wrote {out_path}")
    return report


if __name__ == "__main__":
    main()
