"""RNN-LM training CLI (SURVEY.md §2.1 LM-fusion row).

    python -m pytorch_asr_tpu.train_lm out.npz [text=corpus.txt] [k=v ...]

Trains a char RNN LM for neural shallow fusion and saves it as .npz (pass
that path as decode.lm_path=out.npz to fuse it during beam decoding).

keys: text= (one transcript per line; default: transcripts of the synthetic
corpus), steps=, batch_size=, max_len=, lr=, seed=, and RNNLMConfig fields
(embed_dim=, hidden_dim=, num_layers=).
"""

from __future__ import annotations

import json
import sys

from pytorch_asr_tpu.models.lm_rnn import RNNLMConfig
from pytorch_asr_tpu.training.lm import save_rnn_lm, train_rnn_lm


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0)
    out_path = argv[0]
    kv = dict(a.split("=", 1) for a in argv[1:])

    text_path = kv.pop("text", "")
    if text_path:
        with open(text_path) as fh:
            texts = [line.strip() for line in fh if line.strip()]
    else:
        from pytorch_asr_tpu.data.synthetic import synthetic_texts

        texts = synthetic_texts(int(kv.pop("synthetic_num_utts", "256")),
                                seed=int(kv.get("seed", "0")))

    cfg = RNNLMConfig(
        embed_dim=int(kv.pop("embed_dim", "128")),
        hidden_dim=int(kv.pop("hidden_dim", "256")),
        num_layers=int(kv.pop("num_layers", "2")),
    )
    steps = int(kv.pop("steps", "500"))
    train_kw = dict(
        batch_size=int(kv.pop("batch_size", "32")),
        max_len=int(kv.pop("max_len", "128")),
        lr=float(kv.pop("lr", "1e-3")),
        seed=int(kv.pop("seed", "0")),
        log_every=int(kv.pop("log_every", "100")))
    if kv:  # fail on typo'd keys BEFORE burning the training run
        raise SystemExit(f"unknown keys: {sorted(kv)}")
    model, params, nll = train_rnn_lm(texts, cfg, steps=steps, **train_kw)
    save_rnn_lm(out_path, cfg, params)
    import math

    print(json.dumps({"event": "lm_saved", "path": out_path, "steps": steps,
                      "num_texts": len(texts), "nll": nll,
                      "ppl": math.exp(nll)}))


if __name__ == "__main__":
    main()
