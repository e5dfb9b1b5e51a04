"""n-gram LM training CLI: ``asr-train-ngram out.arpa [k=v ...]``.

The reference genre builds its shallow-fusion ARPA models with external KenLM
(C++); this builds them in-framework with the same estimator (interpolated
modified Kneser-Ney) and writes standard ARPA, directly loadable by the
decode CLI via ``decode.lm_path=out.arpa``.

Keys:
  text=FILE     training text, one sentence per line (default: the synthetic
                corpus transcripts, matching the synthetic training data)
  order=N       n-gram order (default 4)
  eos=true      append eos to every sentence (train the attention-beam eos slot)
  heldout=FILE  optional held-out text; reports per-char perplexity
  num_synthetic=N  synthetic sentences when text= is not given (default 512)
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0)
    out_path = argv[0]
    kv = dict(a.split("=", 1) for a in argv[1:])

    from pytorch_asr_tpu.decoding import lm as lm_mod

    if "text" in kv:
        with open(kv["text"]) as fh:
            texts = [ln.strip().lower() for ln in fh if ln.strip()]
    else:
        from pytorch_asr_tpu.data.synthetic import synthetic_texts

        texts = synthetic_texts(int(kv.get("num_synthetic", "512")))
    order = int(kv.get("order", "4"))
    include_eos = kv.get("eos", "false").lower() in ("1", "true", "yes")

    lm = lm_mod.train_char_ngram_kn(texts, order=order,
                                    include_eos=include_eos)
    lm_mod.write_arpa(lm, out_path)
    n_grams = len(lm.logprobs)
    print(f"wrote {out_path}: order={order} ngrams={n_grams} "
          f"sentences={len(texts)}")
    if "heldout" in kv:
        with open(kv["heldout"]) as fh:
            held = [ln.strip().lower() for ln in fh if ln.strip()]
        print(f"held-out per-char perplexity: "
              f"{lm_mod.perplexity(lm, held):.3f}")


if __name__ == "__main__":
    main()
