"""Standalone WER/CER scoring CLI (SURVEY.md layer T7).

    python -m pytorch_asr_tpu.eval_wer ref.txt hyp.txt

Scores two line-aligned transcript files (reference genre ships an equivalent
score script) and prints one JSON line: {"wer": ..., "cer": ..., "num_utts"}.
Lines may optionally start with an utterance id (``id<TAB>text``); ids are
matched when both files have them, otherwise lines pair by position.
"""

from __future__ import annotations

import json
import sys

from pytorch_asr_tpu.decoding.wer import corpus_cer, corpus_wer


def _read(path: str) -> tuple[list[str], list[str] | None]:
    texts, ids = [], []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if "\t" in line:
                uid, _, text = line.partition("\t")
                ids.append(uid)
                texts.append(text)
            else:
                ids.append("")
                texts.append(line)
    return texts, ids if all(ids) else None


def score(ref_path: str, hyp_path: str) -> dict:
    refs, ref_ids = _read(ref_path)
    hyps, hyp_ids = _read(hyp_path)
    if ref_ids and hyp_ids:
        hyp_map = dict(zip(hyp_ids, hyps))
        missing = [i for i in ref_ids if i not in hyp_map]
        if missing:
            raise SystemExit(f"eval_wer: {len(missing)} reference ids missing "
                             f"from hypotheses (first: {missing[0]!r})")
        hyps = [hyp_map[i] for i in ref_ids]
    elif len(refs) != len(hyps):
        raise SystemExit(f"eval_wer: line-count mismatch "
                         f"({len(refs)} refs vs {len(hyps)} hyps) and no "
                         "utterance ids to align by")
    return {"wer": corpus_wer(refs, hyps), "cer": corpus_cer(refs, hyps),
            "num_utts": len(refs)}


def main(argv: list[str] | None = None) -> None:
    args = sys.argv[1:] if argv is None else argv
    if len(args) != 2 or args[0] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0 if args and args[0] in ("-h", "--help") else 2)
    print(json.dumps(score(args[0], args[1])))


if __name__ == "__main__":
    main()
