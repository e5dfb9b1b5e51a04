"""WER/CER scoring (SURVEY.md §2.1 'WER scorer'): host-side Levenshtein."""

from __future__ import annotations

from dataclasses import dataclass


def edit_distance(ref: list, hyp: list) -> int:
    """Levenshtein distance with O(min) rows."""
    if len(ref) < len(hyp):
        ref, hyp = hyp, ref
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (r != h))
        prev = cur
    return prev[-1]


@dataclass
class ErrorRateAccumulator:
    errors: int = 0
    tokens: int = 0

    def add(self, ref: list, hyp: list) -> None:
        self.errors += edit_distance(ref, hyp)
        self.tokens += len(ref)

    @property
    def rate(self) -> float:
        return self.errors / max(self.tokens, 1)


def _corpus_rate(refs: list[list], hyps: list[list]) -> float:
    """Batch error rate; uses the threaded C++ scorer when built."""
    tokens = sum(len(r) for r in refs)
    if tokens == 0:
        return 0.0
    try:
        from pytorch_asr_tpu import native

        if native.available():
            sym = {}
            to_ids = lambda seq: [sym.setdefault(s, len(sym)) for s in seq]  # noqa: E731
            ref_ids = [to_ids(r) for r in refs]
            hyp_ids = [to_ids(h) for h in hyps]
            return float(native.edit_distance_batch(ref_ids, hyp_ids).sum()) / tokens
    except ImportError:
        pass
    acc = ErrorRateAccumulator()
    for r, h in zip(refs, hyps):
        acc.add(r, h)
    return acc.rate


def corpus_wer(refs: list[str], hyps: list[str]) -> float:
    return _corpus_rate([r.split() for r in refs], [h.split() for h in hyps])


def corpus_cer(refs: list[str], hyps: list[str]) -> float:
    return _corpus_rate([list(r) for r in refs], [list(h) for h in hyps])
