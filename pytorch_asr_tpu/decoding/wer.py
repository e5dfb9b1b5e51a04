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


def corpus_wer(refs: list[str], hyps: list[str]) -> float:
    acc = ErrorRateAccumulator()
    for r, h in zip(refs, hyps):
        acc.add(r.split(), h.split())
    return acc.rate


def corpus_cer(refs: list[str], hyps: list[str]) -> float:
    acc = ErrorRateAccumulator()
    for r, h in zip(refs, hyps):
        acc.add(list(r), list(h))
    return acc.rate
