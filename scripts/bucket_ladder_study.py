"""Bucket-ladder study: padding efficiency vs compile budget (VERDICT r2
item 8; SURVEY.md:369 "bucket design is where the audio-s/s target is lost").

Sweeps the DP-optimal ladder (data/bucket_opt.py) over K = 1..8 buckets for
realistic utterance-duration profiles and prints efficiency + the compile
budget each K implies (each bucket shape is one XLA train_step compilation;
single-chip compile of the bench model measures 20-40 s through the axon
tunnel, amortized once per run).

Profiles (no LibriSpeech on disk — SURVEY §7.1 — so these are synthetic
stand-ins for the published corpus shape):
  * ``train``: LibriSpeech train-* style — segments cut near 35 s max for
    training, mass concentrated at 10-17 s (mean ~12.5 s).
  * ``dev``: dev/test style — natural utterances, roughly lognormal with
    mean ~7.4 s, long tail to ~35 s.

Run: python scripts/bucket_ladder_study.py [n=20000] [seed=0]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_asr_tpu.data.bucket_opt import optimize_buckets, padding_efficiency

SR = 16000


def profile_durations(kind: str, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "train":
        # Truncated normal around 13 s, cap 16.7 s (the LibriSpeech
        # segmentation cap), floor 1.5 s + a 20% shorter-utterance component.
        main = np.clip(rng.normal(13.0, 3.0, int(n * 0.8)), 1.5, 16.7)
        short = np.clip(rng.lognormal(1.6, 0.5, n - len(main)), 1.0, 16.7)
        d = np.concatenate([main, short])
    elif kind == "dev":
        d = np.clip(rng.lognormal(1.75, 0.65, n), 0.8, 35.0)
    else:
        raise ValueError(kind)
    return d


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    n = int(kv.get("n", 20000))
    seed = int(kv.get("seed", 0))
    for kind in ("train", "dev"):
        dur = profile_durations(kind, n, seed)
        audio = (dur * SR).astype(np.int64)
        # chars ~ 14.1/s of speech (LibriSpeech text density)
        labels = np.maximum((dur * 14.1).astype(np.int64), 1)
        print(f"\nprofile={kind}  n={n}  mean={dur.mean():.2f}s  "
              f"p50={np.percentile(dur, 50):.2f}s  "
              f"p95={np.percentile(dur, 95):.2f}s  max={dur.max():.2f}s")
        print(f"{'K':>2} {'pad_eff':>8} {'ladder (s)':<52} labels")
        for K in range(1, 9):
            ba, bl = optimize_buckets(audio, labels, K)
            eff = padding_efficiency(audio, ba)
            ladder = ",".join(f"{b / SR:.1f}" for b in ba)
            print(f"{K:>2} {eff:>8.4f} {ladder:<52} {','.join(map(str, bl))}")


if __name__ == "__main__":
    main()
