"""Multi-host-safe hypothesis collection + metric reduction for eval/decode.

Shared by training.trainer (greedy eval) and decoding.driver (beam decode).
The pattern (SURVEY.md §2.4, VERDICT r2 item 2): per-process row fetch from
batch-sharded global arrays, host-side detokenize, then a single
sum-of-counts collective — a multi-host mesh never sees a global-array fetch
(``np.asarray(global_arr)`` raises when shards are non-addressable).
"""

from __future__ import annotations

import numpy as np

from pytorch_asr_tpu.decoding.wer import corpus_counts
from pytorch_asr_tpu.parallel.distributed import sum_across_processes
from pytorch_asr_tpu.parallel.mesh import fetch_local_rows


def local_hyps_refs(tokenizer, batch, ids, lens, sample_rate: int,
                    ctc_collapse: bool = False):
    """This process's (refs, hyps, audio_seconds) for one decoded batch.

    ``batch`` holds the sharded INPUT arrays (tokens/token_len/audio_len) and
    ``ids``/``lens`` the decoded output — references come from the fetched
    input rows (not the host batch) so row alignment survives any
    process-to-row permutation of the global assembly.
    """
    ids = fetch_local_rows(ids)
    lens = fetch_local_rows(lens)
    toks = fetch_local_rows(batch["tokens"])
    tlen = fetch_local_rows(batch["token_len"])
    alen = fetch_local_rows(batch["audio_len"])
    detok = tokenizer.decode_ctc if ctc_collapse else tokenizer.decode
    refs, hyps = [], []
    for b in np.where(alen > 0)[0]:
        hyps.append(detok(ids[b, : lens[b]]))
        refs.append(tokenizer.decode(toks[b, : tlen[b]]))
    return refs, hyps, float(alen.sum()) / sample_rate


def reduce_decode_metrics(refs, hyps, audio_sec: float, wall_s: float) -> dict:
    """Global WER/CER/RTF from per-process refs/hyps via one count-sum
    collective (every process must call this exactly once per eval)."""
    werr, wtok = corpus_counts(refs, hyps, unit="word")
    cerr, ctok = corpus_counts(refs, hyps, unit="char")
    # Counts reduce as INTEGERS (exact across hosts); audio seconds reduce
    # as float and only feed RTF.
    g = sum_across_processes(
        np.asarray([werr, wtok, cerr, ctok, len(refs)], np.int64))
    a = sum_across_processes(np.asarray([audio_sec], np.float64))
    return {
        "wer": float(g[0] / max(g[1], 1)),
        "cer": float(g[2] / max(g[3], 1)),
        "num_utts": int(g[4]),
        "decode_rtf": float(wall_s / max(a[0], 1e-9)),
    }
