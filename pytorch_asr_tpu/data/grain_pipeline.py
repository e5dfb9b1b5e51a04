"""grain-based input pipeline with checkpointable iterator state.

SURVEY.md §2.1 data-pipeline row and §5.3: the reference uses
torch.utils.data with worker processes; here grain provides the shuffled,
per-host-sharded, restartable example stream, and a bucket-batcher on top
emits the static-shape batches XLA needs.  Iterator state (grain cursor +
partially-filled bucket buffers) serializes into the orbax checkpoint so
training resumes mid-epoch deterministically (§5.3 'deterministic
data-iterator checkpointing').
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import grain.python as grain

from pytorch_asr_tpu.data.batching import Bucket, _emit, assign_bucket, make_buckets
from pytorch_asr_tpu.data.tokenizer import CharTokenizer


class _CorpusSource:
    """grain RandomAccessDataSource over an in-memory or lazy corpus."""

    def __init__(self, corpus: Sequence[tuple[np.ndarray, str]]) -> None:
        self._corpus = corpus

    def __len__(self) -> int:
        return len(self._corpus)

    def __getitem__(self, idx):
        audio, text = self._corpus[idx]
        return {"audio": audio, "text": text}


class GrainBucketedIterator:
    """Infinite bucketed-batch iterator over a grain pipeline.

    Batches match data.batching exactly: dict(audio, audio_len, tokens,
    token_len) with static shapes.  ``get_state``/``set_state`` capture the
    grain cursor and the partially-filled bucket buffers.
    """

    def __init__(
        self,
        corpus: Sequence[tuple[np.ndarray, str]],
        batch_size: int,
        bucket_audio_lens: Sequence[int],
        bucket_label_lens: Sequence[int],
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        tokenizer: CharTokenizer | None = None,
        sortagrad: bool = False,
    ) -> None:
        self.tokenizer = tokenizer or CharTokenizer()
        self.batch_size = batch_size
        self.buckets = make_buckets(bucket_audio_lens, bucket_label_lens)
        ds = grain.MapDataset.source(_CorpusSource(corpus))
        if num_shards > 1:
            ds = ds[shard_index::num_shards]
        # SortaGrad (Deep Speech 2 curriculum): the first pass over the data
        # runs in ascending audio-length order; shuffled epochs follow.
        self._iter0 = None
        if sortagrad:
            order = np.argsort([len(ds[i]["audio"]) for i in range(len(ds))],
                               kind="stable")
            sorted_ds = grain.MapDataset.source(
                _CorpusSource([(ds[int(i)]["audio"], ds[int(i)]["text"])
                               for i in order]))
            self._iter0 = iter(sorted_ds.to_iter_dataset())
        ds = ds.shuffle(seed=seed).repeat()
        self._iter = iter(ds.to_iter_dataset())
        self._buffers: list[list[tuple[np.ndarray, np.ndarray]]] = [
            [] for _ in self.buckets
        ]

    def __iter__(self):
        return self

    def __next__(self) -> dict[str, np.ndarray]:
        while True:
            if self._iter0 is not None:
                try:
                    ex = next(self._iter0)
                except StopIteration:
                    self._iter0 = None
                    continue
            else:
                ex = next(self._iter)
            audio = np.asarray(ex["audio"], np.float32)
            toks = self.tokenizer.encode(str(ex["text"]))
            bi = assign_bucket(self.buckets, len(audio), len(toks))
            if bi is None:
                continue
            self._buffers[bi].append((audio, toks))
            if len(self._buffers[bi]) == self.batch_size:
                batch = _emit(self._buffers[bi], self.buckets[bi], self.batch_size)
                self._buffers[bi] = []
                return batch

    # ------------------------------------------------------------ checkpoint
    def get_state(self) -> dict[str, Any]:
        return {
            "grain": self._iter.get_state(),
            "grain0": (self._iter0.get_state()
                       if self._iter0 is not None else None),
            "buffers": [
                [(a.tolist(), t.tolist()) for a, t in buf] for buf in self._buffers
            ],
        }

    def set_state(self, state: dict[str, Any]) -> None:
        self._iter.set_state(state["grain"])
        g0 = state.get("grain0")
        if g0 is None:
            self._iter0 = None
        elif self._iter0 is not None:
            self._iter0.set_state(g0)
        self._buffers = [
            [(np.asarray(a, np.float32), np.asarray(t, np.int32)) for a, t in buf]
            for buf in state["buffers"]
        ]
