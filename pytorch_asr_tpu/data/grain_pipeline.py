"""grain-based input pipeline with checkpointable iterator state.

SURVEY.md §2.1 data-pipeline row and §5.3: the reference uses
torch.utils.data with worker processes; here grain provides the shuffled,
per-host-sharded, restartable example stream, and a bucket-batcher on top
emits the static-shape batches XLA needs.  Iterator state (grain cursor +
partially-filled bucket buffers) serializes into the orbax checkpoint so
training resumes mid-epoch deterministically (§5.3 'deterministic
data-iterator checkpointing').

Round-3 design points (VERDICT r2 item 1):
  * The corpus may be a LazyCorpus (data/librispeech.py): examples decode
    one file per access, so nothing here may iterate the whole corpus.
    SortaGrad ordering uses header-only lengths; checkpoint state stores
    corpus INDICES for buffered examples, not audio — restore re-decodes.
  * A background producer thread assembles batches ``prefetch`` deep so host
    tokenize+pad+decode overlaps device compute.  Checkpoint exactness is
    kept by snapshotting the cursor state BEFORE each batch is assembled and
    carrying the snapshot with the batch: ``get_state`` returns the snapshot
    of the oldest batch the consumer has NOT yet received, so a restore
    replays exactly the batches still in flight.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Any, Sequence

import numpy as np

import grain.python as grain

from pytorch_asr_tpu.data.batching import _emit, assign_bucket, make_buckets
from pytorch_asr_tpu.data.tokenizer import CharTokenizer


def _corpus_lengths(corpus) -> np.ndarray:
    """Audio sample counts without decoding when the corpus supports it."""
    if hasattr(corpus, "audio_lengths"):
        return np.asarray(corpus.audio_lengths(), np.int64)
    return np.asarray([len(a) for a, _ in corpus], np.int64)


class _CorpusSource:
    """grain RandomAccessDataSource over an in-memory or lazy corpus.

    ``indices`` optionally remaps position -> base corpus index (used for the
    SortaGrad first-epoch ordering).  Every example carries its BASE corpus
    index so buffered-but-unbatched examples can checkpoint as plain ints.
    """

    def __init__(self, corpus: Sequence[tuple[np.ndarray, str]],
                 indices: Sequence[int] | None = None) -> None:
        self._corpus = corpus
        self._indices = None if indices is None else np.asarray(indices, np.int64)

    def __len__(self) -> int:
        return len(self._corpus) if self._indices is None else len(self._indices)

    def __getitem__(self, idx):
        base = int(idx) if self._indices is None else int(self._indices[int(idx)])
        audio, text = self._corpus[base]
        return {"audio": audio, "text": text, "idx": base}


class _MetaSource:
    """Header-only source for lazy corpora: transcript + header sample count,
    NO audio decode.  Bucket assignment needs only lengths, so with this
    source the example stream never touches audio bytes -- decode happens
    once per EMITTED batch, fanned over a thread pool (round 4)."""

    def __init__(self, corpus, lengths: np.ndarray,
                 indices: Sequence[int] | None = None) -> None:
        self._corpus = corpus
        self._lengths = lengths
        self._indices = None if indices is None else np.asarray(indices, np.int64)

    def __len__(self) -> int:
        return len(self._corpus) if self._indices is None else len(self._indices)

    def __getitem__(self, idx):
        base = int(idx) if self._indices is None else int(self._indices[int(idx)])
        return {"text": self._corpus.transcript(base),
                "alen": int(self._lengths[base]), "idx": base}


class GrainBucketedIterator:
    """Infinite bucketed-batch iterator over a grain pipeline.

    Batches match data.batching exactly: dict(audio, audio_len, tokens,
    token_len) with static shapes.  ``get_state``/``set_state`` capture the
    grain cursor and the indices of partially-filled bucket buffers;
    ``prefetch > 0`` assembles batches ahead in a daemon thread without
    changing the delivered sequence or the checkpoint semantics.
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
        prefetch: int = 3,
        decode_workers: int = 0,
    ) -> None:
        self.tokenizer = tokenizer or CharTokenizer()
        self.batch_size = batch_size
        self.buckets = make_buckets(bucket_audio_lens, bucket_label_lens)
        self.prefetch = int(prefetch)
        self._corpus = corpus
        # Lazy-metadata mode (round 4): for corpora with header-only lengths
        # (LazyCorpus), the example stream carries (idx, text, header length)
        # and audio decodes once per EMITTED batch, fanned over a thread pool
        # -- the C++ decoders release the GIL (ctypes.CDLL), so a batch of
        # files decodes in parallel instead of serially inside the stream.
        self._lazy = (hasattr(corpus, "audio_lengths")
                      and hasattr(corpus, "transcript"))
        self._pool = None
        # Unique per-iterator prefix: lets tests (and debuggers) tell THIS
        # iterator's decode threads from any other live iterator's.
        self._pool_prefix = f"audio-decode-{id(self):x}"
        if self._lazy:
            import os as _os

            self._lengths = np.asarray(corpus.audio_lengths(), np.int64)
            self._workers = int(decode_workers) or min(
                8, max(2, (_os.cpu_count() or 2) - 1))
            src = _MetaSource(corpus, self._lengths)
        else:
            src = _CorpusSource(corpus)
        ds = grain.MapDataset.source(src)
        if num_shards > 1:
            ds = ds[shard_index::num_shards]
        # SortaGrad (Deep Speech 2 curriculum): the first pass over the data
        # runs in ascending audio-length order; shuffled epochs follow.  The
        # ordering comes from header-only lengths — no decode, no corpus
        # materialization.
        self._iter0 = None
        self._ds0 = None
        if sortagrad:
            shard_idx = np.arange(len(corpus), dtype=np.int64)
            if num_shards > 1:
                shard_idx = shard_idx[shard_index::num_shards]
            lens = _corpus_lengths(corpus)[shard_idx]
            order = np.argsort(lens, kind="stable")
            src0 = (_MetaSource(corpus, self._lengths, shard_idx[order])
                    if self._lazy else _CorpusSource(corpus, shard_idx[order]))
            self._ds0 = grain.MapDataset.source(src0)
            self._iter0 = iter(self._ds0.to_iter_dataset())
        ds = ds.shuffle(seed=seed).repeat()
        self._iter = iter(ds.to_iter_dataset())
        # buffers hold (base_idx, audio-or-None, tokens); only base_idx
        # checkpoints (lazy mode buffers no audio at all).
        self._buffers: list[list[tuple[int, np.ndarray | None, np.ndarray]]] = [
            [] for _ in self.buckets
        ]
        # ---------------------------------------------------- prefetch state
        self._cond = threading.Condition()
        self._queue: deque[tuple[dict, dict]] = deque()   # (snapshot, batch)
        self._producing: dict | None = None
        self._stop = False
        self._error: BaseException | None = None
        self._thread: threading.Thread | None = None
        if self.prefetch > 0:
            self._start_thread()

    def __iter__(self):
        return self

    # ------------------------------------------------------------- core loop
    def _produce_batch(self) -> dict[str, np.ndarray]:
        """Advance the example stream until one bucket fills; emit it.

        Runs in the producer thread when prefetch > 0, inline otherwise —
        never concurrently with itself.
        """
        while True:
            if self._iter0 is not None:
                try:
                    ex = next(self._iter0)
                except StopIteration:
                    self._iter0 = None
                    continue
            else:
                ex = next(self._iter)
            if self._lazy:
                audio, alen = None, int(ex["alen"])
            else:
                audio = np.asarray(ex["audio"], np.float32)
                alen = len(audio)
            toks = self.tokenizer.encode(str(ex["text"]))
            bi = assign_bucket(self.buckets, alen, len(toks))
            if bi is None:
                continue
            self._buffers[bi].append((int(ex["idx"]), audio, toks))
            if len(self._buffers[bi]) == self.batch_size:
                buf, self._buffers[bi] = self._buffers[bi], []
                batch = _emit(self._decode_buf(buf), self.buckets[bi],
                              self.batch_size)
                return batch

    def _decode_buf(self, buf) -> list[tuple[np.ndarray, np.ndarray]]:
        """(idx, audio-or-None, toks) buffer -> [(audio, toks)], decoding the
        lazy entries of one batch in parallel on the thread pool."""
        if not self._lazy:
            return [(a, t) for _, a, t in buf]
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self._workers,
                thread_name_prefix=self._pool_prefix)
        audios = list(self._pool.map(
            lambda i: np.asarray(self._corpus[i][0], np.float32),
            [i for i, _, _ in buf]))
        return [(a, t) for a, (_, _, t) in zip(audios, buf)]

    def __next__(self) -> dict[str, np.ndarray]:
        if self.prefetch <= 0:
            return self._produce_batch()
        with self._cond:
            while not self._queue and self._error is None:
                self._cond.wait()
            if not self._queue:
                raise self._error
            _snapshot, batch = self._queue.popleft()
            self._cond.notify_all()
            return batch

    # ------------------------------------------------------- prefetch thread
    def _start_thread(self) -> None:
        self._stop = False
        self._error = None
        self._thread = threading.Thread(
            target=self._run, name="grain-prefetch", daemon=True)
        self._thread.start()

    def _run(self) -> None:
        try:
            while True:
                with self._cond:
                    while len(self._queue) >= self.prefetch and not self._stop:
                        self._cond.wait()
                    if self._stop:
                        return
                    # Cursor state from which THIS batch (and everything
                    # after it) reproduces — travels with the batch.
                    self._producing = self._snapshot()
                batch = self._produce_batch()
                with self._cond:
                    self._queue.append((self._producing, batch))
                    self._producing = None
                    self._cond.notify_all()
        except BaseException as e:  # surfaced to the consumer in __next__
            with self._cond:
                self._error = e
                self._producing = None
                self._cond.notify_all()

    def _stop_thread(self) -> None:
        if self._thread is None:
            return
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join()
        self._thread = None

    def close(self) -> None:
        """Stop the prefetch thread (idempotent).  Iterators are otherwise
        closed on GC; call this for deterministic teardown (tests, workers)."""
        self._stop_thread()
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):  # noqa: D105
        try:
            self.close()   # prefetch thread AND the decode pool (non-daemon)
        except Exception:
            pass

    # ------------------------------------------------------------ checkpoint
    def _snapshot(self) -> dict[str, Any]:
        """JSON-serializable cursor: grain state + buffered example indices.

        Audio never enters the state — restore re-decodes by index, which is
        deterministic and keeps 960h-scale checkpoints tiny.
        """
        return {
            "grain": self._iter.get_state(),
            "grain0": (self._iter0.get_state()
                       if self._iter0 is not None else None),
            "buffers": [[i for i, _, _ in buf] for buf in self._buffers],
        }

    def get_state(self) -> dict[str, Any]:
        if self.prefetch <= 0:
            return self._snapshot()
        with self._cond:
            if self._queue:
                return self._queue[0][0]
            if self._producing is not None:
                return self._producing
            # Producer idle under this lock -> live cursor is the next batch.
            return self._snapshot()

    def set_state(self, state: dict[str, Any]) -> None:
        self._stop_thread()
        self._queue.clear()
        self._iter.set_state(state["grain"])
        g0 = state.get("grain0")
        if g0 is None:
            self._iter0 = None
        elif self._ds0 is not None:
            if self._iter0 is None:
                self._iter0 = iter(self._ds0.to_iter_dataset())
            self._iter0.set_state(g0)
        self._buffers = []
        for buf in state["buffers"]:
            items = []
            for idx in buf:
                if self._lazy:
                    items.append((int(idx), None, self.tokenizer.encode(
                        str(self._corpus.transcript(int(idx))))))
                else:
                    audio, text = self._corpus[int(idx)]
                    items.append((int(idx), np.asarray(audio, np.float32),
                                  self.tokenizer.encode(str(text))))
            self._buffers.append(items)
        if self.prefetch > 0:
            self._start_thread()
