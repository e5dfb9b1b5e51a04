"""Structured JSONL metrics (SURVEY.md §5.5).

Metric names follow BASELINE.json:2 so the driver can scrape them:
``audio_seconds_per_sec_per_chip`` (train throughput) and ``decode_rtf``.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Any


class MetricsLogger:
    """JSONL event log, optionally mirrored to TensorBoard (SURVEY §2.1
    logging row: 'structured JSONL + tensorboard')."""

    def __init__(self, path: str | None = None, stdout: bool = True,
                 tensorboard_dir: str | None = None) -> None:
        self._fh: IO[str] | None = None
        self.stdout = stdout
        self._tb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
        if tensorboard_dir:
            import tensorflow as tf  # baked into this image; gated import

            self._tb = tf.summary.create_file_writer(tensorboard_dir)
        self._tb_step = 0

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "ts": time.time(), **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.stdout:
            print(line, flush=True)
        if self._tb is not None:
            import tensorflow as tf

            step = int(fields.get("step", self._tb_step))
            self._tb_step = max(self._tb_step, step) + 1
            with self._tb.as_default():
                for k, v in fields.items():
                    if isinstance(v, (int, float)) and k != "step":
                        tf.summary.scalar(f"{event}/{k}", float(v), step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None


class Throughput:
    """Tracks audio-seconds/s/chip between calls (BASELINE.json:2 metric)."""

    def __init__(self, num_chips: int = 1) -> None:
        self.num_chips = max(num_chips, 1)
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._audio_sec = 0.0
        self._steps = 0

    def update(self, batch_audio_sec: float) -> None:
        self._audio_sec += batch_audio_sec
        self._steps += 1

    def value(self) -> dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "audio_seconds_per_sec_per_chip": self._audio_sec / dt / self.num_chips,
            "steps_per_sec": self._steps / dt,
        }
