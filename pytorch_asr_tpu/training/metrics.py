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
    def __init__(self, path: str | None = None, stdout: bool = True) -> None:
        self._fh: IO[str] | None = None
        self.stdout = stdout
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "ts": time.time(), **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.stdout:
            print(line, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


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
