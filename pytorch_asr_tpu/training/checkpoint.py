"""Checkpoint/resume via orbax (SURVEY.md §2.1 'Checkpoint/resume', §3.5, §5.4).

Reference: ``torch.save``/``torch.load`` pickles.  Here: orbax CheckpointManager
with sharding-aware restore.  Parity checkpoints record config name, tokenizer
vocab, step and RNG so WER comparisons are reproducible (§5.4).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from pytorch_asr_tpu.configs.base import ExperimentConfig
from pytorch_asr_tpu.training.state import TrainState


def _meta(cfg: ExperimentConfig) -> dict[str, Any]:
    meta: dict[str, Any] = {
        "config_name": cfg.name,
        "config": dataclasses.asdict(cfg),
        "vocab": "char_v1" if cfg.data.vocab == "char" else cfg.data.vocab,
        "format_version": 1,
    }
    if cfg.data.vocab.startswith("bpe:"):
        # Embed the subword inventory so the checkpoint stays self-contained
        # even if the external vocab JSON moves.
        from pytorch_asr_tpu.data.tokenizer import get_tokenizer

        tok = get_tokenizer(cfg.data.vocab)
        meta["bpe"] = {"pieces": tok.pieces,
                       "merges": [list(m) for m in tok.merges]}
    return meta


class CheckpointManager:
    def __init__(self, cfg: ExperimentConfig, directory: str | None = None) -> None:
        self.cfg = cfg
        self.directory = os.path.abspath(directory or cfg.train.checkpoint_dir)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=cfg.train.keep_checkpoints, create=True),
        )
        meta_path = os.path.join(self.directory, "experiment.json")
        if not os.path.exists(meta_path):
            with open(meta_path, "w") as fh:
                json.dump(_meta(cfg), fh, indent=2, default=str)
        else:
            with open(meta_path) as fh:
                stored = json.load(fh)
            # Shape-bearing fields must match or orbax fails with an opaque
            # "requested shape not compatible" deep inside restore; surface a
            # diagnosable error instead.
            stored_impl = stored.get("config", {}).get("train", {}).get("rng_impl")
            if stored_impl is not None and stored_impl != cfg.train.rng_impl:
                raise ValueError(
                    f"checkpoint dir {self.directory} was written with "
                    f"train.rng_impl={stored_impl!r} but the current config "
                    f"uses {cfg.train.rng_impl!r} (different RNG key shapes); "
                    "resume with the original rng_impl or use a fresh "
                    "checkpoint_dir")
            if stored.get("config_name") not in (None, cfg.name):
                raise ValueError(
                    f"checkpoint dir {self.directory} belongs to experiment "
                    f"{stored.get('config_name')!r}, not {cfg.name!r}; use a "
                    "fresh checkpoint_dir")

    def save(self, state: TrainState, iterator_state: dict | None = None) -> None:
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if iterator_state is not None:
            with open(os.path.join(self.directory, f"iterator_{step}.json"),
                      "w") as fh:
                json.dump(iterator_state, fh)

    def restore_iterator_state(self, step: int | None = None) -> dict | None:
        step = step if step is not None else self._mgr.latest_step()
        path = os.path.join(self.directory, f"iterator_{step}.json")
        if step is None or not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, target: TrainState, step: int | None = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
