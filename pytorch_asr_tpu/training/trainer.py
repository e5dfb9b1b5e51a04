"""Training driver (SURVEY.md §2.1 'Training driver', §3.1).

Host loop: pull a bucketed batch, device_put it sharded over the 'data' mesh
axis, call the ONE jitted train_step (frontend -> encoder -> losses -> grads ->
update), periodically greedy-eval WER, checkpoint, and log JSONL metrics.  The
host/device boundary is crossed exactly once per step.
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import numpy as np

from pytorch_asr_tpu.configs.base import ExperimentConfig
from pytorch_asr_tpu.data import BucketedDataset, build_dataset, get_tokenizer
from pytorch_asr_tpu.decoding.eval_metrics import (
    local_hyps_refs as _local_hyps_refs,
    reduce_decode_metrics as _reduce_decode_metrics,
)
from pytorch_asr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_batch_global,
    shard_params,
    use_mesh,
)
from pytorch_asr_tpu.parallel.sharding import describe_shardings, shard_params_tp
from pytorch_asr_tpu.training.checkpoint import CheckpointManager
from pytorch_asr_tpu.training.metrics import MetricsLogger, Throughput
from pytorch_asr_tpu.training.state import (
    TrainState,
    build_model,
    eval_params,
    init_train_state,
    make_eval_step,
    make_train_step,
)


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        dataset: BucketedDataset | None = None,
        eval_dataset: BucketedDataset | None = None,
        metrics_path: str | None = None,
        checkpoint_dir: str | None = None,
        enable_checkpoints: bool = True,
        init_from_torch: str | None = None,
        tensorboard_dir: str | None = None,
    ) -> None:
        self.cfg = cfg
        self.tokenizer = get_tokenizer(cfg.data.vocab)
        explicit_dataset = dataset is not None
        self.dataset = dataset or build_dataset(cfg.data, cfg.frontend.sample_rate)
        if eval_dataset is None and not explicit_dataset \
                and cfg.data.librispeech_root \
                and getattr(cfg.data, "eval_split", "") \
                and cfg.data.eval_split != cfg.data.split:
            # Periodic dev-set eval (SURVEY L5): training on real data
            # evaluates on data.eval_split, not the training split.
            import dataclasses as _dc

            eval_dataset = build_dataset(
                _dc.replace(cfg.data, split=cfg.data.eval_split),
                cfg.frontend.sample_rate)
        self.eval_dataset = eval_dataset or self.dataset
        # Training stream: checkpointable grain iterator, per-host sharded
        # (falls back to the in-memory bucketed iterator when a dataset object
        # was handed in explicitly, e.g. by tests).
        self._mem_iter = None
        if explicit_dataset:
            self.train_iter = None
        else:
            from pytorch_asr_tpu.data import build_grain_iterator
            from pytorch_asr_tpu.parallel import distributed

            shards, idx = distributed.host_shard()
            self.train_iter = build_grain_iterator(
                cfg.data, cfg.frontend.sample_rate, shards, idx)
        self.mesh = make_mesh(cfg.mesh, batch_size=cfg.data.batch_size)
        self.tensor_parallel = self.mesh.shape["model"] > 1
        self.tp_directions = False
        self.tp_tcn_pallas = False
        if self.tensor_parallel and getattr(cfg.model.encoder, "use_pallas", False):
            import dataclasses

            from pytorch_asr_tpu.ops.runtime import pallas_active

            enc = cfg.model.encoder
            if (self.mesh.shape["model"] == 2 and pallas_active()
                    and getattr(enc, "kind", "") == "bilstm"
                    and getattr(enc, "bidirectional", True)):
                # Direction-sharded TP: each model shard runs ONE direction's
                # fully-fused Pallas kernel (encoder_bilstm.py::
                # _bilstm_tp_directions) — the fast path SURVIVES the model
                # axis.  LSTM weights stay replicated at rest
                # (DIRECTION_TP_RULES); activations/compute shard.
                self.tp_directions = True
                cfg = dataclasses.replace(cfg, model=dataclasses.replace(
                    cfg.model, encoder=dataclasses.replace(
                        enc, tp_directions=True)))
            elif (getattr(enc, "kind", "") == "tcn" and pallas_active()
                  and enc.channels % self.mesh.shape["model"] == 0):
                # TCN keeps the fused Pallas kernels under ANY model axis:
                # each shard runs the block body on a GLU-pair-aware channel
                # slice + psum (encoder_tcn.py::TCNBlock._tp_pallas) — no
                # per-step recurrence obstacle.  Weights stay replicated at
                # rest (the shard_map body slices locally for free), so the
                # placement rule set is EMPTY.
                self.tp_tcn_pallas = True
            else:
                # Gate-dim TP (LSTM model axis > 2, or no bidirectional pair
                # to shard): the fused kernel needs the full (D, 4H) weights
                # per device, so the recurrence runs the lax.scan path, which
                # GSPMD partitions over the sharded gate dim.
                cfg = dataclasses.replace(cfg, model=dataclasses.replace(
                    cfg.model, encoder=dataclasses.replace(
                        enc, use_pallas=False)))
            self.cfg = cfg
        self.model = build_model(cfg, self.tokenizer)
        # Only the primary host writes metrics/TB (reference: rank-0 logging);
        # orbax checkpoint saves stay collective (all processes participate).
        from pytorch_asr_tpu.parallel import distributed

        primary = distributed.is_primary()
        self.metrics = MetricsLogger(metrics_path if primary else None,
                                     stdout=primary,
                                     tensorboard_dir=tensorboard_dir
                                     if primary else None)
        self.throughput = Throughput(num_chips=self.mesh.devices.size)
        self._ckpt = (CheckpointManager(cfg, checkpoint_dir)
                      if enable_checkpoints else None)

        sample = next(iter(self.dataset.epoch_batches(seed=0)))
        with use_mesh(self.mesh):
            self.state: TrainState = init_train_state(cfg, self.model, sample)
        if init_from_torch:
            self.state = self.state.replace(
                params=self._import_torch(init_from_torch, self.state.params))
        # Parameter placement: tensor-parallel layout (parallel/sharding.py
        # RULES) when the mesh has a model axis, replication otherwise.  The
        # optimizer state and EMA weights mirror the parameter layout -- their
        # tree paths embed the parameter path, so the same rules apply.
        if self.tensor_parallel:
            from pytorch_asr_tpu.parallel.sharding import DIRECTION_TP_RULES

            if self.tp_directions:
                rules, tp_mode = DIRECTION_TP_RULES, "directions"
            elif self.tp_tcn_pallas:
                rules, tp_mode = (), "tcn_pallas"   # all replicated at rest
            else:
                rules, tp_mode = None, "gate_dims"  # default RULES
            place = lambda t: shard_params_tp(t, self.mesh, rules)  # noqa: E731
            self.metrics.log(
                "mesh", layout=dict(self.mesh.shape), tp_mode=tp_mode,
                sharded_params=sorted(
                    describe_shardings(self.state.params, self.mesh, rules)))
        else:
            place = lambda t: shard_params(self.mesh, t)  # noqa: E731
        self.state = self.state.replace(
            params=place(self.state.params),
            opt_state=place(self.state.opt_state),
            ema_params=place(self.state.ema_params)
            if self.state.ema_params is not None else None,
        )
        if self._ckpt is not None and self._ckpt.latest_step() is not None:
            self.state = self._ckpt.restore(self.state)
            it_state = self._ckpt.restore_iterator_state()
            if it_state is not None and self.train_iter is not None:
                self.train_iter.set_state(it_state)
            self.metrics.log("restore", step=int(self.state.step))
        self._train_step = jax.jit(make_train_step(cfg, self.model), donate_argnums=0)
        # Eval outputs PINNED to the batch sharding: multi-host eval fetches
        # each process's addressable rows, so outputs must stay 'data'-sharded
        # (an XLA-chosen replicated layout would double-count utterances).
        from jax.sharding import NamedSharding, PartitionSpec as P

        out_sh = NamedSharding(self.mesh, P("data"))
        self._eval_step = jax.jit(make_eval_step(cfg, self.model),
                                  out_shardings=(out_sh, out_sh))

    # ------------------------------------------------------------------ train
    def train(self, num_steps: int, batches: Iterator[dict] | None = None) -> dict:
        cfg = self.cfg
        # Cache the fallback iterator: rebuilding it per train() call would
        # restart the (same-seed) epoch stream every eval_every chunk.
        if batches is None and self.train_iter is None:
            if self._mem_iter is None:
                self._mem_iter = self.dataset.repeat_batches(
                    seed=cfg.data.shuffle_seed, sortagrad=cfg.data.sortagrad)
            batches = self._mem_iter
        it = batches or self.train_iter
        sr = cfg.frontend.sample_rate
        last = {}
        self.throughput.reset()
        t_step0 = time.perf_counter()
        for _ in range(num_steps):
            host_batch = next(it)
            batch = shard_batch(self.mesh, host_batch)
            with use_mesh(self.mesh):   # trace-time mesh for Pallas shard_map
                self.state, aux = self._train_step(self.state, batch)
            self.throughput.update(float(host_batch["audio_len"].sum()) / sr)
            step = int(self.state.step)
            if step % cfg.train.log_every == 0 or step == 1:
                aux_host = {k: float(v) for k, v in aux.items()
                            if np.ndim(v) == 0}
                tp = self.throughput.value()
                last = {"step": step, **aux_host, **tp}
                self.metrics.log("train", **last)
                self.throughput.reset()
            if self._ckpt is not None and step % cfg.train.checkpoint_every == 0:
                self._ckpt.save(self.state, self._iter_state())
        last["wall_s"] = time.perf_counter() - t_step0
        if self._ckpt is not None:
            self._ckpt.save(self.state, self._iter_state())
            self._ckpt.wait()
        return last

    def close(self) -> None:
        """Deterministic teardown: stop the grain prefetch thread (idempotent).

        The producer is a daemon thread, so process exit never hangs on it --
        but a still-running producer keeps decoding audio in the background,
        which matters when several Trainers share one process (tests, eval
        sweeps).  Safe to call more than once."""
        if self.train_iter is not None:
            self.train_iter.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _iter_state(self):
        return self.train_iter.get_state() if self.train_iter is not None else None

    def _import_torch(self, path: str, params: dict) -> dict:
        """Initialize the model from a reference torch checkpoint
        (SURVEY.md §2.1 'parity checkpoints'; training/torch_import.py).

        Dispatches on the configured architecture, so every BASELINE config
        family imports: conv+BiLSTM (configs 1/2), TCN (config 3), and the
        LAS decoder subtree for attention/joint models (configs 4/5).
        """
        from pytorch_asr_tpu.training.torch_import import (
            TorchImportError,
            import_torch_bilstm_ctc,
            import_torch_las_decoder,
            import_torch_tcn_ctc,
            load_torch_checkpoint,
        )

        enc_cfg = self.cfg.model.encoder
        sd = load_torch_checkpoint(path)
        if getattr(enc_cfg, "kind", "bilstm") == "tcn":
            imported = import_torch_tcn_ctc(
                sd, num_mel_bins=self.cfg.frontend.n_mels,
                vocab_size=self.tokenizer.vocab_size)
        else:
            imported = import_torch_bilstm_ctc(
                sd, num_mel_bins=self.cfg.frontend.n_mels,
                vocab_size=self.tokenizer.vocab_size,
                freq_stride=enc_cfg.conv_stride[1])
        if self.cfg.model.decoder is not None:
            from pytorch_asr_tpu.models.asr_model import encoder_output_dim

            dec = self.cfg.model.decoder
            imported["las"] = import_torch_las_decoder(
                sd, hidden_dim=dec.hidden_dim,
                attention_dim=dec.attention_dim,
                enc_dim=encoder_output_dim(self.cfg.model),
                location_filters=dec.location_filters,
                vocab_size=self.tokenizer.vocab_size)
        merged = {**params, **imported}
        for sub in imported:
            want = jax.tree.map(np.shape, params[sub])
            got = jax.tree.map(np.shape, imported[sub])
            if want != got:
                raise TorchImportError(
                    f"imported '{sub}' shapes {got} do not match the "
                    f"configured model {want}; check the config matches the "
                    f"reference architecture")
        self.metrics.log("init_from_torch", path=path,
                         subtrees=sorted(imported))
        return merged

    # ------------------------------------------------------------------- eval
    def decode_eval(self, max_batches: int | None = None,
                    dump_path: str | None = None) -> dict:
        """Run the decode method named by cfg.decode over the eval set."""
        method = self.cfg.decode.method
        if method == "greedy":
            return self.evaluate(max_batches=max_batches)
        from pytorch_asr_tpu.decoding.driver import decode_dataset

        with use_mesh(self.mesh):
            return decode_dataset(self, max_batches=max_batches,
                                  dump_path=dump_path)

    def evaluate(self, max_batches: int | None = None) -> dict:
        """Greedy-decode WER over the eval dataset.

        Multi-host-safe (SURVEY.md §2.4 / VERDICT r2 item 2): every process
        iterates the SAME eval batches (shapes agree at every collective
        step), contributes its row block via ``shard_batch_global``, fetches
        only its addressable output rows, and the error/token COUNTS are
        summed across processes — never a global-array fetch, which raises
        on a multi-host mesh.
        """
        refs: list[str] = []
        hyps: list[str] = []
        t0 = time.perf_counter()
        audio_sec = 0.0
        for i, host_batch in enumerate(self.eval_dataset.epoch_batches(seed=0)):
            if max_batches is not None and i >= max_batches:
                break
            batch = shard_batch_global(self.mesh, host_batch)
            with use_mesh(self.mesh):
                ids, n = self._eval_step(eval_params(self.state), batch)
            r, h, a_sec = _local_hyps_refs(self.tokenizer, batch, ids, n,
                                           self.cfg.frontend.sample_rate)
            refs.extend(r)
            hyps.extend(h)
            audio_sec += a_sec
        result = _reduce_decode_metrics(refs, hyps, audio_sec,
                                        time.perf_counter() - t0)
        result["step"] = int(self.state.step)
        self.metrics.log("eval", **result)
        return result
