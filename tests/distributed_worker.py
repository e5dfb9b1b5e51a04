"""One process of a 2-process jax.distributed CPU run (tests/test_distributed.py).

Invoked as: python tests/distributed_worker.py <pid> <nproc> <port> <outdir>

Each process exposes 4 virtual CPU devices; together they form the 8-device
global mesh.  The worker exercises the REAL multi-host code paths
(SURVEY.md §2.4/§3.3): `parallel.distributed.initialize`, global mesh
assembly over all processes' devices, per-host grain shards, per-host batch
-> global array assembly (`parallel.mesh.shard_batch`), the jitted sharded
train step, and primary-gated writes.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys


def tiny_cfg():
    """Import-safe (no jax): shared by the worker and the parent test."""
    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (
        BiLSTMEncoderConfig, DataConfig, FrontendConfig, ModelConfig,
        OptimConfig, TrainConfig)

    cfg = get_config("ctc_bilstm_dev1h")
    return dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(batch_size=4, bucket_audio_lens=(16000,),
                        bucket_label_lens=(16,)),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(4, 4), hidden_dim=32,
                                        num_layers=1, dropout=0.0,
                                        use_pallas=False),
            compute_dtype="float32",
        ),
        train=TrainConfig(optim=OptimConfig(warmup_steps=10, total_steps=100),
                          rng_impl="threefry2x32"),
    )


def global_batch(n_rows: int = 8):
    """Deterministic global batch; every process derives the same one."""
    import numpy as np

    rng = np.random.default_rng(0)
    A, L = 16000, 16
    return {
        "audio": (rng.standard_normal((n_rows, A)) * 0.1).astype(np.float32),
        "audio_len": np.full((n_rows,), A, np.int32),
        "tokens": rng.integers(1, 27, size=(n_rows, L)).astype(np.int32),
        "token_len": np.full((n_rows,), L // 2, np.int32),
    }


def run_steps(cfg, mesh, local_batch, steps: int = 2,
              tensor_parallel: bool = False):
    """init -> place params -> assemble global batch -> n train steps.

    ``tensor_parallel``: place parameters/optimizer with the TP layout
    (parallel/sharding.py RULES).  Placement goes through
    ``jax.make_array_from_callback`` because in a multi-controller run each
    process can only materialize ITS addressable shards of a model-sharded
    array (plain device_put only works fully-replicated).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_asr_tpu.parallel.mesh import shard_batch, use_mesh
    from pytorch_asr_tpu.parallel.sharding import param_shardings
    from pytorch_asr_tpu.training.state import (
        build_model, init_train_state, make_train_step)

    model = build_model(cfg)
    sample = global_batch()
    with use_mesh(mesh):
        state = init_train_state(cfg, model, sample)
        rep = NamedSharding(mesh, P())

        def from_host(x, sh):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sh, lambda idx: arr[idx])

        if tensor_parallel:
            place = lambda t: jax.tree.map(  # noqa: E731
                from_host, t, param_shardings(t, mesh))
        else:
            place = lambda t: jax.tree.map(  # noqa: E731
                lambda x: from_host(x, rep), t)
        state = state.replace(
            params=place(state.params),
            opt_state=place(state.opt_state),
            step=from_host(state.step, rep),
            rng=from_host(state.rng, rep),
        )
        batch = shard_batch(mesh, local_batch)
        train_step = jax.jit(make_train_step(cfg, model))
        losses = []
        for _ in range(steps):
            state, aux = train_step(state, batch)
            losses.append(float(jax.device_get(aux["loss"])))
    return losses


def eval_cfg():
    """Config for the multi-host eval/decode parity check (import-safe).

    batch_size 8 keeps the data axis at all 8 global devices (4 per process)
    so both processes own rows of every eval batch.
    """
    import dataclasses

    cfg = tiny_cfg()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, batch_size=8, bucket_audio_lens=(64000,),
            bucket_label_lens=(64,), synthetic_num_utts=20),
        decode=dataclasses.replace(cfg.decode, method="prefix_beam",
                                   beam_size=4),
    )


def run_eval_decode():
    """Greedy eval + prefix-beam decode through the REAL Trainer/driver
    multi-host path (shard_batch_global -> per-process row fetch ->
    count-sum reduction).  Returns corpus metrics; must equal the
    single-process run bit-for-bit on wer/cer/num_utts."""
    from pytorch_asr_tpu.training.trainer import Trainer

    tr = Trainer(eval_cfg(), enable_checkpoints=False)
    ev = tr.evaluate(max_batches=2)
    dec = tr.decode_eval(max_batches=1)
    pick = lambda d: {k: d[k] for k in ("wer", "cer", "num_utts")}  # noqa: E731
    return {"eval": pick(ev), "decode": pick(dec)}


def _utt_keys(it, n_batches: int) -> list[str]:
    """Stable per-utterance fingerprints from a bucketed iterator."""
    import hashlib

    keys = []
    for _ in range(n_batches):
        b = next(it)
        for r in range(b["tokens"].shape[0]):
            if b["audio_len"][r] > 0:
                # Audio is unique per utterance (random tone phases + noise);
                # transcripts are NOT (small synthetic word list).
                n = min(int(b["audio_len"][r]), 1024)
                keys.append(hashlib.sha1(b["audio"][r, :n].tobytes()).hexdigest())
    return keys


def main() -> None:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pytorch_asr_tpu.configs.base import MeshConfig
    from pytorch_asr_tpu.data import synthetic_corpus
    from pytorch_asr_tpu.data.grain_pipeline import GrainBucketedIterator
    from pytorch_asr_tpu.parallel import distributed
    from pytorch_asr_tpu.parallel.mesh import make_mesh

    topo = distributed.initialize(f"localhost:{port}", nproc, pid)

    cfg = tiny_cfg()
    # Per-host grain shard: every host materializes the same corpus, then
    # reads its own strided slice (data/grain_pipeline.py).
    num_shards, shard_index = distributed.host_shard()
    corpus = synthetic_corpus(16, cfg.frontend.sample_rate, seed=0,
                              min_words=1, max_words=2)
    it = GrainBucketedIterator(
        corpus, batch_size=2, bucket_audio_lens=(64000,),
        bucket_label_lens=(64,), num_shards=num_shards,
        shard_index=shard_index)
    utt_keys = _utt_keys(it, n_batches=4)

    mesh = make_mesh(MeshConfig())  # all 8 global devices on the data axis
    gb = global_batch()
    local = {k: v[pid * 4:(pid + 1) * 4] for k, v in gb.items()}
    losses = run_steps(cfg, mesh, local)

    # multi-process TENSOR PARALLELISM: (data=4, model=2) over both hosts,
    # LSTM gate dims sharded across processes.
    mesh_tp = make_mesh(MeshConfig(model_axis=2))
    tp_losses = run_steps(cfg, mesh_tp, local, tensor_parallel=True)

    # Multi-host eval + decode parity (VERDICT r2 item 2).
    eval_decode = run_eval_decode()

    # Primary-gated writes (reference: rank 0 logs/saves).
    if distributed.is_primary():
        with open(os.path.join(outdir, "primary.marker"), "w") as fh:
            fh.write(f"written by process {pid}\n")

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as fh:
        json.dump({"topology": topo, "losses": losses,
                   "tp_losses": tp_losses,
                   "eval_decode": eval_decode,
                   "tp_mesh_shape": {k: int(v) for k, v in mesh_tp.shape.items()},
                   "utt_keys": utt_keys,
                   "mesh_shape": {k: int(v) for k, v in mesh.shape.items()},
                   "host_shard": [num_shards, shard_index]}, fh)


if __name__ == "__main__":
    main()
