"""Two-process jax.distributed bring-up (SURVEY.md §2.4; VERDICT r1 item 3).

Spawns 2 real processes, each with 4 virtual CPU devices, joined through a
localhost coordinator.  Asserts:
  * global mesh assembly: 2 processes x 4 local = 8 global devices;
  * per-host grain shards are disjoint and cover distinct utterances;
  * primary-only writes: exactly one process emits the rank-0 marker;
  * the distributed train-step loss matches a single-process 8-device run
    bit-for-bit at fp32 tolerance (per-host batches assembled into the same
    global array via jax.make_array_from_process_local_data).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("dist"))
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The worker sets its own 4-device XLA flags; drop this process's 8.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), outdir],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"result_{pid}.json")) as fh:
            results.append(json.load(fh))
    return outdir, results


def test_global_mesh_assembly(two_process_run):
    _, results = two_process_run
    for pid, r in enumerate(results):
        assert r["topology"]["process_count"] == 2
        assert r["topology"]["process_index"] == pid
        assert r["topology"]["local_devices"] == 4
        assert r["topology"]["global_devices"] == 8
        assert r["mesh_shape"] == {"data": 8, "model": 1}
        assert r["host_shard"] == [2, pid]


def test_host_grain_shards_disjoint(two_process_run):
    _, results = two_process_run
    k0, k1 = (set(r["utt_keys"]) for r in results)
    assert k0 and k1
    assert not (k0 & k1), "hosts read overlapping utterances"


def test_primary_only_writes(two_process_run):
    outdir, _ = two_process_run
    marker = os.path.join(outdir, "primary.marker")
    assert os.path.exists(marker)
    with open(marker) as fh:
        assert "process 0" in fh.read()


def test_multiprocess_tensor_parallel(two_process_run):
    """(data=4, model=2) across 2 processes: LSTM gate shards live on
    different hosts; losses agree across processes and with the
    single-process TP run."""
    _, results = two_process_run
    for r in results:
        assert r["tp_mesh_shape"] == {"data": 4, "model": 2}
    np.testing.assert_allclose(results[0]["tp_losses"],
                               results[1]["tp_losses"], rtol=0, atol=0)
    import importlib.util

    from pytorch_asr_tpu.configs.base import MeshConfig
    from pytorch_asr_tpu.parallel.mesh import make_mesh

    spec = importlib.util.spec_from_file_location("distributed_worker", WORKER)
    worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker)
    cfg = worker.tiny_cfg()
    mesh = make_mesh(MeshConfig(model_axis=2))
    ref = worker.run_steps(cfg, mesh, worker.global_batch(),
                           tensor_parallel=True)
    np.testing.assert_allclose(results[0]["tp_losses"], ref, rtol=1e-5)


def test_multiprocess_eval_decode_matches_single_process(two_process_run):
    """Greedy eval + prefix-beam decode on the 2-process mesh: each process
    fetches only its addressable rows, WER counts all-reduce — the corpus
    metrics must agree across processes AND with a single-process run
    (VERDICT r2 item 2)."""
    _, results = two_process_run
    ed0, ed1 = results[0]["eval_decode"], results[1]["eval_decode"]
    assert ed0 == ed1, "processes disagree on reduced corpus metrics"
    import importlib.util

    spec = importlib.util.spec_from_file_location("distributed_worker", WORKER)
    worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker)
    ref = worker.run_eval_decode()   # single process, 8 local virtual devices
    for phase in ("eval", "decode"):
        assert ed0[phase]["num_utts"] == ref[phase]["num_utts"] > 0
        np.testing.assert_allclose(ed0[phase]["wer"], ref[phase]["wer"],
                                   rtol=0, atol=0)
        np.testing.assert_allclose(ed0[phase]["cer"], ref[phase]["cer"],
                                   rtol=0, atol=0)


def test_distributed_loss_matches_single_process(two_process_run):
    _, results = two_process_run
    l0, l1 = results[0]["losses"], results[1]["losses"]
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)  # same global state
    # Single-process reference on this test process's own 8 virtual devices.
    import importlib.util

    from pytorch_asr_tpu.configs.base import MeshConfig
    from pytorch_asr_tpu.parallel.mesh import make_mesh

    spec = importlib.util.spec_from_file_location("distributed_worker", WORKER)
    worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker)
    global_batch, run_steps, tiny_cfg = (worker.global_batch, worker.run_steps,
                                         worker.tiny_cfg)

    cfg = tiny_cfg()
    mesh = make_mesh(MeshConfig())
    ref = run_steps(cfg, mesh, global_batch())
    np.testing.assert_allclose(l0, ref, rtol=1e-5)
