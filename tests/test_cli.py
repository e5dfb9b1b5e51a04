"""CLI smoke tests (layer T7)."""

import dataclasses
import json
import os
import subprocess
import sys


def test_train_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "pytorch_asr_tpu.train", "--help"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0
    assert "ctc_bilstm_dev1h" in out.stdout


def test_config_overrides():
    from pytorch_asr_tpu.configs import get_config

    cfg = get_config("ctc_bilstm_dev1h",
                     **{"data.batch_size": "4",
                        "model.encoder.hidden_dim": "64",
                        "train.optim.peak_lr": "0.001",
                        "frontend.use_pallas": "false"})
    assert cfg.data.batch_size == 4
    assert cfg.model.encoder.hidden_dim == 64
    assert cfg.train.optim.peak_lr == 0.001
    assert cfg.frontend.use_pallas is False


def test_train_cli_runs_steps(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "pytorch_asr_tpu.train", "ctc_bilstm_dev1h",
         "steps=3",
         "metrics_path=" + str(metrics),
         "data.batch_size=2",
         "data.bucket_audio_lens=32000",
         "data.bucket_label_lens=32",
         "data.synthetic_num_utts=4",
         "model.encoder.hidden_dim=16",
         "model.encoder.num_layers=1",
         "model.encoder.conv_channels=4",
         "model.compute_dtype=float32",
         "frontend.use_pallas=false",
         "frontend.specaugment=false",
         "train.eval_every=3",
         "train.checkpoint_every=1000",
         "train.checkpoint_dir=" + str(tmp_path / "ckpt"),
         "train.log_every=1"],
        capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    events = [json.loads(l) for l in metrics.read_text().splitlines()]
    kinds = {e["event"] for e in events}
    assert "train" in kinds and "eval" in kinds


def test_eval_wer_cli(tmp_path):
    import json
    import subprocess
    import sys

    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("hello world\nbeam search decode\n")
    hyp.write_text("hello word\nbeam search decode\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-m", "pytorch_asr_tpu.eval_wer", str(ref), str(hyp)],
        env=env, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["num_utts"] == 2 and abs(rec["wer"] - 0.2) < 1e-9

    # id-aligned, order-independent
    ref.write_text("u1\thello world\nu2\tbeam search decode\n")
    hyp.write_text("u2\tbeam search decode\nu1\thello word\n")
    out = subprocess.run(
        [sys.executable, "-m", "pytorch_asr_tpu.eval_wer", str(ref), str(hyp)],
        env=env, capture_output=True, text=True)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert abs(rec["wer"] - 0.2) < 1e-9


def test_align_cli(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    tsv = tmp_path / "align.tsv"
    out = subprocess.run(
        [sys.executable, "-m", "pytorch_asr_tpu.align", "ctc_bilstm_dev1h",
         "data.batch_size=2",
         "data.bucket_audio_lens=48000",
         "data.bucket_label_lens=48",
         "data.synthetic_num_utts=2",
         "model.encoder.hidden_dim=16",
         "model.encoder.num_layers=1",
         "model.encoder.conv_channels=4",
         "model.compute_dtype=float32",
         "frontend.use_pallas=false",
         "train.checkpoint_dir=" + str(tmp_path / "ckpt"),
         "dump_path=" + str(tsv)],
        capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = tsv.read_text().splitlines()
    assert len(lines) > 2
    for line in lines:
        utt, ch, s, e = line.split("\t")
        assert float(e) >= float(s) >= 0.0
        assert len(ch) <= 1
