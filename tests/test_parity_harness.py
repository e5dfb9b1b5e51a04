"""scripts/parity_wer.py end-to-end smoke (VERDICT r1 item 9): given a
reference-format torch checkpoint + a corpus root, one command emits the
BASELINE.json:2 comparison JSON for every supported decode method."""

import importlib.util
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_harness():
    spec = importlib.util.spec_from_file_location(
        "parity_wer", os.path.join(REPO, "scripts", "parity_wer.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _TorchDS2(torch.nn.Module):
    """DS2-class reference model shaped to the harness's tiny overrides."""

    def __init__(self, mel: int, conv: tuple, hidden: int, layers: int,
                 vocab: int):
        super().__init__()
        chans = [1, *conv]
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv2d(chans[i], chans[i + 1], 3, stride=2, padding=1)
            for i in range(len(conv)))
        freq = mel
        for _ in conv:
            freq = (freq + 2 - 3) // 2 + 1
        self.lstm = torch.nn.LSTM(conv[-1] * freq, hidden, num_layers=layers,
                                  bidirectional=True, batch_first=True)
        self.fc = torch.nn.Linear(2 * hidden, vocab)


def test_parity_harness_synthetic(tmp_path):
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer
    from pytorch_asr_tpu.decoding.lm import train_char_ngram, write_arpa

    torch.manual_seed(0)
    model = _TorchDS2(mel=80, conv=(4, 4), hidden=16, layers=1,
                      vocab=CharTokenizer().vocab_size)
    ckpt = str(tmp_path / "ref.pt")
    torch.save({"state_dict": model.state_dict()}, ckpt)
    lm = train_char_ngram(["the quick brown fox", "hello world"], order=3)
    arpa = str(tmp_path / "lm.arpa")
    write_arpa(lm, arpa)

    out = str(tmp_path / "parity.json")
    harness = _load_harness()
    report = harness.main([
        "synthetic", ckpt,
        f"out={out}", f"lm={arpa}", "beam=4", "max_batches=2",
        "data.batch_size=4", "data.bucket_audio_lens=40000",
        "data.bucket_label_lens=48", "data.synthetic_num_utts=8",
        "model.encoder.conv_channels=4,4", "model.encoder.hidden_dim=16",
        "model.encoder.num_layers=1", "model.encoder.use_pallas=false",
        "model.compute_dtype=float32",
        "frontend.use_pallas=false", "frontend.specaugment=false",
    ])
    assert os.path.exists(out)
    with open(out) as fh:
        disk = json.load(fh)
    assert disk == report
    assert set(report["methods"]) == {"greedy", "prefix_beam",
                                      "prefix_beam_lm"}
    for name, m in report["methods"].items():
        assert np.isfinite(m["wer"]) and m["wer"] >= 0.0, (name, m)
        assert m["num_utts"] > 0
        assert m["decode_rtf"] > 0
