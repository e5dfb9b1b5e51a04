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


def test_parity_harness_tcn_config(tmp_path):
    """config=tcn_ctc_devclean certifies the TCN family (VERDICT r2 item 4)."""
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer

    V = CharTokenizer().vocab_size
    C, K, BLOCKS, SUB = 16, 3, 2, 2

    class _TorchTCN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            k = 2 * SUB
            self.stem = torch.nn.Conv1d(80, C, k, stride=SUB,
                                        padding=(k - 1) // 2)
            self.lns = torch.nn.ModuleList(
                torch.nn.LayerNorm(C) for _ in range(BLOCKS))
            self.dconvs = torch.nn.ModuleList(
                torch.nn.Conv1d(C, 2 * C, K, dilation=d,
                                padding=d * (K - 1) // 2) for d in (1, 2))
            self.points = torch.nn.ModuleList(
                torch.nn.Conv1d(C, C, 1) for _ in range(BLOCKS))
            self.final_ln = torch.nn.LayerNorm(C)
            self.fc = torch.nn.Linear(C, V)

    torch.manual_seed(1)
    ckpt = str(tmp_path / "tcn.pt")
    torch.save(_TorchTCN().state_dict(), ckpt)
    out = str(tmp_path / "parity_tcn.json")
    harness = _load_harness()
    report = harness.main([
        "synthetic", ckpt, "config=tcn_ctc_devclean",
        f"out={out}", "beam=4", "max_batches=1",
        "data.batch_size=4", "data.bucket_audio_lens=40000",
        "data.bucket_label_lens=48", "data.synthetic_num_utts=8",
        f"model.encoder.channels={C}", f"model.encoder.kernel_size={K}",
        f"model.encoder.num_blocks={BLOCKS}",
        "model.encoder.dilation_cycle=1,2",
        f"model.encoder.subsample={SUB}", "model.encoder.dropout=0.0",
        "model.encoder.use_pallas=false", "model.compute_dtype=float32",
        "frontend.use_pallas=false", "frontend.specaugment=false",
    ])
    assert set(report["methods"]) == {"greedy", "prefix_beam"}
    for m in report["methods"].values():
        assert np.isfinite(m["wer"]) and m["num_utts"] > 0


def test_parity_harness_joint_config(tmp_path):
    """config=joint_ctc_attention_960h certifies the LAS/joint family:
    listener + speller import from ONE checkpoint, joint beam decodes."""
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer

    V = CharTokenizer().vocab_size
    EH, E, HD, A, F, KL = 12, 8, 10, 6, 4, 3     # enc hidden, LAS dims
    D = 2 * EH

    class _TorchLASDec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Embedding(V, E)
            self.cells = torch.nn.ModuleList([torch.nn.LSTMCell(E + D, HD)])
            self.att_query = torch.nn.Linear(HD, A)
            self.att_memory = torch.nn.Linear(D, A, bias=False)
            self.att_loc = torch.nn.Linear(F, A, bias=False)
            self.loc_conv = torch.nn.Conv1d(1, F, KL, padding=KL // 2,
                                            bias=False)
            self.att_v = torch.nn.Linear(A, 1, bias=False)
            self.out = torch.nn.Linear(HD + D, V)

    class _TorchJoint(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.listener = _TorchDS2(mel=80, conv=(4, 4), hidden=EH,
                                      layers=1, vocab=V)
            self.speller = _TorchLASDec()

    torch.manual_seed(2)
    ckpt = str(tmp_path / "joint.pt")
    torch.save(_TorchJoint().state_dict(), ckpt)
    out = str(tmp_path / "parity_joint.json")
    harness = _load_harness()
    report = harness.main([
        "synthetic", ckpt, "config=joint_ctc_attention_960h",
        f"out={out}", "beam=4", "max_batches=1",
        "data.batch_size=4", "data.bucket_audio_lens=40000",
        "data.bucket_label_lens=48", "data.synthetic_num_utts=8",
        "model.encoder.conv_channels=4,4", f"model.encoder.hidden_dim={EH}",
        "model.encoder.num_layers=1", "model.encoder.dropout=0.0",
        "model.encoder.use_pallas=false",
        f"model.decoder.embed_dim={E}", f"model.decoder.hidden_dim={HD}",
        "model.decoder.num_layers=1",
        f"model.decoder.attention_dim={A}",
        f"model.decoder.location_kernel={KL}",
        f"model.decoder.location_filters={F}", "model.decoder.dropout=0.0",
        "model.compute_dtype=float32",
        "frontend.use_pallas=false", "frontend.specaugment=false",
    ])
    assert set(report["methods"]) == {"greedy", "prefix_beam", "joint_beam"}
    for m in report["methods"].values():
        assert np.isfinite(m["wer"]) and m["num_utts"] > 0
