"""Torch-checkpoint import parity for the remaining model families
(VERDICT r2 item 4): TCN (BASELINE config 3) and LAS / joint (configs 4/5).

Same method as test_torch_import.py's DS2 coverage: build a genuine torch
model of the reference genre, convert its state_dict, and assert our flax
modules reproduce the torch outputs.  torch CPU is the parity oracle
standing in for the absent reference (SURVEY.md §0).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import LASDecoderConfig, TCNEncoderConfig
from pytorch_asr_tpu.models.encoder_tcn import TCNEncoder
from pytorch_asr_tpu.models.las_decoder import LASDecoder
from pytorch_asr_tpu.training.torch_import import (
    TorchImportError,
    import_torch_las,
    import_torch_las_decoder,
    import_torch_tcn_ctc,
)

MEL = 12
C = 16          # TCN channels
KTCN = 3
BLOCKS = 3
DILS = (1, 2, 4)
SUB = 2
V = 10

E, HD, A, D, F, KLOC = 6, 14, 5, 8, 4, 3   # LAS dims (HD != D on purpose)


# ------------------------------------------------------------------ TCN
class TorchTCN(torch.nn.Module):
    """Wav2Letter/TCN-genre torch model mirroring models/encoder_tcn.py."""

    def __init__(self):
        super().__init__()
        k = 2 * SUB
        self.stem = torch.nn.Conv1d(MEL, C, k, stride=SUB, padding=(k - 1) // 2)
        self.lns = torch.nn.ModuleList(
            torch.nn.LayerNorm(C, eps=1e-6) for _ in range(BLOCKS))
        self.dconvs = torch.nn.ModuleList(
            torch.nn.Conv1d(C, 2 * C, KTCN, dilation=d,
                            padding=d * (KTCN - 1) // 2) for d in DILS)
        self.points = torch.nn.ModuleList(
            torch.nn.Conv1d(C, C, 1) for _ in range(BLOCKS))
        self.final_ln = torch.nn.LayerNorm(C, eps=1e-6)
        self.fc = torch.nn.Linear(C, V)

    def forward(self, feats):                     # (B, T, MEL)
        x = torch.relu(self.stem(feats.transpose(1, 2)))    # (B, C, T')
        for ln, dc, pt in zip(self.lns, self.dconvs, self.points):
            y = ln(x.transpose(1, 2)).transpose(1, 2)
            y = torch.nn.functional.glu(dc(y), dim=1)
            y = pt(y)
            x = x + y
        x = self.final_ln(x.transpose(1, 2))
        return self.fc(x)                                   # (B, T', V)


def test_tcn_import_parity():
    torch.manual_seed(0)
    tm = TorchTCN().eval()
    rng = np.random.default_rng(0)
    B, T = 2, 40
    feats = rng.standard_normal((B, T, MEL)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(feats)).numpy()

    params = import_torch_tcn_ctc(tm.state_dict(), num_mel_bins=MEL,
                                  vocab_size=V)
    cfg = TCNEncoderConfig(channels=C, kernel_size=KTCN, num_blocks=BLOCKS,
                           dilation_cycle=DILS, subsample=SUB, dropout=0.0,
                           use_pallas=False)
    enc_mod = TCNEncoder(cfg)
    from flax import linen as nn

    lengths = jnp.full((B,), T, jnp.int32)
    enc, enc_len = enc_mod.apply({"params": params["encoder"]},
                                 jnp.asarray(feats), lengths)
    got = nn.Dense(V).apply({"params": params["ctc_head"]}, enc)
    assert want.shape[1] == int(enc_len[0]) == enc.shape[1]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_tcn_import_linear_pointwise():
    """Pointwise projection as nn.Linear(C, C) instead of Conv1d(C, C, 1)."""
    torch.manual_seed(1)
    tm = TorchTCN()
    sd = dict(tm.state_dict())
    # rewrite points.* conv params as linear-layout (C, C) weights
    for i in range(BLOCKS):
        w = sd.pop(f"points.{i}.weight")          # (C, C, 1)
        sd[f"pointlin.{i}.weight"] = w[..., 0]
        sd[f"pointlin.{i}.bias"] = sd.pop(f"points.{i}.bias")
    params = import_torch_tcn_ctc(sd, num_mel_bins=MEL, vocab_size=V)
    np.testing.assert_allclose(
        params["encoder"]["block0"]["w_point"],
        tm.state_dict()["points.0.weight"][..., 0].numpy().T)


def test_tcn_import_errors():
    torch.manual_seed(2)
    tm = TorchTCN()
    sd = dict(tm.state_dict())
    del sd["lns.0.weight"], sd["lns.0.bias"]
    with pytest.raises(TorchImportError, match="LayerNorm"):
        import_torch_tcn_ctc(sd, num_mel_bins=MEL)
    with pytest.raises(TorchImportError, match="n_mels"):
        import_torch_tcn_ctc(tm.state_dict(), num_mel_bins=MEL + 1)


# ------------------------------------------------------------------ LAS
class TorchLAS(torch.nn.Module):
    """Location-sensitive-attention decoder (Chorowski et al. 2015 genre)
    mirroring models/las_decoder.py structurally: LSTMCell stack over
    [emb, ctx], content+location attention MLP, [h, ctx] output head."""

    def __init__(self, layers=2):
        super().__init__()
        self.embedding = torch.nn.Embedding(V, E)
        self.cells = torch.nn.ModuleList(
            torch.nn.LSTMCell((E + D) if l == 0 else HD, HD)
            for l in range(layers))
        self.att_query = torch.nn.Linear(HD, A, bias=True)     # W_s (+ b)
        self.att_memory = torch.nn.Linear(D, A, bias=False)    # W_e
        self.att_loc = torch.nn.Linear(F, A, bias=False)       # W_f
        self.loc_conv = torch.nn.Conv1d(1, F, KLOC,
                                        padding=KLOC // 2, bias=False)
        self.att_v = torch.nn.Linear(A, 1, bias=False)
        self.out = torch.nn.Linear(HD + D, V)

    def forward(self, enc, enc_len, targets):   # (B,T,D), (B,), (B,U)
        B, T, _ = enc.shape
        mask = torch.arange(T)[None, :] < enc_len[:, None]
        att = mask.float() / enc_len[:, None].clamp(min=1)
        ctx = torch.einsum("bt,btd->bd", att, enc)
        hs = [torch.zeros(B, HD) for _ in self.cells]
        cs = [torch.zeros(B, HD) for _ in self.cells]
        mem = self.att_memory(enc)
        outs = []
        for u in range(targets.shape[1]):
            x = torch.cat([self.embedding(targets[:, u]), ctx], dim=-1)
            for l, cell in enumerate(self.cells):
                inp = x if l == 0 else hs[l - 1]
                hs[l], cs[l] = cell(inp, (hs[l], cs[l]))
            h_top = hs[-1]
            loc = self.loc_conv(att.unsqueeze(1)).transpose(1, 2)  # (B,T,F)
            e = self.att_v(torch.tanh(
                self.att_query(h_top).unsqueeze(1) + mem + self.att_loc(loc)))
            e = e.masked_fill(~mask.unsqueeze(-1), -1e9)
            att = torch.softmax(e.squeeze(-1), dim=-1)
            ctx = torch.einsum("bt,btd->bd", att, enc)
            outs.append(self.out(torch.cat([h_top, ctx], dim=-1)))
        return torch.stack(outs, dim=1)         # (B, U, V)


def _las_case(seed=0, layers=2):
    torch.manual_seed(seed)
    tm = TorchLAS(layers=layers).eval()
    rng = np.random.default_rng(seed)
    B, T, U = 2, 9, 5
    enc = rng.standard_normal((B, T, D)).astype(np.float32)
    enc_len = np.asarray([T, T - 2], np.int32)
    tgt = rng.integers(0, V, size=(B, U)).astype(np.int64)
    return tm, enc, enc_len, tgt


@pytest.mark.parametrize("layers", [1, 2])
def test_las_import_parity(layers):
    """Teacher-forced decoder logits match torch exactly — including the
    forget-gate +1 bias adjustment (our step applies sigmoid(f + 1))."""
    tm, enc, enc_len, tgt = _las_case(layers=layers)
    with torch.no_grad():
        want = tm(torch.from_numpy(enc), torch.from_numpy(enc_len),
                  torch.from_numpy(tgt)).numpy()

    params = jax.tree.map(jnp.asarray, import_torch_las_decoder(
        tm.state_dict(), hidden_dim=HD, attention_dim=A, enc_dim=D,
        location_filters=F, vocab_size=V))
    cfg = LASDecoderConfig(embed_dim=E, hidden_dim=HD, num_layers=layers,
                           attention_dim=A, location_kernel=KLOC,
                           location_filters=F, dropout=0.0)
    las = LASDecoder(cfg, vocab_size=V, enc_dim=D)
    got = las.apply({"params": params}, jnp.asarray(enc),
                    jnp.asarray(enc_len), jnp.asarray(tgt, jnp.int32),
                    jnp.full((2,), tgt.shape[1], jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_las_joint_import_from_combined_state_dict():
    """Joint checkpoint: DS2 listener + LAS decoder in ONE state_dict; the
    cell-style decoder keys must not collide with the encoder nn.LSTM."""
    from tests.test_torch_import import CONV, H as ENC_H, MEL as ENC_MEL, TorchDS2

    class TorchJoint(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.listener = TorchDS2(vocab=V)
            self.speller = TorchLAS()

    torch.manual_seed(3)
    tm = TorchJoint().eval()
    # enc_dim of the DS2 listener is 2H; our TorchLAS uses D -- import only
    # checks decoder dims against the DECODER config, so pass D as enc_dim.
    params = import_torch_las(
        tm.state_dict(), num_mel_bins=ENC_MEL, hidden_dim=HD,
        attention_dim=A, enc_dim=D, location_filters=F, vocab_size=V)
    assert set(params) == {"encoder", "ctc_head", "las"}
    assert params["las"]["lstm0_wx"].shape == (E + D, 4 * HD)
    assert params["encoder"]["lstm0_fwd"]["whh"].shape == (ENC_H, 4 * ENC_H)
    assert params["ctc_head"]["kernel"].shape == (2 * ENC_H, V)
    # decoder forget bias carries the -1 adjustment
    b_torch = (tm.speller.cells[0].bias_ih + tm.speller.cells[0].bias_hh
               ).detach().numpy()
    np.testing.assert_allclose(params["las"]["lstm0_b"][HD:2 * HD],
                               b_torch[HD:2 * HD] - 1.0, atol=1e-6)


def test_las_import_ambiguous_dims_raises():
    """H == D makes (A, H) vs (A, D) shape-ambiguous without name hints."""

    class Amb(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Embedding(V, E)
            self.cell = torch.nn.LSTMCell(E + HD, HD)
            self.lin_a = torch.nn.Linear(HD, A, bias=False)
            self.lin_b = torch.nn.Linear(HD, A, bias=False)
            self.att_loc = torch.nn.Linear(F, A, bias=False)
            self.loc_conv = torch.nn.Conv1d(1, F, KLOC, bias=False)
            self.att_v = torch.nn.Linear(A, 1, bias=False)
            self.out = torch.nn.Linear(2 * HD, V)

    torch.manual_seed(4)
    with pytest.raises(TorchImportError, match="uniquely"):
        import_torch_las_decoder(Amb().state_dict(), hidden_dim=HD,
                                 attention_dim=A, enc_dim=HD,
                                 location_filters=F)
