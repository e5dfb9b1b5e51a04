"""Import reference-format (PyTorch) checkpoints into the TPU framework.

SURVEY.md §2.1 "Checkpoint/resume": WER parity is judged "at parity
checkpoints", which are produced by the reference PyTorch trainer.  This module
converts a DS2-class torch ``state_dict`` (conv subsampler + multi-layer
bidirectional ``nn.LSTM`` + linear CTC head — the genre layout of
chorowski-lab/pytorch-asr's conv+BiLSTM models) into this framework's flax
param tree, handling every layout difference:

  * ``nn.Conv2d`` weight (O, I, kH, kW)  ->  flax Conv kernel (kH, kW, I, O).
  * ``nn.LSTM`` ``weight_ih_l{k}``/``weight_hh_l{k}`` (4H, D) with torch gate
    order (i, f, g, o)  ->  our ``wih``/``whh`` (D, 4H), same gate order
    (models/encoder_bilstm.py splits gates i, f, g, o), so a transpose.
  * torch keeps two bias vectors (``bias_ih`` + ``bias_hh``); we keep one —
    summed on import.
  * ``_reverse`` suffixed weights -> the ``lstm{k}_bwd`` direction.
  * Feature-order permutation at the conv->LSTM seam: torch DS2 models reshape
    the conv output (B, C, T, F) as (B, T, C*F) (feature index c*F + f); our
    encoder reshapes (B, T, F, C) as (B, T, F*C) (index f*C + c).  The first
    LSTM layer's input rows are permuted accordingly.
  * ``nn.Linear`` weight (V, D) -> flax Dense kernel (D, V).

Discovery is structural, not name-bound: conv layers are the 4-D tensors in
state_dict order, the LSTM stack is found via the canonical cuDNN parameter
names torch always emits (``weight_ih_l{k}[_reverse]`` etc., regardless of the
module path prefix), and the CTC head is the trailing 2-D weight.  This makes
the importer robust to the reference's (currently unharvestable — SURVEY.md §0)
module naming.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


class TorchImportError(ValueError):
    pass


def _np(t) -> np.ndarray:
    # torch tensor or ndarray -> float32 ndarray (host).
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_conv2d(weight, bias) -> dict[str, np.ndarray]:
    """torch Conv2d (O, I, kH, kW) + (O,) -> flax {'kernel': (kH, kW, I, O), 'bias'}."""
    w = _np(weight)
    if w.ndim != 4:
        raise TorchImportError(f"conv weight must be 4-D, got {w.shape}")
    return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": _np(bias)}


def convert_linear(weight, bias=None) -> dict[str, np.ndarray]:
    """torch Linear (O, I) -> flax Dense {'kernel': (I, O)[, 'bias']}."""
    out = {"kernel": _np(weight).T}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def convert_lstm_direction(w_ih, w_hh, b_ih, b_hh,
                           input_perm: np.ndarray | None = None
                           ) -> dict[str, np.ndarray]:
    """One torch LSTM direction -> our {'wih','whh','bias'} (gate order shared)."""
    wih = _np(w_ih).T                      # (D, 4H)
    whh = _np(w_hh).T                      # (H, 4H)
    bias = _np(b_ih) + _np(b_hh)
    if input_perm is not None:
        wih = wih[input_perm]
    return {"wih": wih, "whh": whh, "bias": bias}


def first_layer_input_perm(conv_channels: int, freq_bins: int) -> np.ndarray:
    """Permutation taking torch's (c*F + f) feature order to our (f*C + c).

    ours[f*C + c] = torch[c*F + f]; returned array indexes INTO the torch rows.
    """
    C, F = conv_channels, freq_bins
    f = np.arange(F)[:, None]
    c = np.arange(C)[None, :]
    return (c * F + f).reshape(-1)         # length F*C, ours-order -> torch index


_LSTM_RE = re.compile(
    r"(?:^|\.)weight_ih_l(\d+)(_reverse)?$")


def import_torch_bilstm_ctc(state_dict: Mapping[str, Any],
                            num_mel_bins: int,
                            vocab_size: int | None = None,
                            freq_stride: int = 2) -> dict[str, Any]:
    """Convert a DS2-class torch state_dict to an ASRModel flax param tree.

    Returns ``{'encoder': {...}, 'ctc_head': {...}}`` matching
    models/asr_model.py::ASRModel with a BiLSTMEncoder.

    Args:
      state_dict: torch ``model.state_dict()`` (tensors or ndarrays).
      num_mel_bins: frontend mel bins (needed to recover the conv output's
        frequency extent at the conv->LSTM seam).
      vocab_size: output vocab; used to sanity-check the discovered CTC head.
      freq_stride: per-conv-layer frequency stride (conv_stride[1]); only the
        frequency extent matters at the conv->LSTM seam.
    """
    items = list(state_dict.items())

    # --- conv stack: 4-D tensors in order ------------------------------------
    convs: list[tuple[str, np.ndarray]] = [
        (k, _np(v)) for k, v in items
        if getattr(v, "ndim", np.ndim(v)) == 4 and k.endswith("weight")
        # LAS location-attention convs are 1-D-in-time (kH==1 or I==1 heuristics
        # don't apply here: DS2 subsampler convs are the only 4-D weights).
    ]
    if not convs:
        raise TorchImportError("no 4-D conv weights found in state_dict")
    enc: dict[str, Any] = {}
    conv_params: dict[str, Any] = {}
    freq = num_mel_bins
    in_ch = 1
    for i, (k, w) in enumerate(convs):
        bkey = k[: -len("weight")] + "bias"
        if bkey not in state_dict:
            raise TorchImportError(f"conv bias {bkey!r} missing")
        if w.shape[1] != in_ch:
            raise TorchImportError(
                f"conv {k}: expected in_channels {in_ch}, got {w.shape[1]} "
                f"(is this a DS2-class subsampler?)")
        conv_params[f"Conv_{i}"] = convert_conv2d(w, state_dict[bkey])
        kf = w.shape[3]
        pf = (kf - 1) // 2
        freq = (freq + 2 * pf - kf) // freq_stride + 1
        in_ch = w.shape[0]
    enc["ConvSubsampler_0"] = conv_params
    out_ch = in_ch

    # --- LSTM stack: canonical cuDNN names, any module prefix ----------------
    layers: dict[tuple[int, bool], dict[str, Any]] = {}
    for k, _ in items:
        m = _LSTM_RE.search(k)
        if not m:
            continue
        idx, rev = int(m.group(1)), bool(m.group(2))
        prefix = k[: m.start()] + ("." if m.start() else "")
        suffix = f"_l{idx}" + ("_reverse" if rev else "")
        try:
            layers[(idx, rev)] = dict(
                w_ih=state_dict[f"{prefix}weight_ih{suffix}"],
                w_hh=state_dict[f"{prefix}weight_hh{suffix}"],
                b_ih=state_dict[f"{prefix}bias_ih{suffix}"],
                b_hh=state_dict[f"{prefix}bias_hh{suffix}"])
        except KeyError as e:
            raise TorchImportError(f"incomplete LSTM layer {suffix}: {e}") from e
    if not layers:
        raise TorchImportError("no torch LSTM parameters found in state_dict")
    num_layers = 1 + max(i for i, _ in layers)
    if not all((i, True) in layers for i in range(num_layers)):
        raise TorchImportError(
            "state_dict LSTM is unidirectional; BiLSTMEncoder needs "
            "bidirectional=True reference checkpoints")
    missing_fwd = [i for i in range(num_layers) if (i, False) not in layers]
    if missing_fwd:
        raise TorchImportError(
            f"state_dict LSTM is missing forward-direction layer(s) "
            f"{missing_fwd}")

    perm0 = first_layer_input_perm(out_ch, freq)
    for i in range(num_layers):
        perm = perm0 if i == 0 else None
        enc[f"lstm{i}_fwd"] = convert_lstm_direction(**layers[(i, False)],
                                                     input_perm=perm)
        enc[f"lstm{i}_bwd"] = convert_lstm_direction(**layers[(i, True)],
                                                     input_perm=perm)
    hidden = enc["lstm0_fwd"]["whh"].shape[0]

    # --- CTC head: last 2-D weight whose input dim is 2H ---------------------
    head = None
    for k, v in reversed(items):
        if getattr(v, "ndim", np.ndim(v)) == 2 and k.endswith("weight") \
                and _np(v).shape[1] == 2 * hidden and "weight_hh" not in k \
                and "weight_ih" not in k:
            bkey = k[: -len("weight")] + "bias"
            head = convert_linear(v, state_dict.get(bkey))
            break
    if head is None:
        raise TorchImportError("no (V, 2H) CTC head weight found")
    if vocab_size is not None and head["kernel"].shape[1] != vocab_size:
        raise TorchImportError(
            f"CTC head vocab {head['kernel'].shape[1]} != expected {vocab_size}")

    return {"encoder": enc, "ctc_head": head}


def load_torch_checkpoint(path: str) -> Mapping[str, Any]:
    """Load a torch .pt/.pth file and return its model state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    if not isinstance(obj, dict):
        raise TorchImportError(f"unrecognized checkpoint container in {path}")
    # strip DistributedDataParallel 'module.' prefixes
    return {k.removeprefix("module."): v for k, v in obj.items()}
