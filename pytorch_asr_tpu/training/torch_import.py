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
    # Joint checkpoints can hold OTHER (·, 2H) linears (the LAS memory
    # projection sees the same encoder dim), so when the vocab is known the
    # out-dim must match it.
    cands = [(k, v) for k, v in items
             if getattr(v, "ndim", np.ndim(v)) == 2 and k.endswith("weight")
             and _np(v).shape[1] == 2 * hidden and "weight_hh" not in k
             and "weight_ih" not in k]
    if vocab_size is not None:
        right_vocab = [(k, v) for k, v in cands
                       if _np(v).shape[0] == vocab_size]
        # Keep the mismatched candidate when it is the ONLY one so the vocab
        # check below raises the informative error.
        cands = right_vocab or cands
    if not cands:
        raise TorchImportError("no (V, 2H) CTC head weight found")
    k, v = cands[-1]
    head = convert_linear(v, state_dict.get(k[: -len("weight")] + "bias"))
    if vocab_size is not None and head["kernel"].shape[1] != vocab_size:
        raise TorchImportError(
            f"CTC head vocab {head['kernel'].shape[1]} != expected {vocab_size}")

    return {"encoder": enc, "ctc_head": head}


def convert_conv1d(weight, bias=None) -> dict[str, np.ndarray]:
    """torch Conv1d (O, I, K) -> flax-style kernel (K, I, O)[, bias]."""
    w = _np(weight)
    if w.ndim != 3:
        raise TorchImportError(f"conv1d weight must be 3-D, got {w.shape}")
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def import_torch_tcn_ctc(state_dict: Mapping[str, Any],
                         num_mel_bins: int,
                         vocab_size: int | None = None) -> dict[str, Any]:
    """Convert a Wav2Letter/TCN-class torch state_dict to our TCN param tree.

    Target: models/encoder_tcn.py::TCNEncoder + ctc_head.  Reference-genre
    layout (discovered structurally, matching the DS2 importer's approach
    since /root/reference is absent — SURVEY.md §0):

      * stem: ``nn.Conv1d(n_mels, C, k, stride=subsample)`` — the FIRST 3-D
        weight, whose in_channels == num_mel_bins;
      * per block, in module order: ``nn.LayerNorm(C)`` (1-D weight+bias),
        dilated ``nn.Conv1d(C, 2C, K)`` (GLU doubling), pointwise
        ``nn.Conv1d(C, C, 1)`` or ``nn.Linear(C, C)``;
      * final ``nn.LayerNorm(C)``; CTC head ``nn.Linear(C, V)``.

    torch GLU splits channels [linear | gate] exactly like our
    ``jnp.split(y, 2)``, so dilated-conv channels map 1:1.
    """
    items = list(state_dict.items())
    convs3 = [(k, _np(v)) for k, v in items
              if getattr(v, "ndim", np.ndim(v)) == 3 and k.endswith("weight")]
    if not convs3:
        raise TorchImportError("no 3-D Conv1d weights found (TCN stem/blocks)")
    k0, w0 = convs3[0]
    if w0.shape[1] != num_mel_bins:
        raise TorchImportError(
            f"stem conv in_channels {w0.shape[1]} != n_mels {num_mel_bins}")
    C = w0.shape[0]
    enc: dict[str, Any] = {
        "Conv_0": convert_conv1d(w0, state_dict[k0[:-len("weight")] + "bias"])}

    # 1-D LayerNorm scales in order: one per block + the final LN.
    lns = [(k, _np(v)) for k, v in items
           if getattr(v, "ndim", np.ndim(v)) == 1 and k.endswith("weight")]

    # Remaining 3-D convs partition by shape: dilated (2C, C, K) vs
    # pointwise (C, C, 1).  The i-th of each kind belongs to block i (module
    # order within each kind IS the block order, whether the reference
    # interleaves them or keeps per-kind ModuleLists).  nn.Linear(C, C) may
    # stand in for every pointwise conv.
    body = convs3[1:]
    dil = [(k, w) for k, w in body if w.shape[:2] == (2 * C, C)]
    pts = [(k, w) for k, w in body if w.shape == (C, C, 1)]
    stray = [k for k, w in body
             if w.shape[:2] != (2 * C, C) and w.shape != (C, C, 1)]
    if stray:
        raise TorchImportError(
            f"unrecognized 3-D conv weights {stray}: TCN blocks need "
            f"(2C, C, K) dilated and (C, C, 1) pointwise convs")
    lins2 = [(k, _np(v)) for k, v in items
             if getattr(v, "ndim", np.ndim(v)) == 2 and k.endswith("weight")
             and _np(v).shape == (C, C)]
    if len(pts) == len(dil):
        points = [(np.transpose(w, (2, 1, 0))[0],
                   _np(state_dict[k[:-len("weight")] + "bias"]))
                  for k, w in pts]
    elif len(lins2) == len(dil):
        points = [(w.T,
                   _np(state_dict.get(k[:-len("weight")] + "bias",
                                      np.zeros(C, np.float32))))
                  for k, w in lins2]
    else:
        raise TorchImportError(
            f"found {len(dil)} dilated convs but {len(pts)} pointwise convs "
            f"/ {len(lins2)} (C, C) linears — need one per block")
    blocks: list[dict[str, Any]] = []
    for (kd, wd), (w_point, b_point) in zip(dil, points):
        bd = state_dict[kd[:-len("weight")] + "bias"]
        blocks.append({"w_conv": np.transpose(wd, (2, 1, 0)),
                       "b_conv": _np(bd),
                       "w_point": w_point, "b_point": b_point})
    if len(lns) != len(blocks) + 1:
        raise TorchImportError(
            f"found {len(lns)} LayerNorms for {len(blocks)} blocks "
            f"(need one per block + a final one)")
    for i, blk in enumerate(blocks):
        kl, wl = lns[i]
        blk["ln_scale"] = wl
        blk["ln_bias"] = _np(state_dict[kl[:-len("weight")] + "bias"])
        enc[f"block{i}"] = blk
    kf, wf = lns[-1]
    enc["LayerNorm_0"] = {
        "scale": wf, "bias": _np(state_dict[kf[:-len("weight")] + "bias"])}

    head = None
    for k, v in reversed(items):
        if getattr(v, "ndim", np.ndim(v)) == 2 and k.endswith("weight"):
            w = _np(v)
            if w.shape[1] == C and (vocab_size is None
                                    or w.shape[0] == vocab_size) \
                    and w.shape != (C, C):
                head = convert_linear(v, state_dict.get(
                    k[:-len("weight")] + "bias"))
                break
    if head is None:
        raise TorchImportError("no (V, C) CTC head weight found")
    return {"encoder": enc, "ctc_head": head}


_CELL_RE = re.compile(r"(?:^|\.)(?:(\d+)\.)?weight_ih(?:_l(\d+))?$")


def import_torch_las_decoder(state_dict: Mapping[str, Any],
                             hidden_dim: int, attention_dim: int,
                             enc_dim: int, location_filters: int,
                             vocab_size: int | None = None
                             ) -> dict[str, Any]:
    """Convert a genre LAS/ARSG torch decoder to models/las_decoder.py params.

    Expected reference-genre modules (Chorowski et al. 2015 attention):
      * ``nn.Embedding(V, E)`` — the 2-D weight on a key containing 'embed';
      * per-layer ``nn.LSTMCell`` (keys ``weight_ih``/``weight_hh``/biases,
        optionally ``_l{k}``-suffixed if an ``nn.LSTM`` is stepped) — layer 0
        input is [emb, ctx] (E + D rows);
      * location conv ``nn.Conv1d(1, F, K)`` — the 3-D weight with
        in_channels 1;
      * attention MLP linears, mapped BY SHAPE: (A, H) -> w_s, (A, D) -> w_e,
        (A, F) -> w_f, (1, A) -> v; their biases sum into b_att (our module
        keeps one bias on the tanh pre-activation);
      * output ``nn.Linear(H + D, V)`` -> w_out/b_out.

    Our cell applies a +1 forget-gate bias in the step function
    (las_decoder.py: ``sigmoid(f + 1.0)``); torch cells bake any such bias
    into the stored parameters, so 1.0 is SUBTRACTED from the imported
    forget-bias quarter to keep the math identical.

    Shape-based mapping requires H != D (or name hints 'query'/'memory');
    ambiguous dicts raise rather than guess.
    """
    items = list(state_dict.items())
    H, A, D, F = hidden_dim, attention_dim, enc_dim, location_filters
    out: dict[str, Any] = {}

    emb = [(k, _np(v)) for k, v in items
           if getattr(v, "ndim", np.ndim(v)) == 2 and "embed" in k.lower()
           and k.endswith("weight")]
    if len(emb) != 1:
        raise TorchImportError(
            f"expected exactly one embedding weight (key containing "
            f"'embed'), found {[k for k, _ in emb]}")
    out["embed"] = emb[0][1]
    E = emb[0][1].shape[1]
    if vocab_size is not None and emb[0][1].shape[0] != vocab_size:
        raise TorchImportError(
            f"embedding vocab {emb[0][1].shape[0]} != expected {vocab_size}")

    # --- LSTM cells --------------------------------------------------------
    # Joint checkpoints hold BOTH an encoder nn.LSTM (``weight_ih_l{k}``) and
    # decoder nn.LSTMCells (plain ``weight_ih``); cell-style keys take
    # priority so the listener's recurrence never leaks into the decoder.
    matches = [(k, _CELL_RE.search(k)) for k, _v in items]
    matches = [(k, m) for k, m in matches if m]
    cell_style = [(k, m) for k, m in matches if m.group(2) is None]
    if cell_style:
        matches = cell_style
    cells: dict[int, dict[str, Any]] = {}
    for k, m in matches:
        idx = int(m.group(1) or m.group(2) or 0)
        suf = f"_l{m.group(2)}" if m.group(2) else ""
        prefix = k[: len(k) - len("weight_ih") - len(suf)]
        try:
            cells[idx] = dict(
                w_ih=state_dict[f"{prefix}weight_ih{suf}"],
                w_hh=state_dict[f"{prefix}weight_hh{suf}"],
                b_ih=state_dict[f"{prefix}bias_ih{suf}"],
                b_hh=state_dict[f"{prefix}bias_hh{suf}"])
        except KeyError as e:
            raise TorchImportError(f"incomplete LSTM cell {k}: {e}") from e
    if not cells or sorted(cells) != list(range(len(cells))):
        raise TorchImportError(f"bad LSTM cell layer set: {sorted(cells)}")
    for layer in sorted(cells):
        c = cells[layer]
        want_in = (E + D) if layer == 0 else H
        wx = _np(c["w_ih"]).T
        if wx.shape != (want_in, 4 * H):
            raise TorchImportError(
                f"cell {layer} weight_ih {wx.shape} != ({want_in}, {4 * H}) "
                f"(layer 0 input is [embedding, context])")
        bias = _np(c["b_ih"]) + _np(c["b_hh"])
        bias[H:2 * H] -= 1.0          # our step adds +1 to the forget gate
        out[f"lstm{layer}_wx"] = wx
        out[f"lstm{layer}_wh"] = _np(c["w_hh"]).T
        out[f"lstm{layer}_b"] = bias

    # --- location conv -----------------------------------------------------
    loc = [(k, _np(v)) for k, v in items
           if getattr(v, "ndim", np.ndim(v)) == 3 and k.endswith("weight")
           and _np(v).shape[1] == 1]
    if len(loc) != 1:
        raise TorchImportError(
            f"expected one location Conv1d(1, F, K), found "
            f"{[k for k, _ in loc]}")
    if loc[0][1].shape[0] != F:
        raise TorchImportError(
            f"location filters {loc[0][1].shape[0]} != configured {F}")
    out["loc_filter"] = np.transpose(loc[0][1], (2, 1, 0))   # (K, 1, F)

    # --- attention MLP + output, by shape ----------------------------------
    used = {emb[0][0]} | {k for k, _ in loc}
    lstm_keys = {k for k, _ in items if "weight_ih" in k or "weight_hh" in k}
    lin2 = [(k, _np(v)) for k, v in items
            if getattr(v, "ndim", np.ndim(v)) == 2 and k.endswith("weight")
            and k not in used and k not in lstm_keys]
    b_att = np.zeros((A,), np.float32)

    def grab(shape, hint=None, required=True):
        hits = [(k, w) for k, w in lin2 if w.shape == shape]
        if len(hits) > 1 and hint:
            named = [(k, w) for k, w in hits if hint in k.lower()]
            if len(named) == 1:
                hits = named
        if len(hits) != 1:
            if required:
                raise TorchImportError(
                    f"cannot identify the {shape} attention linear uniquely: "
                    f"{[k for k, _ in hits]} (use distinct dims or "
                    f"'query'/'memory' name hints)")
            return None
        k, w = hits[0]
        lin2.remove(hits[0])
        return k, w

    def linear_t(k, w):
        nonlocal b_att
        b = state_dict.get(k[:-len("weight")] + "bias")
        if b is not None and w.shape[0] == A:
            b_att = b_att + _np(b)
        return w.T

    k_s, w_s = grab((A, H), hint="query")
    k_e, w_e = grab((A, D), hint="memory")
    out["w_s"] = linear_t(k_s, w_s)
    out["w_e"] = linear_t(k_e, w_e)
    k_f, w_f = grab((A, F))
    out["w_f"] = linear_t(k_f, w_f)
    k_v, w_v = grab((1, A))
    out["v_att"] = w_v.T
    out["b_att"] = b_att
    k_o, w_o = grab((emb[0][1].shape[0], H + D))
    out["w_out"] = w_o.T
    b_o = state_dict.get(k_o[:-len("weight")] + "bias")
    out["b_out"] = (_np(b_o) if b_o is not None
                    else np.zeros(w_o.shape[0], np.float32))
    return out


def import_torch_las(state_dict: Mapping[str, Any], num_mel_bins: int,
                     hidden_dim: int, attention_dim: int, enc_dim: int,
                     location_filters: int, vocab_size: int | None = None,
                     freq_stride: int = 2,
                     with_encoder: bool = True) -> dict[str, Any]:
    """Full LAS / joint-CTC-attention checkpoint (BASELINE configs 4/5):
    conv+BiLSTM listener + ctc head (reusing the DS2 importer) + attention
    decoder under the ``las`` subtree (models/asr_model.py names it so)."""
    out: dict[str, Any] = {}
    if with_encoder:
        out = import_torch_bilstm_ctc(state_dict, num_mel_bins,
                                      vocab_size=vocab_size,
                                      freq_stride=freq_stride)
    out["las"] = import_torch_las_decoder(
        state_dict, hidden_dim=hidden_dim, attention_dim=attention_dim,
        enc_dim=enc_dim, location_filters=location_filters,
        vocab_size=vocab_size)
    return out


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
