"""Fused Pallas LSTM sequence kernels (SURVEY.md §7.3 'BiLSTM throughput').

The reference leans on cuDNN's fused LSTM; the XLA `lax.scan` cell pays ~2 us
of per-step overhead (dynamic-slice + tiny matmul + dynamic-update per step).
These kernels run the WHOLE recurrence inside one Pallas program: the grid
walks time chunks (BlockSpec-pipelined HBM streaming of the precomputed input
projections), weights stay resident in VMEM, and the hidden/cell carries live
in VMEM scratch.

Design notes:
  * the (B,T,D)@(D,4H) input projection stays OUTSIDE (one large MXU matmul
    XLA already does at speed of light); the kernel only does the sequential
    h@(H,4H) part;
  * backward recomputes the gate pre-activations from (xproj, h_{t-1}) instead
    of storing (T,B,4H) activations -- one extra MXU matmul per step buys a
    60% cut in residual HBM traffic;
  * masking via per-row [start, end) windows so the same kernel serves the
    forward direction (0..len) and the flipped backward direction (T-len..T);
  * dW accumulates in a VMEM scratch across the whole grid and is flushed on
    the last chunk.

Custom VJP: grads for (xproj, whh); parity-tested against jax.grad of the
lax.scan reference in models/encoder_bilstm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_CHUNK = 32
BWD_TIME_CHUNK = 8   # backward streams 6 tensors/chunk; must fit VMEM


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _gate_parts(gates, H):
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    return i, f, g, o


def _fwd_kernel(xp_ref, whh_ref, start_ref, end_ref, hs_ref, cs_ref,
                h_sc, c_sc, *, tc: int, H: int):
    ic = pl.program_id(0)
    B = h_sc.shape[0]

    @pl.when(ic == 0)
    def _():
        h_sc[:] = jnp.zeros((B, H), jnp.float32)
        c_sc[:] = jnp.zeros((B, H), jnp.float32)

    h, c = h_sc[:], c_sc[:]
    whh = whh_ref[:]
    start, end = start_ref[:], end_ref[:]
    for j in range(tc):
        t = ic * tc + j
        gates = xp_ref[j] + jnp.dot(h, whh, preferred_element_type=jnp.float32)
        i, f, g, o = _gate_parts(gates, H)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = (t >= start) & (t < end)                      # (B, 1)
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        hs_ref[j] = h
        cs_ref[j] = c
    h_sc[:] = h
    c_sc[:] = c


def _bwd_kernel(xp_ref, hprev_ref, cs_ref, csprev_ref, ghs_ref,
                whh_ref, start_ref, end_ref,
                dxp_ref, dwhh_ref, dh_sc, dc_sc, dw_sc,
                *, tc: int, H: int, n_chunks: int):
    ic = pl.program_id(0)                                 # reversed chunk index
    B = dh_sc.shape[0]

    @pl.when(ic == 0)
    def _():
        dh_sc[:] = jnp.zeros((B, H), jnp.float32)
        dc_sc[:] = jnp.zeros((B, H), jnp.float32)
        dw_sc[:] = jnp.zeros(dw_sc.shape, jnp.float32)

    dh, dc = dh_sc[:], dc_sc[:]
    dw = dw_sc[:]
    whh = whh_ref[:]
    start, end = start_ref[:], end_ref[:]
    chunk = n_chunks - 1 - ic
    for j in reversed(range(tc)):
        t = chunk * tc + j
        h_prev = hprev_ref[j]
        # recompute gate activations
        gates = xp_ref[j] + jnp.dot(h_prev, whh,
                                    preferred_element_type=jnp.float32)
        i, f, g, o = _gate_parts(gates, H)
        c_t = cs_ref[j]
        c_prev = csprev_ref[j]
        tanh_ct = jnp.tanh(c_t)

        dh_tot = dh + ghs_ref[j]
        do = dh_tot * tanh_ct
        dc_tot = dc + dh_tot * o * (1.0 - tanh_ct * tanh_ct)
        di = dc_tot * g
        df = dc_tot * c_prev
        dg = dc_tot * i
        dgates = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1)  # (B, 4H)
        m = (t >= start) & (t < end)
        dgates = jnp.where(m, dgates, 0.0)
        dh_next = jnp.dot(dgates, whh.T, preferred_element_type=jnp.float32)
        dh = jnp.where(m, dh_next, dh_tot)
        dc = jnp.where(m, dc_tot * f, dc)
        dw = dw + jnp.dot(h_prev.T, dgates, preferred_element_type=jnp.float32)
        dxp_ref[j] = dgates
    dh_sc[:] = dh
    dc_sc[:] = dc
    dw_sc[:] = dw

    @pl.when(ic == n_chunks - 1)
    def _():
        dwhh_ref[:] = dw_sc[:]


def _prep(xproj, lengths, reverse: bool):
    """Time-major padded xproj + per-row valid windows."""
    B, T, H4 = xproj.shape
    t_pad = _round_up(T, TIME_CHUNK)
    xp = jnp.swapaxes(xproj, 0, 1).astype(jnp.float32)     # (T, B, 4H)
    xp = jnp.pad(xp, ((0, t_pad - T), (0, 0), (0, 0)))
    if reverse:
        start = (T - lengths).astype(jnp.int32)[:, None]
        end = jnp.full((B, 1), T, jnp.int32)
    else:
        start = jnp.zeros((B, 1), jnp.int32)
        end = lengths.astype(jnp.int32)[:, None]
    return xp, start, end, t_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_seq(xproj, whh, lengths, reverse=False):
    """Masked LSTM over a (flipped-)padded sequence.

    Args:
      xproj: (B, T, 4H) precomputed input projections (+bias), already flipped
        for the reverse direction.
      whh: (H, 4H) hidden weights.
      lengths: (B,) valid lengths (mask window is [0,len) or [T-len,T)).
    Returns: (B, T, H) hidden states (carried values outside the window).
    """
    hs, _ = _fwd_impl(xproj, whh, lengths, reverse)
    return hs


def _fwd_impl(xproj, whh, lengths, reverse):
    B, T, H4 = xproj.shape
    H = H4 // 4
    xp, start, end, t_pad = _prep(xproj, lengths, reverse)
    kern = functools.partial(_fwd_kernel, tc=TIME_CHUNK, H=H)
    hs, cs = pl.pallas_call(
        kern,
        grid=(t_pad // TIME_CHUNK,),
        in_specs=[
            pl.BlockSpec((TIME_CHUNK, B, H4), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),         # whh
            pl.BlockSpec(memory_space=pltpu.VMEM),         # start (B,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # end (B,1)
        ],
        out_specs=[
            pl.BlockSpec((TIME_CHUNK, B, H), lambda i: (i, 0, 0)),
            pl.BlockSpec((TIME_CHUNK, B, H), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, whh.astype(jnp.float32), start, end)
    hs_bt = jnp.swapaxes(hs[:T], 0, 1)                     # (B, T, H)
    return hs_bt, (xproj, whh, lengths, hs, cs, t_pad)


def _vjp_fwd(xproj, whh, lengths, reverse):
    hs_bt, res = _fwd_impl(xproj, whh, lengths, reverse)
    return hs_bt, res


def _vjp_bwd(reverse, res, g_hs):
    xproj, whh, lengths, hs, cs, t_pad = res
    B, T, H4 = xproj.shape
    H = H4 // 4
    xp, start, end, _ = _prep(xproj, lengths, reverse)
    zeros_row = jnp.zeros((1, B, H), jnp.float32)
    hprev = jnp.concatenate([zeros_row, hs[:-1]], axis=0)
    csprev = jnp.concatenate([zeros_row, cs[:-1]], axis=0)
    ghs = jnp.pad(jnp.swapaxes(g_hs.astype(jnp.float32), 0, 1),
                  ((0, t_pad - T), (0, 0), (0, 0)))
    tc = BWD_TIME_CHUNK
    n_chunks = t_pad // tc
    kern = functools.partial(_bwd_kernel, tc=tc, H=H, n_chunks=n_chunks)
    rev = lambda i: (n_chunks - 1 - i, 0, 0)  # noqa: E731
    dxp, dwhh = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, B, H4), rev),                # xp
            pl.BlockSpec((tc, B, H), rev),                 # h_{t-1}
            pl.BlockSpec((tc, B, H), rev),                 # c_t
            pl.BlockSpec((tc, B, H), rev),                 # c_{t-1}
            pl.BlockSpec((tc, B, H), rev),                 # g_hs
            pl.BlockSpec(memory_space=pltpu.VMEM),         # whh
            pl.BlockSpec(memory_space=pltpu.VMEM),         # start
            pl.BlockSpec(memory_space=pltpu.VMEM),         # end
        ],
        out_specs=[
            pl.BlockSpec((tc, B, H4), rev),                # dxp
            pl.BlockSpec((H, H4), lambda i: (0, 0)),       # dwhh
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),               # dh carry
            pltpu.VMEM((B, H), jnp.float32),               # dc carry
            pltpu.VMEM((H, H4), jnp.float32),              # dW accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, hprev, cs, csprev, ghs, whh.astype(jnp.float32), start, end)
    dxproj = jnp.swapaxes(dxp[:T], 0, 1).astype(xproj.dtype)
    return dxproj, dwhh.astype(whh.dtype), None


lstm_seq.defvjp(_vjp_fwd, _vjp_bwd)
