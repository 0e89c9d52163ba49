"""Fused LSTM scan as a Pallas TPU kernel — the framework's hottest op.

The XLA ``lax.scan`` path (ops/rnn.py) materializes the [T, R, 4H] input
projection in HBM and re-reads it every step; per 10-s batch that is ~10x
more HBM traffic than the tensors themselves. This kernel instead:

- keeps the LSTM state (h, c) and both weight matrices resident in VMEM
  across the whole time loop (grid iterates (dir, row-tile, T) with T
  innermost, so the state scratch carries across steps of one tile);
- computes the input projection x_t @ W_ih *inside* the step (two MXU
  matmuls per step), so HBM traffic is exactly: read x once, write h once;
- accumulates gates in fp32 (``preferred_element_type``) while streaming
  bf16/fp32 activations; the cell state stays fp32 in scratch.

Layout: the caller stacks both directions on a leading axis with the
backward direction's input pre-flipped ((masked_)flip happens outside, so
variable-length eval reuses the same kernel). Rows = batch*sequences, padded
to the row-tile; F and 4H are already lane-aligned (128/512).

Gradients: inference-only. Training keeps the lax.scan path (identical math,
tests/test_pallas_lstm.py asserts equality), toggled by ops.rnn's backend
switch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sigmoid(x):
    # explicit form: jax.nn.sigmoid lowers to a 'logistic' op that trips a
    # Mosaic vector.broadcast verification bug on bf16 operands
    return 1.0 / (1.0 + jnp.exp(-x))


def _lstm_kernel(x_ref, wih_ref, whh_ref, b_ref, out_ref, h_scr, c_scr, *, hidden: int):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    x_t = x_ref[0, 0, :, :]  # [rows, F]
    h = h_scr[:]
    gates = jnp.dot(x_t, wih_ref[0], preferred_element_type=jnp.float32)
    gates = gates + jnp.dot(
        h.astype(x_t.dtype), whh_ref[0], preferred_element_type=jnp.float32
    )
    gates = gates + b_ref[0, 0].astype(jnp.float32)

    H = hidden
    # activations on the 4H-wide gates run in the streaming dtype (bf16 when
    # the model computes in bf16 — 2x VPU throughput); the H-wide cell-state
    # update stays fp32 (the only accumulation over time)
    gates = gates.astype(x_t.dtype)
    i = _sigmoid(gates[:, :H])
    f = _sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = _sigmoid(gates[:, 3 * H :])
    c = f.astype(jnp.float32) * c_scr[:] + (i * g).astype(jnp.float32)
    h_new = o * jnp.tanh(c).astype(x_t.dtype)
    c_scr[:] = c
    h_scr[:] = h_new.astype(h_scr.dtype)
    out_ref[0, 0, :, :] = h_new.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("row_tile",))
def lstm_scan_pallas(x2, w_ih2, w_hh2, b2, row_tile: int = 2048):
    """Forward LSTM over both stacked directions.

    x2:    [D, R, T, F]  (D=1 unidirectional, 2 bidirectional; backward
           direction pre-flipped by the caller)
    w_ih2: [D, F, 4H]; w_hh2: [D, H, 4H]; b2: [D, 4H]
    returns hs [D, R, T, H] (backward direction still time-flipped).
    """
    D, R, T, F = x2.shape
    # kernel layout: time-major [D, T, R, F] so blocks tile the (rows, lanes)
    # plane; the transposes fuse into the surrounding producers/consumers
    xk = jnp.swapaxes(x2, 1, 2)
    out = _pallas_core(xk, w_ih2, w_hh2, b2, row_tile, reverse_dir1=False)
    return jnp.swapaxes(out, 1, 2)[:, :R]


@functools.partial(jax.jit, static_argnames=("row_tile",))
def bilstm_pallas_fused(x, w_ih2, w_hh2, b2, row_tile: int = 2048):
    """Bidirectional LSTM with the backward time-reversal folded into the
    kernel's index maps — zero flip copies. Only valid without length
    masking (train / fixed-shape batches).

    x: [R, T, F]; returns [R, T, 2H] (fwd ++ bwd, both in forward time).
    """
    R, T, F = x.shape
    xk = jnp.swapaxes(x, 0, 1)[None]  # [1, T, R, F] — shared by both dirs
    out = _pallas_core(xk, w_ih2, w_hh2, b2, row_tile, reverse_dir1=True)
    # out: [2, T, R, H], dir 1 already written back in forward time
    out = jnp.swapaxes(out, 1, 2)  # [2, R, T, H]
    return jnp.concatenate([out[0], out[1]], axis=-1)


def _pallas_core(xk, w_ih2, w_hh2, b2, row_tile: int, reverse_dir1: bool):
    """xk: [Dx, T, R, F] (Dx==1 with reverse_dir1: both directions read the
    same buffer, direction 1 through reversed-time index maps)."""
    Dx, T, R, F = xk.shape
    D = w_ih2.shape[0]
    H = w_hh2.shape[1]
    Rp = _round_up(max(R, 8), row_tile) if R > row_tile else _round_up(R, 8)
    tile = min(row_tile, Rp)
    Rp = _round_up(Rp, tile)
    if Rp != R:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
    grid = (D, Rp // tile, T)

    if reverse_dir1:
        def x_map(d, r, t):
            return (0, jax.lax.select(d == 0, t, T - 1 - t), r, 0)

        def out_map(d, r, t):
            return (d, jax.lax.select(d == 0, t, T - 1 - t), r, 0)
    else:
        def x_map(d, r, t):
            return (d, t, r, 0)

        def out_map(d, r, t):
            return (d, t, r, 0)

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, hidden=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile, F), x_map),
            pl.BlockSpec((1, F, 4 * H), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, H, 4 * H), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, 4 * H), lambda d, r, t: (d, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, H), out_map),
        out_shape=jax.ShapeDtypeStruct((D, T, Rp, H), xk.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, H), xk.dtype),
            pltpu.VMEM((tile, H), jnp.float32),
        ],
    )(xk, w_ih2, w_hh2, b2[:, None, :])
    return out[:, :, :R] if Rp != R else out
