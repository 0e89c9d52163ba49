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
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c)
    c_scr[:] = c
    h_scr[:] = h_new.astype(h_scr.dtype)
    out_ref[0, 0, :, :] = h_new.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("row_tile",))
def lstm_scan_pallas(x2, w_ih2, w_hh2, b2, row_tile: int = 1024):
    """Forward LSTM over both stacked directions.

    x2:    [D, R, T, F]  (D=1 unidirectional, 2 bidirectional; backward
           direction pre-flipped by the caller)
    w_ih2: [D, F, 4H]; w_hh2: [D, H, 4H]; b2: [D, 4H]
    returns hs [D, R, T, H] (backward direction still time-flipped).
    """
    D, R, T, F = x2.shape
    H = w_hh2.shape[1]
    Rp = _round_up(max(R, 8), row_tile) if R > row_tile else _round_up(R, 8)
    tile = min(row_tile, Rp)
    Rp = _round_up(Rp, tile)
    if Rp != R:
        x2 = jnp.pad(x2, ((0, 0), (0, Rp - R), (0, 0), (0, 0)))

    # kernel layout: time-major [D, T, R, F] so blocks tile the (rows, lanes)
    # plane; the transposes fuse into the surrounding producers/consumers
    xk = jnp.swapaxes(x2, 1, 2)
    grid = (D, Rp // tile, T)
    out = pl.pallas_call(
        functools.partial(_lstm_kernel, hidden=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile, F), lambda d, r, t: (d, t, r, 0)),
            pl.BlockSpec((1, F, 4 * H), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, H, 4 * H), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, 4 * H), lambda d, r, t: (d, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, H), lambda d, r, t: (d, t, r, 0)),
        out_shape=jax.ShapeDtypeStruct((D, T, Rp, H), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, H), x2.dtype),
            pltpu.VMEM((tile, H), jnp.float32),
        ],
    )(xk, w_ih2, w_hh2, b2[:, None, :])
    return jnp.swapaxes(out, 1, 2)[:, :R]
