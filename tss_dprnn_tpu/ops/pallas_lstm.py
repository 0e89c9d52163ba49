"""Fused LSTM scan as a Pallas TPU kernel — the framework's hottest op.

The XLA ``lax.scan`` path (ops/rnn.py) materializes the [T, R, 4H] input
projection in HBM and re-reads it every step. This kernel instead:

- keeps the LSTM state (h, c) for ALL row tiles and both weight matrices
  resident in VMEM across the whole time loop;
- computes the input projection x_t @ W_ih *inside* the step (two MXU
  matmuls), so HBM traffic is exactly: read x once, write h once;
- iterates the grid time-major with (direction, row-tile) innermost, so the
  independent tiles of one time step hide each other's recurrent-matmul
  latency;
- **unrolls ``U`` time steps per grid invocation** — measured on v5e, the
  per-grid-step fixed cost (~7.6 us: DMA turnaround + dispatch) dominates a
  single 128-wide cell update, so amortizing it across U steps is the main
  lever (tests/ablations in round notes);
- accumulates gates in fp32 (``preferred_element_type``); activations run in
  the streaming dtype (bf16 in the fast path); the cell state stays fp32.

The backward direction of a BiLSTM reads time-reversed input. With no length
masking the reversal is folded into the index maps + an in-kernel reversed
sub-step order (zero copies); with per-sequence lengths the mask-aware
``bilstm2_*_masked`` kernels start each row's reversed scan at its own length
via an in-kernel predicate (the stacked ``masked_flip`` pre-flip path remains
as the XLA-backend fallback).

Gradients: TRAINING runs on fused kernels too — the resid-emitting forwards
(``lstm_forward_resid`` / ``bilstm2_forward_resid[_masked|_tm]``) write the
(h_prev, c_prev, tanh(c)) residual streams in padded kernel layout, and the
matching backward kernels (``lstm_backward`` / ``bilstm2_backward[_masked|
_tm]``) consume them with zero host-side re-layout; ops/rnn.py's custom VJPs
dispatch here whenever the pallas backend is active with ``save_every <= 1``
(PARITY.md perf table: this pair IS the training fast path, 114 ms flagship
step). The lax.scan path remains the segment-checkpointed (``save_every >
1``) and XLA-backend route; tests/test_pallas_lstm.py + tests/test_lstm_grad
assert value/grad equality between the two, and
scripts/perf/grad_check_tpu.py re-verifies both masked and unmasked pairs on
real hardware (BENCH_ALL.md PASS table).
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


def _lstm_kernel(x_ref, wih_ref, whh_ref, b_ref, *rest,
                 hidden: int, unroll: int, reverse_dir1: bool, acc_dtype,
                 want_cs: bool, want_resid: bool = False):
    """Grid (D, r_tiles, T/U) — time innermost so the per-tile state scratch
    carries across steps. The time block holds U consecutive steps; for the
    reversed direction (d==1, zero-copy path) the block is a contiguous chunk
    of *forward* time consumed in reversed sub-step order. With ``want_cs``
    the per-step cell state is a second output (consumed by the hand-written
    training backward in ops/rnn.py)."""
    hp_ref = cp_ref = tc_ref = cs_ref = None
    if want_resid:
        out_ref, hp_ref, cp_ref, tc_ref, h_scr, c_scr = rest
    elif want_cs:
        out_ref, cs_ref, h_scr, c_scr = rest
    else:
        out_ref, h_scr, c_scr = rest
    d = pl.program_id(0)
    t = pl.program_id(2)
    H = hidden

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    for u in range(unroll):
        if reverse_dir1:
            u_eff = jax.lax.select(d == 0, u, unroll - 1 - u)
        else:
            u_eff = u
        x_t = x_ref[0, u_eff, :, :] if unroll > 1 else x_ref[0, 0, :, :]
        gates = jnp.dot(x_t, wih_ref[0], preferred_element_type=acc_dtype)
        gates = gates + jnp.dot(
            h.astype(x_t.dtype), whh_ref[0], preferred_element_type=acc_dtype
        )
        gates = gates + b_ref[0, 0].astype(acc_dtype)
        # fp32 activations: measured identical VPU cost to bf16 on v5e, and
        # they keep the fast path within ~47 dB of the fp32 XLA graph
        i = _sigmoid(gates[:, :H])
        f = _sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = _sigmoid(gates[:, 3 * H :])
        u_idx = u_eff if unroll > 1 else 0
        if want_resid:
            # entering states + tanh(c_t): everything the fused backward
            # needs, aligned at t (no shifted/concatenated streams)
            hp_ref[0, u_idx, :, :] = h.astype(hp_ref.dtype)
            cp_ref[0, u_idx, :, :] = c.astype(cp_ref.dtype)
        c = f * c + i * g
        tc = jnp.tanh(c)
        h = (o * tc).astype(x_t.dtype)
        out_ref[0, u_idx, :, :] = h.astype(out_ref.dtype)
        if want_resid:
            tc_ref[0, u_idx, :, :] = tc.astype(tc_ref.dtype)
        if cs_ref is not None:
            cs_ref[0, u_idx, :, :] = c
    h_scr[:] = h.astype(h_scr.dtype)
    c_scr[:] = c


def _lens_column(lens, B: int, Rp: int, Tp: int):
    """Per-row lengths as the [Rp, 1] int32 COLUMN both the masked forward
    and masked backward kernels consume (a 1D->2D vector reshape in-kernel
    trips Mosaic, so the column shape is made on the host). Pad rows are
    FULL-length (Tp): they behave like the unmasked kernel and are trimmed
    by the caller — the forward/backward pair must agree on this convention
    for gradients to be correct, hence the single shared helper."""
    lens_row = jnp.full((Rp,), Tp, jnp.int32)
    lens_row = lens_row.at[:B].set(lens.astype(jnp.int32))
    return lens_row[:, None]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_unroll(T: int, unroll: int) -> int:
    # an EXACT divisor always beats padding T up to an unroll multiple: the
    # pad materializes a full extra pass over the (GB-scale) input, while
    # unroll depth >=2 already hides the recurrent-matmul latency (measured
    # at the flagship inter shape: T=642 u=3 exact 22.4 ms vs u=5 padded to
    # 645 *in-jit* 34.5 ms vs pre-padded 645 u=5 21.9 ms)
    for u in (unroll, 5, 4, 3, 2, 1):
        if u <= unroll and T % u == 0:
            return u
    return 1


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def lstm_scan_pallas(x2, w_ih2, w_hh2, b2, row_tile: int = 1024, unroll: int = 5):
    """Forward LSTM over stacked directions (backward pre-flipped by caller).

    x2: [D, R, T, F]; w_ih2: [D, F, 4H]; w_hh2: [D, H, 4H]; b2: [D, 4H]
    returns hs [D, R, T, H] (backward direction still time-flipped).
    Time is zero-padded up to a multiple of the unroll factor (harmless for
    forward scans; outputs sliced back).
    """
    D, R, T, F = x2.shape
    u = _pick_unroll(T, unroll)
    Tp = T
    if u == 1 and unroll > 1:
        # pad instead of giving up the unroll win
        u = unroll
        Tp = _round_up(T, u)
    if Tp != T:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    xk = jnp.swapaxes(x2, 1, 2)  # [D, Tp, R, F]
    out = _pallas_core(xk, w_ih2, w_hh2, b2, row_tile, u, reverse_dir1=False)
    return jnp.swapaxes(out, 1, 2)[:, :R, :T]


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def bilstm_pallas_fused(x, w_ih2, w_hh2, b2, row_tile: int = 1024, unroll: int = 5):
    """Bidirectional LSTM with the backward time-reversal folded into the
    kernel (zero flip copies). Only valid without length masking; requires
    no time padding, so the unroll drops to a divisor of T.

    x: [R, T, F]; returns [R, T, 2H] (fwd ++ bwd, both in forward time).
    """
    R, T, F = x.shape
    u = _pick_unroll(T, unroll)
    xk = jnp.swapaxes(x, 0, 1)[None]  # [1, T, R, F] — shared by both dirs
    out = _pallas_core(xk, w_ih2, w_hh2, b2, row_tile, u, reverse_dir1=True)
    out = jnp.swapaxes(out, 1, 2)  # [2, R, T, H]
    return jnp.concatenate([out[0], out[1]], axis=-1)


def _pallas_core(xk, w_ih2, w_hh2, b2, row_tile: int, unroll: int,
                 reverse_dir1: bool, want_cs: bool = False,
                 want_resid: bool = False):
    """xk: [Dx, T, R, F] (Dx==1 with reverse_dir1: both directions read the
    same buffer, direction 1 through reversed-time indexing)."""
    Dx, T, R, F = xk.shape
    D = w_ih2.shape[0]
    H = w_hh2.shape[1]
    assert T % unroll == 0
    Rp = _round_up(max(R, 8), row_tile) if R > row_tile else _round_up(R, 8)
    tile = min(row_tile, Rp)
    Rp = _round_up(Rp, tile)
    if Rp != R:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
    r_tiles = Rp // tile
    n_t = T // unroll
    grid = (D, r_tiles, n_t)
    acc_dtype = jnp.float32  # Mosaic requires 32-bit matmul accumulators

    if reverse_dir1:
        def x_map(d, r, t):
            return (0, jax.lax.select(d == 0, t, n_t - 1 - t), r, 0)

        def out_map(d, r, t):
            return (d, jax.lax.select(d == 0, t, n_t - 1 - t), r, 0)
    else:
        def x_map(d, r, t):
            return (d, t, r, 0)

        def out_map(d, r, t):
            return (d, t, r, 0)

    def w_map(d, r, t):
        return (d, 0, 0)

    out_specs = pl.BlockSpec((1, unroll, tile, H), out_map)
    out_shape = jax.ShapeDtypeStruct((D, T, Rp, H), xk.dtype)
    if want_resid:
        st = pl.BlockSpec((1, unroll, tile, H), out_map)
        out_specs = (out_specs, st, st, st)
        sh = jax.ShapeDtypeStruct((D, T, Rp, H), xk.dtype)
        out_shape = (out_shape, sh, sh, sh)
    elif want_cs:
        out_specs = (out_specs, pl.BlockSpec((1, unroll, tile, H), out_map))
        out_shape = (out_shape, jax.ShapeDtypeStruct((D, T, Rp, H), jnp.float32))
    out = pl.pallas_call(
        functools.partial(
            _lstm_kernel, hidden=H, unroll=unroll,
            reverse_dir1=reverse_dir1, acc_dtype=acc_dtype, want_cs=want_cs,
            want_resid=want_resid,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, unroll, tile, F), x_map),
            pl.BlockSpec((1, F, 4 * H), w_map),
            pl.BlockSpec((1, H, 4 * H), w_map),
            pl.BlockSpec((1, 1, 4 * H), w_map),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile, H), xk.dtype),
            pltpu.VMEM((tile, H), jnp.float32),
        ],
    )(xk, w_ih2, w_hh2, b2[:, None, :])
    if want_resid:
        # residual streams stay PADDED (kernel layout) — the backward kernel
        # consumes them as-is; only the primal output is sliced
        hs, hp, cp, tc = out
        return (hs[:, :, :R] if Rp != R else hs), hp, cp, tc
    if want_cs:
        hs, cs = out
        if Rp != R:
            hs, cs = hs[:, :, :R], cs[:, :, :R]
        return hs, cs
    return out[:, :, :R] if Rp != R else out

# ---------------------------------------------------------------------------
# v2: manual double-buffered DMA pipeline.
#
# The BlockSpec pipeline above still pays a fixed per-grid-step cost for every
# (time-step x tile); with 128-wide cells that overhead dominates (measured
# ~7.6 us/step on v5e vs ~2.7 us of compute). This version makes the whole
# time loop ONE grid step per (direction, row-tile): x streams in and h
# streams out through explicitly double-buffered async copies in chunks of
# ``chunk`` steps, while the recurrence runs from VMEM scratch.
# ---------------------------------------------------------------------------


def _lstm_manual_kernel(x_hbm, wih_ref, whh_ref, b_ref, out_hbm,
                        xbuf, obuf, h_scr, c_scr, in_sem, out_sem, *,
                        hidden: int, tile: int, chunk: int, n_chunks: int,
                        r_tiles: int, reverse_dir1: bool, x_shared: bool):
    H = hidden
    dr = pl.program_id(0)
    d = dr // r_tiles
    r = dr % r_tiles
    row0 = r * tile
    xd = 0 if x_shared else d

    def chunk_eff(tc):
        if reverse_dir1:
            return jax.lax.select(d == 0, tc, n_chunks - 1 - tc)
        return tc

    def in_dma(tc, slot):
        return pltpu.make_async_copy(
            x_hbm.at[xd, pl.ds(chunk_eff(tc) * chunk, chunk), pl.ds(row0, tile), :],
            xbuf.at[slot],
            in_sem.at[slot],
        )

    def out_dma(tc, slot):
        return pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[d, pl.ds(chunk_eff(tc) * chunk, chunk), pl.ds(row0, tile), :],
            out_sem.at[slot],
        )

    h_scr[:] = jnp.zeros((tile, H), h_scr.dtype)
    c_scr[:] = jnp.zeros((tile, H), c_scr.dtype)
    in_dma(0, 0).start()

    def step(tc, carry):
        h, c = carry
        slot = jax.lax.rem(tc, 2)

        @pl.when(tc + 1 < n_chunks)
        def _():
            in_dma(tc + 1, jax.lax.rem(tc + 1, 2)).start()

        in_dma(tc, slot).wait()

        @pl.when(tc >= 2)
        def _():
            out_dma(tc - 2, slot).wait()

        for u in range(chunk):
            if reverse_dir1:
                u_eff = jax.lax.select(d == 0, u, chunk - 1 - u)
            else:
                u_eff = u
            x_t = xbuf[slot, u_eff, :, :]
            gates = jnp.dot(x_t, wih_ref[0], preferred_element_type=jnp.float32)
            gates = gates + jnp.dot(
                h.astype(x_t.dtype), whh_ref[0], preferred_element_type=jnp.float32
            )
            gates = gates + b_ref[0, 0].astype(jnp.float32)
            gates = gates.astype(x_t.dtype)
            i = _sigmoid(gates[:, :H])
            f = _sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = _sigmoid(gates[:, 3 * H :])
            c = f.astype(jnp.float32) * c + (i * g).astype(jnp.float32)
            h = o * jnp.tanh(c).astype(x_t.dtype)
            obuf[slot, u_eff, :, :] = h.astype(obuf.dtype)

        out_dma(tc, slot).start()
        return h, c

    h0 = h_scr[:]
    c0 = c_scr[:]
    h, c = jax.lax.fori_loop(0, n_chunks, step, (h0, c0))

    # drain the last two output DMAs
    @pl.when(n_chunks >= 2)
    def _():
        out_dma(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

    out_dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()


def _pallas_core_v2(xk, w_ih2, w_hh2, b2, row_tile: int, chunk: int,
                    reverse_dir1: bool):
    """xk: [Dx, T, R, F]; T must be a multiple of ``chunk``."""
    Dx, T, R, F = xk.shape
    D = w_ih2.shape[0]
    H = w_hh2.shape[1]
    assert T % chunk == 0
    Rp = _round_up(max(R, 8), row_tile) if R > row_tile else _round_up(R, 8)
    tile = min(row_tile, Rp)
    Rp = _round_up(Rp, tile)
    if Rp != R:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, Rp - R), (0, 0)))
    r_tiles = Rp // tile
    n_chunks = T // chunk

    out = pl.pallas_call(
        functools.partial(
            _lstm_manual_kernel, hidden=H, tile=tile, chunk=chunk,
            n_chunks=n_chunks, r_tiles=r_tiles, reverse_dir1=reverse_dir1,
            x_shared=(Dx == 1 and D == 2),
        ),
        grid=(D * r_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec((1, F, 4 * H), lambda dr: (dr // r_tiles, 0, 0)),
            pl.BlockSpec((1, H, 4 * H), lambda dr: (dr // r_tiles, 0, 0)),
            pl.BlockSpec((1, 1, 4 * H), lambda dr: (dr // r_tiles, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((D, T, Rp, H), xk.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, tile, F), xk.dtype),
            pltpu.VMEM((2, chunk, tile, H), xk.dtype),
            pltpu.VMEM((tile, H), xk.dtype),
            pltpu.VMEM((tile, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(xk, w_ih2, w_hh2, b2[:, None, :])
    return out[:, :, :R] if Rp != R else out


@functools.partial(jax.jit, static_argnames=("row_tile", "chunk"))
def bilstm_pallas_v2(x, w_ih2, w_hh2, b2, row_tile: int = 1024, chunk: int = 10):
    """Manual-DMA bidirectional LSTM, zero-copy reversal. x: [R, T, F] ->
    [R, T, 2H]. Time padded to a chunk multiple is NOT allowed on the
    zero-copy path (reversed reads would hit padding first) — the caller
    guarantees T % chunk == 0 or picks a divisor chunk."""
    R, T, F = x.shape
    ch = chunk
    while T % ch != 0:
        ch -= 1
    xk = jnp.swapaxes(x, 0, 1)[None]
    out = _pallas_core_v2(xk, w_ih2, w_hh2, b2, row_tile, ch, reverse_dir1=True)
    out = jnp.swapaxes(out, 1, 2)
    return jnp.concatenate([out[0], out[1]], axis=-1)


@functools.partial(jax.jit, static_argnames=("row_tile", "chunk"))
def lstm_scan_pallas_v2(x2, w_ih2, w_hh2, b2, row_tile: int = 1024, chunk: int = 10):
    """Manual-DMA forward scan over pre-flipped stacked directions.
    x2: [D, R, T, F] -> [D, R, T, H]; time end-padded to a chunk multiple."""
    D, R, T, F = x2.shape
    Tp = _round_up(T, chunk)
    if Tp != T:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    xk = jnp.swapaxes(x2, 1, 2)
    out = _pallas_core_v2(xk, w_ih2, w_hh2, b2, row_tile, chunk, reverse_dir1=False)
    return jnp.swapaxes(out, 1, 2)[:, :R, :T]


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def lstm_forward_with_cs(xx, w_ih, b, w_hh, row_tile: int = 1024, unroll: int = 5):
    """Training-forward entry: xx [D, B, T, F] (backward dir pre-flipped) ->
    (hs [T, D, B, H], cs [T, D, B, H] fp32). Used by ops/rnn._recurrence when
    the pallas backend is active under grad."""
    D, B, T, F = xx.shape
    u = _pick_unroll(T, unroll)
    Tp = T
    if u == 1 and unroll > 1:
        u = unroll
        Tp = _round_up(T, u)
    xk = jnp.swapaxes(xx, 1, 2)  # [D, T, B, F]
    if Tp != T:
        xk = jnp.pad(xk, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    hs, cs = _pallas_core(xk, w_ih, w_hh, b, row_tile, u,
                          reverse_dir1=False, want_cs=True)
    # [D, Tp, B, H] -> [T, D, B, H]
    hs = jnp.transpose(hs[:, :T], (1, 0, 2, 3))
    cs = jnp.transpose(cs[:, :T], (1, 0, 2, 3))
    return hs, cs


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def lstm_forward(xx, w_ih, b, w_hh, row_tile: int = 1024, unroll: int = 5):
    """Inference entry: like :func:`lstm_forward_with_cs` but h only."""
    D, B, T, F = xx.shape
    u = _pick_unroll(T, unroll)
    Tp = T
    if u == 1 and unroll > 1:
        u = unroll
        Tp = _round_up(T, u)
    xk = jnp.swapaxes(xx, 1, 2)
    if Tp != T:
        xk = jnp.pad(xk, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    hs = _pallas_core(xk, w_ih, w_hh, b, row_tile, u, reverse_dir1=False)
    return jnp.transpose(hs[:, :T], (1, 0, 2, 3))



# ---------------------------------------------------------------------------
# Fused backward: the hand-written LSTM VJP's reverse pass as one kernel.
#
# The XLA backward (ops/rnn._bwd_steps) materializes seven [T, D, B, H]
# per-step factor arrays in HBM before a lax.scan re-reads them, then runs
# three more full-sequence contractions for the weight grads. Profiling the
# first fused version showed HALF the train step going to pure data movement
# (host-side flips, pads, h_prev/c_prev concatenations, layout transposes) —
# so this design eliminates it at the source:
#
# - the TRAINING FORWARD (``lstm_forward_resid``) emits, aligned at t and in
#   kernel layout [D, Tp, Rp, H]: h_prev / c_prev (the states *entering* each
#   step — free in-register) and tanh(c_t) (computed for h anyway). The
#   backward therefore needs no shifted/concatenated/flipped streams at all.
# - the backward grid walks time via a static reversed index map
#   (t -> n_t-1-t for BOTH directions — unlike the select-based dual map of
#   bilstm_pallas_fused, which miscompiles when composed; validated on
#   hardware by scripts/perf/grad_check_tpu.py) with the in-block sub-step
#   order reversed, so no jnp.flip copies exist anywhere.
# - residual streams stay padded: the backward reuses the forward's row/time
#   padding instead of re-padding (padded steps carry zero cotangents
#   through: g, dh, dc are zero there, so every contribution vanishes).
#
# Per step: 2 MXU matmuls recompute the gates from (x_t, h_prev), one turns
# dpre into dh_{t-1}, one into dx_t, and two accumulate dW_ih / dW_hh into
# VMEM-resident output blocks (index maps constant in t).
# ---------------------------------------------------------------------------


def _lstm_bwd_kernel(x_ref, hp_ref, cp_ref, tc_ref, g_ref, wih_ref, whh_ref,
                     b_ref, dx_ref, dwih_ref, dwhh_ref, db_ref, dh_scr, dc_scr,
                     *, hidden: int, unroll: int):
    """Grid (D, r_tiles, n_t) over REVERSED time blocks (index maps give
    block n_t-1-t); sub-steps run u = unroll-1 .. 0. Blocks: x [1,U,tile,F];
    hp/cp/tc/g [1,U,tile,H]; dx [1,U,tile,F]; dwih [1,1,F,4H] /
    dwhh [1,1,H,4H] / db [1,1,1,4H] accumulators (constant index maps ->
    VMEM-resident, zeroed at grid t==0 == last time block)."""
    t = pl.program_id(2)
    H = hidden
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dh_c = dh_scr[:]
    dc_c = dc_scr[:]
    dwih = dwih_ref[0, 0]
    dwhh = dwhh_ref[0, 0]
    db = db_ref[0, 0]
    for u in range(unroll - 1, -1, -1):
        x_t = x_ref[0, u, :, :]
        h_prev = hp_ref[0, u, :, :]
        c_prev = cp_ref[0, u, :, :]
        tc = tc_ref[0, u, :, :].astype(f32)
        g_t = g_ref[0, u, :, :]
        # recompute gate activations (fp32, as the forward computed them)
        gates = jnp.dot(x_t, wih_ref[0], preferred_element_type=f32)
        gates = gates + jnp.dot(h_prev, whh_ref[0], preferred_element_type=f32)
        gates = gates + b_ref[0, 0].astype(f32)
        i = _sigmoid(gates[:, :H])
        f = _sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = _sigmoid(gates[:, 3 * H :])
        dh = g_t.astype(f32) + dh_c
        dc = dc_c + dh * (o * (1.0 - tc * tc))
        dpre = jnp.concatenate(
            [
                dc * (g * i * (1.0 - i)),
                dc * (c_prev.astype(f32) * f * (1.0 - f)),
                dc * (i * (1.0 - g * g)),
                dh * (tc * o * (1.0 - o)),
            ],
            axis=-1,
        )  # [tile, 4H] fp32
        dpre_s = dpre.astype(x_t.dtype)
        dh_c = jax.lax.dot_general(
            dpre_s, whh_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        dc_c = dc * f
        dx_ref[0, u, :, :] = jax.lax.dot_general(
            dpre_s, wih_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=f32
        ).astype(dx_ref.dtype)
        dwih = dwih + jax.lax.dot_general(
            x_t, dpre_s, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        dwhh = dwhh + jax.lax.dot_general(
            h_prev, dpre_s, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        db = db + jnp.sum(dpre, axis=0)
    dh_scr[:] = dh_c
    dc_scr[:] = dc_c
    dwih_ref[0, 0] = dwih
    dwhh_ref[0, 0] = dwhh
    db_ref[0, 0] = db


_RESID_ROW_TILE = 256  # shared by fwd/bwd so padded rows line up


@functools.partial(jax.jit, static_argnames=("unroll",))
def lstm_forward_resid(xx, w_ih, b, w_hh, unroll: int = 5):
    """Training-forward entry for the fused-backward path.

    xx [D, B, T, F] (backward dir pre-flipped) ->
    (hs [T, D, B, H], xk [D, Tp, Rp, F], hp/cp/tc [D, Tp, Rp, H]) where the
    last four stay in padded kernel layout for lstm_backward to consume
    without any re-layout.
    """
    D, B, T, F = xx.shape
    u = _pick_unroll(T, unroll)
    Tp = T
    if u == 1 and unroll > 1:
        u = unroll
        Tp = _round_up(T, u)
    xk = jnp.swapaxes(xx, 1, 2)  # [D, T, B, F]
    if Tp != T:
        xk = jnp.pad(xk, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    # pad rows here so the saved xk is kernel-final (avoids a second pad in
    # _pallas_core AND any pad in the backward)
    Rp = _round_up(max(B, 8), 8)
    tile = min(_RESID_ROW_TILE, Rp)
    Rp = _round_up(Rp, tile)
    if Rp != B:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, Rp - B), (0, 0)))
    hs, hp, cp, tc = _pallas_core(xk, w_ih, w_hh, b, tile, u,
                                  reverse_dir1=False, want_resid=True)
    hs = jnp.transpose(hs[:, :T, :B], (1, 0, 2, 3))  # [T, D, B, H]
    return hs, xk, hp, cp, tc


@functools.partial(jax.jit, static_argnames=("unroll",))
def lstm_backward(xk, hp, cp, tc, g_hs, w_ih, b, w_hh, unroll: int = 5):
    """Fused reverse pass. xk/hp/cp/tc: padded kernel-layout residuals from
    :func:`lstm_forward_resid`; g_hs [T, D, B, H] output cotangents.
    Returns (dxx [D, B, T, F], dw_ih [D, F, 4H] f32, db [D, 4H] f32,
    dw_hh [D, H, 4H] f32)."""
    D, Tp, Rp, F = xk.shape
    H = w_hh.shape[1]
    T, B = g_hs.shape[0], g_hs.shape[2]
    f32 = jnp.float32
    u = _pick_unroll(Tp, unroll)
    gk = jnp.transpose(g_hs, (1, 0, 2, 3))  # [D, T, B, H]
    if Tp != T or Rp != B:
        gk = jnp.pad(gk, ((0, 0), (0, Tp - T), (0, Rp - B), (0, 0)))
    tile = min(_RESID_ROW_TILE, Rp)
    r_tiles = Rp // tile
    n_t = Tp // u
    grid = (D, r_tiles, n_t)

    def s_map(d, r, t):  # static reversed traversal — no host flips
        return (d, n_t - 1 - t, r, 0)

    def w_map(d, r, t):
        return (d, 0, 0)

    def acc_map(d, r, t):
        return (d, r, 0, 0)

    dxk, dwih, dwhh, db = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, hidden=H, unroll=u),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, u, tile, F), s_map),
            pl.BlockSpec((1, u, tile, H), s_map),
            pl.BlockSpec((1, u, tile, H), s_map),
            pl.BlockSpec((1, u, tile, H), s_map),
            pl.BlockSpec((1, u, tile, H), s_map),
            pl.BlockSpec((1, F, 4 * H), w_map),
            pl.BlockSpec((1, H, 4 * H), w_map),
            pl.BlockSpec((1, 1, 4 * H), w_map),
        ],
        out_specs=(
            pl.BlockSpec((1, u, tile, F), s_map),
            pl.BlockSpec((1, 1, F, 4 * H), acc_map),
            pl.BlockSpec((1, 1, H, 4 * H), acc_map),
            pl.BlockSpec((1, 1, 1, 4 * H), lambda d, r, t: (d, r, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, Tp, Rp, F), xk.dtype),
            jax.ShapeDtypeStruct((D, r_tiles, F, 4 * H), f32),
            jax.ShapeDtypeStruct((D, r_tiles, H, 4 * H), f32),
            jax.ShapeDtypeStruct((D, r_tiles, 1, 4 * H), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, H), f32),
            pltpu.VMEM((tile, H), f32),
        ],
    )(xk, hp, cp, tc, gk, w_ih, w_hh, b[:, None, :])

    dxx = jnp.swapaxes(dxk[:, :T, :B], 1, 2)  # [D, B, T, F]
    return (
        dxx,
        jnp.sum(dwih, axis=1),
        jnp.sum(db, axis=(1, 2)),
        jnp.sum(dwhh, axis=1),
    )


# ---------------------------------------------------------------------------
# No-stack bidirectional kernels ("bilstm2"): both directions in ONE grid
# step. Dir-0 consumes forward-time block t; dir-1 consumes the mirrored
# block n_t-1-t through a STATIC index map (the select-based dual map of
# bilstm_pallas_fused miscompiles; the static mirrored form is the same
# class lstm_backward uses, validated on hardware by
# scripts/perf/grad_check_tpu.py). Consequences:
#
# - the [2, B, T, F] stacked input, its dir-1 time flip, and the dir-1
#   OUTPUT flip all disappear (profiled at ~200 ms of a 1.6 s B=32x10s
#   inference call) — dir-1's output lands in forward time by construction;
# - lengths=None gives full-T reversal; MASKED sequences use the ``masked``
#   kernel mode (bilstm2_forward_masked, round 3): an extra [Rp, 1] int32
#   length column and a per-sub-step predicate hold dir-1's zero state until
#   the global time index drops below each row's own length — masked-flip
#   semantics with no stack and no flips. Differentiable: the masked
#   resid-forward + backward kernels skip dir-1's held steps per row
#   (rnn._recurrence3_masked) — masked training runs at fast-path speed;
# - time padding (to the unroll multiple) sits at the forward END, which is
#   the START of dir-1's scan: the kernel masks dir-1's state updates on the
#   pad sub-steps (static sub-index x traced block-index predicate) so zeros
#   enter its real steps, and the backward masks the mirrored tail the same
#   way.
# ---------------------------------------------------------------------------


def _bilstm2_kernel(x0_ref, x1_ref, wih_ref, whh_ref, b_ref, *rest,
                    hidden: int, unroll: int, n_t: int, pad: int,
                    want_resid: bool, cell_dtype=jnp.float32,
                    dense: bool = False, masked: bool = False):
    """Grid (r_tiles, n_t). x0/x1: (u, tile, F) blocks of the SAME array at
    block t and n_t-1-t. Outputs per dir: h [Tp, Rp, H] (+ resid streams
    hp/cp/tc per dir when want_resid). Dir-1 sub-steps run mirrored, so its
    output block at forward position j holds its scan step for time j.

    ``dense``: the SplitDense epilogue fused in — one extra input wo [2, H, Fo]
    and the per-dir outputs become y_d = h_d @ wo[d] (u, tile, Fo). The H-wide
    scan outputs never reach HBM, which kills the {2,0,1}->{2,1,0} relayout
    copy XLA otherwise inserts between each scan and its Dense (~94 ms/iter of
    pure copies at the flagship inference shape — profiled 2026-08-18). The
    extra matmul rides the MXU, which idles while the cell's elementwise
    stream bounds the kernel."""
    wo_ref = None
    lens_ref = None
    rest = list(rest)
    if dense:
        wo_ref = rest.pop(0)
    if masked:
        # per-row valid lengths [tile, 1]: dir-1 starts its scan at each
        # row's own length instead of the padded T (no input masked_flip)
        lens_ref = rest.pop(0)
    if want_resid:
        (o0_ref, o1_ref, hp0_ref, cp0_ref, tc0_ref,
         hp1_ref, cp1_ref, tc1_ref, h0s, c0s, h1s, c1s) = rest
    else:
        o0_ref, o1_ref, h0s, c0s, h1s, c1s = rest
        hp0_ref = None
    t = pl.program_id(1)
    H = hidden
    f32 = jnp.float32
    # cell_dtype: ablation hook (scripts/perf/bf16_cell_probe.py). bf16
    # cell math measured NEGATIVE on v5e: 39.5 vs 33.0 ms at the flagship
    # intra shape and -10 dB fidelity — Mosaic does not 2x-pack the bf16
    # elementwise stream here, and the f32->bf16 gate cast (the MXU acc must
    # stay 32-bit) adds a pass. Production stays f32.
    cdt = cell_dtype

    @pl.when(t == 0)
    def _():
        h0s[:] = jnp.zeros_like(h0s)
        c0s[:] = jnp.zeros_like(c0s)
        h1s[:] = jnp.zeros_like(h1s)
        c1s[:] = jnp.zeros_like(c1s)

    h0 = h0s[:]
    c0 = c0s[:]
    h1 = h1s[:]
    c1 = c1s[:]
    for u in range(unroll):
        # ---- dir 0: forward time, ascending sub-steps
        x_t = x0_ref[u, :, :]
        g = jnp.dot(x_t, wih_ref[0], preferred_element_type=f32)
        g = g + jnp.dot(h0.astype(x_t.dtype), whh_ref[0], preferred_element_type=f32)
        g = (g + b_ref[0, 0].astype(f32)).astype(cdt)
        i = _sigmoid(g[:, :H])
        f = _sigmoid(g[:, H : 2 * H])
        gg = jnp.tanh(g[:, 2 * H : 3 * H])
        o = _sigmoid(g[:, 3 * H :])
        if want_resid:
            hp0_ref[u, :, :] = h0.astype(hp0_ref.dtype)
            cp0_ref[u, :, :] = c0.astype(cp0_ref.dtype)
        c0 = f * c0 + i * gg
        tc = jnp.tanh(c0)
        h0 = (o * tc).astype(x_t.dtype)
        if dense:
            o0_ref[u, :, :] = jnp.dot(
                h0, wo_ref[0], preferred_element_type=f32
            ).astype(o0_ref.dtype)
        else:
            o0_ref[u, :, :] = h0.astype(o0_ref.dtype)
        if want_resid:
            tc0_ref[u, :, :] = tc.astype(tc0_ref.dtype)

        # ---- dir 1: mirrored block, descending sub-steps
        u1 = unroll - 1 - u
        x_t = x1_ref[u1, :, :]
        g = jnp.dot(x_t, wih_ref[1], preferred_element_type=f32)
        g = g + jnp.dot(h1.astype(x_t.dtype), whh_ref[1], preferred_element_type=f32)
        g = (g + b_ref[1, 0].astype(f32)).astype(cdt)
        i = _sigmoid(g[:, :H])
        f = _sigmoid(g[:, H : 2 * H])
        gg = jnp.tanh(g[:, 2 * H : 3 * H])
        o = _sigmoid(g[:, 3 * H :])
        if masked:
            # global forward time of this sub-step; dir-1 walks it downward.
            # Holding (h1, c1) at their zero init while j >= len[row] makes
            # the first processed step exactly x[len-1] — the masked-flip
            # stacked path's semantics without any flip (out1[t >= len] = 0,
            # masked downstream like the unmasked path's pad garbage). The
            # per-row predicate subsumes the static time-pad hold (len <= T).
            j = (n_t - 1 - t) * unroll + u1
            valid = j < lens_ref[:, :]  # [tile, 1], broadcasts over lanes
        elif pad and u1 >= unroll - pad:
            # forward-END padding = the START of dir-1's scan: only block
            # t==0 touches it; hold the state there so zeros enter the
            # first real step
            valid = t > 0
        else:
            valid = None
        if want_resid:
            hp1_ref[u1, :, :] = h1.astype(hp1_ref.dtype)
            cp1_ref[u1, :, :] = c1.astype(cp1_ref.dtype)
        c1_new = f * c1 + i * gg
        tc = jnp.tanh(c1_new)
        h1_new = (o * tc).astype(x_t.dtype)
        if valid is not None:
            c1 = jnp.where(valid, c1_new, c1)
            h1 = jnp.where(valid, h1_new, h1)
        else:
            c1 = c1_new
            h1 = h1_new
        if dense:
            o1_ref[u1, :, :] = jnp.dot(
                h1, wo_ref[1], preferred_element_type=f32
            ).astype(o1_ref.dtype)
        else:
            o1_ref[u1, :, :] = h1.astype(o1_ref.dtype)
        if want_resid:
            tc1_ref[u1, :, :] = tc.astype(tc1_ref.dtype)
    h0s[:] = h0
    c0s[:] = c0
    h1s[:] = h1
    c1s[:] = c1


def _bilstm2_core(x, w_ih2, b2, w_hh2, row_tile: int, unroll: int,
                  want_resid: bool, cell_dtype=jnp.float32, wo2=None,
                  lens=None):
    """x [B, T, F] -> (o0, o1) [Tp, Rp, H] (+ xk and 6 resid streams when
    want_resid). o1 is already in forward time."""
    xk = jnp.swapaxes(x, 0, 1)  # [T, B, F]
    return _bilstm2_core_tm(xk, w_ih2, b2, w_hh2, row_tile, unroll, want_resid,
                            cell_dtype=cell_dtype, wo2=wo2, lens=lens)


def _bilstm2_core_tm(xk, w_ih2, b2, w_hh2, row_tile: int, unroll: int,
                     want_resid: bool, cell_dtype=jnp.float32, wo2=None,
                     lens=None):
    """Time-major core: xk [T, R, F] -> (o0, o1) [Tp, Rp, H] (+ xk and 6
    resid streams when want_resid). o1 is already in forward time.
    With ``wo2`` [2, H, Fo] the SplitDense epilogue is fused: outputs become
    (y0, y1) [Tp, Rp, Fo] = h_d @ wo2[d] (mutually exclusive with
    want_resid — training uses the unfused resid forward).
    With ``lens`` [R] the kernel runs mask-aware: dir-1 starts each row's
    backward scan at its own length (used by bilstm2_forward_masked for
    inference AND by bilstm2_forward_resid_masked, whose resid streams feed
    the masked training backward)."""
    T, B, F = xk.shape
    H = w_hh2.shape[1]
    dense = wo2 is not None
    masked = lens is not None
    assert not (dense and want_resid)
    assert not (masked and dense)
    Fo = wo2.shape[2] if dense else H
    u = _pick_unroll(T, unroll)
    Tp = T
    if u == 1 and unroll > 1:
        # indivisible T only: pad time to a full-unroll multiple (the kernel
        # masks pad sub-steps on both passes). Divisible T never pads — see
        # _pick_unroll.
        u = unroll
        Tp = _round_up(T, u)
    pad = Tp - T
    if pad:
        xk = jnp.pad(xk, ((0, pad), (0, 0), (0, 0)))
    Rp = _round_up(max(B, 8), 8)
    tile = min(row_tile, Rp)
    if not want_resid and Rp % tile:
        # prefer an exact-divisor tile over padding rows up to a tile
        # multiple: the row pad forces a full extra pass over the (GB-scale)
        # input and output. Measured at the flagship intra shape
        # (rows=20544): tile 192 exact = 21.3 ms vs tile 512 padded =
        # 33.1 ms. Floor at 96 rows — below that grid overhead wins.
        for cand in range(tile - tile % 8, 95, -8):
            if Rp % cand == 0:
                tile = cand
                break
    Rp = _round_up(Rp, tile)
    if Rp != B:
        xk = jnp.pad(xk, ((0, 0), (0, Rp - B), (0, 0)))
    r_tiles = Rp // tile
    n_t = Tp // u
    grid = (r_tiles, n_t)

    def fmap(r, t):  # forward-time block
        return (t, r, 0)

    def mmap(r, t):  # mirrored block (static)
        return (n_t - 1 - t, r, 0)

    def wmap(r, t):
        return (0, 0, 0)

    sblk = pl.BlockSpec((u, tile, H), fmap)
    sblk_m = pl.BlockSpec((u, tile, H), mmap)
    sshape = jax.ShapeDtypeStruct((Tp, Rp, H), xk.dtype)
    out_specs = [pl.BlockSpec((u, tile, Fo), fmap), pl.BlockSpec((u, tile, Fo), mmap)]
    out_shape = [jax.ShapeDtypeStruct((Tp, Rp, Fo), xk.dtype)] * 2
    if want_resid:
        out_specs += [sblk, sblk, sblk, sblk_m, sblk_m, sblk_m]
        out_shape += [sshape] * 6
    in_specs = [
        pl.BlockSpec((u, tile, F), fmap),
        pl.BlockSpec((u, tile, F), mmap),
        pl.BlockSpec((2, F, 4 * H), wmap),
        pl.BlockSpec((2, H, 4 * H), wmap),
        pl.BlockSpec((2, 1, 4 * H), wmap),
    ]
    operands = [xk, xk, w_ih2, w_hh2, b2[:, None, :]]
    if dense:
        in_specs.append(pl.BlockSpec((2, H, Fo), wmap))
        operands.append(wo2)
    if masked:
        in_specs.append(pl.BlockSpec((tile, 1), lambda r, t: (r, 0)))
        operands.append(_lens_column(lens, B, Rp, Tp))
    scratch = [pltpu.VMEM((tile, H), xk.dtype), pltpu.VMEM((tile, H), cell_dtype),
               pltpu.VMEM((tile, H), xk.dtype), pltpu.VMEM((tile, H), cell_dtype)]
    out = pl.pallas_call(
        functools.partial(_bilstm2_kernel, hidden=H, unroll=u, n_t=n_t,
                          pad=pad, want_resid=want_resid, cell_dtype=cell_dtype,
                          dense=dense, masked=masked),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
    )(*operands)
    if want_resid:
        return (*out, xk)
    return out


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll", "cell_dtype"))
def bilstm2_forward(x, w_ih2, b2, w_hh2, row_tile: int = 512, unroll: int = 5,
                    cell_dtype=jnp.float32):
    # row_tile 512 (not the single-direction kernels' 1024): this kernel
    # streams both directions' x and out blocks at once — 1024-row tiles
    # exceed the 16 MB scoped-VMEM limit (measured 17.1 MB bf16)
    """Inference: x [B, T, F] -> (out0, out1) each [B, T, H], BOTH in forward
    time (no input stack/flip, no output flip)."""
    B, T, _ = x.shape
    o0, o1 = _bilstm2_core(x, w_ih2, b2, w_hh2, row_tile, unroll, False,
                           cell_dtype=jnp.dtype(cell_dtype).type)
    return (jnp.swapaxes(o0[:T, :B], 0, 1), jnp.swapaxes(o1[:T, :B], 0, 1))


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def bilstm2_forward_masked(x, lens, w_ih2, b2, w_hh2, row_tile: int = 512,
                           unroll: int = 5):
    """Mask-aware no-stack inference: x [B, T, F], lens [B] -> (out0, out1)
    each [B, T, H], both in forward time.

    dir-0 is the plain forward scan (positions t >= len are garbage by
    construction, masked downstream — the ``lstm()`` masked contract); dir-1
    holds its zero state until the global time index drops below each row's
    own length, so its first processed step is exactly x[len-1] — the
    masked-flip semantics with NO input stack and NO masked_flip gathers
    (the round-2 masked lane spent its gap on exactly those: two permutation
    matmuls + a [2, B, T, F] stack per inter scan). out1[t >= len] is 0."""
    B, T, _ = x.shape
    xk = jnp.swapaxes(x, 0, 1)
    o0, o1 = _bilstm2_core_tm(xk, w_ih2, b2, w_hh2, row_tile, unroll, False,
                              lens=lens)
    return (jnp.swapaxes(o0[:T, :B], 0, 1), jnp.swapaxes(o1[:T, :B], 0, 1))


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def bilstm2_dense_forward(x, w_ih2, b2, w_hh2, wo2, row_tile: int = 512,
                          unroll: int = 5):
    """Inference with the SplitDense epilogue fused into the kernel:
    x [B, T, F] -> (y0, y1) each [B, T, Fo] = h_d @ wo2[d], both in forward
    time. The H-wide scan outputs never reach HBM (see _bilstm2_kernel's
    ``dense`` mode)."""
    B, T, _ = x.shape
    y0, y1 = _bilstm2_core(x, w_ih2, b2, w_hh2, row_tile, unroll, False,
                           wo2=wo2)
    return (jnp.swapaxes(y0[:T, :B], 0, 1), jnp.swapaxes(y1[:T, :B], 0, 1))


@functools.partial(jax.jit, static_argnames=())
def bilstm2_forward_resid(x, w_ih2, b2, w_hh2):
    """Training forward: also returns the padded kernel-layout residuals."""
    B, T, _ = x.shape
    o0, o1, hp0, cp0, tc0, hp1, cp1, tc1, xk = _bilstm2_core(
        x, w_ih2, b2, w_hh2, _RESID_ROW_TILE, 5, True)
    outs = (jnp.swapaxes(o0[:T, :B], 0, 1), jnp.swapaxes(o1[:T, :B], 0, 1))
    return outs, (xk, hp0, cp0, tc0, hp1, cp1, tc1)


@functools.partial(jax.jit, static_argnames=())
def bilstm2_forward_resid_masked(x, lens, w_ih2, b2, w_hh2):
    """Mask-aware training forward (see bilstm2_forward_masked) with the
    padded kernel-layout residual streams — dir-1's hp/cp at held steps hold
    the zero state, which the masked backward skips anyway."""
    B, T, _ = x.shape
    o0, o1, hp0, cp0, tc0, hp1, cp1, tc1, xk = _bilstm2_core(
        x, w_ih2, b2, w_hh2, _RESID_ROW_TILE, 5, True, lens=lens)
    outs = (jnp.swapaxes(o0[:T, :B], 0, 1), jnp.swapaxes(o1[:T, :B], 0, 1))
    return outs, (xk, hp0, cp0, tc0, hp1, cp1, tc1)


@functools.partial(jax.jit, static_argnames=())
def bilstm2_backward_masked(xk, hp0, cp0, tc0, hp1, cp1, tc1, g0, g1,
                            w_ih2, b2, w_hh2, lens):
    """Mask-aware twin of :func:`bilstm2_backward`: dir-1's held steps
    (j >= len per row) contribute nothing (their forward output was the
    constant zero init)."""
    B, T = g0.shape[0], g0.shape[1]
    g0k = jnp.swapaxes(g0, 0, 1)
    g1k = jnp.swapaxes(g1, 0, 1)
    dx, dw_ih2, db2, dw_hh2 = bilstm2_backward_tm(
        xk, hp0, cp0, tc0, hp1, cp1, tc1, g0k, g1k, w_ih2, b2, w_hh2,
        T=T, R=B, lens=lens)
    return jnp.swapaxes(dx, 0, 1), dw_ih2, db2, dw_hh2


# ---------------------------------------------------------------------------
# Time-major entries: the DPRNN block's fast path keeps its tensors in the
# kernels' own [T, rows, F] layout, so the host-side swapaxes around every
# scan (profiled at ~20% of flagship inference: 12 copies + 13 pad fusions
# ~8 ms each per call at B=32x10 s) never exist. Same kernels, same grids —
# only the public layout differs.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def bilstm2_forward_tm(x, w_ih2, b2, w_hh2, row_tile: int = 512, unroll: int = 5):
    """Inference, time-major: x [T, R, F] -> (out0, out1) each [T, R, H],
    both in forward time."""
    T, R, _ = x.shape
    o0, o1 = _bilstm2_core_tm(x, w_ih2, b2, w_hh2, row_tile, unroll, False)
    if o0.shape[0] != T or o0.shape[1] != R:
        o0, o1 = o0[:T, :R], o1[:T, :R]
    return o0, o1


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def bilstm2_forward_masked_tm(x, lens, w_ih2, b2, w_hh2, row_tile: int = 512,
                              unroll: int = 5):
    """Mask-aware time-major inference: x [T, R, F], lens [R] -> (out0, out1)
    each [T, R, H], both in forward time — :func:`bilstm2_forward_masked`
    without the surrounding swapaxes pair (the masked core is ALREADY
    time-major; the batch-major entry exists only for the [B, T, F] public
    layout). Same per-row dir-1 hold-until-length predicate; out1[t >= len]
    is 0, out0[t >= len] is garbage-by-contract."""
    T, R, _ = x.shape
    o0, o1 = _bilstm2_core_tm(x, w_ih2, b2, w_hh2, row_tile, unroll, False,
                              lens=lens)
    if o0.shape[0] != T or o0.shape[1] != R:
        o0, o1 = o0[:T, :R], o1[:T, :R]
    return o0, o1


@functools.partial(jax.jit, static_argnames=())
def bilstm2_forward_resid_masked_tm(x, lens, w_ih2, b2, w_hh2):
    """Mask-aware time-major training forward: time-major twin of
    :func:`bilstm2_forward_resid_masked` (residual streams stay in the
    kernel layout either way; only the public outs skip the swapaxes)."""
    T, R, _ = x.shape
    o0, o1, hp0, cp0, tc0, hp1, cp1, tc1, xk = _bilstm2_core_tm(
        x, w_ih2, b2, w_hh2, _RESID_ROW_TILE, 5, True, lens=lens)
    return (o0[:T, :R], o1[:T, :R]), (xk, hp0, cp0, tc0, hp1, cp1, tc1)


# ---------------------------------------------------------------------------
# Batch-major bilstm2: the kernel consumes x [R, T, F] and produces
# [R, T, H] per direction DIRECTLY — the BlockSpec index maps walk the time
# axis in place of the host-side swapaxes. Motivation (flagship B=32 x 10 s
# inference profile, 2026-08-18): the time-major kernels' outputs land in
# {2,0,1} minor-to-major, so every scan was followed by a concatenate
# materialized as pad_maximum_fusion (~16 ms) plus a {2,0,1}->{2,1,0} relayout
# copy (~16 ms) before the next Dense — 2x the scan kernel's own time, ~30% of
# the whole forward across 12 scans.
#
# MEASURED OUTCOME: NEGATIVE — kept opt-in (TSS_BM=1) as tested
# infrastructure. With time as the block's second-minor dim, each sub-step
# slice x[:, u, :] cuts across the (8, 128) native VMEM tiles, so Mosaic
# retiles every sub-step: the kernel plateaus at ~70 ms (flagship intra
# shape, every (unroll, row_tile) in {8,16,32}x{64..256}) vs 30 ms for the
# time-major kernel, and e2e 324.6x vs 375.3x realtime despite eliminating
# the concat+relayout glue. Numerics are bitwise-identical to the time-major
# kernel. Pallas constraint: the time block (second-minor) must be a multiple
# of 8, so T pads up to the unroll multiple with in-kernel dir-1 masking.
# ---------------------------------------------------------------------------


def _bilstm2_bm_kernel(x0_ref, x1_ref, wih_ref, whh_ref, b_ref,
                       o0_ref, o1_ref, h0s, c0s, h1s, c1s,
                       *, hidden: int, unroll: int, n_t: int, pad: int):
    """Batch-major twin of `_bilstm2_kernel` (inference only): blocks are
    (tile, u, F/H), sub-steps index the MIDDLE axis. Same math, same masking
    of dir-1's pad sub-steps (forward-END padding = dir-1 scan START)."""
    t = pl.program_id(1)
    H = hidden
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        h0s[:] = jnp.zeros_like(h0s)
        c0s[:] = jnp.zeros_like(c0s)
        h1s[:] = jnp.zeros_like(h1s)
        c1s[:] = jnp.zeros_like(c1s)

    h0 = h0s[:]
    c0 = c0s[:]
    h1 = h1s[:]
    c1 = c1s[:]
    for u in range(unroll):
        # ---- dir 0: forward time, ascending sub-steps
        x_t = x0_ref[:, u, :]
        g = jnp.dot(x_t, wih_ref[0], preferred_element_type=f32)
        g = g + jnp.dot(h0.astype(x_t.dtype), whh_ref[0], preferred_element_type=f32)
        g = g + b_ref[0, 0].astype(f32)
        i = _sigmoid(g[:, :H])
        f = _sigmoid(g[:, H : 2 * H])
        gg = jnp.tanh(g[:, 2 * H : 3 * H])
        o = _sigmoid(g[:, 3 * H :])
        c0 = f * c0 + i * gg
        h0 = (o * jnp.tanh(c0)).astype(x_t.dtype)
        o0_ref[:, u, :] = h0.astype(o0_ref.dtype)

        # ---- dir 1: mirrored block, descending sub-steps
        u1 = unroll - 1 - u
        x_t = x1_ref[:, u1, :]
        g = jnp.dot(x_t, wih_ref[1], preferred_element_type=f32)
        g = g + jnp.dot(h1.astype(x_t.dtype), whh_ref[1], preferred_element_type=f32)
        g = g + b_ref[1, 0].astype(f32)
        i = _sigmoid(g[:, :H])
        f = _sigmoid(g[:, H : 2 * H])
        gg = jnp.tanh(g[:, 2 * H : 3 * H])
        o = _sigmoid(g[:, 3 * H :])
        c1_new = f * c1 + i * gg
        h1_new = (o * jnp.tanh(c1_new)).astype(x_t.dtype)
        if pad and u1 >= unroll - pad:
            valid = t > 0
            c1 = jnp.where(valid, c1_new, c1)
            h1 = jnp.where(valid, h1_new, h1)
        else:
            c1 = c1_new
            h1 = h1_new
        o1_ref[:, u1, :] = h1.astype(o1_ref.dtype)
    h0s[:] = h0
    c0s[:] = c0
    h1s[:] = h1
    c1s[:] = c1


@functools.partial(jax.jit, static_argnames=("row_tile", "unroll"))
def bilstm2_forward_bm(x, w_ih2, b2, w_hh2, row_tile: int = 512, unroll: int = 8):
    """Inference: x [B, T, F] -> (out0, out1) each [B, T, H], both in forward
    time, computed and written batch-major — zero relayouts on either side.

    The time axis is the block's second-to-last dim, so Pallas requires the
    unroll (= time block size) be a multiple of 8; T is padded up to the
    unroll multiple and the pad sub-steps are masked in-kernel for dir 1."""
    B, T, F = x.shape
    H = w_hh2.shape[1]
    u = max(8, _round_up(unroll, 8))
    Tp = _round_up(T, u)
    pad = Tp - T
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Rp = _round_up(max(B, 8), 8)
    tile = min(row_tile, Rp)
    if Rp % tile:
        # exact-divisor tile over row padding (same policy as the tm core)
        for cand in range(tile - tile % 8, 95, -8):
            if Rp % cand == 0:
                tile = cand
                break
    Rp = _round_up(Rp, tile)
    if Rp != B:
        x = jnp.pad(x, ((0, Rp - B), (0, 0), (0, 0)))
    r_tiles = Rp // tile
    n_t = Tp // u
    grid = (r_tiles, n_t)

    def fmap(r, t):
        return (r, t, 0)

    def mmap(r, t):
        return (r, n_t - 1 - t, 0)

    def wmap(r, t):
        return (0, 0, 0)

    sblk = pl.BlockSpec((tile, u, H), fmap)
    sblk_m = pl.BlockSpec((tile, u, H), mmap)
    sshape = jax.ShapeDtypeStruct((Rp, Tp, H), x.dtype)
    scratch = [pltpu.VMEM((tile, H), x.dtype), pltpu.VMEM((tile, H), jnp.float32),
               pltpu.VMEM((tile, H), x.dtype), pltpu.VMEM((tile, H), jnp.float32)]
    o0, o1 = pl.pallas_call(
        functools.partial(_bilstm2_bm_kernel, hidden=H, unroll=u, n_t=n_t, pad=pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, u, F), fmap),
            pl.BlockSpec((tile, u, F), mmap),
            pl.BlockSpec((2, F, 4 * H), wmap),
            pl.BlockSpec((2, H, 4 * H), wmap),
            pl.BlockSpec((2, 1, 4 * H), wmap),
        ],
        out_specs=(sblk, sblk_m),
        out_shape=(sshape, sshape),
        scratch_shapes=scratch,
    )(x, x, w_ih2, w_hh2, b2[:, None, :])
    if Rp != B or Tp != T:
        o0, o1 = o0[:B, :T], o1[:B, :T]
    return o0, o1


@functools.partial(jax.jit, static_argnames=())
def bilstm2_forward_resid_tm(x, w_ih2, b2, w_hh2):
    """Training forward, time-major: x [T, R, F] -> ((o0, o1) [T, R, H],
    padded kernel-layout residuals)."""
    T, R, _ = x.shape
    o0, o1, hp0, cp0, tc0, hp1, cp1, tc1, xk = _bilstm2_core_tm(
        x, w_ih2, b2, w_hh2, _RESID_ROW_TILE, 5, True)
    if o0.shape[0] != T or o0.shape[1] != R:
        o0, o1 = o0[:T, :R], o1[:T, :R]
    return (o0, o1), (xk, hp0, cp0, tc0, hp1, cp1, tc1)


def _bilstm2_bwd_kernel(x0_ref, x1_ref, hp0_ref, cp0_ref, tc0_ref, g0_ref,
                        hp1_ref, cp1_ref, tc1_ref, g1_ref, wih_ref, whh_ref,
                        b_ref, *rest, hidden: int, unroll: int,
                        n_t: int, pad: int, masked: bool = False):
    """Reverse pass of _bilstm2_kernel. Dir-0 walks mirrored blocks
    (n_t-1-t, sub-steps descending); dir-1 walks forward blocks (t,
    sub-steps ascending = reverse of its scan). Dir-1's pad tail (last
    block's high sub-steps) is where-masked to zero contributions.

    ``masked``: per-row lengths column [tile, 1] as an extra input — dir-1's
    forward HELD its zero state while j >= len (the state there is the
    constant zero init, a function of nothing), so its backward skips those
    steps per row: no dpre/dx/dw contributions, carries passed through. The
    per-row predicate subsumes the static pad mask (len <= T)."""
    lens_ref = None
    rest = list(rest)
    if masked:
        lens_ref = rest.pop(0)
    (dx0_ref, dx1_ref, dwih0_ref, dwhh0_ref, db0_ref,
     dwih1_ref, dwhh1_ref, db1_ref, dh0s, dc0s, dh1s, dc1s) = rest
    t = pl.program_id(1)
    H = hidden
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        dh0s[:] = jnp.zeros_like(dh0s)
        dc0s[:] = jnp.zeros_like(dc0s)
        dh1s[:] = jnp.zeros_like(dh1s)
        dc1s[:] = jnp.zeros_like(dc1s)
        dwih0_ref[:] = jnp.zeros_like(dwih0_ref)
        dwhh0_ref[:] = jnp.zeros_like(dwhh0_ref)
        db0_ref[:] = jnp.zeros_like(db0_ref)
        dwih1_ref[:] = jnp.zeros_like(dwih1_ref)
        dwhh1_ref[:] = jnp.zeros_like(dwhh1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    def one_dir(x_ref, hp_ref, cp_ref, tc_ref, g_ref, dx_ref, w_i, w_h, bias,
                dh_c, dc_c, dwih, dwhh, db, sub_steps, mask_fn):
        for u in sub_steps:
            x_t = x_ref[u, :, :]
            h_prev = hp_ref[u, :, :]
            c_prev = cp_ref[u, :, :]
            tc = tc_ref[u, :, :].astype(f32)
            g_t = g_ref[u, :, :]
            gates = jnp.dot(x_t, w_i, preferred_element_type=f32)
            gates = gates + jnp.dot(h_prev, w_h, preferred_element_type=f32)
            gates = gates + bias.astype(f32)
            i = _sigmoid(gates[:, :H])
            f = _sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = _sigmoid(gates[:, 3 * H :])
            dh = g_t.astype(f32) + dh_c
            dc = dc_c + dh * (o * (1.0 - tc * tc))
            dpre = jnp.concatenate(
                [
                    dc * (g * i * (1.0 - i)),
                    dc * (c_prev.astype(f32) * f * (1.0 - f)),
                    dc * (i * (1.0 - g * g)),
                    dh * (tc * o * (1.0 - o)),
                ],
                axis=-1,
            )
            m = mask_fn(u)
            if m is not None:
                dpre = jnp.where(m, dpre, 0.0)
            dpre_s = dpre.astype(x_t.dtype)
            dh_new = jax.lax.dot_general(
                dpre_s, w_h, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            dc_new = dc * f
            if m is not None:
                dh_c = jnp.where(m, dh_new, dh_c)
                dc_c = jnp.where(m, dc_new, dc_c)
            else:
                dh_c = dh_new
                dc_c = dc_new
            dx_ref[u, :, :] = jax.lax.dot_general(
                dpre_s, w_i, (((1,), (1,)), ((), ())), preferred_element_type=f32
            ).astype(dx_ref.dtype)
            dwih = dwih + jax.lax.dot_general(
                x_t, dpre_s, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )
            dwhh = dwhh + jax.lax.dot_general(
                h_prev, dpre_s, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )
            db = db + jnp.sum(dpre, axis=0)
        return dh_c, dc_c, dwih, dwhh, db

    # dir 0: pad tail is processed FIRST (t==0 -> mirrored block n_t-1) with
    # zero cotangents and zero carries -> contributions vanish on their own
    dh, dc, dwih, dwhh, db = one_dir(
        x0_ref, hp0_ref, cp0_ref, tc0_ref, g0_ref, dx0_ref,
        wih_ref[0], whh_ref[0], b_ref[0, 0],
        dh0s[:], dc0s[:], dwih0_ref[0], dwhh0_ref[0], db0_ref[0, 0],
        range(unroll - 1, -1, -1), lambda u: None,
    )
    dh0s[:] = dh
    dc0s[:] = dc
    dwih0_ref[0] = dwih
    dwhh0_ref[0] = dwhh
    db0_ref[0, 0] = db

    # dir 1: its backward ENDS in the pad tail (t == n_t-1, high sub-steps)
    # with a live carry -> mask those contributions explicitly
    def mask1(u):
        if masked:
            # held forward steps (j >= len[row]) contribute nothing: their
            # output was the constant zero init
            return (t * unroll + u) < lens_ref[:, :]
        if pad and u >= unroll - pad:
            return t < n_t - 1
        return None

    dh, dc, dwih, dwhh, db = one_dir(
        x1_ref, hp1_ref, cp1_ref, tc1_ref, g1_ref, dx1_ref,
        wih_ref[1], whh_ref[1], b_ref[1, 0],
        dh1s[:], dc1s[:], dwih1_ref[0], dwhh1_ref[0], db1_ref[0, 0],
        range(unroll), mask1,
    )
    dh1s[:] = dh
    dc1s[:] = dc
    dwih1_ref[0] = dwih
    dwhh1_ref[0] = dwhh
    db1_ref[0, 0] = db


@functools.partial(jax.jit, static_argnames=())
def bilstm2_backward(xk, hp0, cp0, tc0, hp1, cp1, tc1, g0, g1,
                     w_ih2, b2, w_hh2):
    """g0/g1 [B, T, H] (forward time) -> (dx [B, T, F], dw_ih2 [2, F, 4H],
    db2 [2, 4H], dw_hh2 [2, H, 4H])."""
    B, T = g0.shape[0], g0.shape[1]
    g0k = jnp.swapaxes(g0, 0, 1)
    g1k = jnp.swapaxes(g1, 0, 1)
    dx, dw_ih2, db2, dw_hh2 = bilstm2_backward_tm(
        xk, hp0, cp0, tc0, hp1, cp1, tc1, g0k, g1k, w_ih2, b2, w_hh2,
        T=T, R=B)
    return jnp.swapaxes(dx, 0, 1), dw_ih2, db2, dw_hh2


@functools.partial(jax.jit, static_argnames=("T", "R"))
def bilstm2_backward_tm(xk, hp0, cp0, tc0, hp1, cp1, tc1, g0k, g1k,
                        w_ih2, b2, w_hh2, T: int, R: int, lens=None):
    """Time-major backward: g0k/g1k [T, R, H] (forward time) ->
    (dx [T, R, F], dw_ih2 [2, F, 4H], db2 [2, 4H], dw_hh2 [2, H, 4H]).
    ``lens`` [R]: mask-aware variant (see _bilstm2_bwd_kernel)."""
    Tp, Rp, F = xk.shape
    H = w_hh2.shape[1]
    B = R
    f32 = jnp.float32
    u = _pick_unroll(Tp, 5)
    pad = Tp - T

    def prep_g(gk):
        if Tp != T or Rp != B:
            gk = jnp.pad(gk, ((0, Tp - T), (0, Rp - B), (0, 0)))
        return gk

    g0k = prep_g(g0k)
    g1k = prep_g(g1k)
    # 128-row tiles: this kernel streams 12 double-buffered block operands
    # (2x x, 2x3 resid, 2 g, 2 dx) — 256-row tiles overflow the 16 MB VMEM
    # scoped limit in fp32 (measured: 16.5 MB)
    tile = min(128, Rp)
    if Rp % tile:
        # the resid forward (_RESID_ROW_TILE=256) pads Rp only to a multiple
        # of 8 when R <= 256, so 128 need not divide Rp; truncating the grid
        # (Rp // tile) would silently drop the tail rows' gradients. Fall
        # back to the largest multiple-of-8 divisor of Rp (Rp is always a
        # multiple of 8, so 8 itself always qualifies).
        tile = next(c for c in range(tile - tile % 8, 7, -8) if Rp % c == 0)
    r_tiles = Rp // tile
    n_t = Tp // u
    grid = (r_tiles, n_t)

    def fmap(r, t):
        return (t, r, 0)

    def mmap(r, t):
        return (n_t - 1 - t, r, 0)

    def wmap(r, t):
        return (0, 0, 0)

    def amap(r, t):
        return (r, 0, 0)

    sf = pl.BlockSpec((u, tile, H), fmap)
    sm = pl.BlockSpec((u, tile, H), mmap)
    in_specs = [
        pl.BlockSpec((u, tile, F), mmap),   # x for dir-0 bwd
        pl.BlockSpec((u, tile, F), fmap),   # x for dir-1 bwd
        sm, sm, sm, sm,                      # hp0 cp0 tc0 g0 (mirrored)
        sf, sf, sf, sf,                      # hp1 cp1 tc1 g1 (forward)
        pl.BlockSpec((2, F, 4 * H), wmap),
        pl.BlockSpec((2, H, 4 * H), wmap),
        pl.BlockSpec((2, 1, 4 * H), wmap),
    ]
    operands = [xk, xk, hp0, cp0, tc0, g0k, hp1, cp1, tc1, g1k,
                w_ih2, w_hh2, b2[:, None, :]]
    masked = lens is not None
    if masked:
        in_specs.append(pl.BlockSpec((tile, 1), lambda r, t: (r, 0)))
        operands.append(_lens_column(lens, B, Rp, Tp))
    outs = pl.pallas_call(
        functools.partial(_bilstm2_bwd_kernel, hidden=H, unroll=u, n_t=n_t,
                          pad=pad, masked=masked),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((u, tile, F), mmap),
            pl.BlockSpec((u, tile, F), fmap),
            pl.BlockSpec((1, F, 4 * H), amap),
            pl.BlockSpec((1, H, 4 * H), amap),
            pl.BlockSpec((1, 1, 4 * H), amap),
            pl.BlockSpec((1, F, 4 * H), amap),
            pl.BlockSpec((1, H, 4 * H), amap),
            pl.BlockSpec((1, 1, 4 * H), amap),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Rp, F), xk.dtype),
            jax.ShapeDtypeStruct((Tp, Rp, F), xk.dtype),
            jax.ShapeDtypeStruct((r_tiles, F, 4 * H), f32),
            jax.ShapeDtypeStruct((r_tiles, H, 4 * H), f32),
            jax.ShapeDtypeStruct((r_tiles, 1, 4 * H), f32),
            jax.ShapeDtypeStruct((r_tiles, F, 4 * H), f32),
            jax.ShapeDtypeStruct((r_tiles, H, 4 * H), f32),
            jax.ShapeDtypeStruct((r_tiles, 1, 4 * H), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, H), f32), pltpu.VMEM((tile, H), f32),
            pltpu.VMEM((tile, H), f32), pltpu.VMEM((tile, H), f32),
        ],
    )(*operands)
    dx0, dx1, dwih0, dwhh0, db0, dwih1, dwhh1, db1 = outs
    dx = (dx0 + dx1)[:T, :B]  # [T, R, F]
    dw_ih2 = jnp.stack([jnp.sum(dwih0, 0), jnp.sum(dwih1, 0)])
    dw_hh2 = jnp.stack([jnp.sum(dwhh0, 0), jnp.sum(dwhh1, 0)])
    db2 = jnp.stack([jnp.sum(db0, (0, 1)), jnp.sum(db1, (0, 1))])
    return dx, dw_ih2, db2, dw_hh2
