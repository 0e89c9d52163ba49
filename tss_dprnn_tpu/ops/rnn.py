"""Bidirectional LSTM as a single fused ``lax.scan``.

Replaces the reference's cuDNN ``nn.LSTM`` (src/models/dprnn.py:7-37
SingleRNN) — the hot kernel of the whole framework: every DPRNN block runs an
intra-chunk BiLSTM over K steps on B*S sequences and an inter-chunk (Bi)LSTM
over S steps on B*K sequences (src/models/dprnn.py:79-99).

TPU-first design:

- the input projection ``x @ W_ih^T + b`` for *all* timesteps and *both*
  directions is hoisted out of the scan into one large MXU matmul
  ([T*B, F] x [F, 8H]);
- both directions run in a single ``lax.scan``: the backward direction's input
  is (mask-aware) time-flipped and stacked on a leading direction axis, so
  each scan step does one batched matmul ([2, B, H] x [2, H, 4H]) instead of
  two scans with half the batch;
- the recurrent matmul accumulates in fp32 (``preferred_element_type``), gate
  nonlinearities fuse into it on the VPU.

Gate order follows torch (i, f, g, o) so converted checkpoints are exact.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tss_dprnn_tpu.ops.masking import masked_flip

# 'xla' (lax.scan, default) | 'pallas' (fused TPU kernel — see
# ops/pallas_lstm.py). Both are differentiable: the hand-written backward in
# _recurrence consumes (hs, cs) from either forward.
_LSTM_BACKEND: contextvars.ContextVar = contextvars.ContextVar("lstm_backend", default="xla")

# Residual policy for the custom VJP: 1 (default) saves (h, c) for every step
# — fastest backward; Q > 1 saves them only at every Q-th step and
# re-runs each Q-step segment's forward inside the backward. Residual memory
# drops T/Q-fold and the 4H-wide batched gate recompute shrinks to one
# segment at a time — the flagship fp32 full-batch train step goes from a
# 20.3 GB HBM requirement (OOM on a 16 GB v5e) to fitting, at ~1 extra
# sequential forward of cost in the backward.
_LSTM_SAVE_EVERY: contextvars.ContextVar = contextvars.ContextVar("lstm_save_every", default=1)


@contextlib.contextmanager
def lstm_backend(name: str):
    token = _LSTM_BACKEND.set(name)
    try:
        yield
    finally:
        _LSTM_BACKEND.reset(token)


@contextlib.contextmanager
def lstm_save_every(q: int):
    token = _LSTM_SAVE_EVERY.set(max(1, int(q)))
    try:
        yield
    finally:
        _LSTM_SAVE_EVERY.reset(token)


# Scheduling pragma (trainer config `schedule_masks: true`): treat `lengths`
# as None inside the scans while the rest of the graph keeps its mask ops.
# ONLY valid when every row is full-length (training's fixed crops) — values
# then agree up to float reduction order (masked norms reduce as sum(x*m)/n
# vs mean(x); NOT bitwise), and the mask elementwise ops nudge XLA into a
# measurably better fusion/layout plan (ROUND_NOTES session 10: the masked
# inference graph beats the unmasked one by ~10% on pure glue; threading
# all-ones masks through the TRAIN graph with unmasked scans reproduced
# 113.9 vs 118.4/118.8 ms/step on the flagship, 2x measured 2026-08-20).
_LSTM_IGNORE_LENGTHS: contextvars.ContextVar = contextvars.ContextVar(
    "lstm_ignore_lengths", default=False)


@contextlib.contextmanager
def lstm_ignore_lengths(on: bool = True):
    token = _LSTM_IGNORE_LENGTHS.set(bool(on))
    try:
        yield
    finally:
        _LSTM_IGNORE_LENGTHS.reset(token)


def current_lstm_backend() -> str:
    return _LSTM_BACKEND.get()


# Time-major layout opt-in (see lstm_time_major_available): inference
# entry points (Inferencer, bench) set this for the bf16+pallas fast lane,
# where it is a measured win since the bf16-resident norm apply (round 5:
# masked 426 -> 437x, unmasked 413 -> 439x at flagship B=32). Training and
# the fp32 lanes keep the batch-major default (tm was a measured LOSS there
# on the pre-round-5 plans and is unmeasured since). TSS_TM=1/0 force-
# overrides either way.
_LSTM_TM: contextvars.ContextVar = contextvars.ContextVar("lstm_tm", default=False)


@contextlib.contextmanager
def lstm_time_major(on: bool = True):
    token = _LSTM_TM.set(bool(on))
    try:
        yield
    finally:
        _LSTM_TM.reset(token)


class LSTMWeights(NamedTuple):
    """Weights for one direction, torch layouts already transposed for x @ W:

    w_ih: [F, 4H]   (torch weight_ih_l0 is [4H, F])
    w_hh: [H, 4H]   (torch weight_hh_l0 is [4H, H])
    b:    [4H]      (torch bias_ih_l0 + bias_hh_l0)
    """

    w_ih: jax.Array
    w_hh: jax.Array
    b: jax.Array


def _cell_batch(h, c, gates):
    """gates: [..., 4H] pre-activations in torch order i,f,g,o."""
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _recurrence(save_every, xx, w_ih, b, w_hh):
    """The full (multi-direction) LSTM with a memory-lean hand-written
    backward (cuDNN-style).

    save_every: static int residual policy (see ``lstm_save_every``) — a
    plain argument (not the contextvar) because jax traces the backward
    *after* the forward returns, outside any ``with`` block around the model
    call, and the residual layout must agree between the two.
    xx: [D, B, T, F] stacked direction inputs (backward direction pre-
    flipped); w_ih: [D, F, 4H]; b: [D, 4H]; w_hh: [D, H, 4H].
    Returns hs [T, D, B, H].

    jax's autodiff of ``lax.scan`` checkpoints every per-step intermediate
    (gate activations, 4H-wide pre-activations, ...) — ~40 GB for one
    flagship batch-5 train step, far past a v5e's HBM. This VJP saves only
    the inputs plus (h, c) per step (or per segment, save_every > 1) and
    recomputes the input projection and gate activations in batched
    (non-sequential) form inside the backward.
    """
    if _LSTM_BACKEND.get() == "pallas":
        from tss_dprnn_tpu.ops.pallas_lstm import lstm_forward

        return lstm_forward(xx, w_ih, b, w_hh)
    xp = _input_proj(xx, w_ih, b)
    hs, _ = _recurrence_fwd_scan(xp, w_hh)
    return hs


def _input_proj(xx, w_ih, b):
    # [D, B, T, F] @ [D, F, 4H] -> time-major [T, D, B, 4H]
    return jnp.einsum("dbtf,dfg->tdbg", xx, w_ih) + b[None, :, None, :]


def _recurrence_fwd_scan(xp, w_hh, h0=None, c0=None):
    D, B, H = xp.shape[1], xp.shape[2], w_hh.shape[1]
    if h0 is None:
        h0 = jnp.zeros((D, B, H), xp.dtype)
    if c0 is None:
        c0 = jnp.zeros((D, B, H), jnp.float32)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jax.lax.dot_general(
            h, w_hh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(xp_t.dtype)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f.astype(jnp.float32) * c + (i * g).astype(jnp.float32)
        h = (o.astype(jnp.float32) * jnp.tanh(c)).astype(xp_t.dtype)
        return (h, c), (h, c)

    (_, _), (hs, cs) = jax.lax.scan(step, (h0, c0), xp)
    return hs, cs


def _recurrence_vjp_fwd(save_every, xx, w_ih, b, w_hh):
    if _LSTM_BACKEND.get() == "pallas":
        if save_every <= 1:
            # fused-backward path: the forward emits (h_prev, c_prev,
            # tanh(c)) residual streams in padded kernel layout so the
            # backward kernel runs with ZERO host-side re-layout (no flips/
            # pads/concats — they were half the train step, see
            # pallas_lstm.py's backward section)
            from tss_dprnn_tpu.ops.pallas_lstm import lstm_forward_resid

            hs, xk, hp, cp, tc = lstm_forward_resid(xx, w_ih, b, w_hh)
            return hs, (xk, hp, cp, tc, w_ih, b, w_hh)
        from tss_dprnn_tpu.ops.pallas_lstm import lstm_forward_with_cs

        hs, cs = lstm_forward_with_cs(xx, w_ih, b, w_hh)
    else:
        xp = _input_proj(xx, w_ih, b)
        hs, cs = _recurrence_fwd_scan(xp, w_hh)
    # NB: xp is NOT a residual — recomputed in bwd; residual cost is the
    # F-wide input instead of the 4H-wide projection
    q = save_every
    if q <= 1:
        return hs, (xx, w_ih, b, w_hh, hs, cs)
    # segment-checkpointed residuals: keep only the states *entering* each
    # q-step segment (zeros for segment 0, h/c after step s*q-1 for s >= 1);
    # the dense hs/cs become transients the compiler can free
    import numpy as np

    T = hs.shape[0]
    idx = np.arange(q - 1, T - 1, q)
    bh = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[idx]], axis=0)
    bc = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[idx]], axis=0)
    return hs, (xx, w_ih, b, w_hh, bh, bc)


def _bwd_steps(xp, h_prev, c_prev, cs, g_hs, w_hh, dh_tail, dc_tail):
    """Reverse-mode gradients for a contiguous run of steps.

    xp [t, D, B, 4H] pre-activations (input projection incl. bias);
    h_prev/c_prev [t, D, B, H] states entering each step; cs [t, D, B, H]
    (fp32) states after each step; g_hs [t, D, B, H] output cotangents;
    dh_tail/dc_tail [D, B, H] (fp32) cotangents flowing in from later steps.
    Returns (dh_entry, dc_entry, dxp [t, D, B, 4H]).
    """
    H = w_hh.shape[1]
    f32 = jnp.float32
    cdt = xp.dtype

    # recompute gate activations for all steps in one batched matmul +
    # elementwise pass (transient, freed after the scan) — keeping this out
    # of the sequential loop is what makes bwd ~2x fwd instead of ~15x
    gates = xp + jnp.einsum("tdbh,dhg->tdbg", h_prev, w_hh).astype(cdt)
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    tc = jnp.tanh(cs.astype(f32)).astype(cdt)
    # per-step factors (elementwise, vectorized over t)
    d_i = (g * i * (1 - i)).astype(cdt)
    d_f = (c_prev.astype(f32).astype(cdt) * f * (1 - f)).astype(cdt)
    d_g = (i * (1 - g * g)).astype(cdt)
    d_o = (tc * o * (1 - o)).astype(cdt)
    dcdh = (o * (1 - tc * tc)).astype(cdt)  # ∂c-path factor of dh
    fgate = f.astype(f32)

    def step(carry, inp):
        dh_next, dc_next = carry
        gh, d_i_t, d_f_t, d_g_t, d_o_t, dcdh_t, f_t = inp
        dh = gh.astype(f32) + dh_next
        dc = dc_next + dh * dcdh_t.astype(f32)
        dpre = jnp.concatenate(
            [
                (dc * d_i_t.astype(f32)).astype(cdt),
                (dc * d_f_t.astype(f32)).astype(cdt),
                (dc * d_g_t.astype(f32)).astype(cdt),
                (dh * d_o_t.astype(f32)).astype(cdt),
            ],
            axis=-1,
        )  # [D, B, 4H]
        dh_prev = jax.lax.dot_general(
            dpre, w_hh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        dc_prev = dc * f_t
        return (dh_prev, dc_prev), dpre

    (dh_e, dc_e), dxp = jax.lax.scan(
        step, (dh_tail, dc_tail), (g_hs, d_i, d_f, d_g, d_o, dcdh, fgate), reverse=True
    )
    return dh_e, dc_e, dxp


def _recurrence_vjp_bwd(save_every, res, g_hs):
    q = save_every
    f32 = jnp.float32
    if q <= 1:
        if _LSTM_BACKEND.get() == "pallas":
            from tss_dprnn_tpu.ops.pallas_lstm import lstm_backward

            xk, hp, cp, tc, w_ih, b, w_hh = res
            dxx, dw_ih, db, dw_hh = lstm_backward(xk, hp, cp, tc, g_hs, w_ih, b, w_hh)
            return (
                dxx.astype(xk.dtype),
                dw_ih.astype(w_ih.dtype),
                db.astype(b.dtype),
                dw_hh.astype(w_hh.dtype),
            )
        xx, w_ih, b, w_hh, hs, cs = res
        xp = _input_proj(xx, w_ih, b)
        D, B, H = hs.shape[1], hs.shape[2], hs.shape[3]
        # shifted previous-state sequences (step 0 starts from zeros)
        h_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
        c_prev = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
        zero = jnp.zeros((D, B, H), f32)
        _, _, dxp = _bwd_steps(xp, h_prev, c_prev, cs, g_hs, w_hh, zero, zero)
        # weight/bias/input grads in batched contractions over all steps
        dw_hh = jnp.einsum("tdbh,tdbg->dhg", h_prev.astype(f32), dxp.astype(f32))
        dxx = jnp.einsum("tdbg,dfg->dbtf", dxp, w_ih)
        dw_ih = jnp.einsum("dbtf,tdbg->dfg", xx.astype(f32), dxp.astype(f32))
        db = jnp.sum(dxp.astype(f32), axis=(0, 2))
        return (
            dxx.astype(xx.dtype),
            dw_ih.astype(w_ih.dtype),
            db.astype(b.dtype),
            dw_hh.astype(w_hh.dtype),
        )

    # ---------------- segment-checkpointed backward (lstm_save_every > 1):
    # reverse lax.scan over S = ceil(T/q) segments; each iteration re-runs the
    # q-step forward from the saved boundary state, then runs the same
    # batched-gate reverse core on just that segment. Peak extra memory is
    # one segment's transients instead of the whole sequence's.
    xx, w_ih, b, w_hh, bh, bc = res
    D, B, T, F = xx.shape
    H = bh.shape[-1]
    S = bh.shape[0]
    Tp = S * q
    if Tp != T:  # zero-pad the tail segment (zero cotangents -> zero grads)
        xx_p = jnp.pad(xx, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        g_p = jnp.pad(g_hs, ((0, Tp - T), (0, 0), (0, 0), (0, 0)))
    else:
        xx_p, g_p = xx, g_hs
    xx_seg = jnp.transpose(xx_p.reshape(D, B, S, q, F), (2, 0, 1, 3, 4))  # [S,D,B,q,F]
    g_seg = g_p.reshape(S, q, D, B, H)

    def seg(carry, inp):
        dh_next, dc_next = carry
        xx_s, g_s, h_in, c_in = inp
        xp_s = _input_proj(xx_s, w_ih, b)  # [q, D, B, 4H]
        hs_s, cs_s = _recurrence_fwd_scan(xp_s, w_hh, h_in, c_in)
        h_prev = jnp.concatenate([h_in[None], hs_s[:-1]], axis=0)
        c_prev = jnp.concatenate([c_in[None], cs_s[:-1]], axis=0)
        dh_e, dc_e, dxp_s = _bwd_steps(
            xp_s, h_prev, c_prev, cs_s, g_s, w_hh, dh_next, dc_next
        )
        dwhh_s = jnp.einsum("tdbh,tdbg->dhg", h_prev.astype(f32), dxp_s.astype(f32))
        dwih_s = jnp.einsum("dbtf,tdbg->dfg", xx_s.astype(f32), dxp_s.astype(f32))
        db_s = jnp.sum(dxp_s.astype(f32), axis=(0, 2))
        dxx_s = jnp.einsum("tdbg,dfg->dbtf", dxp_s, w_ih)
        return (dh_e, dc_e), (dxx_s, dwih_s, dwhh_s, db_s)

    zero = jnp.zeros((D, B, H), f32)
    (_, _), (dxx_seg, dwih_seg, dwhh_seg, db_seg) = jax.lax.scan(
        seg, (zero, zero), (xx_seg, g_seg, bh, bc.astype(f32)), reverse=True
    )
    dxx = jnp.transpose(dxx_seg, (1, 2, 0, 3, 4)).reshape(D, B, Tp, F)[:, :, :T]
    return (
        dxx.astype(xx.dtype),
        jnp.sum(dwih_seg, axis=0).astype(w_ih.dtype),
        jnp.sum(db_seg, axis=0).astype(b.dtype),
        jnp.sum(dwhh_seg, axis=0).astype(w_hh.dtype),
    )


_recurrence.defvjp(_recurrence_vjp_fwd, _recurrence_vjp_bwd)


@jax.custom_vjp
def _recurrence3(x, w_ih2, b2, w_hh2):
    """No-stack bidirectional pallas path (lengths=None only): both
    directions in one kernel sweep via static mirrored index maps — the
    [2, B, T, F] stacked input, its time flip, and the output flip never
    exist (see pallas_lstm.py bilstm2 section). Returns (out_f, out_b), both
    [B, T, H] in FORWARD time.

    A BATCH-MAJOR kernel variant (blocks walk the time axis in the public
    [R, T, F] layout; pallas_lstm.bilstm2_forward_bm) is available via
    ``TSS_BM=1`` but is a measured NET LOSS (2026-08-18): with time as the
    block's second-minor dim every sub-step slice ``x[:, u, :]`` cuts across
    the (8, 128) VMEM tiles, so Mosaic retiles per sub-step — the kernel
    plateaus at ~70 ms at the flagship intra shape vs 30 ms time-major for
    every (unroll, row_tile) in {8,16,32}x{64..256}, and e2e 324.6x vs
    375.3x realtime even though it eliminates the ~32 ms/scan concat+relayout
    glue the time-major outputs incur. Fourth confirmation of the layout
    lesson: keep the scan's hot loop sublane-aligned (time-major) and let XLA
    pay the public-layout conversion."""
    import os

    if os.environ.get("TSS_BM", "0") == "1":
        from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_bm

        return bilstm2_forward_bm(x, w_ih2, b2, w_hh2)
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward

    return bilstm2_forward(x, w_ih2, b2, w_hh2)


def _recurrence3_vjp_fwd(x, w_ih2, b2, w_hh2):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_resid

    outs, resid = bilstm2_forward_resid(x, w_ih2, b2, w_hh2)
    return outs, (*resid, w_ih2, b2, w_hh2)


def _recurrence3_vjp_bwd(res, g):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_backward

    xk, hp0, cp0, tc0, hp1, cp1, tc1, w_ih2, b2, w_hh2 = res
    g0, g1 = g
    dx, dw_ih2, db2, dw_hh2 = bilstm2_backward(
        xk, hp0, cp0, tc0, hp1, cp1, tc1, g0, g1, w_ih2, b2, w_hh2
    )
    return (
        dx.astype(xk.dtype),
        dw_ih2.astype(w_ih2.dtype),
        db2.astype(b2.dtype),
        dw_hh2.astype(w_hh2.dtype),
    )


_recurrence3.defvjp(_recurrence3_vjp_fwd, _recurrence3_vjp_bwd)


def _zero_lens_cotangent(lens):
    if jnp.issubdtype(lens.dtype, jnp.floating):
        return jnp.zeros_like(lens)
    import numpy as _np

    return _np.zeros(lens.shape, jax.dtypes.float0)


@jax.custom_vjp
def _recurrence3_masked(x, lens, w_ih2, b2, w_hh2):
    """Mask-aware no-stack bidirectional pallas path: dir-1 starts each row's
    backward scan at its own length via a per-row in-kernel predicate — the
    bucketed-eval (masked) lane's inter scans previously paid a [2, B, T, F]
    stack plus TWO masked_flip permutation-matmuls per scan on top of the
    stacked kernel (round-2 VERDICT weak #2). Values on t < len match
    ``_masked_pair_stacked``; t >= len is 0 for dir-1 / garbage for dir-0
    (masked downstream — same contract as lstm()). Fully differentiable:
    the VJP runs the masked resid forward + masked backward kernels
    (variable-length training at fast-path speed — a capability the
    fixed-crop reference has no counterpart for). Dir-1 cotangents at
    t >= len refer to the constant zero output and are correctly discarded;
    in-model they are exactly zero anyway (every consumer masks)."""
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_masked

    return bilstm2_forward_masked(x, lens, w_ih2, b2, w_hh2)


def _recurrence3_masked_vjp_fwd(x, lens, w_ih2, b2, w_hh2):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_resid_masked

    outs, resid = bilstm2_forward_resid_masked(x, lens, w_ih2, b2, w_hh2)
    return outs, (*resid, lens, w_ih2, b2, w_hh2)


def _recurrence3_masked_vjp_bwd(res, g):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_backward_masked

    xk, hp0, cp0, tc0, hp1, cp1, tc1, lens, w_ih2, b2, w_hh2 = res
    g0, g1 = g
    dx, dw_ih2, db2, dw_hh2 = bilstm2_backward_masked(
        xk, hp0, cp0, tc0, hp1, cp1, tc1, g0, g1, w_ih2, b2, w_hh2, lens
    )
    return (
        dx.astype(xk.dtype),
        _zero_lens_cotangent(lens),
        dw_ih2.astype(w_ih2.dtype),
        db2.astype(b2.dtype),
        dw_hh2.astype(w_hh2.dtype),
    )


_recurrence3_masked.defvjp(_recurrence3_masked_vjp_fwd, _recurrence3_masked_vjp_bwd)


@jax.custom_vjp
def _recurrence3_tm(x, w_ih2, b2, w_hh2):
    """Time-major no-stack bidirectional pallas path: x [T, R, F] ->
    (out_f, out_b) each [T, R, H], both in forward time. The caller keeps its
    tensors in the kernel's own layout, so no transposes surround the scan
    (the batch-major `_recurrence3` spends ~20% of flagship inference on
    them — profiled)."""
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_tm

    return bilstm2_forward_tm(x, w_ih2, b2, w_hh2)


def _recurrence3_tm_vjp_fwd(x, w_ih2, b2, w_hh2):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_resid_tm

    outs, resid = bilstm2_forward_resid_tm(x, w_ih2, b2, w_hh2)
    return outs, (*resid, x.shape[0], x.shape[1], w_ih2, b2, w_hh2)


def _recurrence3_tm_vjp_bwd(res, g):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_backward_tm

    xk, hp0, cp0, tc0, hp1, cp1, tc1, T, R, w_ih2, b2, w_hh2 = res
    g0, g1 = g
    dx, dw_ih2, db2, dw_hh2 = bilstm2_backward_tm(
        xk, hp0, cp0, tc0, hp1, cp1, tc1, g0, g1, w_ih2, b2, w_hh2, T=T, R=R
    )
    return (
        dx.astype(xk.dtype),
        dw_ih2.astype(w_ih2.dtype),
        db2.astype(b2.dtype),
        dw_hh2.astype(w_hh2.dtype),
    )


_recurrence3_tm.defvjp(_recurrence3_tm_vjp_fwd, _recurrence3_tm_vjp_bwd)


@jax.custom_vjp
def _recurrence3_masked_tm(x, lens, w_ih2, b2, w_hh2):
    """Mask-aware time-major pallas path: x [T, R, F], lens [R] ->
    (out_f, out_b) each [T, R, H]. `_recurrence3_masked` without the
    swapaxes pair on either side — the masked kernel core is already
    time-major, so the masked lane can keep the DPRNN block's tensors in
    kernel layout exactly like the unmasked TSS_TM path. Same masked-output
    contract (t >= len: dir-0 garbage, dir-1 zero; consumers mask)."""
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_masked_tm

    return bilstm2_forward_masked_tm(x, lens, w_ih2, b2, w_hh2)


def _recurrence3_masked_tm_vjp_fwd(x, lens, w_ih2, b2, w_hh2):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_resid_masked_tm

    outs, resid = bilstm2_forward_resid_masked_tm(x, lens, w_ih2, b2, w_hh2)
    return outs, (*resid, x.shape[0], x.shape[1], lens, w_ih2, b2, w_hh2)


def _recurrence3_masked_tm_vjp_bwd(res, g):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_backward_tm

    xk, hp0, cp0, tc0, hp1, cp1, tc1, T, R, lens, w_ih2, b2, w_hh2 = res
    g0, g1 = g
    dx, dw_ih2, db2, dw_hh2 = bilstm2_backward_tm(
        xk, hp0, cp0, tc0, hp1, cp1, tc1, g0, g1, w_ih2, b2, w_hh2,
        T=T, R=R, lens=lens)
    return (
        dx.astype(xk.dtype),
        _zero_lens_cotangent(lens),
        dw_ih2.astype(w_ih2.dtype),
        db2.astype(b2.dtype),
        dw_hh2.astype(w_hh2.dtype),
    )


_recurrence3_masked_tm.defvjp(_recurrence3_masked_tm_vjp_fwd,
                              _recurrence3_masked_tm_vjp_bwd)


@jax.custom_vjp
def _recurrence3_dense(x, w_ih2, b2, w_hh2, wo2):
    """No-stack bidirectional pallas path with the SplitDense contraction
    fused into the scan kernel's epilogue: returns (y0, y1), each [B, T, Fo]
    = h_d @ wo2[d], both in forward time. The H-wide scan outputs never reach
    HBM, which kills the {2,0,1}->{2,1,0} relayout copies XLA inserts between
    each scan and its Dense (~94 ms/iter of pure copies at the flagship
    inference shape, profiled 2026-08-18). MEASURED OUTCOME e2e: NET LOSS
    (366.2x vs 373.3x realtime) — the epilogue matmul serializes into the
    elementwise-bound cell loop and costs more than the copies it removes.
    Kept opt-in (TSS_FUSED_DENSE=1), see :func:`lstm_split_dense`."""
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_dense_forward

    return bilstm2_dense_forward(x, w_ih2, b2, w_hh2, wo2)


def _recurrence3_dense_vjp_fwd(x, w_ih2, b2, w_hh2, wo2):
    # training forward: the unfused resid kernel (the backward needs the
    # h-stream residuals anyway); the contraction runs as a plain XLA matmul.
    # Saving (o0, o1) matches the pre-fusion footprint — XLA's autodiff of
    # SplitDense saved them too (dkernel needs them).
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward_resid

    (o0, o1), resid = bilstm2_forward_resid(x, w_ih2, b2, w_hh2)
    y0 = jnp.einsum("bth,hf->btf", o0, wo2[0]).astype(o0.dtype)
    y1 = jnp.einsum("bth,hf->btf", o1, wo2[1]).astype(o1.dtype)
    return (y0, y1), (*resid, o0, o1, w_ih2, b2, w_hh2, wo2)


def _recurrence3_dense_vjp_bwd(res, g):
    from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_backward

    xk, hp0, cp0, tc0, hp1, cp1, tc1, o0, o1, w_ih2, b2, w_hh2, wo2 = res
    gy0, gy1 = g
    f32 = jnp.float32
    g0 = jnp.einsum("btf,hf->bth", gy0, wo2[0]).astype(o0.dtype)
    g1 = jnp.einsum("btf,hf->bth", gy1, wo2[1]).astype(o1.dtype)
    dwo2 = jnp.stack(
        [
            jnp.einsum("bth,btf->hf", o0.astype(f32), gy0.astype(f32)),
            jnp.einsum("bth,btf->hf", o1.astype(f32), gy1.astype(f32)),
        ]
    )
    dx, dw_ih2, db2, dw_hh2 = bilstm2_backward(
        xk, hp0, cp0, tc0, hp1, cp1, tc1, g0, g1, w_ih2, b2, w_hh2
    )
    return (
        dx.astype(xk.dtype),
        dw_ih2.astype(w_ih2.dtype),
        db2.astype(b2.dtype),
        dw_hh2.astype(w_hh2.dtype),
        dwo2.astype(wo2.dtype),
    )


_recurrence3_dense.defvjp(_recurrence3_dense_vjp_fwd, _recurrence3_dense_vjp_bwd)


def lstm_split_dense(x, fwd: LSTMWeights, bwd: LSTMWeights, kernel, lengths=None):
    """BiLSTM -> Dense(2H -> Fo) WITHOUT bias: ``out_f @ kernel[:H] + out_b @
    kernel[H:]`` over [B, T, F] -> [B, T, Fo].

    The in-kernel fused epilogue (:func:`_recurrence3_dense`, contraction in
    the scan kernel itself so the H-wide outputs never reach HBM) is OPT-IN
    via ``TSS_FUSED_DENSE=1``: measured e2e it is a NET LOSS at the flagship
    inference shape (366.2x vs 373.3x realtime, 2026-08-18) — the epilogue
    matmul serializes into the elementwise-bound cell loop and costs more
    than the relayout copies it removes (fifth confirmation of the layout
    lesson: keep the scan hot loop lean, let XLA pay public-layout glue).
    Default path: per-direction pair + plain XLA contraction, identical
    math."""
    import os

    if lengths is not None and _LSTM_IGNORE_LENGTHS.get():
        lengths = None  # schedule_masks pragma: rows are full-length
    H = fwd.w_hh.shape[0]
    if (
        lengths is None
        and _LSTM_BACKEND.get() == "pallas"
        and _LSTM_SAVE_EVERY.get() <= 1
        and os.environ.get("TSS_FUSED_DENSE", "0") == "1"
    ):
        w_ih2 = jnp.stack([fwd.w_ih, bwd.w_ih]).astype(x.dtype)
        b2 = jnp.stack([fwd.b, bwd.b])
        w_hh2 = jnp.stack([fwd.w_hh, bwd.w_hh]).astype(x.dtype)
        wo2 = jnp.stack([kernel[:H], kernel[H:]]).astype(x.dtype)
        y0, y1 = _recurrence3_dense(x, w_ih2, b2, w_hh2, wo2)
        return y0 + y1
    o0, o1 = lstm_pair(x, fwd, bwd, lengths)
    return o0 @ kernel[:H] + o1 @ kernel[H:]


def lstm_time_major_available(bidirectional: bool, lengths) -> bool:
    """True when the time-major fused path applies: bidirectional LSTM on the
    pallas backend without segment checkpointing. Masked runs qualify too
    since round 5 (`_recurrence3_masked_tm` — the masked kernel core was
    already time-major; only the public entry was missing).

    Selection (round-5 re-measurement): the ``lstm_time_major()`` context —
    set by the inference entry points for the bf16+pallas fast lane — turns
    the path on; ``TSS_TM=1``/``TSS_TM=0`` force-override in either
    direction. History: on the pre-round-5 fusion plans tm was a NET LOSS
    (298x vs 311x at B=8, OOM at B=32 — XLA extended live ranges across the
    explicit 4D transposes); after the bf16-resident norm apply changed the
    plan, tm is a measured WIN on both bf16 inference lanes (masked
    426 -> 437x, unmasked 413 -> 439x, B=32 flagship) — see ROUND_NOTES.md."""
    import os

    env = os.environ.get("TSS_TM", "")
    want = _LSTM_TM.get() if env == "" else (env == "1")
    return (
        bidirectional
        and _LSTM_BACKEND.get() == "pallas"
        and _LSTM_SAVE_EVERY.get() <= 1
        and want
    )


def lstm_tm(x, fwd: LSTMWeights, bwd: LSTMWeights):
    """Bidirectional LSTM over time-major [T, R, F] -> [T, R, 2H], zero
    initial state, full-length reversal (lengths=None semantics). Only valid
    when :func:`lstm_time_major_available` — callers fall back to :func:`lstm`
    otherwise."""
    w_ih2 = jnp.stack([fwd.w_ih, bwd.w_ih]).astype(x.dtype)
    b2 = jnp.stack([fwd.b, bwd.b])
    w_hh2 = jnp.stack([fwd.w_hh, bwd.w_hh]).astype(x.dtype)
    out_f, out_b = _recurrence3_tm(x, w_ih2, b2, w_hh2)
    return jnp.concatenate([out_f, out_b], axis=-1)  # [T, R, 2H]


def lstm(x, fwd: LSTMWeights, bwd: Optional[LSTMWeights] = None, lengths=None):
    """(Bi)LSTM over [B, T, F] -> [B, T, H * ndir], zero initial state.

    ``lengths`` ([B] ints or None): when given, the backward direction reads
    each sequence reversed *within its valid length*, matching torch on
    unpadded inputs; forward-direction outputs at padded steps are garbage by
    construction (mask downstream, as the reference's zero-pad chunks are).
    """
    if lengths is not None and _LSTM_IGNORE_LENGTHS.get():
        lengths = None  # schedule_masks pragma: rows are full-length
    B, T, F = x.shape
    H = fwd.w_hh.shape[0]
    if (
        bwd is not None
        and _LSTM_BACKEND.get() == "pallas"
        and _LSTM_SAVE_EVERY.get() <= 1
    ):
        # no-stack fused bidirectional kernel: no input stack/flip, no
        # output flip. Masked sequences take the mask-aware variant (dir-1
        # starts at each row's own length in-kernel).
        w_ih2 = jnp.stack([fwd.w_ih, bwd.w_ih]).astype(x.dtype)
        b2 = jnp.stack([fwd.b, bwd.b])
        w_hh2 = jnp.stack([fwd.w_hh, bwd.w_hh]).astype(x.dtype)
        if lengths is None:
            out_f, out_b = _recurrence3(x, w_ih2, b2, w_hh2)
        else:
            out_f, out_b = _recurrence3_masked(x, lengths, w_ih2, b2, w_hh2)
        return jnp.concatenate([out_f, out_b], axis=-1)  # [B, T, 2H]
    if bwd is None:
        xx = x[None]  # [1, B, T, F]
        w_ih = fwd.w_ih[None]
        b = fwd.b[None]
        w_hh = fwd.w_hh[None]
        ndir = 1
    else:
        xr = masked_flip(x, lengths, time_axis=1)
        w_ih = jnp.stack([fwd.w_ih, bwd.w_ih])  # [2, F, 4H]
        b = jnp.stack([fwd.b, bwd.b])  # [2, 4H]
        xx = jnp.stack([x, xr])  # [2, B, T, F]
        w_hh = jnp.stack([fwd.w_hh, bwd.w_hh])  # [2, H, 4H]
        ndir = 2

    hs = _recurrence(
        _LSTM_SAVE_EVERY.get(), xx, w_ih.astype(x.dtype), b, w_hh.astype(x.dtype)
    )  # [T, D, B, H]
    out_f = jnp.transpose(hs[:, 0], (1, 0, 2))  # [B, T, H]
    if ndir == 1:
        return out_f
    out_b = masked_flip(jnp.transpose(hs[:, 1], (1, 0, 2)), lengths, time_axis=1)
    return jnp.concatenate([out_f, out_b], axis=-1)  # [B, T, 2H]


def lstm_pair(x, fwd: LSTMWeights, bwd: LSTMWeights, lengths=None):
    """Bidirectional LSTM returning the per-direction pair (out_f, out_b),
    each [B, T, H], WITHOUT concatenating. The consumer that follows every
    DPRNN scan is a Dense(2H -> N) — a linearity, so it can contract each
    direction against its kernel half and skip the concat entirely (the
    time-major pallas outputs live in {2,0,1} layout and XLA materializes
    their concat as a pad_maximum fusion, ~16 ms/scan at the flagship shape).
    Semantics identical to ``lstm(...)`` split at the last axis."""
    if lengths is not None and _LSTM_IGNORE_LENGTHS.get():
        lengths = None  # schedule_masks pragma: rows are full-length
    if _LSTM_BACKEND.get() == "pallas" and _LSTM_SAVE_EVERY.get() <= 1:
        w_ih2 = jnp.stack([fwd.w_ih, bwd.w_ih]).astype(x.dtype)
        b2 = jnp.stack([fwd.b, bwd.b])
        w_hh2 = jnp.stack([fwd.w_hh, bwd.w_hh]).astype(x.dtype)
        if lengths is None:
            return _recurrence3(x, w_ih2, b2, w_hh2)
        return _recurrence3_masked(x, lengths, w_ih2, b2, w_hh2)
    out = lstm(x, fwd, bwd, lengths)
    H = fwd.w_hh.shape[0]
    return out[..., :H], out[..., H:]


def lstm_pair_tm(x, fwd: LSTMWeights, bwd: LSTMWeights, lengths=None):
    """Time-major twin of :func:`lstm_pair`: x [T, R, F] -> pair of
    [T, R, H]. Same validity conditions as :func:`lstm_tm`; with ``lengths``
    ([R] ints) the mask-aware kernel runs (dir-1 holds until each row's own
    length, same contract as the batch-major masked pair)."""
    if lengths is not None and _LSTM_IGNORE_LENGTHS.get():
        lengths = None  # schedule_masks pragma: rows are full-length
    w_ih2 = jnp.stack([fwd.w_ih, bwd.w_ih]).astype(x.dtype)
    b2 = jnp.stack([fwd.b, bwd.b])
    w_hh2 = jnp.stack([fwd.w_hh, bwd.w_hh]).astype(x.dtype)
    if lengths is None:
        return _recurrence3_tm(x, w_ih2, b2, w_hh2)
    return _recurrence3_masked_tm(x, lengths, w_ih2, b2, w_hh2)


def vanilla_rnn(x, fwd, bwd=None, lengths=None):
    """(Bi) tanh-RNN over [B, T, F] (torch nn.RNN): h = tanh(xW_ih + b_ih + hW_hh + b_hh).

    fwd/bwd = (w_ih [F,H], w_hh [H,H], b_ih [H], b_hh [H]). Reference API
    parity for rnn_type='RNN' (src/models/dprnn.py:23)."""
    B, T, F = x.shape

    def run(xs, w_ih, w_hh, b_ih, b_hh):
        H = w_hh.shape[0]
        xp = jnp.transpose(xs @ w_ih + b_ih + b_hh, (1, 0, 2))

        def step(h, xp_t):
            h = jnp.tanh(xp_t + h @ w_hh)
            return h, h

        _, hs = jax.lax.scan(step, jnp.zeros((B, H), xs.dtype), xp)
        return jnp.transpose(hs, (1, 0, 2))

    out = run(x, *fwd)
    if bwd is None:
        return out
    xr = masked_flip(x, lengths, time_axis=1)
    out_b = masked_flip(run(xr, *bwd), lengths, time_axis=1)
    return jnp.concatenate([out, out_b], axis=-1)


def gru(x, fwd, bwd=None, lengths=None):
    """(Bi)GRU over [B, T, F]; weights use torch gate order r,z,n with
    separate input/hidden biases: fwd = (w_ih [F,3H], w_hh [H,3H], b_ih [3H],
    b_hh [3H]). Provided for reference API parity ('GRU' rnn_type,
    src/models/dprnn.py:23); LSTM is the shipped path."""
    B, T, F = x.shape
    w_ih, w_hh, b_ih, b_hh = fwd
    H = w_hh.shape[0]

    def run(xs, w_ih, w_hh, b_ih, b_hh):
        xp = xs @ w_ih + b_ih  # [B, T, 3H]
        xp = jnp.transpose(xp, (1, 0, 2))

        def step(h, xp_t):
            hp = h @ w_hh + b_hh  # [B, 3H]
            r = jax.nn.sigmoid(xp_t[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xp_t[..., H : 2 * H] + hp[..., H : 2 * H])
            n = jnp.tanh(xp_t[..., 2 * H :] + r * hp[..., 2 * H :])
            h = (1 - z) * n + z * h
            return h, h

        _, hs = jax.lax.scan(step, jnp.zeros((B, H), xs.dtype), xp)
        return jnp.transpose(hs, (1, 0, 2))

    out = run(x, w_ih, w_hh, b_ih, b_hh)
    if bwd is None:
        return out
    wb_ih, wb_hh, bb_ih, bb_hh = bwd
    xr = masked_flip(x, lengths, time_axis=1)
    out_b = masked_flip(run(xr, wb_ih, wb_hh, bb_ih, bb_hh), lengths, time_axis=1)
    return jnp.concatenate([out, out_b], axis=-1)
