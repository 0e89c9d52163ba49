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


@contextlib.contextmanager
def lstm_backend(name: str):
    token = _LSTM_BACKEND.set(name)
    try:
        yield
    finally:
        _LSTM_BACKEND.reset(token)


def current_lstm_backend() -> str:
    return _LSTM_BACKEND.get()


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


@jax.custom_vjp
def _recurrence(xx, w_ih, b, w_hh):
    """The full (multi-direction) LSTM with a memory-lean hand-written
    backward (cuDNN-style).

    xx: [D, B, T, F] stacked direction inputs (backward direction pre-
    flipped); w_ih: [D, F, 4H]; b: [D, 4H]; w_hh: [D, H, 4H].
    Returns hs [T, D, B, H].

    jax's autodiff of ``lax.scan`` checkpoints every per-step intermediate
    (gate activations, 4H-wide pre-activations, ...) — ~40 GB for one
    flagship batch-5 train step, far past a v5e's HBM. This VJP saves only
    the inputs plus (h, c) per step and recomputes the input projection and
    gate activations in batched (non-sequential) form inside the backward.
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


def _recurrence_fwd_scan(xp, w_hh):
    D, B, H = xp.shape[1], xp.shape[2], w_hh.shape[1]
    h0 = jnp.zeros((D, B, H), xp.dtype)
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


def _recurrence_vjp_fwd(xx, w_ih, b, w_hh):
    if _LSTM_BACKEND.get() == "pallas":
        from tss_dprnn_tpu.ops.pallas_lstm import lstm_forward_with_cs

        hs, cs = lstm_forward_with_cs(xx, w_ih, b, w_hh)
    else:
        xp = _input_proj(xx, w_ih, b)
        hs, cs = _recurrence_fwd_scan(xp, w_hh)
    # NB: xp is NOT a residual — recomputed in bwd; residual cost is the
    # F-wide input instead of the 4H-wide projection
    return hs, (xx, w_ih, b, w_hh, hs, cs)


def _recurrence_vjp_bwd(res, g_hs):
    xx, w_ih, b, w_hh, hs, cs = res
    xp = _input_proj(xx, w_ih, b)
    D, B, H = hs.shape[1], hs.shape[2], hs.shape[3]
    f32 = jnp.float32
    cdt = xp.dtype

    # shifted previous-state sequences (step 0 starts from zeros)
    h_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    c_prev = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)

    # recompute gate activations for ALL steps in one batched matmul +
    # elementwise pass (transient, freed after the scan) — keeping this out
    # of the sequential loop is what makes bwd ~2x fwd instead of ~15x
    gates = xp + jnp.einsum("tdbh,dhg->tdbg", h_prev, w_hh).astype(cdt)
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    tc = jnp.tanh(cs.astype(f32)).astype(cdt)
    # per-step factors (elementwise, vectorized over T)
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

    carry0 = (jnp.zeros((D, B, H), f32), jnp.zeros((D, B, H), f32))
    (_, _), dxp = jax.lax.scan(
        step, carry0, (g_hs, d_i, d_f, d_g, d_o, dcdh, fgate), reverse=True
    )
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


_recurrence.defvjp(_recurrence_vjp_fwd, _recurrence_vjp_bwd)


def lstm(x, fwd: LSTMWeights, bwd: Optional[LSTMWeights] = None, lengths=None):
    """(Bi)LSTM over [B, T, F] -> [B, T, H * ndir], zero initial state.

    ``lengths`` ([B] ints or None): when given, the backward direction reads
    each sequence reversed *within its valid length*, matching torch on
    unpadded inputs; forward-direction outputs at padded steps are garbage by
    construction (mask downstream, as the reference's zero-pad chunks are).
    """
    B, T, F = x.shape
    H = fwd.w_hh.shape[0]
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

    hs = _recurrence(xx, w_ih.astype(x.dtype), b, w_hh.astype(x.dtype))  # [T, D, B, H]
    out_f = jnp.transpose(hs[:, 0], (1, 0, 2))  # [B, T, H]
    if ndir == 1:
        return out_f
    out_b = masked_flip(jnp.transpose(hs[:, 1], (1, 0, 2)), lengths, time_axis=1)
    return jnp.concatenate([out_f, out_b], axis=-1)  # [B, T, 2H]


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
