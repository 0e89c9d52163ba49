"""Length-mask helpers.

The reference (torch) evaluates full-length utterances eagerly with exact
dynamic shapes (reference: src/inferencers/inferencer.py:48-78). Under ``jit``
we instead pad every utterance to a static bucket length and thread a
``lengths`` vector through the graph; these helpers produce the masks and the
masked primitives (flip, softmax) that make the padded computation *bit-match*
the reference's unpadded one on the valid region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_mask(lengths, size: int, dtype=jnp.float32):
    """[B] lengths -> [B, size] {0,1} mask (1 where t < length)."""
    t = jnp.arange(size, dtype=jnp.int32)[None, :]
    return (t < lengths[:, None].astype(jnp.int32)).astype(dtype)


def masked_flip(x, lengths=None, time_axis: int = 1):
    """Reverse each sequence along ``time_axis`` within its valid length.

    For a sequence of valid length ``l`` (padded to ``T``):
    ``out[t] = x[l - 1 - t]`` for ``t < l`` and ``out[t] = x[t]`` otherwise.
    With ``lengths=None`` this is a plain ``jnp.flip``.

    This is what makes the *backward* direction of a bidirectional LSTM over a
    padded batch produce exactly the values the reference produces on unpadded
    sequences (reference runs nn.LSTM on exact-length inputs,
    src/models/dprnn.py:33-37).

    TPU implementation note: the obvious ``take_along_axis`` with a
    broadcast full-shape index lowers to a per-ELEMENT scalar gather —
    measured 30.4 s on [2000, 642, 128] bf16 (the flagship masked inter-scan
    shape), which made the whole masked-eval path ~160x slower than the
    unmasked one. Both formulations here are exact (each output position
    selects exactly one input position, so no rounding regardless of dtype):

    - one-hot permutation matmul, ``einsum(P[b,t,s], x[b,s,f])`` — rides the
      MXU, measured 8.2 ms on the same shape (~3700x); used while the
      logical P tensor stays modest (T <= 2048);
    - flip + per-row roll via vmapped ``dynamic_slice`` on a doubled time
      axis — contiguous [T, F] slices instead of scalars, measured 171 ms;
      no O(T^2) term, used for long time axes.
    """
    if lengths is None:
        return jnp.flip(x, axis=time_axis)
    if time_axis != 1:
        x2 = jnp.moveaxis(x, time_axis, 1)
        return jnp.moveaxis(masked_flip(x2, lengths, 1), 1, time_axis)
    orig_shape = x.shape
    B, T = x.shape[0], x.shape[1]
    x3 = x.reshape(B, T, -1)
    lengths = lengths.astype(jnp.int32)
    t = jnp.arange(T, dtype=jnp.int32)
    if T <= 2048:
        idx = lengths[:, None] - 1 - t[None, :]
        idx = jnp.where(idx >= 0, idx, t[None, :])  # [B, T]
        P = (idx[:, :, None] == t[None, None, :]).astype(x3.dtype)
        out = jnp.einsum("bts,bsf->btf", P, x3)
    else:
        # out[t] = flip(x)[t + T - l] for t < l (then x[t] on the tail)
        xf = jnp.flip(x3, axis=1)
        xx = jnp.concatenate([xf, xf], axis=1)
        start = T - lengths

        def row(r, s):
            return jax.lax.dynamic_slice(r, (s, 0), (T, r.shape[1]))

        out = jax.vmap(row)(xx, start)
        out = jnp.where(t[None, :, None] < lengths[:, None, None], out, x3)
    return out.reshape(orig_shape)


def masked_softmax(x, mask=None, axis: int = -1):
    """Softmax over ``axis`` restricted to positions where ``mask != 0``.

    Matches torch ``F.softmax`` on the unpadded sequence (reference attention
    fusion, src/models/dprnn_spe.py:220).
    """
    if mask is None:
        x_max = jnp.max(x, axis=axis, keepdims=True)
        e = jnp.exp(x - x_max)
        return e / jnp.sum(e, axis=axis, keepdims=True)
    neg = jnp.finfo(x.dtype).min
    xm = jnp.where(mask != 0, x, neg)
    x_max = jnp.max(xm, axis=axis, keepdims=True)
    e = jnp.exp(xm - x_max) * (mask != 0)
    return e / (jnp.sum(e, axis=axis, keepdims=True) + jnp.asarray(1e-38, x.dtype))
