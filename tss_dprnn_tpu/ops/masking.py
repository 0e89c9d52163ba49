"""Length-mask helpers.

The reference (torch) evaluates full-length utterances eagerly with exact
dynamic shapes (reference: src/inferencers/inferencer.py:48-78). Under ``jit``
we instead pad every utterance to a static bucket length and thread a
``lengths`` vector through the graph; these helpers produce the masks and the
masked primitives (flip, softmax) that make the padded computation *bit-match*
the reference's unpadded one on the valid region.
"""

from __future__ import annotations

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
    """
    if lengths is None:
        return jnp.flip(x, axis=time_axis)
    T = x.shape[time_axis]
    t = jnp.arange(T, dtype=jnp.int32)
    # idx shape [B, T]
    idx = lengths[:, None].astype(jnp.int32) - 1 - t[None, :]
    idx = jnp.where(idx >= 0, idx, t[None, :])
    # expand idx to x's rank with batch at axis 0
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    shape[time_axis] = T
    idx = idx.reshape(shape)
    idx = jnp.broadcast_to(idx, x.shape)
    return jnp.take_along_axis(x, idx, axis=time_axis)


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
