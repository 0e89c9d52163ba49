"""The five speaker-embedding fusion ops (reference src/models/dprnn_spe.py:165-229).

All operate channels-last ([B, L, N], features on the lane dim) on a
per-utterance speaker embedding projected to the feature space (the
projections themselves are model-level Dense params) and the normalized
mixture features. Pure broadcast/elementwise ops (VPU), except attention
which adds a pooled masked softmax.

The 'att' variant reproduces two reference quirks exactly:
- the frozen depthwise "average" conv (stride=kernel, weights 1/kernel,
  dprnn_spe.py:100-104) == non-overlapping mean pooling;
- ``nn.Upsample(mode='nearest')`` back to L built per-forward
  (dprnn_spe.py:181-182): out[t] = att[floor(t * L_avg / L)].
"""

from __future__ import annotations

import jax.numpy as jnp

from tss_dprnn_tpu.ops.masking import masked_softmax


def concatenation(aux, out):
    """aux: [B, E], out: [B, L, N] -> [B, L, N+E] (dprnn_spe.py:186-192)."""
    B, L, _ = out.shape
    rep = jnp.broadcast_to(aux[:, None, :], (B, L, aux.shape[-1]))
    return jnp.concatenate([out, rep], axis=-1)


def addition(aux_proj, out):
    """aux_proj: [B, N] (already fusion_linear'ed), out: [B, L, N]."""
    return out + aux_proj[:, None, :]


def multiplication(aux_proj, out):
    return out * aux_proj[:, None, :]


def film(aux_mul, aux_add, out):
    """FiLM = multiplicative then additive modulation (dprnn_spe.py:224-229)."""
    return out * aux_mul[:, None, :] + aux_add[:, None, :]


def mean_pool_time(x, k: int):
    """Non-overlapping width-k mean over time: [B, L, N] -> [B, floor(L/k), N].

    Equals the reference's frozen depthwise 'average' conv."""
    B, L, N = x.shape
    n = L // k
    return jnp.mean(x[:, : n * k, :].reshape(B, n, k, N), axis=2)


def nearest_upsample_to(x, L: int, in_lengths=None, out_lengths=None):
    """torch nn.Upsample(size=L, mode='nearest') on [B, L_in, N].

    For bucketed eval the *true* in/out lengths may be smaller than the padded
    shapes; torch computes indices with the true ratio, so we reproduce
    ``idx[t] = floor(t * true_L_in / true_L_out)`` per sample.
    """
    B, L_in, N = x.shape
    t = jnp.arange(L, dtype=jnp.float32)
    if in_lengths is None:
        idx = jnp.clip(jnp.floor(t * (L_in / L)).astype(jnp.int32), 0, L_in - 1)
        return x[:, idx, :]
    scale = in_lengths.astype(jnp.float32) / out_lengths.astype(jnp.float32)  # [B]
    idx = jnp.floor(t[None, :] * scale[:, None]).astype(jnp.int32)  # [B, L]
    idx = jnp.clip(idx, 0, L_in - 1)
    idx = jnp.broadcast_to(idx[:, :, None], (B, L, N))
    return jnp.take_along_axis(x, idx, axis=1)


def attention(aux_proj, out, kernel_size: int, lengths=None):
    """Attention fusion (dprnn_spe.py:178-183, 214-222), channels-last.

    aux_proj: [B, N] (fusion_linear(aux)), out: [B, L, N] normalized features.
    Returns out * upsample(att + aux) with
    att = softmax_t(sum_n(avg(out) * aux)) * aux.
    """
    B, L, N = out.shape
    avg = mean_pool_time(out, kernel_size)  # [B, L_avg, N]
    L_avg = avg.shape[1]
    a = aux_proj[:, None, :]  # [B, 1, N]
    score = jnp.sum(avg * a, axis=-1, keepdims=True)  # [B, L_avg, 1]
    if lengths is None:
        att = masked_softmax(score, None, axis=1)
        att = att * a + a  # [B, L_avg, N]
        return out * nearest_upsample_to(att, L)
    avg_lengths = lengths // kernel_size
    m = (jnp.arange(L_avg)[None, :, None] < avg_lengths[:, None, None]).astype(out.dtype)
    att = masked_softmax(score, m, axis=1)
    att = att * a + a
    up = nearest_upsample_to(att, L, in_lengths=avg_lengths, out_lengths=lengths)
    tm = (jnp.arange(L)[None, :, None] < lengths[:, None, None]).astype(out.dtype)
    return out * up * tm
