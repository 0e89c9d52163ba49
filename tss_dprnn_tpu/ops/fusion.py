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
    ``idx[t] = floor(t * true_L_in / true_L_out)`` per sample. Output
    positions at/after ``out_lengths`` are zero (callers mask them anyway).

    TPU implementation note: a ``take_along_axis`` with a broadcast
    full-shape index lowers to a per-element scalar gather (~1.05 s at the
    flagship masked-eval shape [8, 80000, 128] — it dominated the masked
    forward). Instead, exploit that every (in_lengths, out_lengths) pair
    here comes from the same utterance through ``l_in = floor(l / k)``, so
    ``idx[t] = floor(t * l_in / l)`` deviates from the static anchor
    ``t // k`` by exactly 0 or -1 on the valid region
    (|t*(1/k - floor(l/k)/l)| = t*(l mod k)/(k*l) < 1 for t < l): the
    upsample is a select between two statically-shifted k-fold repeats —
    pure broadcast/elementwise, no gather (measured ~3 ms)."""
    import numpy as np

    B, L_in, N = x.shape
    k = max(1, L // L_in)
    # the two-stream select needs |idx - t//k| <= 1, which holds whenever
    # L_in == floor(L/k) (true for every in-model use: the pooled length is
    # floor(L/kernel)); verify the static anchor and fall back to a
    # constant-index gather (not the pathological dynamic kind) otherwise
    t_np = np.arange(L)
    dev_ok = np.all(np.abs(np.minimum(t_np * L_in // L, L_in - 1) - np.minimum(t_np // k, L_in - 1)) <= 1)
    base_np = np.minimum(t_np // k, L_in - 1)  # [L] static clipped anchor
    if in_lengths is None:
        idx_np = np.clip(t_np * L_in // L, 0, L_in - 1)
        if not dev_ok:
            return x[:, jnp.asarray(idx_np, jnp.int32), :]
        sel0 = jnp.asarray(idx_np == base_np)[None, :, None]
        valid = None
    else:
        t = jnp.arange(L, dtype=jnp.int32)
        scale = in_lengths.astype(jnp.float32) / out_lengths.astype(jnp.float32)
        idx = jnp.floor(t[None, :].astype(jnp.float32) * scale[:, None]).astype(jnp.int32)
        idx = jnp.clip(idx, 0, L_in - 1)
        if not dev_ok:  # arbitrary ratio: keep the (slow) exact gather
            gidx = jnp.broadcast_to(idx[:, :, None], (B, L, N))
            return jnp.take_along_axis(x, gidx, axis=1)
        sel0 = (idx == jnp.asarray(base_np)[None, :])[:, :, None]
        valid = (t[None, :] < out_lengths[:, None].astype(jnp.int32))[:, :, None]

    # out[t] = x[base[t]] where sel0 else x[base[t] - 1]. Blocked form: the k
    # positions t in block j = t // k share base j, so the select broadcasts
    # x and its one-step shift directly — XLA fuses it into a single output
    # pass (no materialized k-fold repeat streams).
    Lc = -(-L // k)  # blocks covering L
    xe = x if Lc <= L_in else jnp.concatenate(
        [x, jnp.broadcast_to(x[:, -1:, :], (B, Lc - L_in, N))], axis=1
    )  # edge-extend so clipped anchors past k*L_in read the last frame
    xs = jnp.concatenate([xe[:, :1], xe[:, :-1]], axis=1)
    pad_t = Lc * k - L
    s = sel0[..., 0]
    s = jnp.broadcast_to(s, (B, L))
    if pad_t:
        s = jnp.pad(s, ((0, 0), (0, pad_t)))
    s = s.reshape(B, Lc, k, 1)
    out = jnp.where(s, xe[:, :Lc, None, :], xs[:, :Lc, None, :]).reshape(B, Lc * k, N)[:, :L]
    if valid is not None:
        out = jnp.where(valid, out, jnp.zeros((), x.dtype))
    return out


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
