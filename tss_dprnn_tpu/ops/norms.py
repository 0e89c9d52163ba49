"""Normalization kernels (mask-aware).

Replaces reference src/models/norms.py (z_norm:6, _glob_norm:12, GlobLN:27)
and the ``nn.GroupNorm(1, C)`` usage for ``norm_type='ln'``
(src/models/dprnn.py:75-77,131-134).

Both norms compute a *global* mean/variance over all non-batch dims and apply
a per-channel affine; they differ only in epsilon (GlobLN: 1e-8 inside the
sqrt; torch GroupNorm: 1e-5 added to the variance) — numerically the same
formula, so a single masked kernel serves both. These are bandwidth-bound
VPU ops; XLA fuses them into neighbouring elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp

GLOBLN_EPS = 1e-8  # reference norms.py:6 z_norm eps
GROUPNORM_EPS = 1e-5  # torch nn.GroupNorm default


def masked_mean_var(x, axes, mask=None):
    """Mean and biased variance over ``axes``; if ``mask`` is given (broadcastable
    to ``x``, {0,1}), statistics only cover unmasked positions."""
    if mask is None:
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        return mean, var
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    n = jnp.sum(mask, axis=axes, keepdims=True)
    n = jnp.maximum(n, 1.0)
    mean = jnp.sum(x * mask, axis=axes, keepdims=True) / n
    var = jnp.sum(jnp.square(x - mean) * mask, axis=axes, keepdims=True) / n
    return mean, var


def z_norm(x, axes, eps: float = GLOBLN_EPS, mask=None):
    """(x - mean) / sqrt(var + eps) over ``axes`` (reference norms.py:6-10)."""
    mean, var = masked_mean_var(x, axes, mask)
    out = (x - mean) / jnp.sqrt(var + eps)
    if mask is not None:
        out = out * jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return out


def global_channel_norm(x, gamma, beta, eps: float, mask=None):
    """Global LN over all non-batch dims with per-channel (axis 1) affine.

    x: [B, C, *spatial]; gamma/beta: [C].
    Covers both GlobLN (eps=1e-8, reference norms.py:27-31) and
    nn.GroupNorm(1, C) (eps=1e-5). ``mask`` broadcastable to x, e.g.
    [B, 1, L] time mask or [B, 1, 1, S] chunk mask.
    """
    axes = tuple(range(1, x.ndim))
    out = z_norm(x, axes, eps=eps, mask=mask)
    affine_shape = [1] * x.ndim
    affine_shape[1] = x.shape[1]
    g = gamma.reshape(affine_shape).astype(x.dtype)
    b = beta.reshape(affine_shape).astype(x.dtype)
    out = g * out + b
    if mask is not None:
        # keep padded positions exactly zero (beta would bleed in otherwise)
        out = out * jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return out


def glob_ln(x, gamma, beta, mask=None):
    """Reference GlobLN (norms.py:27)."""
    return global_channel_norm(x, gamma, beta, eps=GLOBLN_EPS, mask=mask)


def chan_ln(x, gamma, beta, mask=None):
    """torch nn.GroupNorm(1, C) equivalent ('ln' in reference configs)."""
    return global_channel_norm(x, gamma, beta, eps=GROUPNORM_EPS, mask=mask)


def global_channel_norm_cl(x, gamma, beta, eps: float, mask=None, batch_axis: int = 0):
    """Channels-LAST global LN: x [B, *spatial, C], affine on the last axis.

    Same statistics as :func:`global_channel_norm` (mean/var over everything
    but batch); this is the layout the model core uses so the affine rides the
    128-lane dimension. ``batch_axis`` lets time-major callers ([T, B, *, C])
    keep per-example statistics without transposing first.
    """
    axes = tuple(i for i in range(x.ndim) if i != batch_axis)
    out = z_norm(x, axes, eps=eps, mask=mask)
    out = gamma.astype(x.dtype) * out + beta.astype(x.dtype)
    if mask is not None:
        out = out * jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return out
