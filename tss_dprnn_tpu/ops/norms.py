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

import jax
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


def _mean_var_lowp_f32acc(x, axes, mask=None):
    """One-pass mean/biased-variance with f32 ACCUMULATION over a
    low-precision (bf16) tensor.

    Unlike upcasting x before :func:`masked_mean_var`, this never
    materializes an f32 copy of x in HBM: the ``dtype=float32`` reduces and
    the in-expression ``astype`` upcast element-wise inside the reduce
    fusions. Profiled motivation (flagship B=32 inference, 2026-08-18): the
    pre-upcast turned every scan-output relayout copy into an f32 write —
    2x the HBM bytes of the bf16 tensor, ~90 ms/iter across 12 blocks (the
    B=48 OOM dump showed 3.7 GB f32 HLO temps per norm). One-pass
    E[x^2]-E[x]^2 in f32 is safe here: post-Dense activations are O(1) with
    near-zero mean, and the bf16 fast path's own rounding (~47 dB output
    fidelity) dominates any f32 cancellation. The fp32 parity path keeps the
    two-pass :func:`masked_mean_var` route bit-for-bit unchanged."""
    f32 = jnp.float32
    if mask is None:
        n = 1.0
        for a in axes:
            n *= x.shape[a]
        s1 = jnp.sum(x, axis=axes, keepdims=True, dtype=f32)
        s2 = jnp.sum(jnp.square(x.astype(f32)), axis=axes, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        return mean, var
    m = jnp.broadcast_to(mask, x.shape)
    n = jnp.maximum(jnp.sum(m, axis=axes, keepdims=True, dtype=f32), 1.0)
    xm = x * m.astype(x.dtype)  # masked positions exactly zero in bf16 too
    s1 = jnp.sum(xm, axis=axes, keepdims=True, dtype=f32)
    s2 = jnp.sum(jnp.square(xm.astype(f32)), axis=axes, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return mean, var


def global_channel_norm_cl(x, gamma, beta, eps: float, mask=None, batch_axis: int = 0):
    """Channels-LAST global LN: x [B, *spatial, C], affine on the last axis.

    Same statistics as :func:`global_channel_norm` (mean/var over everything
    but batch); this is the layout the model core uses so the affine rides the
    128-lane dimension. ``batch_axis`` lets time-major callers ([T, B, *, C])
    keep per-example statistics without transposing first.

    Statistics are always fp32. bf16 inputs take the low-precision-resident
    path (:func:`_mean_var_lowp_f32acc`): x stays bf16 in HBM and every
    upcast happens element-wise inside fusions; other dtypes keep the
    original two-pass route (the fp32 parity path is bit-identical).
    """
    axes = tuple(i for i in range(x.ndim) if i != batch_axis)
    if x.dtype == jnp.bfloat16:
        mean, var = _mean_var_lowp_f32acc(x, axes, mask)
        # apply phase in bf16: with f32 element arithmetic XLA shared one
        # x.astype(f32) between the apply fusion and the next relayout and
        # MATERIALIZED it — six f32[rows,K,N] convert+relayout copies,
        # 37.8 ms/iter = 4.9% of the flagship masked forward (profiled
        # 2026-08-21). Folding gamma*scale / (beta - mean*gamma*scale) into
        # two per-batch f32 scalars first keeps the f32 statistics precision
        # where it matters; the bf16 multiply-add's rounding is the same
        # order as x's own bf16 quantization (the fp32 parity path below is
        # untouched).
        scale = (gamma.astype(jnp.float32) * jax.lax.rsqrt(var + eps))
        shift = beta.astype(jnp.float32) - mean * scale
        out = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        if mask is not None:
            out = out * jnp.broadcast_to(mask, x.shape).astype(x.dtype)
        return out
    out = z_norm(x, axes, eps=eps, mask=mask)
    out = gamma.astype(x.dtype) * out + beta.astype(x.dtype)
    if mask is not None:
        out = out * jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return out
