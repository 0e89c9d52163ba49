"""Parametrized sinc filterbank synthesis (SincNet / asteroid ParamSincFB
parameterization) — pure function so the model, tests and any export path
share one implementation.

Used by the RawNet3 front-end (reference src/models/rawnet/RawNet3.py:26-32
wraps asteroid_filterbanks.ParamSincFB(C//4, 251, stride)). Each of the
``n_band`` bands has learnable absolute offsets (low_hz_, band_hz_); band i
emits a cosine-phase band-pass FIR and its odd-symmetric (Hilbert-pair)
sine-phase partner, interleaved -> 2*n_band filters.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def mel_init_bands(n_band: int, sample_rate: float, min_low_hz: float = 50.0,
                   min_band_hz: float = 50.0):
    """Mel-spaced initial (low_hz_, band_hz_) arrays, each [n_band, 1]."""
    high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
    to_mel = lambda hz: 2595.0 * np.log10(1.0 + hz / 700.0)
    to_hz = lambda mel: 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    mel = np.linspace(to_mel(min_low_hz), to_mel(high_hz), n_band + 1)
    hz = to_hz(mel)
    return hz[:-1].reshape(-1, 1).astype(np.float32), np.diff(hz).reshape(-1, 1).astype(np.float32)


def sinc_filters(low_hz, band_hz, kernel_size: int, sample_rate: float,
                 min_low_hz: float = 50.0, min_band_hz: float = 50.0):
    """(low_hz_ [n,1], band_hz_ [n,1]) -> filters [2n, 1, kernel_size]."""
    half = kernel_size // 2
    n_neg = 2.0 * math.pi * jnp.arange(-half, 0.0, dtype=jnp.float32) / sample_rate
    window = jnp.asarray(np.hamming(kernel_size)[:half].copy(), jnp.float32)

    low = min_low_hz + jnp.abs(low_hz)  # [n, 1]
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz), min_low_hz, sample_rate / 2)
    band = (high - low)[:, 0]  # [n]

    f_lo = low * n_neg[None, :]
    f_hi = high * n_neg[None, :]
    bp_left = ((jnp.sin(f_hi) - jnp.sin(f_lo)) / (n_neg[None, :] / 2.0)) * window[None, :]
    bp_center = 2.0 * band[:, None]
    cos_f = jnp.concatenate([bp_left, bp_center, jnp.flip(bp_left, axis=1)], axis=1)
    cos_f = cos_f / (2.0 * band[:, None])
    sp_left = ((jnp.cos(f_lo) - jnp.cos(f_hi)) / (n_neg[None, :] / 2.0)) * window[None, :]
    sp_center = jnp.zeros_like(band)[:, None]
    sin_f = jnp.concatenate([sp_left, sp_center, -jnp.flip(sp_left, axis=1)], axis=1)
    sin_f = sin_f / (2.0 * band[:, None])

    n = low_hz.shape[0]
    return jnp.stack([cos_f, sin_f], axis=1).reshape(2 * n, 1, kernel_size)
