"""Device-resident STOI: the short-time objective intelligibility measure
(Taal et al. 2011) as a jittable, batched JAX graph.

The reference computes STOI on the host per utterance via asteroid ->
pystoi (src/inferencers/inferencer.py:64-70); our host twin is
``ops/metrics.stoi``. At 400x-realtime device forwards the host metric
triple becomes the end-to-end eval bottleneck (round-3 VERDICT weak #4) —
STOI is fully vectorizable (STFT, third-octave matmul, windowed
correlations), so here it runs ON the TPU alongside the forward:

- 8->10 kHz resample as a strided polyphase conv (same windowed-sinc kernel
  as data/resample.py — coefficient-identical);
- silent-frame removal with data-dependent COMPACTION expressed as a
  one-hot permutation matmul on the MXU (the masked_flip trick from
  ops/masking.py — never a scalar gather, ROUND_NOTES' TPU gather lesson);
- overlap-add / re-framing with the interleave-class reshape trick
  (hop | frame) — static shapes throughout, bucketed like the forward;
- 512-pt rfft (XLA FFT), third-octave band matmul, all 30-frame sliding
  segments at once via 30 static shifted slices.

Shapes are static per (bucket_T); per-row true ``lengths`` thread through as
validity masks (frame counts, segment counts), so padded batch rows produce
exactly the value the host computes on the exactly-cropped row (fp32 vs the
host's float64: measured |delta| <= ~2e-4 typical, tests/test_stoi_jax.py).
Rows too short for one 30-frame segment return NaN like the host.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from tss_dprnn_tpu.data.resample import _kernel as _resample_kernel
from tss_dprnn_tpu.ops.metrics import (
    _DYN_RANGE,
    _FS,
    _HOP,
    _MIN_FREQ,
    _N_FRAME,
    _N_SEG,
    _NFFT,
    _third_octave_matrix,
)

EPS = 1e-8
_BETA_C = 10.0 ** (15.0 / 20.0)  # 10 ** (-BETA/20), BETA = -15 dB


def resample_batch(x: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """[B, T] -> [B, ceil(T*new/orig)] polyphase resample, coefficient- and
    value-matching data/resample.resample (host numpy) up to fp32
    accumulation order.

    Implementation: strided length-W windows at hop ``orig`` contracted
    against the [new, W] phase kernel — materialized as W static slices of a
    [B, L/orig, orig] reshape and ONE einsum on the MXU. (A 1-in-channel
    ``lax.conv`` of the same computation measured 28 ms at [8, 120k] on v5e —
    XLA tiles single-channel convs poorly; this formulation is <1 ms.)"""
    if orig_freq == new_freq:
        return x
    kernel, width, orig, new = _resample_kernel(orig_freq, new_freq)
    B, T = x.shape
    W = kernel.shape[1]
    target_len = int(math.ceil(new * T / orig))
    n_blocks = -(-target_len // new)
    need = (n_blocks - 1) * orig + W
    # window w of block k reads xp[:, k*orig + w] — expose as lane (w % orig)
    # of a [B, ., orig] reshape at block offset w // orig
    n_cols = -(-need // orig) + 1
    xp = jnp.pad(x, ((0, 0), (width, n_cols * orig - T - width)))
    v = xp.reshape(B, n_cols, orig)
    wins = jnp.stack(
        [v[:, (w // orig) : (w // orig) + n_blocks, w % orig] for w in range(W)],
        axis=-1,
    )  # [B, n_blocks, W]
    out = jnp.einsum("bkw,pw->bkp", wins, jnp.asarray(kernel))
    return out.reshape(B, n_blocks * new)[:, :target_len]


@lru_cache(maxsize=1)
def _stoi_consts():
    win = np.hanning(_N_FRAME + 2)[1:-1].astype(np.float32)
    obm = _third_octave_matrix().astype(np.float32)  # [15, 257]
    return win, obm


def _frame(x: jax.Array, n: int) -> jax.Array:
    """x [L] -> [n, 256] frames at hop 128 via two interleaved reshapes
    (hop | frame, no gather)."""
    a = x[: (n + 1) * _HOP].reshape(n + 1, _HOP)
    return jnp.concatenate([a[:-1], a[1:]], axis=-1)


def _overlap_add(frames: jax.Array, out_len: int) -> jax.Array:
    """[n, 256] windowed frames -> [out_len] OLA at hop 128 (interleave
    classes: frame/hop = 2 disjoint contiguous streams)."""
    xs = jnp.zeros((out_len,), frames.dtype)
    for j in range(2):
        fj = frames[j::2].reshape(-1)
        xs = xs.at[j * _HOP : j * _HOP + fj.shape[0]].add(fj)
    return xs


def _band_spec(frames: jax.Array, win: jax.Array, obm: jax.Array) -> jax.Array:
    spec = jnp.fft.rfft(frames * win[None, :], _NFFT, axis=-1)  # [n, 257]
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(power @ obm.T + EPS)  # [n, 15]


def _stoi_row(clean10: jax.Array, deg10: jax.Array, l10: jax.Array) -> jax.Array:
    """One row at 10 kHz: clean10/deg10 [T10] (zeros beyond l10) -> scalar
    STOI (NaN when too short). All shapes static; l10 drives masks only."""
    win, obm = _stoi_consts()
    win = jnp.asarray(win)
    obm = jnp.asarray(obm)
    T10 = clean10.shape[0]
    n = 1 + max(0, (T10 - _N_FRAME)) // _HOP
    if n < _N_SEG:  # bucket statically too short for one segment
        return jnp.asarray(jnp.nan, jnp.float32)

    cf = _frame(clean10, n) * win[None, :]
    df = _frame(deg10, n) * win[None, :]
    # frame validity: frames fully inside the true (exact-length) signal —
    # the host computes on the cropped row, which has 1+(l10-256)//128 frames
    nv = 1 + (l10 - _N_FRAME) // _HOP  # may be <= 0 for tiny rows
    valid = jnp.arange(n) < nv
    energies = 20.0 * jnp.log10(
        jnp.linalg.norm(cf, axis=-1) / np.sqrt(_N_FRAME) + EPS)
    emax = jnp.max(jnp.where(valid, energies, -jnp.inf))
    mask = valid & (energies > emax - _DYN_RANGE)

    # compaction as a one-hot permutation matmul (MXU, no gather)
    dest = jnp.cumsum(mask.astype(jnp.int32)) - 1
    m = jnp.sum(mask.astype(jnp.int32))
    P = ((jnp.arange(n)[:, None] == dest[None, :]) & mask[None, :]).astype(cf.dtype)
    cxf = P @ cf
    dxf = P @ df

    out_len = (n + 1) * _HOP
    xs = _overlap_add(cxf, out_len)
    ys = _overlap_add(dxf, out_len)

    X = _band_spec(_frame(xs, n), win, obm)  # [n, 15]
    Y = _band_spec(_frame(ys, n), win, obm)

    ns = n - (_N_SEG - 1)
    # all 30-frame sliding segments: [ns, 15, 30] via 30 static slices
    Xs = jnp.stack([X[k : k + ns] for k in range(_N_SEG)], axis=-1)
    Ys = jnp.stack([Y[k : k + ns] for k in range(_N_SEG)], axis=-1)
    alpha = jnp.sqrt(jnp.sum(Xs**2, axis=-1) / (jnp.sum(Ys**2, axis=-1) + EPS))
    Yp = jnp.minimum(Ys * alpha[..., None], Xs * (1.0 + _BETA_C))
    xn = Xs - jnp.mean(Xs, axis=-1, keepdims=True)
    yn = Yp - jnp.mean(Yp, axis=-1, keepdims=True)
    num = jnp.sum(xn * yn, axis=-1)
    den = jnp.sqrt(jnp.sum(xn**2, axis=-1)) * jnp.sqrt(jnp.sum(yn**2, axis=-1)) + EPS
    corr = num / den  # [ns, 15]

    m_seg = m - (_N_SEG - 1)  # valid segment count
    seg_ok = (jnp.arange(ns) < m_seg)[:, None]
    d = jnp.sum(jnp.where(seg_ok, corr, 0.0)) / (
        jnp.maximum(m_seg, 1).astype(jnp.float32) * corr.shape[1])
    return jnp.where(m_seg >= 1, d, jnp.nan).astype(jnp.float32)


@partial(jax.jit, static_argnames=("sample_rate",))
def stoi_batch(clean: jax.Array, deg: jax.Array, lengths: jax.Array,
               sample_rate: int = 8000) -> jax.Array:
    """Batched STOI on device. clean/deg [B, T] (rows zero-padded beyond
    ``lengths``), lengths [B] ints at ``sample_rate`` -> [B] float32 scores
    (NaN for rows too short after the 10 kHz resample).

    Rows MUST be zero beyond their length (the eval collate's pad contract)
    — padding influences only masked-out frames, so values match the host
    ``ops/metrics.stoi`` of the exactly-cropped row within fp32 envelope."""
    lengths = lengths.astype(jnp.int32)
    if sample_rate != _FS:
        kernel, width, orig, new = _resample_kernel(sample_rate, _FS)
        clean = resample_batch(clean, sample_rate, _FS)
        deg = resample_batch(deg, sample_rate, _FS)
        l10 = -(-(lengths * new) // orig)  # ceil, per-row
    else:
        l10 = lengths
    # zero the resample filter-tail bleed past each row's true end so the
    # padded row stays value-identical to the exactly-cropped host signal
    T10 = clean.shape[1]
    keep = jnp.arange(T10)[None, :] < l10[:, None]
    clean = jnp.where(keep, clean, 0.0)
    deg = jnp.where(keep, deg, 0.0)
    if T10 < _N_FRAME + _HOP:  # statically too short for one frame pair
        return jnp.full((clean.shape[0],), jnp.nan, jnp.float32)
    return jax.vmap(_stoi_row)(clean, deg, l10)
