"""Device-resident PESQ: the full first-party P.862 chain (ops/pesq.py) as a
jittable, batched JAX graph — level alignment, IRS receive filter, two-stage
delay search, Bark-band perceptual model, disturbance processing and the
L6/L2 aggregation all run ON the TPU.

With SI-SDR and STOI already device-resident (ops/stoi_jax.py), host PESQ
was the last per-utterance host cost of the eval triple (~32 ms/call x 2
calls/utterance on one core) AND the only reason the separated audio had to
cross device->host at all. This module removes both: `device_pesq: true`
keeps the whole metric triple on device.

Batching/masking design (same discipline as stoi_jax):
- static shapes per (bucket_T); per-row true ``lengths`` thread through as
  masks only (frame-validity, window-validity, masked means);
- the host chain's data-dependent loop count (frames of the exact-length
  signal + 0.32 s padding) becomes a static frame axis + a per-row valid
  count;
- the short-term gain smoother (first-order IIR over frames) is a
  ``lax.scan``; it is causal, so trailing invalid frames cannot perturb the
  valid prefix;
- the two-stage delay search keeps the host's semantics: coarse argmax over
  the circular 4 ms-envelope correlation, fine argmax over a +-1.5-block
  full-rate correlation window gathered (49 taps) from one FFT correlation.

Known, documented divergences from the host implementation (ops/pesq.py) —
all resolution artifacts of computing FFTs on the padded static length
instead of each row's exact length: the IRS filter and level-align band
power land on a finer frequency grid, and arithmetic is fp32. Measured
envelope vs the host chain: |delta MOS| typically < 0.01, gated at 0.05 in
tests/test_pesq_jax.py. The host implementation remains the default and the
parity reference.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from tss_dprnn_tpu.ops.pesq import (
    _ASYM_OFFSET,
    _DATA_PADDING_SEC,
    _D_WEIGHT,
    _DA_WEIGHT,
    _FREQ_COMP_OFFSET,
    _GAIN_OFFSET,
    _IRS_RECEIVE_DB,
    _LISTENING_LEVEL_DB,
    _LOUDNESS_SCALE,
    _TARGET_POWER,
    _ZWICKER_POWER,
    _band_layout,
)

_F32 = jnp.float32


@lru_cache(maxsize=8)
def _consts(fs: int, T: int, mode: str):
    """Per-(fs, static length) constants, host-precomputed."""
    bin_band, _, width_bark, abs_thresh, n_bands = _band_layout(fs)
    nf = 256 if fs == 8000 else 512
    # frequency-domain gains of the receive filter on the padded T grid
    f = np.maximum(np.fft.rfftfreq(T, 1.0 / fs), 1.0)
    bp = _IRS_RECEIVE_DB if mode == "nb" else np.array(
        [(8.0, -200.0), (50.0, -40.0), (100.0, 0.0), (8000.0, 0.0)])
    gain_db = np.interp(np.log(f), np.log(bp[:, 0]), bp[:, 1])
    irs_gain = (10.0 ** (gain_db / 20.0)).astype(np.float32)
    # level-align band mask (350-3250 Hz) on the same grid
    fr = np.fft.rfftfreq(T, 1.0 / fs)
    level_mask = ((fr >= 350.0) & (fr <= 3250.0)).astype(np.float32)
    # bin -> band one-hot matrix for the Bark grouping ([n_bins, n_bands])
    n_bins = nf // 2 + 1
    grouping = np.zeros((n_bins, int(n_bands)), np.float32)
    valid = bin_band >= 0
    grouping[np.arange(n_bins)[valid], bin_band[valid]] = 1.0
    win = (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(nf) / nf))).astype(np.float32)
    return (irs_gain, level_mask, grouping, win,
            width_bark.astype(np.float32), abs_thresh.astype(np.float32))


def _frames_hop_half(x: jax.Array, nf: int) -> jax.Array:
    """[T] -> [n, nf] frames at hop nf/2 via two interleaved reshapes."""
    hop = nf // 2
    n = (x.shape[0] - nf) // hop + 1
    a = x[: (n + 1) * hop].reshape(n + 1, hop)
    return jnp.concatenate([a[:-1], a[1:]], axis=-1)


def _align_and_filter_row(x, level_mask, irs_gain, l):
    """Level alignment (350-3250 Hz band power -> target) fused with the
    receive filter: one rfft/irfft pair per signal."""
    T = x.shape[0]
    spec = jnp.fft.rfft(x)
    p_band = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    # Parseval: mean-square of the band-filtered exact-length signal; the
    # rfft of a real signal double-counts interior bins
    sc = jnp.ones(p_band.shape[0]).at[0].set(0.5)
    if T % 2 == 0:
        sc = sc.at[-1].set(0.5)
    p = 2.0 * jnp.sum(p_band * level_mask * sc) / (T * jnp.maximum(l, 1.0))
    s = jnp.sqrt(_TARGET_POWER / (p + 1e-20))
    return jnp.fft.irfft(spec * (s * irs_gain), T)


def _estimate_delay_row(ref, deg, l, fs):
    """Constant-delay estimate matching ops/pesq._estimate_delay on the
    zero-padded row (valid blocks only enter the correlations)."""
    block = fs // 250
    T = ref.shape[0]
    M = T // block
    n_blk = l // block  # valid whole blocks of the exact signal
    env_r = jnp.sum(jnp.abs(ref[: M * block]).reshape(M, block), axis=1)
    env_d = jnp.sum(jnp.abs(deg[: M * block]).reshape(M, block), axis=1)
    bvalid = jnp.arange(M) < n_blk
    nb = jnp.maximum(n_blk, 1).astype(_F32)
    env_r = jnp.where(bvalid, env_r - jnp.sum(env_r * bvalid) / nb, 0.0)
    env_d = jnp.where(bvalid, env_d - jnp.sum(env_d * bvalid) / nb, 0.0)
    size = 2 ** int(math.ceil(math.log2(2 * M)))
    xc = jnp.fft.irfft(
        jnp.fft.rfft(env_d, size) * jnp.conj(jnp.fft.rfft(env_r, size)), size)
    # circular lag layout [0..M-1, -(size-M)..-1]; restrict to |lag| < n_blk
    lags = jnp.concatenate([jnp.arange(M), jnp.arange(-(size - M), 0)])
    ok = jnp.abs(lags) < jnp.maximum(n_blk, 1)
    coarse = lags[jnp.argmax(jnp.where(ok, xc, -jnp.inf))] * block

    # fine pass: +-1.5 blocks around coarse, one full-rate FFT correlation.
    # Size the FFT at >= 2T so the correlation stays LINEAR for every
    # admissible lag (|coarse| can reach n - block ~ T; the host sizes by
    # n + max|lag| + 1, ops/pesq.py:193 — a T + 2*block pad wraps circularly
    # for multi-second delays and the fine argmax would read aliased values)
    n = l // block * block  # host truncates to whole blocks
    size2 = 2 ** int(math.ceil(math.log2(2 * T)))
    cc = jnp.fft.irfft(
        jnp.fft.rfft(jnp.where(jnp.arange(T) < n, deg, 0.0), size2)
        * jnp.conj(jnp.fft.rfft(jnp.where(jnp.arange(T) < n, ref, 0.0), size2)),
        size2)
    w = jnp.arange(-(block + block // 2), block + block // 2 + 1)
    lag_w = coarse + w  # [3*block + 1]
    vals = cc[jnp.mod(lag_w, size2)]
    okf = (n - jnp.abs(lag_w)) >= block
    any_ok = jnp.any(okf)
    fine = lag_w[jnp.argmax(jnp.where(okf, vals, -jnp.inf))]
    return jnp.where(any_ok, fine, coarse)


def _apply_delay_row(deg, delay, l, T):
    """Shift left by ``delay`` within the row's valid region (host
    _apply_delay semantics on the exact-length signal, zero-extended)."""
    rolled = jnp.roll(deg, -delay)
    idx = jnp.arange(T)
    # delay > 0: content [delay, l) moves to [0, l-delay); everything from
    # l-delay on must be zero. delay < 0: [0, l) moves to [-delay, l-delay);
    # zeros before -delay and after l-delay.
    lo = jnp.maximum(-delay, 0)
    hi = l - jnp.maximum(delay, 0)  # host result stays length l
    return jnp.where((idx >= lo) & (idx < hi), rolled, 0.0)


def _pitch_powers(x, grouping, win, nf):
    frames = _frames_hop_half(x, nf) * win[None, :]
    spec = jnp.fft.rfft(frames, axis=1)
    p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    p = p * (2.0 / (nf * jnp.sum(win**2)))
    bands = p @ grouping  # [n_frames, n_bands]
    return bands * (10.0 ** (_LISTENING_LEVEL_DB / 10.0) / _TARGET_POWER)


def _total_audible(pp, abs_thresh):
    return jnp.sum(jnp.where(pp > abs_thresh[None, :], pp, 0.0), axis=1)


def _loudness(pp, abs_thresh):
    t = abs_thresh[None, :]
    s = (_LOUDNESS_SCALE * (t / 0.5) ** _ZWICKER_POWER
         * ((0.5 + 0.5 * pp / t) ** _ZWICKER_POWER - 1.0))
    return jnp.where(pp > t, s, 0.0)


def _aggregate(x, fvalid, n_frames):
    """L6 over 20-frame windows (hop 10, host tail semantics), L2 over the
    valid windows. x [N] masked to 0 beyond the row's frames."""
    N = x.shape[0]
    W = max(1, -(-max(1, N - 9) // 10))
    starts = 10 * jnp.arange(W)
    # windows [W, 20] via gather of static offsets (tiny)
    offs = starts[:, None] + jnp.arange(20)[None, :]
    inside = offs < N
    xw = jnp.where(inside, x[jnp.minimum(offs, N - 1)], 0.0)
    cnt = jnp.maximum(jnp.minimum(jnp.asarray(20), n_frames - starts), 1)
    # host: mean over x[s:s+20] where the slice stops at the array end; the
    # array end is n_frames (+0 masked tail), so divisor = min(20, n - s)
    l6 = (jnp.sum(xw**6.0, axis=1) / cnt.astype(_F32)) ** (1.0 / 6.0)
    wvalid = starts < jnp.maximum(n_frames - 9, 1)
    nw = jnp.maximum(jnp.sum(wvalid.astype(_F32)), 1.0)
    return jnp.sqrt(jnp.sum(jnp.where(wvalid, l6**2, 0.0)) / nw)


def _pesq_row(ref, deg, l, fs, mode, consts):
    irs_gain, level_mask, grouping, win, width_bark, abs_thresh = consts
    T = ref.shape[0]
    lf = l.astype(_F32)

    ref = _align_and_filter_row(ref, level_mask, irs_gain, lf)
    deg = _align_and_filter_row(deg, level_mask, irs_gain, lf)
    # the circular filter rings a little into the padded region; re-zero it
    keep = jnp.arange(T) < l
    ref = jnp.where(keep, ref, 0.0)
    deg = jnp.where(keep, deg, 0.0)

    delay = _estimate_delay_row(ref, deg, l, fs)
    deg = _apply_delay_row(deg, delay, l, T)

    nf = 256 if fs == 8000 else 512
    hop = nf // 2
    pp_ref = _pitch_powers(ref, grouping, win, nf)
    pp_deg = _pitch_powers(deg, grouping, win, nf)
    N = pp_ref.shape[0]
    # valid frames of the host chain = frames of the exact signal + 0.32 s
    # zero padding (the static row is zero there by construction)
    n_frames = jnp.minimum(
        (l + int(_DATA_PADDING_SEC * fs) - nf) // hop + 1, N)
    fvalid = jnp.arange(N) < n_frames

    total_ref = _total_audible(pp_ref, abs_thresh)
    silent_thr = 10.0 ** ((_LISTENING_LEVEL_DB - 35.0) / 10.0)
    speech = fvalid & (total_ref >= silent_thr)
    n_speech = jnp.sum(speech.astype(_F32))
    any_speech = n_speech > 0
    ns = jnp.maximum(n_speech, 1.0)

    avg_ref = jnp.sum(jnp.where(speech[:, None], pp_ref, 0.0), axis=0) / ns
    avg_deg = jnp.sum(jnp.where(speech[:, None], pp_deg, 0.0), axis=0) / ns
    band_ratio = jnp.clip(
        (avg_deg + _FREQ_COMP_OFFSET) / (avg_ref + _FREQ_COMP_OFFSET), 0.01, 100.0)
    pp_ref_c = pp_ref * band_ratio[None, :]

    aud_ref = _total_audible(pp_ref_c, abs_thresh)
    aud_deg = _total_audible(pp_deg, abs_thresh)
    ratio = (aud_ref + _GAIN_OFFSET) / (aud_deg + _GAIN_OFFSET)

    def smooth(g, r_t):
        g = 0.2 * r_t + 0.8 * g
        return g, jnp.clip(g, 3e-4, 5.0)

    # host seeds the smoother with ratio[0] (g = r_0), equivalent to a
    # carry-in of r_0 hitting the 0.2/0.8 blend... it is NOT: replicate the
    # exact host recurrence by scanning from g0 = ratio[0] over frames 1..N.
    g0 = ratio[0]
    _, gain_tail = jax.lax.scan(smooth, g0, ratio[1:])
    gain = jnp.concatenate([jnp.clip(g0, 3e-4, 5.0)[None], gain_tail])
    pp_deg_c = pp_deg * gain[:, None]

    loud_ref = _loudness(pp_ref_c, abs_thresh)
    loud_deg = _loudness(pp_deg_c, abs_thresh)
    d = loud_deg - loud_ref
    m = 0.25 * jnp.minimum(loud_deg, loud_ref)
    d = jnp.sign(d) * jnp.maximum(jnp.abs(d) - m, 0.0)

    asym = ((pp_deg_c + _ASYM_OFFSET) / (pp_ref_c + _ASYM_OFFSET)) ** 1.2
    asym = jnp.where(asym < 3.0, 0.0, jnp.minimum(asym, 12.0))

    wn = width_bark / jnp.sum(width_bark)
    d_frame = jnp.sum(wn[None, :] * jnp.abs(d) ** 3.0, axis=1) ** (1.0 / 3.0)
    da_frame = jnp.sum(wn[None, :] * jnp.abs(d) * asym, axis=1)
    h = ((total_ref + 1e5) / 10.0 ** (_LISTENING_LEVEL_DB / 10.0)) ** 0.04
    d_frame = jnp.where(fvalid, jnp.minimum(d_frame / h, 45.0), 0.0)
    da_frame = jnp.where(fvalid, jnp.minimum(da_frame / h, 45.0), 0.0)

    D = _aggregate(d_frame, fvalid, n_frames)
    DA = _aggregate(da_frame, fvalid, n_frames)
    D = jnp.where(any_speech, D, 0.0)
    DA = jnp.where(any_speech, DA, 0.0)

    raw = jnp.clip(4.5 - _D_WEIGHT * D - _DA_WEIGHT * DA, -0.5, 4.5)
    if mode == "nb":
        return 0.999 + 4.0 / (1.0 + jnp.exp(-1.4945 * raw + 4.6607))
    return 0.999 + 4.0 / (1.0 + jnp.exp(-1.3669 * raw + 3.8224))


@partial(jax.jit, static_argnames=("fs", "mode"))
def pesq_batch(ref: jax.Array, deg: jax.Array, lengths: jax.Array,
               fs: int = 8000, mode: str = "nb") -> jax.Array:
    """Batched device PESQ. ref/deg [B, T] (rows zero beyond ``lengths``),
    lengths [B] ints -> [B] float32 MOS-LQO. Rows shorter than 0.25 s get
    NaN (the host API raises; a batch can't)."""
    if mode not in ("nb", "wb"):
        raise ValueError(f"mode must be 'nb' or 'wb', got {mode!r}")
    if fs not in (8000, 16000):
        raise ValueError(f"fs must be 8000 or 16000, got {fs}")
    if mode == "wb" and fs != 16000:
        raise ValueError("wideband PESQ requires fs=16000")
    lengths = lengths.astype(jnp.int32)
    B, T = ref.shape
    Tp = T + int(_DATA_PADDING_SEC * fs)
    nf = 256 if fs == 8000 else 512
    Tp = -(-(Tp - nf) // (nf // 2)) * (nf // 2) + nf  # frame-grid align
    ref = jnp.pad(ref.astype(_F32), ((0, 0), (0, Tp - T)))
    deg = jnp.pad(deg.astype(_F32), ((0, 0), (0, Tp - T)))
    keep = jnp.arange(Tp)[None, :] < lengths[:, None]
    ref = jnp.where(keep, ref, 0.0)
    deg = jnp.where(keep, deg, 0.0)
    consts = tuple(jnp.asarray(c) for c in _consts(fs, Tp, mode))
    out = jax.vmap(lambda r, d, l: _pesq_row(r, d, l, fs, mode, consts))(
        ref, deg, lengths)
    return jnp.where(lengths >= fs // 4, out, jnp.nan).astype(_F32)
