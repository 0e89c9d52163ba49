"""Device PESQ (ops/pesq_jax.py) vs the host chain (ops/pesq.py): batched
padded rows must reproduce the host value of the exactly-cropped row within
the documented fp32/padded-FFT envelope (|delta| <= 0.05 MOS gate, typically
far tighter)."""

import numpy as np
import pytest

from tss_dprnn_tpu.ops.pesq import pesq as host_pesq
from tss_dprnn_tpu.ops.pesq_jax import pesq_batch


def _speechish(rng, T, sr=8000):
    t = np.arange(T) / sr
    f0 = rng.uniform(120, 220)
    x = sum(a * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6))
            for h, a in enumerate([1.0, 0.5, 0.25, 0.12], start=1))
    env = np.clip(np.sin(2 * np.pi * rng.uniform(1.5, 3.0) * t), 0, None)
    x = (x * env).astype(np.float32)
    x += 0.01 * rng.standard_normal(T).astype(np.float32)
    return 0.4 * x / (np.abs(x).max() + 1e-9)


def _batch(rng, lens, T, sr, degrade):
    B = len(lens)
    ref = np.zeros((B, T), np.float32)
    deg = np.zeros((B, T), np.float32)
    for b, l in enumerate(lens):
        c = _speechish(rng, l, sr)
        ref[b, :l] = c
        deg[b, :l] = degrade(c, b)
    return ref, deg


def test_pesq_batch_matches_host(rng):
    sr = 8000
    T = 4 * sr
    lens = np.array([T, int(2.7 * sr), int(3.3 * sr)], np.int32)

    def degrade(c, b):
        noise = rng.standard_normal(len(c)).astype(np.float32)
        snr = [30.0, 20.0, 12.0][b]
        noise *= np.sqrt(np.mean(c**2) / np.mean(noise**2)) * 10 ** (-snr / 20)
        return c + noise

    ref, deg = _batch(rng, lens, T, sr, degrade)
    got = np.asarray(pesq_batch(ref, deg, lens, sr, "nb"))
    want = np.array([host_pesq(sr, ref[b, : lens[b]], deg[b, : lens[b]], "nb")
                     for b in range(len(lens))])
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=0.05)
    assert np.median(np.abs(got - want)) < 0.02


def test_pesq_batch_identical_is_ceiling(rng):
    sr = 8000
    x = _speechish(rng, 3 * sr, sr)[None, :]
    got = float(np.asarray(pesq_batch(x, x, np.array([3 * sr], np.int32), sr))[0])
    assert got == pytest.approx(4.549, abs=2e-3)


def test_pesq_batch_delayed_estimate(rng):
    """A shifted degraded signal must be realigned by the delay search (host
    behavior): score close to the unshifted score."""
    sr = 8000
    l = 3 * sr
    c = _speechish(rng, l, sr)
    d = c * 0.9 + 0.02 * rng.standard_normal(l).astype(np.float32)
    shift = 160  # 20 ms
    d_shifted = np.concatenate([np.zeros(shift, np.float32), d[:-shift]])
    T = l
    ref = np.stack([c, c]).astype(np.float32)
    deg = np.stack([d, d_shifted]).astype(np.float32)
    lens = np.array([l, l], np.int32)
    got = np.asarray(pesq_batch(ref, deg, lens, sr, "nb"))
    want = np.array([host_pesq(sr, c, d, "nb"),
                     host_pesq(sr, c, d_shifted, "nb")])
    np.testing.assert_allclose(got, want, atol=0.05)


def test_pesq_batch_padding_invariance(rng):
    sr = 8000
    l = int(2.6 * sr)
    c = _speechish(rng, l, sr)
    d = c * 0.8 + 0.05 * rng.standard_normal(l).astype(np.float32)
    vals = []
    for T in (3 * sr, 5 * sr):
        ref = np.zeros((1, T), np.float32)
        deg = np.zeros((1, T), np.float32)
        ref[0, :l] = c
        deg[0, :l] = d
        vals.append(float(np.asarray(
            pesq_batch(ref, deg, np.array([l], np.int32), sr))[0]))
    # different static pads change FFT grids (documented divergence class);
    # values must agree to well under the host-parity gate
    np.testing.assert_allclose(vals[0], vals[1], atol=0.02)


def test_pesq_batch_too_short_nan(rng):
    sr = 8000
    ref = np.zeros((1, sr), np.float32)
    ref[0, :1000] = 0.1
    got = np.asarray(pesq_batch(ref, ref, np.array([1000], np.int32), sr))
    assert np.isnan(got[0])


def test_pesq_batch_wideband_matches_host(rng):
    sr = 16000
    T = 3 * sr
    lens = np.array([T, int(2.1 * sr)], np.int32)

    def degrade(c, b):
        noise = rng.standard_normal(len(c)).astype(np.float32)
        noise *= np.sqrt(np.mean(c**2) / np.mean(noise**2)) * 10 ** (-[25.0, 15.0][b] / 20)
        return c + noise

    ref, deg = _batch(rng, lens, T, sr, degrade)
    got = np.asarray(pesq_batch(ref, deg, lens, sr, "wb"))
    want = np.array([host_pesq(sr, ref[b, : lens[b]], deg[b, : lens[b]], "wb")
                     for b in range(len(lens))])
    np.testing.assert_allclose(got, want, atol=0.05)
