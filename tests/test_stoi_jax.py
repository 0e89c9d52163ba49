"""Device STOI (ops/stoi_jax.py) vs the host implementation
(ops/metrics.stoi): batched padded rows must reproduce the host value of the
exactly-cropped row within the fp32 envelope."""

import numpy as np
import pytest

from tss_dprnn_tpu.data.resample import resample as host_resample
from tss_dprnn_tpu.ops import metrics as metrics_mod
from tss_dprnn_tpu.ops.stoi_jax import resample_batch, stoi_batch


def _speechish(rng, T, sr=8000):
    """Speech-like: harmonic voicing with AM envelope + silence gaps (so the
    silent-frame removal actually removes frames)."""
    t = np.arange(T) / sr
    f0 = rng.uniform(100, 250)
    x = sum(a * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6))
            for h, a in enumerate([1.0, 0.6, 0.3, 0.15], start=1))
    env = np.clip(np.sin(2 * np.pi * rng.uniform(1.5, 3.5) * t), 0, None)
    x = (x * env).astype(np.float32)
    x += 0.02 * rng.standard_normal(T).astype(np.float32)
    return 0.3 * x / (np.abs(x).max() + 1e-9)


def test_resample_batch_matches_host(rng):
    x = rng.standard_normal((3, 4001)).astype(np.float32)
    got = np.asarray(resample_batch(x, 8000, 10000))
    want = host_resample(x, 8000, 10000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_stoi_batch_matches_host(rng):
    sr = 8000
    T = 4 * sr
    lens = np.array([T, int(2.9 * sr), int(3.5 * sr), int(1.2 * sr)], np.int32)
    B = len(lens)
    clean = np.zeros((B, T), np.float32)
    deg = np.zeros((B, T), np.float32)
    for b in range(B):
        c = _speechish(rng, int(lens[b]), sr)
        noise = 0.1 * rng.standard_normal(int(lens[b])).astype(np.float32)
        clean[b, : lens[b]] = c
        deg[b, : lens[b]] = c * rng.uniform(0.6, 1.0) + noise
    got = np.asarray(stoi_batch(clean, deg, lens, sr))
    want = np.array([
        metrics_mod.stoi(clean[b, : lens[b]], deg[b, : lens[b]], sr)
        for b in range(B)
    ])
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=2e-3)
    # typical agreement is much tighter than the gate
    assert np.median(np.abs(got - want)) < 5e-4


def test_stoi_batch_identical_signals_near_one(rng):
    sr = 8000
    x = _speechish(rng, 3 * sr, sr)[None, :]
    got = float(np.asarray(stoi_batch(x, x, np.array([3 * sr], np.int32), sr))[0])
    assert got > 0.95


def test_stoi_batch_too_short_is_nan(rng):
    sr = 8000
    T = sr  # 1 s pad
    clean = np.zeros((2, T), np.float32)
    deg = np.zeros((2, T), np.float32)
    clean[0, :400] = rng.standard_normal(400)
    deg[0, :400] = clean[0, :400]
    clean[1] = _speechish(rng, T, sr)
    deg[1] = clean[1]
    got = np.asarray(stoi_batch(clean, deg, np.array([400, T], np.int32), sr))
    assert np.isnan(got[0])
    assert np.isfinite(got[1])


def test_stoi_batch_padding_invariance(rng):
    """Same row in two different buckets (pad amounts) -> same value."""
    sr = 8000
    l = int(2.7 * sr)
    c = _speechish(rng, l, sr)
    d = c * 0.8 + 0.05 * rng.standard_normal(l).astype(np.float32)
    out = []
    for T in (3 * sr, 5 * sr):
        cp = np.zeros((1, T), np.float32)
        dp = np.zeros((1, T), np.float32)
        cp[0, :l] = c
        dp[0, :l] = d
        out.append(float(np.asarray(stoi_batch(cp, dp, np.array([l], np.int32), sr))[0]))
    np.testing.assert_allclose(out[0], out[1], atol=2e-5)
