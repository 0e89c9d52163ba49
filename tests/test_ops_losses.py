"""SI-SDR / PIT losses vs an independent numpy oracle implementing the
asteroid PairwiseNegSDR('sisdr') definition the reference relies on
(src/trainers/trainer.py:6,39)."""

import itertools

import numpy as np
import torch

from tss_dprnn_tpu.ops import losses

EPS = 1e-8


def np_si_sdr(est, target):
    est = est - est.mean(-1, keepdims=True)
    target = target - target.mean(-1, keepdims=True)
    dot = np.sum(est * target, -1, keepdims=True)
    s_t = dot * target / (np.sum(target**2, -1, keepdims=True) + EPS)
    e = est - s_t
    return 10 * np.log10(np.sum(s_t**2, -1) / (np.sum(e**2, -1) + EPS) + EPS)


def np_pairwise(est, target):
    B, n, T = est.shape
    m = target.shape[1]
    out = np.zeros((B, n, m))
    for i in range(n):
        for j in range(m):
            out[:, i, j] = -np_si_sdr(est[:, i], target[:, j])
    return out


def np_pit(est, target):
    pw = np_pairwise(est, target)
    n = est.shape[1]
    best = None
    for p in itertools.permutations(range(n)):
        val = np.mean([pw[:, i, p[i]] for i in range(n)], axis=0)
        best = val if best is None else np.minimum(best, val)
    return np.mean(best)


def test_si_sdr_matches_numpy(rng):
    est = rng.standard_normal((4, 1000)).astype(np.float32)
    target = rng.standard_normal((4, 1000)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(losses.si_sdr(est, target)), np_si_sdr(est, target), atol=1e-4, rtol=1e-4
    )


def test_si_sdr_scale_invariance(rng):
    t = rng.standard_normal((2, 500)).astype(np.float32)
    est = t + 0.1 * rng.standard_normal((2, 500)).astype(np.float32)
    a = np.asarray(losses.si_sdr(est, t))
    b = np.asarray(losses.si_sdr(est, 3.7 * t))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_pairwise_matches_numpy(rng):
    est = rng.standard_normal((3, 2, 800)).astype(np.float32)
    target = rng.standard_normal((3, 2, 800)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(losses.pairwise_neg_sisdr(est, target)),
        np_pairwise(est, target),
        atol=1e-3,
        rtol=1e-4,
    )


def test_pit_loss_and_reordering(rng):
    target = rng.standard_normal((3, 2, 600)).astype(np.float32)
    # est = swapped targets + noise -> PIT must find the swap
    est = target[:, ::-1] + 0.01 * rng.standard_normal((3, 2, 600)).astype(np.float32)
    loss, reordered = losses.pit_sisdr_loss(est, target, return_est=True)
    np.testing.assert_allclose(float(loss), np_pit(est, target), atol=1e-3)
    # reordered sources must align with targets
    si = np.asarray(losses.si_sdr(np.asarray(reordered), target))
    assert (si > 20).all()


def test_masked_si_sdr_equals_exact(rng):
    T = 64
    lengths = np.array([64, 41], dtype=np.int32)
    est = rng.standard_normal((2, T)).astype(np.float32)
    target = rng.standard_normal((2, T)).astype(np.float32)
    got = np.asarray(losses.masked_si_sdr(est, target, lengths))
    for b, l in enumerate(lengths):
        exact = np_si_sdr(est[b : b + 1, :l], target[b : b + 1, :l])
        np.testing.assert_allclose(got[b], exact[0], atol=1e-4)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((5, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=5)
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(losses.cross_entropy(logits, labels))
    np.testing.assert_allclose(got, ref, atol=1e-5)
