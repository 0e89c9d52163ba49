"""TPU-resident losses: SI-SDR, pairwise PIT matrices, cross-entropy.

Replaces the reference's ``asteroid.losses.PITLossWrapper(pairwise_neg_sisdr)``
(src/trainers/trainer.py:6,39) and the ``torch.nn.CrossEntropyLoss`` speaker
loss (src/trainers/trainer_spe.py:40-43). The reference computes these on
device via asteroid/torch; here they are jnp so the whole train step jits into
one XLA program — no host round-trip per step.

Semantics match asteroid's ``PairwiseNegSDR('sisdr')`` defaults:
zero-mean both signals, EPS=1e-8, 10*log10(||s_t||^2 / ||e||^2 + EPS),
PIT = min over source permutations of the mean pairwise loss.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp

EPS = 1e-8


def si_sdr(est, target, zero_mean: bool = True):
    """Scale-invariant SDR in dB. est/target: [..., T] -> [...]."""
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    dot = jnp.sum(est * target, axis=-1, keepdims=True)
    energy = jnp.sum(target * target, axis=-1, keepdims=True) + EPS
    scaled = (dot / energy) * target
    noise = est - scaled
    ratio = jnp.sum(scaled * scaled, axis=-1) / (jnp.sum(noise * noise, axis=-1) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


def masked_si_sdr(est, target, lengths=None):
    """SI-SDR restricted to the first ``lengths`` samples (for bucketed eval)."""
    if lengths is None:
        return si_sdr(est, target)
    T = est.shape[-1]
    t = jnp.arange(T)
    mask_shape = [1] * est.ndim
    mask_shape[0] = est.shape[0]
    mask_shape[-1] = T
    m = (t[None, :] < lengths[:, None]).astype(est.dtype)
    m = m.reshape(mask_shape)
    n = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    mean_e = jnp.sum(est * m, axis=-1, keepdims=True) / n[..., None]
    mean_t = jnp.sum(target * m, axis=-1, keepdims=True) / n[..., None]
    est = (est - mean_e) * m
    target = (target - mean_t) * m
    return si_sdr(est, target, zero_mean=False)


def pairwise_neg_sisdr(est, target, lengths=None):
    """est: [B, n_est, T], target: [B, n_src, T] -> [B, n_est, n_src] of -SI-SDR.

    Matches asteroid PairwiseNegSDR('sisdr'): both zero-meaned over time first.
    With ``lengths`` ([B] ints) every statistic is restricted to each row's
    first ``lengths[b]`` samples — zero-mean within the valid region, padding
    zeroed so the T-axis sums below ignore it. Equals computing the unmasked
    loss per row on exactly-cropped signals (tests/test_ops_losses.py) —
    the variable-length training loss (the reference trains fixed 3-s crops
    only, src/datasets/librimix.py:55-64).
    """
    if lengths is not None:
        T = est.shape[-1]
        m = (jnp.arange(T)[None, :] < lengths[:, None]).astype(est.dtype)[:, None, :]
        n = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
        est = (est - jnp.sum(est * m, axis=-1, keepdims=True) / n) * m
        target = (target - jnp.sum(target * m, axis=-1, keepdims=True) / n) * m
    else:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    # [B, n_est, n_src]
    dot = jnp.einsum("bet,bst->bes", est, target)
    energy = jnp.sum(target * target, axis=-1)[:, None, :] + EPS
    scale = dot / energy  # [B, n_est, n_src]
    # materialize the noise tensor [B, n_est, n_src, T]: n_est*n_src is tiny
    # (2 or 3 sources) and the explicit subtraction avoids the catastrophic
    # cancellation of the ||e||^2 - 2<e,s> + ||s||^2 expansion in fp32.
    scaled = scale[..., None] * target[:, None, :, :]
    noise = est[:, :, None, :] - scaled
    s_pow = jnp.sum(scaled * scaled, axis=-1)
    e_pow = jnp.sum(noise * noise, axis=-1)
    ratio = s_pow / (e_pow + EPS)
    return -10.0 * jnp.log10(ratio + EPS)


def pit_from_pairwise(pw):
    """pw: [B, n, n] pairwise loss matrix -> (min mean loss [B], best perm idx [B]).

    Enumerates the n! permutations (n is 2 or 3 here, as in the reference's
    2-speaker PIT, src/trainers/trainer.py:39)."""
    n = pw.shape[-1]
    perms = list(itertools.permutations(range(n)))
    losses = jnp.stack(
        [jnp.mean(pw[:, jnp.arange(n), jnp.asarray(p)], axis=-1) for p in perms],
        axis=-1,
    )  # [B, n!]
    idx = jnp.argmin(losses, axis=-1)
    return jnp.min(losses, axis=-1), idx


def pit_sisdr_loss(est, target, return_est: bool = False, lengths=None):
    """PIT-resolved negative SI-SDR, mean over batch.

    est/target: [B, n, T]. With ``return_est`` also returns ``est`` reordered
    to the best permutation (asteroid PITLossWrapper(..., return_est=True),
    used by the reference both as the loss and to reorder sources for metrics,
    src/inferencers/inferencer.py:60). ``lengths`` masks each row to its
    valid samples (variable-length training)."""
    pw = pairwise_neg_sisdr(est, target, lengths=lengths)
    loss_b, idx = pit_from_pairwise(pw)
    loss = jnp.mean(loss_b)
    if not return_est:
        return loss
    n = est.shape[1]
    perms = jnp.asarray(list(itertools.permutations(range(n))))  # [n!, n]
    sel = perms[idx]  # [B, n] — sel[b][j] = which est goes to target slot j
    # reorder est so that reordered[:, j] aligns with target[:, j]
    inv = jnp.argsort(sel, axis=-1)
    reordered = jnp.take_along_axis(est, inv[:, :, None], axis=1)
    return loss, reordered


def cross_entropy(logits, labels):
    """Mean softmax cross-entropy with integer labels (torch CrossEntropyLoss)."""
    logz = jnp.log(jnp.sum(jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True)), axis=-1))
    logz = logz + jnp.max(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - picked)
