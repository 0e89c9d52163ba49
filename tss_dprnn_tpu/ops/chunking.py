"""Chunk segmentation / overlap-add as pure reshapes.

Replaces the torch ``unfold``/``fold`` pair of the reference DPRNN
(src/models/dprnn.py:189-217): the feature sequence [B, N, L] is zero-padded
by a full chunk K on both sides and cut into S overlapping chunks of length K
with hop H; overlap-add is the exact adjoint (fold *sums* overlaps, no
normalization).

TPU-first design: when ``K % H == 0`` (always true for the shipped configs,
K=250, H=125) the overlapping frames split into ``r = K // H`` interleaved
classes of *non-overlapping* frames, so both directions are expressible as
pad + reshape + transpose (+ add for the adjoint) — zero gathers, zero
scatters, fully fusible by XLA and layout-friendly for the MXU consumers.
A gather/scatter fallback covers arbitrary hops.
"""

from __future__ import annotations

import jax.numpy as jnp


def num_chunks(L: int, chunk_length: int, hop_length: int) -> int:
    """S for an input of length L (torch unfold with padding=K both sides):
    floor((L + 2K - K) / H) + 1 (reference dprnn.py:192-198)."""
    return (L + chunk_length) // hop_length + 1


def segment(x, chunk_length: int, hop_length: int):
    """[B, N, L] -> [B, N, K, S] overlapping chunks (reference dprnn.py:189-201)."""
    K, H = chunk_length, hop_length
    B, N, L = x.shape
    S = num_chunks(L, K, H)
    padded = jnp.pad(x, ((0, 0), (0, 0), (K, K)))
    Lp = L + 2 * K
    if K % H == 0:
        r = K // H
        # class j holds frames s = j, j+r, j+2r, ... ; frame s starts at s*H,
        # so within a class consecutive frames start K apart: non-overlapping.
        chunks = []  # each [B, N, n_j, K]
        n_per = []
        for j in range(r):
            n_j = (S - j + r - 1) // r
            n_per.append(n_j)
            start = j * H
            need = start + n_j * K
            strip = padded
            if need > Lp:
                strip = jnp.pad(strip, ((0, 0), (0, 0), (0, need - Lp)))
            strip = strip[:, :, start : start + n_j * K]
            chunks.append(strip.reshape(B, N, n_j, K))
        n_max = max(n_per)
        stacked = jnp.stack(
            [
                jnp.pad(c, ((0, 0), (0, 0), (0, n_max - c.shape[2]), (0, 0)))
                for c in chunks
            ],
            axis=3,
        )  # [B, N, n_max, r, K]
        # interleave classes back to frame order s = m*r + j
        out = stacked.reshape(B, N, n_max * r, K)[:, :, :S, :]
        return jnp.transpose(out, (0, 1, 3, 2))  # [B, N, K, S]
    # generic fallback: strided gather
    starts = jnp.arange(S) * H
    idx = starts[None, :] + jnp.arange(K)[:, None]  # [K, S]
    safe = jnp.minimum(idx, Lp - 1)
    out = jnp.take(padded, safe.reshape(-1), axis=2).reshape(B, N, K, S)
    return out


def overlap_add(x, L: int, hop_length: int):
    """[B, N, K, S] -> [B, N, L]; exact adjoint of :func:`segment`
    (torch fold, reference dprnn.py:203-217). Overlaps are summed."""
    B, N, K, S = x.shape
    H = hop_length
    Lp = L + 2 * K
    if K % H == 0:
        r = K // H
        total = None
        frames = jnp.transpose(x, (0, 1, 3, 2))  # [B, N, S, K]
        for j in range(r):
            n_j = (S - j + r - 1) // r
            if n_j <= 0:
                continue
            cls = frames[:, :, j::r, :]  # [B, N, n_j, K]
            strip = cls.reshape(B, N, n_j * K)
            start = j * H
            width = start + n_j * K
            pad_right = max(Lp, width) - width
            strip = jnp.pad(strip, ((0, 0), (0, 0), (start, pad_right)))
            strip = strip[:, :, :Lp] if strip.shape[2] > Lp else strip
            total = strip if total is None else total + strip
        return total[:, :, K : K + L]
    # generic fallback: scatter-add
    starts = jnp.arange(S) * H
    idx = (starts[None, :] + jnp.arange(K)[:, None]).reshape(-1)  # [K*S]
    flat = jnp.transpose(x, (0, 1, 2, 3)).reshape(B, N, K * S)
    out = jnp.zeros((B, N, Lp + K), x.dtype)
    out = out.at[:, :, idx].add(flat)
    return out[:, :, K : K + L]


# ---------------------------------------------------------------------------
# Channels-last variants — the layouts the TPU model core actually uses.
# Keeping the feature axis last puts it on the 128-lane dimension, so the
# LSTM/Dense consumers need no transposes; the torch-layout functions above
# remain as the parity/test surface.
# ---------------------------------------------------------------------------


def segment_cl(x, chunk_length: int, hop_length: int):
    """[B, L, N] -> [B, S, K, N] overlapping chunks (channels-last)."""
    K, H = chunk_length, hop_length
    B, L, N = x.shape
    S = num_chunks(L, K, H)
    padded = jnp.pad(x, ((0, 0), (K, K), (0, 0)))
    Lp = L + 2 * K
    if K % H == 0:
        r = K // H
        chunks = []
        for j in range(r):
            n_j = (S - j + r - 1) // r
            start = j * H
            need = start + n_j * K
            strip = padded
            if need > Lp:
                strip = jnp.pad(strip, ((0, 0), (0, need - Lp), (0, 0)))
            strip = strip[:, start : start + n_j * K, :]
            chunks.append(strip.reshape(B, n_j, K, N))
        n_max = max(c.shape[1] for c in chunks)
        stacked = jnp.stack(
            [jnp.pad(c, ((0, 0), (0, n_max - c.shape[1]), (0, 0), (0, 0))) for c in chunks],
            axis=2,
        )  # [B, n_max, r, K, N]
        return stacked.reshape(B, n_max * r, K, N)[:, :S]
    starts = jnp.arange(S) * H
    idx = starts[:, None] + jnp.arange(K)[None, :]  # [S, K]
    return jnp.take(padded, jnp.minimum(idx, Lp - 1).reshape(-1), axis=1).reshape(B, S, K, N)


def overlap_add_cl(x, L: int, hop_length: int):
    """[B, S, K, N] -> [B, L, N]; adjoint of :func:`segment_cl` (sums overlaps)."""
    B, S, K, N = x.shape
    H = hop_length
    Lp = L + 2 * K
    if K % H == 0:
        r = K // H
        total = None
        for j in range(r):
            n_j = (S - j + r - 1) // r
            if n_j <= 0:
                continue
            strip = x[:, j::r].reshape(B, n_j * K, N)
            start = j * H
            pad_right = Lp - (start + n_j * K)
            strip = jnp.pad(strip, ((0, 0), (start, max(pad_right, 0)), (0, 0)))
            strip = strip[:, :Lp]
            total = strip if total is None else total + strip
        return total[:, K : K + L]
    starts = jnp.arange(S) * H
    idx = (starts[:, None] + jnp.arange(K)[None, :]).reshape(-1)
    out = jnp.zeros((B, Lp + K, N), x.dtype)
    out = out.at[:, idx].add(x.reshape(B, S * K, N))
    return out[:, K : K + L]
