"""Constant-memory separation of arbitrarily long audio.

The bucketed eval path jits one graph per (batch, length) bucket — right for
test-split utterances (≤ ~15 s), but a production input of minutes-to-hours
would compile an enormous graph and exceed HBM. This module instead runs ONE
fixed-window jitted forward over overlapping windows and stitches the window
estimates with weight-normalized crossfades: compile cost and device memory
are O(window), input length is unbounded, and the same compiled graph serves
every request. The reference has no equivalent (its eval loop is one
full-length forward per utterance, src/inferencers/inferencer.py:48-78).

BSS outputs are permutation-aligned across windows: a separation model's
source ordering is arbitrary per forward, so each window's sources are
reordered to best correlate with the running estimate over the overlap
region before being blended in.
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional

import numpy as np


def _crossfade_weight(window: int, overlap: int) -> np.ndarray:
    """Per-sample blend weight: linear ramps over the overlapped edges,
    1 in the interior. Stitching divides by the accumulated weight, so
    reconstruction is exact wherever window estimates agree (and edge
    windows, covered once, pass through untouched)."""
    w = np.ones(window, np.float32)
    if overlap > 0:
        ramp = np.arange(1, overlap + 1, dtype=np.float32) / (overlap + 1)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def _best_permutation(prev: np.ndarray, cur: np.ndarray) -> tuple:
    """Source order of ``cur`` [n_src, ov] best matching ``prev`` [n_src, ov]
    by summed normalized cross-correlation over the overlap."""
    n = prev.shape[0]
    pn = prev / (np.linalg.norm(prev, axis=-1, keepdims=True) + 1e-12)
    cn = cur / (np.linalg.norm(cur, axis=-1, keepdims=True) + 1e-12)
    score = pn @ cn.T  # [prev_src, cur_src]
    best, best_v = tuple(range(n)), -np.inf
    for p in itertools.permutations(range(n)):
        v = sum(score[j, p[j]] for j in range(n))
        if v > best_v:
            best_v, best = v, p
    return best


class WindowedSeparator:
    """Stream an arbitrarily long waveform through a fixed-window forward.

    ``forward``: callable ``[B, window] float32 -> [B, n_src, window]``
    (typically a jitted model apply; see :func:`bss_windowed` /
    :func:`spe_windowed`). Called with a constant batch shape — ragged tails
    are padded with zero rows — so a jitted callable compiles exactly once.

    ``__call__(mix [T]) -> [n_src, T]``.
    """

    def __init__(self, forward: Callable[[np.ndarray], np.ndarray], window: int,
                 hop: Optional[int] = None, batch_size: int = 8,
                 align_sources: bool = True):
        if hop is None:
            hop = window // 2
        if not 0 < hop <= window:
            raise ValueError(f"hop must be in (0, window], got {hop} vs {window}")
        self.forward = forward
        self.window = int(window)
        self.hop = int(hop)
        self.batch_size = int(batch_size)
        self.align_sources = align_sources

    def _window_starts(self, T: int):
        if T <= self.window:
            return [0]
        starts = list(range(0, T - self.window, self.hop))
        starts.append(T - self.window)  # flush right; stitching renormalizes
        return starts

    def __call__(self, mix: np.ndarray) -> np.ndarray:
        mix = np.asarray(mix, np.float32)
        if mix.ndim != 1:
            raise ValueError(f"mix must be 1-D [T], got shape {mix.shape}")
        T = len(mix)
        W = self.window
        padded_T = max(T, W)
        x = np.zeros(padded_T, np.float32)
        x[:T] = mix
        starts = self._window_starts(padded_T)

        # batched forwards at a constant [batch_size, W] shape
        frames = np.stack([x[s:s + W] for s in starts])
        ests = []
        for i in range(0, len(frames), self.batch_size):
            chunk = frames[i:i + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, W), np.float32)])
            out = np.asarray(self.forward(chunk))
            ests.append(out[: len(frames) - i])
        est = np.concatenate(ests)  # [n_win, n_src, W]
        n_src = est.shape[1]

        weight = _crossfade_weight(W, W - self.hop)
        num = np.zeros((n_src, padded_T), np.float32)
        den = np.zeros(padded_T, np.float32)
        for k, s in enumerate(starts):
            e = est[k]
            if self.align_sources and n_src > 1 and k > 0:
                ov_prev = num[:, s:s + W] / np.maximum(den[s:s + W], 1e-12)
                valid = den[s:s + W] > 0
                if valid.any():
                    perm = _best_permutation(ov_prev[:, valid], e[:, valid])
                    e = e[list(perm)]
            num[:, s:s + W] += e * weight
            den[s:s + W] += weight
        return (num / np.maximum(den, 1e-12))[:, :T]


def _wire_decode(pcm, scale) -> np.ndarray:
    return np.asarray(pcm).astype(np.float32) * np.asarray(scale)


def bss_windowed(model, variables, window: int, hop: Optional[int] = None,
                 batch_size: int = 8, lstm_backend: str = "pallas",
                 wire: bool = True) -> WindowedSeparator:
    """WindowedSeparator over a BSS model (DPRNNTasNet-like:
    ``apply(vars, mix) -> [B, n_src, T]``).

    ``wire``: move the window estimates device->host as int16 PCM + per-row
    fp32 scale (same format as Inferencer._encode_wire — quantization at
    -96 dBFS, orders below metric sensitivity) instead of fp32. Halves the
    dominant transfer on PCIe/tunnel-constrained serving hosts; ``False``
    restores the exact fp32 path."""
    import jax
    import jax.numpy as jnp

    from tss_dprnn_tpu.ops import rnn as rnn_ops

    @jax.jit
    def fwd(mix):
        with rnn_ops.lstm_backend(lstm_backend):
            est = model.apply(variables, mix)
        if not wire:
            return est
        peak = jnp.max(jnp.abs(est), axis=-1, keepdims=True)
        scale = 32767.0 / jnp.maximum(peak, 1e-9)
        return (jnp.clip(est * scale, -32767, 32767).astype(jnp.int16),
                (1.0 / scale).astype(jnp.float32))

    if wire:
        return WindowedSeparator(lambda m: _wire_decode(*fwd(m)), window, hop, batch_size)
    return WindowedSeparator(lambda m: np.asarray(fwd(m)), window, hop, batch_size)


def spe_windowed(model, variables, reference: np.ndarray, ref_len: Optional[float] = None,
                 window: int = 80000, hop: Optional[int] = None, batch_size: int = 8,
                 lstm_backend: str = "pallas") -> WindowedSeparator:
    """WindowedSeparator over a target-speech model (DPRNNSpe/IRA/RawNet
    TasNet: ``apply(vars, mix, aux, aux_len) -> (wav [B, T], logits)``).

    The speaker reference is embedded per window batch with the same tiled
    waveform — single target, so no cross-window source alignment is needed."""
    import jax

    from tss_dprnn_tpu.ops import rnn as rnn_ops

    reference = np.asarray(reference, np.float32).ravel()
    if ref_len is None:
        ref_len = float(len(reference))

    @jax.jit
    def fwd(mix, aux, aux_len):
        with rnn_ops.lstm_backend(lstm_backend):
            wav, _ = model.apply(variables, mix, aux, aux_len, train=False)
        return wav

    def forward(mix_batch: np.ndarray) -> np.ndarray:
        B = mix_batch.shape[0]
        aux = np.broadcast_to(reference, (B, len(reference)))
        al = np.full((B,), ref_len, np.float32)
        return np.asarray(fwd(mix_batch, aux, al))[:, None, :]

    return WindowedSeparator(forward, window, hop, batch_size, align_sources=False)
