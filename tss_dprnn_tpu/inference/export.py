"""Serving export: serialize a jitted separation forward to a portable
StableHLO artifact (``jax.export``) and drive it without the model code.

The reference has no deployment story beyond "load the torch checkpoint in
Python" (src/inferencers/inferencer.py:33-46); production TPU serving wants a
compiler-level artifact instead: weights baked in as constants, shapes fixed
per bucket, no flax/python model code on the serving host. This module
provides

- :func:`export_separation` — one (batch, samples) bucket of a model's
  forward → ``jax.export.Exported`` (weights embedded);
- :func:`save_artifact` / :func:`load_artifact` — a zip container holding
  several buckets plus a JSON manifest;
- :class:`ServingModel` — picks the smallest bucket that fits an input,
  zero-pads batch and time, and crops the output back (the DPRNN graph is
  length-exact for zero-padded tails at these kernel/stride settings, the
  same property the bucketed eval loader relies on).

A fast-path (bf16 + Pallas) export embeds Mosaic TPU custom calls — those are
tied to the libtpu that produced them, hence non-hermetic across runtime
upgrades (``jax.export`` requires opting in via DisabledSafetyCheck). The
fp32 XLA path ('xla' backend) serializes to pure StableHLO and is stable.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

FORMAT_VERSION = 1


def _spe_like(model) -> bool:
    """True when the forward takes (mix, aux, aux_len) — Spe/IRA/RawNet."""
    return hasattr(model, "fusion_type")


def _aux_rate_factor(model) -> int:
    """RawNet references are 16 kHz raw waveforms (2x the 8 kHz mixture)."""
    return 2 if type(model).__name__ == "DPRNNRawNetTasNet" else 1


def example_args(model, batch_size: int, n_samples: int,
                 with_lengths: bool = False) -> Tuple[np.ndarray, ...]:
    mix = np.zeros((batch_size, n_samples), np.float32)
    lengths = (np.full((batch_size,), n_samples, np.int32),) if with_lengths else ()
    if not _spe_like(model):
        return (mix,) + lengths
    Ta = n_samples * _aux_rate_factor(model)
    aux = np.zeros((batch_size, Ta), np.float32)
    aux_len = np.full((batch_size,), float(Ta), np.float32)
    return (mix, aux, aux_len) + lengths


def export_separation(
    model,
    variables,
    batch_size: int,
    n_samples: int,
    *,
    lstm_backend: str = "xla",
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Export ``model.apply(variables, ...)`` (waveform output only) at a
    fixed (batch, samples) bucket. Weights are closed over — the artifact is
    self-contained.

    The forward takes a trailing ``lengths`` [B] int32 argument and runs the
    masked-eval path: shorter requests zero-pad up to the bucket and the
    masks keep the valid region bit-identical to an exact-shape run (the
    global norms' statistics would otherwise absorb the padded zeros —
    the same property tests/test_masked_eval.py pins for the eval loader)."""
    from tss_dprnn_tpu.ops import rnn as rnn_ops

    args = example_args(model, batch_size, n_samples, with_lengths=True)

    def fwd(*a):
        with rnn_ops.lstm_backend(lstm_backend):
            out = model.apply(variables, *a[:-1], lengths=a[-1])
        return out[0] if isinstance(out, tuple) else out

    disabled = [
        # Mosaic TPU kernels serialize as custom calls pinned to the
        # producing libtpu; the fp32 'xla' backend needs no exemptions.
        jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jax_export.DisabledSafetyCheck.custom_call("Sharding"),
    ]
    return jax_export.export(
        jax.jit(fwd),
        platforms=list(platforms) if platforms else None,
        disabled_checks=disabled if lstm_backend == "pallas" else [],
    )(*args)


def save_artifact(path: str, buckets: List[jax_export.Exported], meta: Dict[str, Any]):
    """Zip container: ``meta.json`` + one ``bucket_<B>x<T>.bin`` per shape."""
    entries = []
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for exp in buckets:
            B, T = exp.in_avals[0].shape
            name = f"bucket_{B}x{T}.bin"
            zf.writestr(name, exp.serialize())
            entries.append({"batch": int(B), "samples": int(T), "file": name})
        zf.writestr(
            "meta.json",
            json.dumps({"format_version": FORMAT_VERSION, "buckets": entries, **meta},
                       indent=2),
        )


def load_artifact(path: str) -> "ServingModel":
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(f"unsupported artifact version {meta.get('format_version')}")
        buckets = {}
        for ent in meta["buckets"]:
            exp = jax_export.deserialize(zf.read(ent["file"]))
            buckets[(ent["batch"], ent["samples"])] = exp
    return ServingModel(buckets, meta)


class ServingModel:
    """Callable over the exported buckets: pads (batch, time) up to the
    smallest bucket that fits, crops the result back to the true shape.

    ``call(mix [b, t], aux=None, aux_len=None) -> [b, n_out, t]`` separated
    waveforms (n_out = 2 for BSS, 1 for TSS)."""

    def __init__(self, buckets: Dict[Tuple[int, int], jax_export.Exported],
                 meta: Dict[str, Any]):
        self.buckets = buckets
        self.meta = meta
        self.spe = bool(meta.get("spe"))
        self.aux_factor = int(meta.get("aux_factor", 1))
        # Exported.call re-traces its XlaCallModule on every invocation
        # (measured: ~47 s/call at the flagship shape); wrapping each bucket
        # in jax.jit caches the compiled executable after the first call
        self._fns = {k: jax.jit(exp.call) for k, exp in buckets.items()}

    def _pick(self, b: int, t: int) -> Tuple[int, int]:
        fits = [k for k in self.buckets if k[0] >= b and k[1] >= t]
        if not fits:
            raise ValueError(
                f"no exported bucket fits batch={b}, samples={t}; "
                f"available: {sorted(self.buckets)}"
            )
        return min(fits, key=lambda k: (k[1], k[0]))

    def call(self, mix: np.ndarray, aux: Optional[np.ndarray] = None,
             aux_len: Optional[np.ndarray] = None,
             lengths: Optional[np.ndarray] = None) -> np.ndarray:
        """``lengths`` [b] (optional): per-request valid samples when rows of
        ``mix`` are themselves padded; defaults to the full ``t``."""
        b, t = mix.shape
        B, T = self._pick(b, t)
        pad = lambda a, rows, cols: np.pad(
            np.asarray(a, np.float32), ((0, rows - a.shape[0]), (0, cols - a.shape[1]))
        )
        args: Tuple[np.ndarray, ...] = (pad(mix, B, T),)
        if self.spe:
            if aux is None:
                raise ValueError("this artifact is a TSS model: aux is required")
            Ta = T * self.aux_factor
            if aux.shape[1] > Ta:
                raise ValueError(f"aux has {aux.shape[1]} samples > bucket {Ta}")
            if aux_len is None:
                aux_len = np.full((aux.shape[0],), float(aux.shape[1]), np.float32)
            args += (
                pad(aux, B, Ta),
                # filler rows get aux_len=Ta, not 0: the SpEx+ mean-pool
                # divides by aux_T(aux_len) and a zero length would put
                # inf/nan in rows we crop anyway
                np.pad(np.asarray(aux_len, np.float32), (0, B - b),
                       constant_values=float(Ta)),
            )
        if lengths is None:
            lengths = np.full((b,), t, np.int32)
        # filler rows claim full length; their garbage is cropped below
        args += (np.pad(np.asarray(lengths, np.int32), (0, B - b),
                        constant_values=T),)
        out = np.asarray(self._fns[(B, T)](*args))
        if out.ndim == 2:  # TSS: [B, T] single target
            out = out[:, None, :]
        return out[:b, :, :t]

    def platforms(self) -> Tuple[str, ...]:
        return next(iter(self.buckets.values())).platforms
