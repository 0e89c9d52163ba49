"""Probe: gate regrouping [i,f,g,o] -> [i,f,o,g] in the bilstm2 forward
kernel so all three sigmoid gates activate in ONE (tile, 3H) VPU pass
instead of three (tile, H) passes (ROUND_NOTES item 3: the cell is
VPU-elementwise bound; transcendental op count is part of the floor).

Runs on the TPU: parity check vs the production kernel, then timing at the
flagship intra-scan shape. Variants:
  base     — production bilstm2_forward
  regroup  — [i,f,o,g] weight layout, sigmoid over one 3H slab
  regroup2 — additionally activates BOTH directions' slabs back-to-back

    python scripts/perf/gate_reorder_probe.py [--iters 20]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tss_dprnn_tpu.ops.pallas_lstm import (
    _bilstm2_core,
    _pick_unroll,
    _round_up,
    _sigmoid,
    bilstm2_forward,
)


def _kernel_regroup(x0_ref, x1_ref, wih_ref, whh_ref, b_ref,
                    o0_ref, o1_ref, h0s, c0s, h1s, c1s,
                    *, hidden: int, unroll: int, n_t: int, pad: int):
    """Weights pre-permuted to [i, f, o, g]: sigmoid over [:, :3H] in one op."""
    t = pl.program_id(1)
    H = hidden
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        h0s[:] = jnp.zeros_like(h0s)
        c0s[:] = jnp.zeros_like(c0s)
        h1s[:] = jnp.zeros_like(h1s)
        c1s[:] = jnp.zeros_like(c1s)

    h0, c0, h1, c1 = h0s[:], c0s[:], h1s[:], c1s[:]
    for u in range(unroll):
        x_t = x0_ref[u, :, :]
        g = jnp.dot(x_t, wih_ref[0], preferred_element_type=f32)
        g = g + jnp.dot(h0.astype(x_t.dtype), whh_ref[0], preferred_element_type=f32)
        g = g + b_ref[0, 0].astype(f32)
        s = _sigmoid(g[:, : 3 * H])
        i, f, o = s[:, :H], s[:, H : 2 * H], s[:, 2 * H : 3 * H]
        gg = jnp.tanh(g[:, 3 * H :])
        c0 = f * c0 + i * gg
        h0 = (o * jnp.tanh(c0)).astype(x_t.dtype)
        o0_ref[u, :, :] = h0.astype(o0_ref.dtype)

        u1 = unroll - 1 - u
        x_t = x1_ref[u1, :, :]
        g = jnp.dot(x_t, wih_ref[1], preferred_element_type=f32)
        g = g + jnp.dot(h1.astype(x_t.dtype), whh_ref[1], preferred_element_type=f32)
        g = g + b_ref[1, 0].astype(f32)
        s = _sigmoid(g[:, : 3 * H])
        i, f, o = s[:, :H], s[:, H : 2 * H], s[:, 2 * H : 3 * H]
        gg = jnp.tanh(g[:, 3 * H :])
        c1_new = f * c1 + i * gg
        h1_new = (o * jnp.tanh(c1_new)).astype(x_t.dtype)
        if pad and u1 >= unroll - pad:
            valid = t > 0
            c1 = jnp.where(valid, c1_new, c1)
            h1 = jnp.where(valid, h1_new, h1)
        else:
            c1, h1 = c1_new, h1_new
        o1_ref[u1, :, :] = h1.astype(o1_ref.dtype)
    h0s[:], c0s[:], h1s[:], c1s[:] = h0, c0, h1, c1


def _kernel_regroup2(x0_ref, x1_ref, wih_ref, whh_ref, b_ref,
                     o0_ref, o1_ref, h0s, c0s, h1s, c1s,
                     *, hidden: int, unroll: int, n_t: int, pad: int):
    """Both directions' gate slabs computed, then activated back-to-back
    (matmuls first, elementwise second — gives Mosaic a longer elementwise
    region to schedule against the next sub-step's matmuls)."""
    t = pl.program_id(1)
    H = hidden
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        h0s[:] = jnp.zeros_like(h0s)
        c0s[:] = jnp.zeros_like(c0s)
        h1s[:] = jnp.zeros_like(h1s)
        c1s[:] = jnp.zeros_like(c1s)

    h0, c0, h1, c1 = h0s[:], c0s[:], h1s[:], c1s[:]
    for u in range(unroll):
        u1 = unroll - 1 - u
        xa = x0_ref[u, :, :]
        xb = x1_ref[u1, :, :]
        ga = jnp.dot(xa, wih_ref[0], preferred_element_type=f32)
        ga = ga + jnp.dot(h0.astype(xa.dtype), whh_ref[0], preferred_element_type=f32)
        ga = ga + b_ref[0, 0].astype(f32)
        gb = jnp.dot(xb, wih_ref[1], preferred_element_type=f32)
        gb = gb + jnp.dot(h1.astype(xb.dtype), whh_ref[1], preferred_element_type=f32)
        gb = gb + b_ref[1, 0].astype(f32)

        sa = _sigmoid(ga[:, : 3 * H])
        gga = jnp.tanh(ga[:, 3 * H :])
        c0 = sa[:, H : 2 * H] * c0 + sa[:, :H] * gga
        h0 = (sa[:, 2 * H : 3 * H] * jnp.tanh(c0)).astype(xa.dtype)
        o0_ref[u, :, :] = h0.astype(o0_ref.dtype)

        sb = _sigmoid(gb[:, : 3 * H])
        ggb = jnp.tanh(gb[:, 3 * H :])
        c1_new = sb[:, H : 2 * H] * c1 + sb[:, :H] * ggb
        h1_new = (sb[:, 2 * H : 3 * H] * jnp.tanh(c1_new)).astype(xb.dtype)
        if pad and u1 >= unroll - pad:
            valid = t > 0
            c1 = jnp.where(valid, c1_new, c1)
            h1 = jnp.where(valid, h1_new, h1)
        else:
            c1, h1 = c1_new, h1_new
        o1_ref[u1, :, :] = h1.astype(o1_ref.dtype)
    h0s[:], c0s[:], h1s[:], c1s[:] = h0, c0, h1, c1


def _core_variant(kernel, x, w_ih2, b2, w_hh2, row_tile: int, unroll: int):
    B, T, F = x.shape
    H = w_hh2.shape[1]
    u = _pick_unroll(T, unroll)
    Tp = T
    if u == 1 and unroll > 1:
        u = unroll
        Tp = _round_up(T, u)
    pad = Tp - T
    xk = jnp.swapaxes(x, 0, 1)
    if pad:
        xk = jnp.pad(xk, ((0, pad), (0, 0), (0, 0)))
    Rp = _round_up(max(B, 8), 8)
    tile = min(row_tile, Rp)
    Rp = _round_up(Rp, tile)
    if Rp != B:
        xk = jnp.pad(xk, ((0, 0), (0, Rp - B), (0, 0)))
    grid = (Rp // tile, Tp // u)
    n_t = Tp // u

    def fmap(r, t):
        return (t, r, 0)

    def mmap(r, t):
        return (n_t - 1 - t, r, 0)

    def wmap(r, t):
        return (0, 0, 0)

    sblk = pl.BlockSpec((u, tile, H), fmap)
    sblk_m = pl.BlockSpec((u, tile, H), mmap)
    sshape = jax.ShapeDtypeStruct((Tp, Rp, H), xk.dtype)
    out = pl.pallas_call(
        functools.partial(kernel, hidden=H, unroll=u, n_t=n_t, pad=pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((u, tile, F), fmap),
            pl.BlockSpec((u, tile, F), mmap),
            pl.BlockSpec((2, F, 4 * H), wmap),
            pl.BlockSpec((2, H, 4 * H), wmap),
            pl.BlockSpec((2, 1, 4 * H), wmap),
        ],
        out_specs=(sblk, sblk_m),
        out_shape=(sshape, sshape),
        scratch_shapes=[pltpu.VMEM((tile, H), xk.dtype), pltpu.VMEM((tile, H), jnp.float32),
                        pltpu.VMEM((tile, H), xk.dtype), pltpu.VMEM((tile, H), jnp.float32)],
    )(xk, xk, w_ih2, w_hh2, b2[:, None, :])
    o0, o1 = out
    return (jnp.swapaxes(o0[:T, :B], 0, 1), jnp.swapaxes(o1[:T, :B], 0, 1))


def regroup_weights(w):
    """[.., 4H] torch gate order i,f,g,o -> i,f,o,g."""
    H = w.shape[-1] // 4
    parts = [w[..., :H], w[..., H: 2 * H], w[..., 3 * H:], w[..., 2 * H: 3 * H]]
    return jnp.concatenate(parts, axis=-1)


def main():
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 20
    # flagship intra-scan shape: rows = B*n_chunks collapses to the kernel's
    # row dim; use the same magnitudes as the production profile
    B, T, F, H = 6144, 250, 128, 128
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)), dt)
    w_ih2 = jnp.asarray(rng.standard_normal((2, F, 4 * H)) * 0.05, dt)
    w_hh2 = jnp.asarray(rng.standard_normal((2, H, 4 * H)) * 0.05, dt)
    b2 = jnp.asarray(rng.standard_normal((2, 4 * H)) * 0.05, dt)
    w_ih2_r, w_hh2_r, b2_r = (regroup_weights(w_ih2), regroup_weights(w_hh2),
                              regroup_weights(b2))

    base = jax.jit(lambda x: bilstm2_forward(x, w_ih2, b2, w_hh2))
    reg = jax.jit(lambda x: _core_variant(_kernel_regroup, x, w_ih2_r, b2_r,
                                          w_hh2_r, 512, 5))
    reg2 = jax.jit(lambda x: _core_variant(_kernel_regroup2, x, w_ih2_r, b2_r,
                                           w_hh2_r, 512, 5))

    ref = base(x)
    for name, fn in [("regroup", reg), ("regroup2", reg2)]:
        got = fn(x)
        for a, b in zip(ref, got):
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
            assert d < 1e-2, f"{name} mismatch {d}"
        print(f"{name}: parity ok")

    def bench(fn):
        r = fn(x)
        _ = float(jnp.sum(r[0].astype(jnp.float32)))  # sync
        r = fn(x)
        _ = float(jnp.sum(r[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(x)
        _ = float(jnp.sum(r[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    for name, fn in [("base", base), ("regroup", reg), ("regroup2", reg2)]:
        print(f"{name:9s} {bench(fn):7.2f} ms")


if __name__ == "__main__":
    main()
