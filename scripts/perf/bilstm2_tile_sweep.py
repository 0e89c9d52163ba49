"""Sweep bilstm2_forward block shape (unroll x row_tile) at the flagship
intra/inter scan shapes. The kernel streams 4 (u, tile, 128) operand blocks
per grid step; fewer+bigger blocks amortize per-step DMA issue overhead until
VMEM (16 MB scoped) runs out.

    python scripts/perf/bilstm2_tile_sweep.py
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward

def bench(fn, x, iters=20):
    r = fn(x); _ = float(jnp.sum(r[0].astype(jnp.float32)))
    r = fn(x); _ = float(jnp.sum(r[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    _ = float(jnp.sum(r[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3

rng = np.random.default_rng(0)
F = H = 128
W = (jnp.asarray(rng.standard_normal((2, F, 4*H))*0.05, jnp.bfloat16),
     jnp.asarray(rng.standard_normal((2, 4*H))*0.05, jnp.bfloat16),
     jnp.asarray(rng.standard_normal((2, H, 4*H))*0.05, jnp.bfloat16))

# flagship B=32x10s: intra rows 32*642=20544 over T=250; inter rows 32*250=8000 over T=642
for name, (R, T) in [("intra", (20544, 250)), ("inter", (8000, 642))]:
    x = jnp.asarray(rng.standard_normal((R, T, F)), jnp.bfloat16)
    print(f"-- {name}: rows {R} T {T}")
    for u in (5, 10):
        for tile in (256, 512, 1024):
            try:
                fn = jax.jit(lambda x, u=u, t=tile: bilstm2_forward(x, W[0], W[1], W[2],
                                                                    row_tile=t, unroll=u))
                ms = bench(fn, x)
                print(f"  u={u:3d} tile={tile:5d}: {ms:7.2f} ms")
            except Exception as e:
                print(f"  u={u:3d} tile={tile:5d}: FAIL {str(e)[:80]}")
