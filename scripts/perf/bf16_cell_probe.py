"""Probe: bf16 gate/cell math in the bilstm2 kernel (cell_dtype option).

The cell is VPU-elementwise-bound (~6 ns/row/step, ROUND_NOTES); the VPU
packs bf16 2-per-sublane, so bf16 cell math could cut the bound ~2x. The
trade is c accumulating with ~3 significand digits over T steps. This
measures both sides at the flagship scan shapes:

    python scripts/perf/bf16_cell_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tss_dprnn_tpu.ops import rnn
from tss_dprnn_tpu.ops.pallas_lstm import bilstm2_forward


def bench(fn, x, iters=20):
    r = fn(x); _ = float(jnp.sum(r[0].astype(jnp.float32)))
    r = fn(x); _ = float(jnp.sum(r[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    _ = float(jnp.sum(r[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def snr_db(ref, est):
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    return 10 * np.log10(np.sum(ref**2) / (np.sum((ref - est) ** 2) + 1e-30))


rng = np.random.default_rng(0)
F = H = 128
Wf = (rng.standard_normal((2, F, 4 * H)) * 0.05,
      rng.standard_normal((2, 4 * H)) * 0.05,
      rng.standard_normal((2, H, 4 * H)) * 0.05)
W = tuple(jnp.asarray(w, jnp.bfloat16) for w in Wf)

# --- perf at flagship scan shapes
for name, (R, T) in [("intra", (20544, 250)), ("inter", (8000, 642))]:
    x = jnp.asarray(rng.standard_normal((R, T, F)), jnp.bfloat16)
    for cdt in ("float32", "bfloat16"):
        fn = jax.jit(lambda x, c=cdt: bilstm2_forward(x, W[0], W[1], W[2], cell_dtype=c))
        print(f"{name} R={R} T={T} cell={cdt}: {bench(fn, x):7.2f} ms")

# --- fidelity vs fp32 lax-scan oracle at inter length
R, T = 64, 642
xs = rng.standard_normal((R, T, F))
x32 = jnp.asarray(xs, jnp.float32)
xb = jnp.asarray(xs, jnp.bfloat16)
fwd32 = rnn.LSTMWeights(jnp.asarray(Wf[0][0], jnp.float32),
                        jnp.asarray(Wf[2][0], jnp.float32),
                        jnp.asarray(Wf[1][0], jnp.float32))
bwd32 = rnn.LSTMWeights(jnp.asarray(Wf[0][1], jnp.float32),
                        jnp.asarray(Wf[2][1], jnp.float32),
                        jnp.asarray(Wf[1][1], jnp.float32))
oracle = np.asarray(rnn.lstm(x32, fwd32, bwd32))  # [R, T, 2H] fp32 xla
for cdt in ("float32", "bfloat16"):
    o0, o1 = bilstm2_forward(xb, W[0], W[1], W[2], cell_dtype=cdt)
    est = np.concatenate([np.asarray(o0, np.float32), np.asarray(o1, np.float32)], -1)
    print(f"fidelity cell={cdt}: SNR vs fp32 oracle = {snr_db(oracle, est):.1f} dB")
