"""Hardware grad-parity check: pallas backend (fused fwd+bwd kernels) vs the
XLA backend, on flagship-like shapes, run on the real TPU. Guards the
reversed-index-map class of Mosaic miscompiles (round-1 found one in the
zero-copy fused forward when composed after another pallas call — this script
composes two bilstm layers to cover exactly that pattern; round-2 found a
silent wrong-gradient tile-truncation bug in bilstm2_backward_tm the same
way).

Modes:
    python scripts/perf/grad_check_tpu.py [bf16]          # full-length pair
    python scripts/perf/grad_check_tpu.py masked [bf16]   # ragged lengths ->
        the masked kernel pair (bilstm2_forward_resid_masked +
        bilstm2_backward_masked), i.e. the variable-length TRAINING fast path.

The masked mode masks the inter-layer activations and the loss to t < len —
outputs at t >= len are garbage-by-contract on both backends (every in-model
consumer masks), so only the valid region is compared.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

from tss_dprnn_tpu.ops import rnn

bf16 = "bf16" in sys.argv
masked = "masked" in sys.argv
dt = jnp.bfloat16 if bf16 else jnp.float32

B, T, F, H = 485, 97, 128, 128  # inter-scan-like shapes (ragged T, odd rows)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, F)), dt) * 0.3
tgt = jnp.asarray(rng.standard_normal((B, T, 2 * H)), dt)

if masked:
    # ragged valid lengths: full-length rows (pad-row convention must agree
    # between fwd and bwd kernels), short rows, lengths coprime with the
    # unroll factor, and a length-1 edge row
    lens_np = rng.integers(1, T + 1, size=B).astype(np.int32)
    lens_np[:8] = T
    lens_np[8] = 1
    lens = jnp.asarray(lens_np)
    mask = jnp.asarray((np.arange(T)[None, :] < lens_np[:, None]), dt)[:, :, None]
else:
    lens = None
    mask = None


def weights(seed):
    r = np.random.default_rng(seed)
    return rnn.LSTMWeights(
        jnp.asarray(r.standard_normal((F, 4 * H)) * 0.15, jnp.float32),
        jnp.asarray(r.standard_normal((H, 4 * H)) * 0.15, jnp.float32),
        jnp.asarray(r.standard_normal(4 * H) * 0.05, jnp.float32),
    )


w = [weights(i) for i in range(4)]
proj = jnp.asarray(rng.standard_normal((2 * H, F)) * 0.1, dt)


def loss(x, w):
    # two composed bilstm layers — the composition is what broke the
    # zero-copy reversed forward in round 1
    y = rnn.lstm(x, w[0], w[1], lengths=lens)
    if mask is not None:
        y = y * mask  # consumers mask t >= len (model contract)
    y = jnp.dot(y, proj).astype(dt)
    y = rnn.lstm(y, w[2], w[3], lengths=lens)
    if mask is not None:
        y = y * mask
    return jnp.sum((y - tgt).astype(jnp.float32) ** 2)


def make(backend):
    # the backend contextvar must be active at TRACE time (it is not part of
    # the jit cache key) — enter it inside the jitted function
    @jax.jit
    def g(x, w):
        with rnn.lstm_backend(backend):
            return jax.grad(loss, argnums=(0, 1))(x, w)

    return g


gx_ref, gw_ref = make("xla")(x, w)
jax.block_until_ready(gx_ref)
gx_p, gw_p = make("pallas")(x, w)
jax.block_until_ready(gx_p)

# Tolerances: the SAME script under CPU interpret mode agrees to ~1e-6 (run
# via tests — algorithmic identity); on hardware the two paths differ by MXU
# default-precision effects (fp32 dots use bf16-multiplier passes) amplified
# through the 2-layer recurrence — weight grads land ~1e-3, the
# chaos-amplified dx a few e-3. A Mosaic miscompile shows up as gross (1e0)
# corruption, which is what this guard is for.
tol = 5e-2 if bf16 else 1e-2
ok = True
for name, a, b in [("dx", gx_ref, gx_p)] + [
    (f"w{i}.{f}", getattr(gw_ref[i], f), getattr(gw_p[i], f))
    for i in range(4) for f in ("w_ih", "w_hh", "b")
]:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if name == "dx" and mask is not None:
        # dx at t >= len flows only from garbage outputs (masked in-loss);
        # both backends produce *some* values there but they are outside the
        # contract — compare the valid region
        m = np.asarray(mask, np.float32)
        a = a * m
        b = b * m
    denom = np.maximum(np.abs(a).max(), 1e-6)
    rel = np.abs(a - b).max() / denom
    status = "OK " if rel < tol else "FAIL"
    ok &= rel < tol
    print(f"{status} {name:8s} max-rel-err {rel:.2e}")
print(("masked " if masked else "") + ("bf16 " if bf16 else "fp32 ") +
      ("PASS" if ok else "FAIL"), flush=True)
sys.exit(0 if ok else 1)
