"""Output fidelity of the bf16+pallas fast path vs the fp32 XLA parity graph
(flagship model, shared weights). Prints SNR in dB; the SI-SDR budget is
0.1 dB, which ~>35 dB output SNR comfortably clears."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
from tss_dprnn_tpu.models import DPRNNSpeTasNet
from tss_dprnn_tpu.ops import rnn as rnn_ops
from __graft_entry__ import FLAGSHIP

B, T = 4, 32000
rng = np.random.default_rng(0)
mix = rng.standard_normal((B, T)).astype(np.float32)
aux = rng.standard_normal((B, T)).astype(np.float32)
ln = np.full((B,), float(T), np.float32)

m32 = DPRNNSpeTasNet(**FLAGSHIP)
m16 = DPRNNSpeTasNet(**FLAGSHIP, dtype=jnp.bfloat16)
variables = m32.init(jax.random.PRNGKey(0), mix[:1], aux[:1], ln[:1])

@jax.jit
def f32(mix, aux, ln):
    with rnn_ops.lstm_backend("xla"):
        return m32.apply(variables, mix, aux, ln)[0]

@jax.jit
def f16(mix, aux, ln):
    with rnn_ops.lstm_backend("pallas"):
        return m16.apply(variables, mix, aux, ln)[0]

@jax.jit
def f32p(mix, aux, ln):
    # fp32 + pallas: full-precision serving lane (bench_all --f32) — same
    # math as the XLA graph modulo add-association inside the fused cell
    with rnn_ops.lstm_backend("pallas"):
        return m32.apply(variables, mix, aux, ln)[0]

def snr_db(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return 10 * np.log10(np.sum(a**2) / max(np.sum((a - b) ** 2), 1e-30))

a = f32(mix, aux, ln)
print(f"fast-path output SNR vs fp32 graph: {snr_db(a, f16(mix, aux, ln)):.1f} dB", flush=True)
print(f"f32+pallas output SNR vs fp32 graph: {snr_db(a, f32p(mix, aux, ln)):.1f} dB", flush=True)
