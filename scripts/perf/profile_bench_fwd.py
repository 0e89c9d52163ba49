"""Trace the flagship inference forward (bench.py fast path) and summarize
device-op time by kernel family from the captured trace.

    python scripts/perf/profile_bench_fwd.py [outdir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_fwd"

import jax
import jax.numpy as jnp

from tss_dprnn_tpu.models import DPRNNSpeTasNet
from tss_dprnn_tpu.ops import rnn as rnn_ops
from __graft_entry__ import FLAGSHIP

B, T = 32, 80000
model = DPRNNSpeTasNet(**FLAGSHIP, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
mix = jax.device_put(rng.standard_normal((B, T)).astype(np.float32))
aux = jax.device_put(rng.standard_normal((B, T)).astype(np.float32))
ln = jax.device_put(np.full((B,), float(T), np.float32))
variables = model.init(jax.random.PRNGKey(0), mix[:1], aux[:1], ln[:1])

@jax.jit
def fwd(mix, aux, ln):
    with rnn_ops.lstm_backend("pallas"):
        wav, _ = model.apply(variables, mix, aux, ln)
    return wav

_ = float(jnp.sum(fwd(mix, aux, ln).astype(jnp.float32)))
_ = float(jnp.sum(fwd(mix, aux, ln).astype(jnp.float32)))

jax.profiler.start_trace(out)
for _ in range(2):
    r = fwd(mix, aux, ln)
_ = float(jnp.sum(r.astype(jnp.float32)))
jax.profiler.stop_trace()

# summarize: find trace.json.gz, aggregate complete events on device lines
paths = glob.glob(os.path.join(out, "**", "*.trace.json.gz"), recursive=True)
assert paths, f"no trace under {out}"
with gzip.open(sorted(paths)[-1], "rt") as f:
    tr = json.load(f)
ev = tr["traceEvents"]
# device thread ids: pick threads whose names mention TensorFlow Op/XLA Ops
pid_names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dur_by_name = defaultdict(float)
total = 0.0
for e in ev:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "/device" not in pname.lower():
        continue
    name = e.get("name", "")
    d = e.get("dur", 0) / 1e3  # ms
    dur_by_name[name] += d
    total += d
top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]
print(f"device total (2 iters): {total:.1f} ms")
for name, d in top:
    print(f"{d:9.2f} ms  {name[:100]}")
