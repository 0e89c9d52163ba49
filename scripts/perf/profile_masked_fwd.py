"""Trace the MASKED flagship inference forward (the bench.py headline lane:
lengths threaded, bf16+pallas) and itemize device-op time by op class —
round-4 VERDICT item 2: every op class >= 2% of device time gets a named
disposition in BENCH_ALL.md.

    python scripts/perf/profile_masked_fwd.py [outdir] [--unmasked] [--tm]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/tmp/prof_masked"
masked = "--unmasked" not in sys.argv

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
lengths = jax.device_put(np.full((B,), T, np.int32))
variables = model.init(jax.random.PRNGKey(0), mix[:1], aux[:1], ln[:1])

use_tm = "--tm" in sys.argv  # shipped bf16 inference layout (round 5)

@jax.jit
def fwd(mix, aux, ln, lengths):
    with rnn_ops.lstm_backend("pallas"), rnn_ops.lstm_time_major(use_tm):
        if masked:
            wav, _ = model.apply(variables, mix, aux, ln, lengths=lengths)
        else:
            wav, _ = model.apply(variables, mix, aux, ln)
    return wav

_ = float(jnp.sum(fwd(mix, aux, ln, lengths).astype(jnp.float32)))
_ = float(jnp.sum(fwd(mix, aux, ln, lengths).astype(jnp.float32)))

jax.profiler.start_trace(out)
for _ in range(2):
    r = fwd(mix, aux, ln, lengths)
_ = float(jnp.sum(r.astype(jnp.float32)))
jax.profiler.stop_trace()

paths = glob.glob(os.path.join(out, "**", "*.trace.json.gz"), recursive=True)
assert paths, f"no trace under {out}"
with gzip.open(sorted(paths)[-1], "rt") as f:
    tr = json.load(f)
ev = tr["traceEvents"]
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
    if name.lower().startswith("jit_"):
        continue
    d = e.get("dur", 0) / 1e3  # ms
    dur_by_name[name] += d
    total += d

def op_class(name):
    n = name.lower()
    if "lstm" in n or "custom" in n:
        return "scan-kernel"
    if "convolution" in n or n.startswith("dot") or "einsum" in n:
        return "mxu"
    if n.startswith("copy") or "transpose" in n:
        return "copy/transpose"
    if n.startswith("fusion") or n.startswith("loop_") or n.startswith("input_fusion"):
        return "fusion"
    if "reduce" in n:
        return "reduce"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/dynamic"
    return "other"

by_class = defaultdict(float)
for name, d in dur_by_name.items():
    by_class[op_class(name)] += d
print(f"lane={'masked' if masked else 'unmasked'} device total (2 iters): {total:.1f} ms")
for c, d in sorted(by_class.items(), key=lambda kv: -kv[1]):
    print(f"CLASS {c:16s} {d:9.2f} ms  {100*d/total:5.1f}%")
print()
top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:50]
for name, d in top:
    if 100*d/total < 0.5:
        break
    print(f"{d:9.2f} ms {100*d/total:5.1f}%  {name[:110]}")
