"""Flagship train-step probe.

Usage: python train_step_probe.py [q] [accum] [bf16] [pallas] [sched]
                                  [--repeats N]

``--repeats N`` overrides the DPRNN stack depth — ``--repeats 12`` is the
two-pass STRUCTURAL PROXY for the IRA lane (two full 6-block stacks with
none of IRA's re-embed/fusion logic): the gap between it and the measured
IRA step is IRA's true framework overhead (BENCH_ALL.md round-4 close-out).
``sched`` enables the schedule_masks pragma like bench_all --sched."""
import sys, time
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax as _jax, os as _os
_cd = _os.path.expanduser("~/.cache/tss_dprnn_tpu_xla")
_os.makedirs(_cd, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cd)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

q = int(sys.argv[1]) if len(sys.argv) > 1 else 1
accum = int(sys.argv[2]) if len(sys.argv) > 2 else 1
bf16 = "bf16" in sys.argv
repeats = (int(sys.argv[sys.argv.index("--repeats") + 1])
           if "--repeats" in sys.argv else None)

from tss_dprnn_tpu.models import DPRNNSpeTasNet
from tss_dprnn_tpu.training.trainer_spe import TrainerSpe
from __graft_entry__ import FLAGSHIP
import jax.numpy as jnp

B, T = 5, 24000
rng = np.random.default_rng(0)
batch = {
    "mix": rng.standard_normal((B, T)).astype(np.float32),
    "target": rng.standard_normal((B, T)).astype(np.float32),
    "reference": rng.standard_normal((B, T)).astype(np.float32),
    "ref_len": np.full((B,), float(T), np.float32),
    "spk_idx": np.arange(B, dtype=np.int32),
}
config = {"optimizer": {"lr": 5e-4, "weight_decay": 1e-5},
          "lr_scheduler": {"patience": 2, "factor": 0.5},
          "clip_norm": 5, "ce_gamma": 0.5,
          "accum_steps": accum, "lstm_save_every": q,
          "new_checkpoints_path": "/tmp/perf_chkpts", "data": {"sample_rate": 8000},
          "schedule_masks": "sched" in sys.argv,
          "lstm_backend": "pallas" if "pallas" in sys.argv else "xla"}
hp = dict(FLAGSHIP)
if repeats is not None:
    hp["n_repeats"] = repeats
model = DPRNNSpeTasNet(**hp, dtype=jnp.bfloat16 if bf16 else None,
                       remat="noremat" not in sys.argv)
tr = TrainerSpe(model, config)
tr._ensure_state(batch)
from tss_dprnn_tpu.parallel import shard_batch
sharded = shard_batch(batch, tr.mesh)
state = tr.state
t0 = time.time()
state, loss, aux = tr._train_step(state, sharded)
_ = float(loss)
print(f"compile+first: {time.time()-t0:.1f}s loss={float(loss):.3f}", flush=True)
t0 = time.time()
state, loss, aux = tr._train_step(state, sharded)
_ = float(loss)
print(f"second: {time.time()-t0:.1f}s", flush=True)
N = 10
t0 = time.time()
for _ in range(N):
    state, loss, aux = tr._train_step(state, sharded)
_ = float(loss)
dt = (time.time() - t0) / N * 1000
tag = "bf16" if bf16 else "fp32"
rep = f" repeats={repeats}" if repeats is not None else ""
sched = " sched" if "sched" in sys.argv else ""
print(f"q={q} accum={accum} {tag}{rep}{sched}: {dt:.1f} ms/step (flagship B={B} 3s)", flush=True)
