"""Capture a jax.profiler trace of the flagship train step. Usage:
python scripts/perf/profile_step.py [outdir] [bf16] [pallas]"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax as _jax, os as _os
_cd = _os.path.expanduser("~/.cache/tss_dprnn_tpu_xla")
_os.makedirs(_cd, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cd)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
bf16 = "bf16" in sys.argv
import jax, jax.numpy as jnp
from tss_dprnn_tpu.models import DPRNNSpeTasNet
from tss_dprnn_tpu.training.trainer_spe import TrainerSpe
from __graft_entry__ import FLAGSHIP

B, T = 5, 24000
rng = np.random.default_rng(0)
batch = {"mix": rng.standard_normal((B, T)).astype(np.float32),
         "target": rng.standard_normal((B, T)).astype(np.float32),
         "reference": rng.standard_normal((B, T)).astype(np.float32),
         "ref_len": np.full((B,), float(T), np.float32),
         "spk_idx": np.arange(B, dtype=np.int32)}
config = {"optimizer": {"lr": 5e-4, "weight_decay": 1e-5},
          "lr_scheduler": {"patience": 2, "factor": 0.5},
          "clip_norm": 5, "ce_gamma": 0.5, "accum_steps": 1, "lstm_save_every": 1,
          "new_checkpoints_path": "/tmp/perf_chkpts", "data": {"sample_rate": 8000},
          "lstm_backend": "pallas" if "pallas" in sys.argv else "xla"}
model = DPRNNSpeTasNet(**FLAGSHIP, dtype=jnp.bfloat16 if bf16 else None,
                       remat="noremat" not in sys.argv)
tr = TrainerSpe(model, config)
tr._ensure_state(batch)
from tss_dprnn_tpu.parallel import shard_batch
sharded = shard_batch(batch, tr.mesh)
state = tr.state
for _ in range(3):
    state, loss, aux = tr._train_step(state, sharded)
_ = float(loss)
print("warm", flush=True)
jax.profiler.start_trace(out)
for _ in range(3):
    state, loss, aux = tr._train_step(state, sharded)
_ = float(loss)
jax.profiler.stop_trace()
print("trace written to", out, flush=True)
