"""Sweep DPRNN-Spe-IRA's fractional pass-1 remat (models/dprnn_spe_ira.py
``pass1_remat``) on the real chip at the reference training shape
(B=5 x 3 s, bf16 + fused Pallas backward).

Pass 2 always runs full-residual; pass-1 rematerializes only the first k
blocks. k=6 == the previous all-remat policy; k=0 == both passes full
residual (expected to exceed HBM temp — recorded as OOM, not a failure).
Prints one JSON line per k.

Usage: python scripts/perf/ira_remat_sweep.py [--ks 6,4,3,2,1,0] [--batch 5]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def step_ms(k, batch=5):
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP
    from tss_dprnn_tpu.models import DPRNNSpeIRATasNet
    from tss_dprnn_tpu.parallel import shard_batch
    from tss_dprnn_tpu.training import TrainerSpe

    model = DPRNNSpeIRATasNet(**FLAGSHIP, dtype=jnp.bfloat16, remat=True,
                              pass1_remat=k)
    B, T = batch, 24000
    rng = np.random.default_rng(0)
    batch_d = {
        "mix": rng.standard_normal((B, T)).astype(np.float32),
        "target": rng.standard_normal((B, T)).astype(np.float32),
        "reference": rng.standard_normal((B, T)).astype(np.float32),
        "ref_len": np.full((B,), float(T), np.float32),
        "spk_idx": np.arange(B, dtype=np.int32) % FLAGSHIP["num_spks"],
    }
    config = {
        "optimizer": {"lr": 5e-4, "weight_decay": 1e-5},
        "lr_scheduler": {"patience": 2, "factor": 0.5},
        "clip_norm": 5, "ce_gamma": 0.5, "lstm_backend": "pallas",
        "new_checkpoints_path": "/tmp/ira_sweep_chkpts",
        "data": {"sample_rate": 8000},
    }
    trainer = TrainerSpe(model, config)
    trainer._ensure_state(batch_d)
    sharded = shard_batch(batch_d, trainer.mesh)
    state = trainer.state
    for _ in range(2):
        state, loss, aux = trainer._train_step(state, sharded)
    _ = float(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, aux = trainer._train_step(state, sharded)
    _ = float(loss)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
    ks = [6, 4, 3, 2, 1, 0]
    if "--ks" in sys.argv:
        ks = [int(x) for x in sys.argv[sys.argv.index("--ks") + 1].split(",")]
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 5
    for k in ks:
        try:
            ms = step_ms(k, batch)
            print(json.dumps({"pass1_remat": k, "ms_per_step": round(ms, 1)}),
                  flush=True)
        except Exception as e:  # RESOURCE_EXHAUSTED etc — record and continue
            msg = str(e).splitlines()[0][:160]
            print(json.dumps({"pass1_remat": k, "error": msg}), flush=True)


if __name__ == "__main__":
    main()
