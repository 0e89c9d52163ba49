"""End-to-end shipped-eval throughput: the FULL test-CLI pipeline on TPU.

Everything between "test set on disk" and "final_metrics.json": WAV decode,
bucketed batching, jitted masked forward (the round-3 mask-aware kernel
lane), PIT reorder + SI-SDR/STOI/PESQ on the overlapped host worker pool,
and the CSV/JSON writes. This is the number a reference user actually
experiences when they run `python -m tss_dprnn_tpu.cli.test` — the kernel
benches (bench.py / bench_all.py) measure only the device forward.

    python scripts/perf/eval_cli_bench.py [--n 64] [--batch 8] [--metrics si_sdr,stoi,pesq]

Writes one JSON line: end-to-end separated audio-sec per wall-clock second.
Reference counterpart: the serial per-utterance eager loop of
src/inferencers/inferencer.py:48-78 (batch 1, host metrics inline).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_mix = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 64
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 8
    metrics = (sys.argv[sys.argv.index("--metrics") + 1].split(",")
               if "--metrics" in sys.argv else ["si_sdr", "stoi", "pesq"])
    device_metrics = "--device-metrics" in sys.argv
    device_pesq = "--device-pesq" in sys.argv

    from tss_dprnn_tpu.utils.tpu_jobs import reap_tpu_jobs

    reap_tpu_jobs(log=lambda m: print(m, file=sys.stderr, flush=True))

    import jax

    from tss_dprnn_tpu.utils.compile_cache import enable as _cc

    _cc()

    from __graft_entry__ import FLAGSHIP
    from tests.fixtures import make_mini_librimix
    from tss_dprnn_tpu.data.librimix import LibrimixSpe
    from tss_dprnn_tpu.inference import InferencerSpe
    from tss_dprnn_tpu.models import DPRNNSpeTasNet
    from tss_dprnn_tpu.utils.checkpoint import CheckpointManager, to_pure_tree

    import jax.numpy as jnp

    with tempfile.TemporaryDirectory() as td:
        csv = make_mini_librimix(td + "/corpus", n_mix=n_mix, min_sec=3.0,
                                 max_sec=15.0, n_speakers=8)
        ds = LibrimixSpe(csv_path=csv, segment=None)
        total_audio_sec = sum(ds.lengths()) / 8000.0

        model = DPRNNSpeTasNet(**FLAGSHIP, dtype=jnp.bfloat16)
        z = np.zeros((1, 8000), np.float32)
        variables = model.init(jax.random.PRNGKey(0), z, z,
                               np.array([8000.0], np.float32))
        ck = CheckpointManager(td + "/ck")
        path = ck.save(1, {"epoch": 1,
                           "params": to_pure_tree(variables["params"]),
                           "batch_stats": to_pure_tree(
                               variables.get("batch_stats", {}))}, best=True)
        cfg = {"checkpoint_path": path, "test_savedir": td + "/out",
               "metrics": metrics, "data": {"sample_rate": 8000},
               "lstm_backend": "pallas", "device_metrics": device_metrics,
               "device_pesq": device_pesq}
        inf = InferencerSpe(model, cfg)

        # warm pass compiles every bucket shape; timed pass measures steady
        # state (a real test run amortizes compiles over 3000 utterances; the
        # XLA compile cache makes reruns start warm)
        inf.run(ds, batch_size=batch, n_buckets=4)
        t0 = time.perf_counter()
        final = inf.run(ds, batch_size=batch, n_buckets=4)
        dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "eval_cli_end_to_end_audio_sec_per_sec",
        "value": round(total_audio_sec / dt, 2),
        "unit": "audio-sec/sec",
        "n_utts": n_mix,
        "batch": batch,
        "metrics": metrics,
        "device_metrics": device_metrics,
        "device_pesq": device_pesq,
        "total_audio_sec": round(total_audio_sec, 1),
        "wall_sec": round(dt, 2),
        "vs_baseline": round(total_audio_sec / dt / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
