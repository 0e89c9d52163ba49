"""Worker process for the REAL 2-process ``jax.distributed`` integration test
(tests/test_multihost.py).

Each invocation is one *host* of a multi-host SPMD run, on CPU: the process
forces ``--xla_force_host_platform_device_count`` local devices and joins a
localhost coordinator, so ``jax.devices()`` spans both processes — the same
topology a TPU pod presents (one process per host, ICI-global device list).
This executes, in their true multi-process configuration, the paths that were
previously only unit-tested with mocked process counts (round-2 VERDICT weak
#1): ``TrainLoader``'s per-host lockstep row slicing (data/loader.py),
``shard_batch``'s ``jax.make_array_from_process_local_data`` branch
(parallel/sharding.py), the dp x tp global-mesh trainer step, and the
host-local sharded eval with per-process ``proc<i>`` savedirs (cli/test.py
semantics). The reference has no distributed path at all (SURVEY.md §2.3).

Outputs (under --tmpdir):
  params_<tag>.npz     flattened trained params (identical across processes)
  losses_<tag>.json    per-epoch mean train losses
  eval[/proc<i>]/      all_metrics.csv + final_metrics.json from sharded eval
  ck/1_best            checkpoint written by the single-process run (consumed
                       by the 2-process eval)
"""

from __future__ import annotations

import argparse
import json
import os


TINY = dict(input_size=8, feature_size=12, hidden_size=16, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
            O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="add")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--tmpdir", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    # Keep the GLOBAL device count fixed at 8 regardless of process count so
    # the single- and two-process runs compile the identical 4x2 GSPMD
    # program over the identical global mesh shape.
    per_proc = 8 // args.nprocs
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={per_proc}"

    import jax

    # the TPU-tunnel sitecustomize force-rewrites jax_platforms; override
    # after import, before any device use (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    if args.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nprocs,
            process_id=args.pid,
        )
    assert jax.process_count() == args.nprocs, (jax.process_count(), args.nprocs)
    assert len(jax.devices()) == 8

    import numpy as np

    from tss_dprnn_tpu.data.librimix import LibrimixSpe
    from tss_dprnn_tpu.data.loader import TrainLoader, collate_spe
    from tss_dprnn_tpu.models import DPRNNSpeTasNet
    from tss_dprnn_tpu.parallel import make_mesh
    from tss_dprnn_tpu.training import TrainerSpe

    tag = f"p{args.pid}of{args.nprocs}"
    SR = 8000

    # ---------------------------------------------------------------- train
    ds = LibrimixSpe(csv_path=args.csv, segment=0.5)
    # GLOBAL batch size 4: with 2 processes each host materializes only its
    # 2-row slice; shard_batch assembles the global [4, T] arrays
    loader = TrainLoader(ds, batch_size=4, collate_fn=collate_spe, seed=0, prefetch=0)
    mesh = make_mesh(data=4, model=2)  # spans both processes when nprocs=2
    config = {
        "cur_epoch": 0, "print_freq": 100, "clip_norm": 5, "ce_gamma": 0.5,
        "optimizer": {"lr": 1e-3, "weight_decay": 1e-5},
        "lr_scheduler": {"decay_rate": None},
        "checkpoint_path": None,
        "new_checkpoints_path": os.path.join(args.tmpdir, f"ck_scratch_{tag}"),
        "n_checkpoints": 1, "data": {"sample_rate": SR},
    }
    model = DPRNNSpeTasNet(**{**TINY, "num_spks": max(ds.num_speakers, 2)})
    trainer = TrainerSpe(model, config, mesh=mesh)
    losses = []
    for epoch in range(args.epochs):
        trainer.cur_epoch = epoch  # distinct (seed, epoch) shuffle per epoch
        losses.append(float(trainer.train(loader)))

    # materialize the (possibly cross-process TP-sharded) params on every host
    if args.nprocs > 1:
        from jax.experimental import multihost_utils

        params = multihost_utils.process_allgather(trainer.state.params, tiled=True)
    else:
        params = jax.device_get(trainer.state.params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}
    np.savez(os.path.join(args.tmpdir, f"params_{tag}.npz"), **arrays)
    with open(os.path.join(args.tmpdir, f"losses_{tag}.json"), "w") as f:
        json.dump(losses, f)

    # the single-process run freezes a checkpoint for BOTH eval passes
    ck_dir = os.path.join(args.tmpdir, "ck")
    ck_path = os.path.join(ck_dir, "1_best")
    if args.nprocs == 1:
        from tss_dprnn_tpu.utils.checkpoint import CheckpointManager, to_pure_tree

        CheckpointManager(ck_dir, 1).save(
            1, {"epoch": 1, "params": params,
                "batch_stats": to_pure_tree(trainer.state.batch_stats)},
            best=True)

    # ----------------------------------------------------------------- eval
    # Host-local sharded eval (cli/test.py semantics): BucketedEvalLoader
    # auto-slices the batch plan by jax.process_index/process_count; each
    # process shards its batches over its OWN devices and writes to its own
    # proc<i> savedir. No cross-host collectives.
    from tss_dprnn_tpu.inference import InferencerSpe

    ds_test = LibrimixSpe(csv_path=args.csv, segment=None)
    eval_mesh = make_mesh(data=min(4, per_proc), model=1, devices=jax.local_devices())
    savedir = os.path.join(args.tmpdir, "eval") if args.nprocs == 1 else \
        os.path.join(args.tmpdir, "eval", f"proc{args.pid}")
    cfg = {"checkpoint_path": ck_path, "test_savedir": savedir,
           "metrics": ["si_sdr"], "data": {"sample_rate": SR}}
    inf = InferencerSpe(model, cfg, mesh=eval_mesh)
    inf.run(ds_test, batch_size=4, n_buckets=2)
    print(f"worker {tag} done", flush=True)


if __name__ == "__main__":
    main()
