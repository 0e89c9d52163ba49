"""Gradient accumulation: accum_steps=2 must produce the same update as the
full batch (mean losses are linear in batch averaging)."""

import numpy as np

import jax

from tests.fixtures import SR, make_mini_librimix
from tss_dprnn_tpu.data.librimix import Librimix
from tss_dprnn_tpu.data.loader import TrainLoader, collate_bss
from tss_dprnn_tpu.models import DPRNNTasNet
from tss_dprnn_tpu.parallel import make_mesh
from tss_dprnn_tpu.training import Trainer

TINY = dict(input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln")


def _cfg(tmp_path, accum):
    return {
        "cur_epoch": 0, "print_freq": 1000, "clip_norm": 5,
        "optimizer": {"lr": 1e-3, "weight_decay": 1e-5},
        "lr_scheduler": {"decay_rate": None},
        "checkpoint_path": None, "new_checkpoints_path": str(tmp_path / f"ck{accum}"),
        "n_checkpoints": 1, "data": {"sample_rate": SR}, "accum_steps": accum,
    }


def test_accum_matches_full_batch(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.2)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=4, collate_fn=collate_bss,
                         shuffle=False, seed=0, prefetch=0)
    batch = next(iter(loader))

    results = {}
    for accum in (1, 2):
        trainer = Trainer(DPRNNTasNet(**TINY), _cfg(tmp_path, accum),
                          mesh=make_mesh(data=1), seed=0)
        trainer._ensure_state(batch)
        from tss_dprnn_tpu.parallel import shard_batch

        sharded = shard_batch(batch, trainer.mesh)
        state, loss, _ = trainer._train_step(trainer.state, sharded)
        results[accum] = (float(loss), jax.tree.map(np.asarray, state.params))

    l1, p1 = results[1]
    l2, p2 = results[2]
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
