"""Remaining surfaces: RawNet inferencer end-to-end, trainer warm start from
checkpoint (epoch restored, hard-fail on mismatch), reference Hydra-target
config resolution."""

import numpy as np
import pytest

import jax

from tests.fixtures import SR, make_mini_librimix
from tss_dprnn_tpu.data.librimix import Librimix, LibrimixSpe
from tss_dprnn_tpu.data.loader import TrainLoader, collate_bss
from tss_dprnn_tpu.inference import InferencerRawNet
from tss_dprnn_tpu.models import DPRNNRawNetTasNet, DPRNNTasNet
from tss_dprnn_tpu.models.registry import build_model
from tss_dprnn_tpu.parallel import make_mesh
from tss_dprnn_tpu.training import Trainer
from tss_dprnn_tpu.utils.checkpoint import CheckpointManager

TINY = dict(input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln")


def test_rawnet_inferencer_end_to_end(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=4, min_sec=1.0, max_sec=1.5)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNRawNetTasNet(**TINY, embeddings_size=8, num_spks=8, fusion_type="att",
                              rawnet_C=32, rawnet_scale=4, rawnet_sinc_stride=16)
    z8 = np.zeros((1, SR), np.float32)
    z16 = np.zeros((1, 2 * SR), np.float32)
    variables = model.init(jax.random.PRNGKey(0), z8, z16)
    ck = CheckpointManager(str(tmp_path / "ck"))
    path = ck.save(1, {"epoch": 1, "params": jax.tree.map(np.asarray, variables["params"]),
                       "batch_stats": jax.tree.map(np.asarray, variables.get("batch_stats", {}))},
                   best=True)
    config = {"checkpoint_path": path, "test_savedir": str(tmp_path / "m"),
              "data": {"sample_rate": SR}, "metrics": ["si_sdr"]}
    inf = InferencerRawNet(model, config)
    final = inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
    assert np.isfinite(final["si_sdr"])


def test_trainer_warm_start_restores_epoch(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.2)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=0, prefetch=0)
    cfg = {
        "cur_epoch": 0, "print_freq": 1000, "clip_norm": 5,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
        "lr_scheduler": {"decay_rate": None},
        "checkpoint_path": None, "new_checkpoints_path": str(tmp_path / "ck"),
        "n_checkpoints": 5, "data": {"sample_rate": SR},
    }
    t1 = Trainer(DPRNNTasNet(**TINY), cfg, mesh=make_mesh(data=4))
    t1.train(loader)
    t1.cur_epoch = 3
    t1._save_checkpoint(best=True)

    cfg2 = dict(cfg)
    cfg2["checkpoint_path"] = str(tmp_path / "ck" / "3_best")
    cfg2.pop("cur_epoch")
    t2 = Trainer(DPRNNTasNet(**TINY), cfg2, mesh=make_mesh(data=4))
    batch = next(iter(loader))
    t2._ensure_state(batch)
    assert t2.cur_epoch == 3  # resume epoch from the checkpoint (SURVEY §5.4 fix)
    a = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, t1.state.params))
    b = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, t2.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_trainer_warm_start_hard_fails_on_mismatch(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.2)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=0, prefetch=0)
    cfg = {
        "cur_epoch": 0, "print_freq": 1000, "clip_norm": 5,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
        "lr_scheduler": {"decay_rate": None},
        "checkpoint_path": None, "new_checkpoints_path": str(tmp_path / "ck"),
        "n_checkpoints": 5, "data": {"sample_rate": SR},
    }
    t1 = Trainer(DPRNNTasNet(**TINY), cfg, mesh=make_mesh(data=4))
    t1.train(loader)
    t1.cur_epoch = 1
    t1._save_checkpoint(best=True)
    # different architecture -> the reference would log-and-continue from
    # random init (trainer.py:71-76); we raise
    cfg2 = dict(cfg)
    cfg2["checkpoint_path"] = str(tmp_path / "ck" / "1_best")
    wrong = Trainer(DPRNNTasNet(**{**TINY, "feature_size": 16}), cfg2, mesh=make_mesh(data=4))
    batch = next(iter(loader))
    with pytest.raises(Exception):
        wrong._ensure_state(batch)


def test_registry_accepts_reference_hydra_targets():
    m = build_model({
        "target": "src.models.dprnn.DPRNNTasNet",
        "input_size": 8, "feature_size": 12, "hidden_size": 10,
        "chunk_length": 40, "kernel_size": 2, "hop_length": 20,
        "n_repeats": 1, "norm_type": "ln",
    })
    assert isinstance(m, DPRNNTasNet)
    with pytest.raises(ValueError):
        build_model({"target": "src.models.nonexistent.Foo"})
