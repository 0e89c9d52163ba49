"""Mesh/sharding: dp-only and dp x tp training steps on the virtual 8-device
CPU mesh; param sharding rules produce the intended PartitionSpecs."""

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from tests.fixtures import SR, make_mini_librimix
from tss_dprnn_tpu.data.librimix import LibrimixSpe
from tss_dprnn_tpu.data.loader import TrainLoader, collate_spe
from tss_dprnn_tpu.models import DPRNNSpeTasNet
from tss_dprnn_tpu.parallel import make_mesh, param_shardings
from tss_dprnn_tpu.training import TrainerSpe

TINY = dict(input_size=8, feature_size=12, hidden_size=16, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
            O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="add")


def test_param_sharding_rules_tp():
    mesh = make_mesh(data=4, model=2)
    model = DPRNNSpeTasNet(**TINY)
    z = np.zeros((1, SR // 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z, np.array([SR // 2], np.float32))
    shardings = param_shardings(variables, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec for path, s in flat}
    lstm = [v for k, v in specs.items() if k.endswith("w_ih_f")]
    assert lstm and all(s == P(None, "model") for s in lstm)
    # everything else replicated by default
    enc = [v for k, v in specs.items() if k.endswith("encoder/w")]
    assert enc == [P()]


def test_dp_tp_train_step(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = LibrimixSpe(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=4, collate_fn=collate_spe, seed=0, prefetch=0)
    mesh = make_mesh(data=4, model=2)
    config = {
        "cur_epoch": 0, "print_freq": 100, "clip_norm": 5, "ce_gamma": 0.5,
        "optimizer": {"lr": 1e-3, "weight_decay": 1e-5},
        "lr_scheduler": {"decay_rate": None},
        "checkpoint_path": None, "new_checkpoints_path": str(tmp_path / "ck"),
        "n_checkpoints": 1, "data": {"sample_rate": SR},
    }
    model = DPRNNSpeTasNet(**{**TINY, "num_spks": max(ds.num_speakers, 2)})
    trainer = TrainerSpe(model, config, mesh=mesh)
    loss = trainer.train(loader)
    assert np.isfinite(loss)
    # params actually sharded over the model axis where rules apply
    w = trainer.state.params["separation"]["core"]["blocks_0"]["intra_rnn"]["w_ih_f"]
    assert w.sharding.spec == P(None, "model")
