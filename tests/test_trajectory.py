"""Multi-step training-TRAJECTORY equivalence vs torch (round-2 VERDICT item 2).

The 1-step Adam test (test_training.py) pins a single optimizer update; here a
full torch training loop — functional oracle forward, PIT-SI-SDR (+ CE·γ for
TSS), Adam with grad-coupled weight decay, clip-by-global-norm 5 — runs for
N_STEPS from the SAME weights on the SAME batches as the real flax Trainer,
and the per-step loss trajectories must track each other. This falsifies the
round-2 open question of whether the framework's training dynamics diverge
from the reference (the spe_cat convergence plateau): fusion 'cat' is tested
explicitly. Reference loops: src/trainers/trainer.py:86-133,
trainer_spe.py:14-72."""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_oracle import Cfg, make_bss_sd, make_spe_sd, oracle_bss, oracle_spe
from tss_dprnn_tpu.models import DPRNNSpeTasNet, DPRNNTasNet
from tss_dprnn_tpu.parallel import make_mesh, replicated
from tss_dprnn_tpu.training import Trainer, TrainerSpe
from tss_dprnn_tpu.utils.torch_convert import convert_state_dict

from tests.test_model_parity import _model_kwargs

T = 1200
N_STEPS = 25
SR = 8000
EPS = 1e-8


# ------------------------------------------------------------- torch training


def _t_sisdr(est, target):
    est = est - est.mean(-1, keepdim=True)
    target = target - target.mean(-1, keepdim=True)
    dot = (est * target).sum(-1, keepdim=True)
    energy = (target * target).sum(-1, keepdim=True) + EPS
    scaled = dot / energy * target
    noise = est - scaled
    return 10 * torch.log10(scaled.pow(2).sum(-1) / (noise.pow(2).sum(-1) + EPS) + EPS)


def _t_pit_loss(est, target):
    """2-source PIT over -SI-SDR (asteroid PITLossWrapper semantics)."""
    a = -( _t_sisdr(est[:, 0], target[:, 0]) + _t_sisdr(est[:, 1], target[:, 1])) / 2
    b = -( _t_sisdr(est[:, 0], target[:, 1]) + _t_sisdr(est[:, 1], target[:, 0])) / 2
    return torch.minimum(a, b).mean()


def _split_params(sd):
    params = {k: v.clone().detach().requires_grad_(True) for k, v in sd.items()
              if "running_" not in k and "num_batches" not in k}
    buffers = {k: v.clone().detach() for k, v in sd.items()
               if "running_" in k or "num_batches" in k}
    return params, buffers


def _torch_traj(sd, cfg, batches, loss_of, lr, wd=1e-5, clip=5.0):
    params, buffers = _split_params(sd)
    opt = torch.optim.Adam(params.values(), lr=lr, weight_decay=wd)
    live = {**params, **buffers}
    losses = []
    for batch in batches:
        loss = loss_of(live, batch)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params.values(), clip)
        opt.step()
        losses.append(float(loss))
    return losses


# -------------------------------------------------------------- flax training


class _ListLoader:
    def __init__(self, batch):
        self.batch = batch

    def __len__(self):
        return 1

    def __iter__(self):
        yield self.batch

    def set_epoch(self, epoch):
        pass

    def peek(self):
        return self.batch


def _flax_traj(trainer, sd, batches):
    """Drive the REAL Trainer step (jitted SPMD step incl. shard_batch) one
    batch per train() call, from the converted torch weights."""
    trainer._ensure_state(batches[0])
    conv = convert_state_dict(sd)
    rep = replicated(trainer.mesh)
    params = jax.device_put(jax.tree.map(jnp.asarray, conv["params"]), rep)
    bs = conv.get("batch_stats", {})
    bs = jax.device_put(jax.tree.map(jnp.asarray, bs), rep) if bs else {}
    trainer.state = trainer.state.replace(params=params, batch_stats=bs)
    return [float(trainer.train(_ListLoader(b))) for b in batches]


def _config(lr, tmp_path):
    return {
        "cur_epoch": 0, "print_freq": 1000, "clip_norm": 5, "ce_gamma": 0.5,
        "optimizer": {"lr": lr, "weight_decay": 1e-5},
        "lr_scheduler": {"decay_rate": None},
        "checkpoint_path": None, "new_checkpoints_path": str(tmp_path / "ck"),
        "n_checkpoints": 1, "data": {"sample_rate": SR},
    }


def _assert_tracks(t_losses, f_losses):
    t, f = np.asarray(t_losses), np.asarray(f_losses)
    # step 0 is a pure forward-parity check; later steps accumulate backend
    # (ATen vs XLA) rounding through the weights, so the envelope widens
    np.testing.assert_allclose(f[0], t[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(f[:5], t[:5], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(f, t, rtol=2e-2, atol=2e-2)


# -------------------------------------------------------------------- tests


def test_bss_trajectory_matches_torch(tmp_path):
    cfg = Cfg()
    sd = make_bss_sd(cfg, seed=3)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(N_STEPS):
        src = rng.standard_normal((4, 2, T)).astype(np.float32) * 0.3
        batches.append({"mix": src.sum(1), "sources": src})

    t_losses = _torch_traj(
        sd, cfg, batches,
        lambda live, b: _t_pit_loss(
            oracle_bss(live, cfg, torch.from_numpy(b["mix"])),
            torch.from_numpy(b["sources"])),
        lr=1e-3)

    trainer = Trainer(DPRNNTasNet(**_model_kwargs(cfg, spe=False)),
                      _config(1e-3, tmp_path), mesh=make_mesh(data=4))
    f_losses = _flax_traj(trainer, sd, batches)
    _assert_tracks(t_losses, f_losses)


@pytest.mark.parametrize("fusion_type", ["cat", "att"])
def test_spe_trajectory_matches_torch(tmp_path, fusion_type):
    """'cat' specifically: the round-2 convergence sweep saw spe_cat plateau
    at the reference lr — this test decides whether torch's step-for-step
    dynamics differ (they must not)."""
    cfg = Cfg(fusion_type=fusion_type)
    sd = make_spe_sd(cfg, seed=4)
    rng = np.random.default_rng(1)
    batches = []
    for _ in range(N_STEPS):
        src = rng.standard_normal((4, 2, T)).astype(np.float32) * 0.3
        batches.append({
            "mix": src.sum(1), "target": src[:, 0],
            "reference": rng.standard_normal((4, T)).astype(np.float32) * 0.3,
            "ref_len": np.full((4,), float(T), np.float32),
            "spk_idx": rng.integers(0, cfg.num_spks, size=4).astype(np.int32),
        })

    def t_loss(live, b):
        est, logits = oracle_spe(
            live, cfg, torch.from_numpy(b["mix"]), torch.from_numpy(b["reference"]),
            torch.from_numpy(b["ref_len"]), training=True)
        sisdr = (-_t_sisdr(est, torch.from_numpy(b["target"]))).mean()
        ce = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(b["spk_idx"]).long())
        return sisdr + 0.5 * ce

    t_losses = _torch_traj(sd, cfg, batches, t_loss, lr=1e-3)

    trainer = TrainerSpe(DPRNNSpeTasNet(**_model_kwargs(cfg, spe=True)),
                         _config(1e-3, tmp_path), mesh=make_mesh(data=4))
    f_losses = _flax_traj(trainer, sd, batches)
    _assert_tracks(t_losses, f_losses)


# --------------------------------------------------- init-distribution parity


def test_dense_bias_init_matches_torch_linear(tmp_path):
    """Round-2 VERDICT weak #6: make_dense biases now draw from torch
    nn.Linear's U(±1/√fan_in), not zeros."""
    model = DPRNNTasNet(**_model_kwargs(Cfg(), spe=False))
    z = np.zeros((1, T), np.float32)
    variables = model.init(jax.random.PRNGKey(0), z)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    checked = 0
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[-1] != "bias" or "rnn" in keys[-2]:
            continue
        # find the matching kernel to derive fan_in
        kernel = variables["params"]
        for k in keys[:-1]:
            kernel = kernel[k]
        kernel = kernel["kernel"] if "kernel" in kernel else None
        if kernel is None or kernel.ndim != 2:
            continue
        bound = 1.0 / np.sqrt(kernel.shape[0])
        b = np.asarray(leaf)
        assert np.abs(b).max() <= bound + 1e-7, keys
        assert np.abs(b).max() > 0, f"bias still zero-initialized: {keys}"
        checked += 1
    assert checked >= 4  # intra/inter_linear, mask head, bottleneck...
