"""Training stack smoke/behavior tests on the virtual 8-device CPU mesh:
jitted SPMD steps, loss improvement, checkpoint save/restore round-trip,
torch-equivalent optimizer semantics."""

import numpy as np
import pytest

import jax

from tests.fixtures import SR, make_mini_librimix
from tss_dprnn_tpu.data.librimix import Librimix, LibrimixSpe
from tss_dprnn_tpu.data.loader import TrainLoader, collate_bss, collate_spe
from tss_dprnn_tpu.models import DPRNNSpeTasNet, DPRNNTasNet
from tss_dprnn_tpu.parallel import make_mesh
from tss_dprnn_tpu.training import Trainer, TrainerSpe
from tss_dprnn_tpu.utils.checkpoint import load_checkpoint_variables

TINY = dict(input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln")


def _config(tmp_path, lr=1e-3):
    return {
        "cur_epoch": 0,
        "print_freq": 100,
        "clip_norm": 5,
        "ce_gamma": 0.5,
        "optimizer": {"lr": lr, "weight_decay": 1e-5},
        "lr_scheduler": {"decay_rate": None, "factor": 0.5, "patience": 2},
        "checkpoint_path": None,
        "new_checkpoints_path": str(tmp_path / "chkpts"),
        "n_checkpoints": 2,
        "data": {"sample_rate": SR},
    }


def test_bss_training_improves_and_checkpoints(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=8, collate_fn=collate_bss, seed=0, prefetch=0)
    mesh = make_mesh(data=8)
    trainer = Trainer(DPRNNTasNet(**TINY), _config(tmp_path), mesh=mesh)
    l0 = trainer.train(loader)
    for _ in range(4):
        l1 = trainer.train(loader)
    assert l1 < l0  # separating synthetic sines is easy
    trainer.cur_epoch = 1
    trainer._save_checkpoint(best=True)
    ck = tmp_path / "chkpts" / "1_best"
    assert ck.exists()
    loaded = load_checkpoint_variables(str(ck))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        loaded["variables"]["params"],
        jax.tree.map(np.asarray, trainer.state.params),
    )


def test_checkpoint_rolling_retention(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=8, collate_fn=collate_bss, seed=0, prefetch=0)
    trainer = Trainer(DPRNNTasNet(**TINY), _config(tmp_path), mesh=make_mesh(data=1))
    trainer.train(loader)
    for ep in range(1, 4):
        trainer.cur_epoch = ep
        trainer._save_checkpoint(best=False)
    kept = sorted(p.name for p in (tmp_path / "chkpts").iterdir())
    assert kept == ["2_last", "3_last"]  # n_checkpoints=2 evicts oldest


def test_spe_training_step_and_eval(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = LibrimixSpe(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=4, collate_fn=collate_spe, seed=0, prefetch=0)
    cfg = _config(tmp_path)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8,
                           num_spks=max(ds.num_speakers, 2), fusion_type="att")
    trainer = TrainerSpe(model, cfg, mesh=make_mesh(data=4))
    l0 = trainer.train(loader)
    e0 = trainer.eval(loader)
    assert np.isfinite(l0) and np.isfinite(e0)
    # batch stats must have been updated by training
    bs = jax.tree_util.tree_leaves(trainer.state.batch_stats)
    assert any(np.any(np.asarray(x) != 0) for x in bs)


def test_run_early_stop_and_schedulers(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=8, collate_fn=collate_bss, seed=0, prefetch=0)
    trainer = Trainer(DPRNNTasNet(**TINY), _config(tmp_path), mesh=make_mesh(data=8))
    trainer.run(loader, loader, n_epochs=2, early_stop=10)
    assert trainer.cur_epoch == 2
    assert any("best" in p.name for p in (tmp_path / "chkpts").iterdir())
    assert any("last" in p.name for p in (tmp_path / "chkpts").iterdir())


def test_optimizer_matches_torch_adam_step():
    """One Adam step with grad-coupled weight decay + clip == torch."""
    import torch

    from tss_dprnn_tpu.training.train_state import make_optimizer

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([10.0, 20.0, -30.0], np.float32)  # big grads -> clipping acts

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=0.01, weight_decay=0.1)
    tw.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_([tw], 5.0)
    opt.step()
    opt.step_count = 1

    tx = make_optimizer(0.01, weight_decay=0.1, clip_norm=5.0)
    params = {"w": w0.copy()}
    opt_state = tx.init(params)
    updates, _ = tx.update({"w": g.copy()}, opt_state, params)
    new = params["w"] + updates["w"]
    np.testing.assert_allclose(new, tw.detach().numpy(), atol=1e-6)


def test_train_step_compiles_once(tmp_path):
    """The whole TrainState is mesh-committed at init, so repeated steps —
    including after a host-side lr update — hit one jit cache entry. An
    uncommitted opt_state/lr leaf silently doubles flagship compile time
    (~33 s recompile at step 2 on the v5e).

    Retraces are counted directly (``_forward_loss`` runs once per TRACE,
    never per execution) — the earlier ``_train_step._cache_size() == 1``
    probe read global jit-cache state that the full 220-test process can
    evict under memory pressure (observed reading 0 after three successful
    steps in the 2026-08-21 --runslow run; unreproducible in isolation)."""
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=8, collate_fn=collate_bss, seed=0, prefetch=0)
    trainer = Trainer(DPRNNTasNet(**TINY), _config(tmp_path), mesh=make_mesh(data=4))
    batch = next(iter(loader))
    trainer._ensure_state(batch)
    traces = {"n": 0}
    orig_forward_loss = trainer._forward_loss

    def counting_forward_loss(*a, **k):
        traces["n"] += 1
        return orig_forward_loss(*a, **k)

    trainer._forward_loss = counting_forward_loss
    trainer._build_steps()  # rebuild the jit over the counting wrapper
    from tss_dprnn_tpu.parallel import shard_batch

    sharded = shard_batch(batch, trainer.mesh)
    state = trainer.state
    for _ in range(2):
        state, _, _ = trainer._train_step(state, sharded)
    n_first = traces["n"]
    assert n_first >= 1  # the first call traced
    state = state.set_learning_rate(3e-4)  # epoch-boundary scheduler update
    state, _, _ = trainer._train_step(state, sharded)
    assert traces["n"] == n_first, "lr update caused a retrace"


def test_exact_resume_bitwise(tmp_path):
    """save_optimizer: true — train(2 epochs) == train(1) + resume(1),
    bitwise on params AND optimizer moments. Exercises the full payload:
    opt_state leaves, global step, lr-scheduler internals (exponential decay
    so the resumed epoch must train at the decayed lr), run counters, and the
    epoch-keyed loader shuffle (the resumed run replays epoch 2's order)."""
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)

    def mk_train():
        return TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=0, prefetch=0)

    def mk_eval():
        return TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=0,
                           shuffle=False, prefetch=0)

    def cfg(subdir, **over):
        c = _config(tmp_path)
        c["new_checkpoints_path"] = str(tmp_path / subdir)
        c["save_optimizer"] = True
        c["lr_scheduler"] = {"decay_rate": 0.5}
        c.update(over)
        return c

    mesh = make_mesh(data=4)

    # uninterrupted 2-epoch run
    t_full = Trainer(DPRNNTasNet(**TINY), cfg("full"), mesh=mesh, seed=0)
    t_full.run(mk_train(), mk_eval(), n_epochs=2, early_stop=10)

    # 1 epoch, then resume for the 2nd from the saved "1_last"
    t_a = Trainer(DPRNNTasNet(**TINY), cfg("ab"), mesh=mesh, seed=0)
    t_a.run(mk_train(), mk_eval(), n_epochs=1, early_stop=10)
    t_b = Trainer(
        DPRNNTasNet(**TINY),
        cfg("ab2", checkpoint_path=str(tmp_path / "ab" / "1_last")),
        mesh=mesh, seed=0,
    )
    t_b.run(mk_train(), mk_eval(), n_epochs=2, early_stop=10)
    assert t_b.cur_epoch == 2

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        t_full.state.params, t_b.state.params,
    )
    for a, b in zip(jax.tree.leaves(t_full.state.opt_state),
                    jax.tree.leaves(t_b.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(t_full.state.step) == int(t_b.state.step)


def test_resume_optimizer_mismatch_is_hard_error(tmp_path):
    """Exact-resume opt_state is NAME-KEYED (tree paths, trainer.opt_path_key):
    resuming under an optimizer config whose opt_state has the same LEAF COUNT
    but different tree paths (here: clip_norm dropped — ClipState is an
    EmptyState, so the positional leaf list would restore Adam's moments into
    silently-wrong slots) must be a hard, explicit error."""
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)

    def mk():
        return TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=0, prefetch=0)

    cfg = _config(tmp_path)
    cfg["new_checkpoints_path"] = str(tmp_path / "ck")
    cfg["save_optimizer"] = True
    mesh = make_mesh(data=4)
    t_a = Trainer(DPRNNTasNet(**TINY), cfg, mesh=mesh, seed=0)
    t_a.run(mk(), mk(), n_epochs=1, early_stop=10)
    n_leaves = len(jax.tree.leaves(t_a.state.opt_state))

    cfg2 = _config(tmp_path)
    cfg2["new_checkpoints_path"] = str(tmp_path / "ck2")
    cfg2["save_optimizer"] = True
    cfg2["clip_norm"] = None  # same leaf count, different opt_state paths
    cfg2["checkpoint_path"] = str(tmp_path / "ck" / "1_last")
    t_b = Trainer(DPRNNTasNet(**TINY), cfg2, mesh=mesh, seed=0)
    with pytest.raises(ValueError, match="opt_state does not match"):
        t_b.run(mk(), mk(), n_epochs=2, early_stop=10)
    # the scenario really is leaf-count-preserving (the silent-wrong case)
    from tss_dprnn_tpu.training.train_state import make_optimizer

    tx2 = make_optimizer(1e-3, weight_decay=1e-5, clip_norm=None)
    assert len(jax.tree.leaves(tx2.init(jax.device_get(t_a.state.params)))) == n_leaves


def test_is_metrics_epoch_summary(tmp_path):
    """is_metrics: true accumulates per-utterance host metrics during training
    and reports the epoch means (the reference's path crashes with an
    UnboundLocalError, trainer.py:253-255; ours must work)."""
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=8, collate_fn=collate_bss, seed=0, prefetch=0)

    class SpyReporter:
        def __init__(self):
            self.calls = []

        def add_and_report(self, logs=None, mode="train"):
            self.calls.append((mode, logs))

    spy = SpyReporter()
    cfg = _config(tmp_path)
    cfg["is_metrics"] = True
    cfg["metrics"] = ["si_sdr", "stoi"]  # pesq is heavy; config narrows the set
    trainer = Trainer(DPRNNTasNet(**TINY), cfg, mesh=make_mesh(data=8), reporter=spy)
    trainer.cur_epoch = 1
    trainer.train(loader)
    train_calls = [l for m, l in spy.calls if m == "train"]
    assert train_calls, "no epoch summary reported"
    md = train_calls[-1]["metrics"]
    assert md is not None and set(md) == {"si_sdr", "stoi"}
    assert all(np.isfinite(v) for v in md.values())


def test_ira_fractional_remat_value_and_grad_identical():
    """DPRNNCore's remat policy (True / False / int k) is a pure memory/
    recompute trade: outputs AND gradients must be bitwise-independent of it.
    Guards the IRA pass1_remat knob (models/dprnn_spe_ira.py)."""
    from tss_dprnn_tpu.models import DPRNNSpeIRATasNet

    kw = dict(input_size=8, feature_size=12, hidden_size=10, chunk_length=20,
              kernel_size=2, hop_length=10, n_repeats=3, norm_type="ln",
              O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="att")
    B, T = 2, 800
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((B, T)).astype(np.float32)
    aux = rng.standard_normal((B, T)).astype(np.float32)
    target = rng.standard_normal((B, T)).astype(np.float32)
    aux_len = np.full((B,), float(T), np.float32)

    outs, grads = [], []
    for pass1_remat in (None, 0, 1, 2):
        model = DPRNNSpeIRATasNet(**kw, pass1_remat=pass1_remat)
        variables = model.init(jax.random.PRNGKey(0), mix, aux, aux_len)

        def loss_fn(params):
            (wav, logits), _ = model.apply({**variables, "params": params},
                                           mix, aux, aux_len, train=True,
                                           mutable=["batch_stats"])
            return jax.numpy.mean((wav - target) ** 2) + 1e-3 * jax.numpy.mean(logits**2)

        loss, g = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
        outs.append(float(loss))
        grads.append(g)

    for o in outs[1:]:
        assert o == outs[0]
    for g in grads[1:]:
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            grads[0], g,
        )


def test_trainer_seed_changes_init(tmp_path):
    """config `seed` reaches model init via the CLI plumbing (train.py)."""
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)
    loader = TrainLoader(ds, batch_size=8, collate_fn=collate_bss, seed=0, prefetch=0)
    batch = next(iter(loader))
    cfg = _config(tmp_path)
    leaves = []
    for seed in (0, 0, 1):
        t = Trainer(DPRNNTasNet(**TINY), cfg, seed=seed)
        t._ensure_state(batch)
        leaves.append(np.asarray(jax.tree_util.tree_leaves(t.state.params)[0]))
    np.testing.assert_array_equal(leaves[0], leaves[1])  # deterministic
    assert not np.allclose(leaves[0], leaves[2])  # seed-sensitive


def test_schedule_masks_pragma_value_neutral(tmp_path):
    """`schedule_masks: true` threads all-ones masks through the train graph
    while the scans ignore them (rnn.lstm_ignore_lengths) — a pure XLA
    scheduling lever (measured -4% flagship step time on TPU). On
    fixed-length crops the VALUES must match the default graph (only the
    norm-statistics expression differs: masked sum/n vs mean)."""
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = LibrimixSpe(csv_path=csv, segment=0.5)

    def mk():
        return TrainLoader(ds, batch_size=4, collate_fn=collate_spe, seed=0, prefetch=0)

    mesh = make_mesh(data=4)
    losses = {}
    params = {}
    for flag in (False, True):
        cfg = _config(tmp_path)
        cfg["new_checkpoints_path"] = str(tmp_path / f"ck_{flag}")
        cfg["schedule_masks"] = flag
        model = DPRNNSpeTasNet(
            input_size=8, feature_size=12, hidden_size=16, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
            O=8, P=12, embeddings_size=8, num_spks=max(ds.num_speakers, 2),
            fusion_type="add")
        t = TrainerSpe(model, cfg, mesh=mesh, seed=0)
        losses[flag] = t.train(mk())
        params[flag] = jax.device_get(t.state.params)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
    # params tolerance is looser: the masked norm computes its statistics as
    # sum(x*mask)/n instead of mean(x) — a different reduction whose last-ulp
    # differences Adam's g/sqrt(v) normalization amplifies over the steps
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3, rtol=5e-3),
        params[True], params[False])
