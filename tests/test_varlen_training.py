"""Variable-length training end to end: masked PIT loss semantics, the
length-bucketed VarLenTrainLoader, the trainer's true-lengths threading, and
the CLI surface (``data.variable_length: true``).

Capability superset over the reference, which trains fixed 3-s crops only
(src/datasets/librimix.py:55-64); the masked-scan kernels this exercises are
hardware-verified by scripts/perf/grad_check_tpu.py (masked mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from tests.fixtures import make_mini_librimix
from tss_dprnn_tpu.data.loader import VarLenTrainLoader, collate_bss_eval
from tss_dprnn_tpu.ops import losses


# ------------------------------------------------------------- masked loss


def test_masked_pit_loss_equals_cropped(rng):
    B, T = 5, 600
    lens = np.array([600, 431, 257, 600, 33], np.int32)
    est = rng.standard_normal((B, 2, T)).astype(np.float32)
    tgt = rng.standard_normal((B, 2, T)).astype(np.float32)
    # make padding garbage LARGE so leakage would be obvious
    for b in range(B):
        est[b, :, lens[b]:] = 100.0
        tgt[b, :, lens[b]:] = -50.0
    masked = losses.pit_sisdr_loss(
        jnp.asarray(est), jnp.asarray(tgt), lengths=jnp.asarray(lens))
    per_row = [
        float(losses.pit_sisdr_loss(
            jnp.asarray(est[b : b + 1, :, : lens[b]]),
            jnp.asarray(tgt[b : b + 1, :, : lens[b]])))
        for b in range(B)
    ]
    np.testing.assert_allclose(float(masked), np.mean(per_row), rtol=1e-5, atol=1e-5)


def test_masked_pit_loss_full_lengths_is_noop(rng):
    est = rng.standard_normal((3, 2, 400)).astype(np.float32)
    tgt = rng.standard_normal((3, 2, 400)).astype(np.float32)
    full = losses.pit_sisdr_loss(jnp.asarray(est), jnp.asarray(tgt))
    masked = losses.pit_sisdr_loss(jnp.asarray(est), jnp.asarray(tgt),
                                   lengths=jnp.full((3,), 400, jnp.int32))
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_masked_pit_return_est_reorders(rng):
    est = rng.standard_normal((2, 2, 300)).astype(np.float32)
    lens = jnp.asarray([300, 181], jnp.int32)
    # targets = swapped estimates -> best perm is the swap
    tgt = est[:, ::-1, :].copy()
    _, reordered = losses.pit_sisdr_loss(
        jnp.asarray(est), jnp.asarray(tgt), return_est=True, lengths=lens)
    np.testing.assert_allclose(np.asarray(reordered), tgt, atol=1e-6)


# ----------------------------------------------------------------- loader


class _RaggedBss:
    """List-like BSS dataset of ragged-length rows."""

    def __init__(self, lengths, seed=0):
        self._lens = list(lengths)
        self._rng = np.random.default_rng(seed)
        self._items = [
            (self._rng.standard_normal(l).astype(np.float32),
             self._rng.standard_normal((2, l)).astype(np.float32))
            for l in self._lens
        ]

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i):
        return self._items[i]

    def lengths(self):
        return self._lens


def test_varlen_loader_buckets_and_shapes():
    lens = [1000, 1100, 2000, 2100, 3100, 3300, 900, 1050, 2050, 3200, 950, 2020]
    ds = _RaggedBss(lens)
    loader = VarLenTrainLoader(ds, 2, collate_bss_eval, lengths=ds.lengths(),
                               n_buckets=3, multiple=500, seed=1, prefetch=0)
    seen_shapes = set()
    n_rows = 0
    for batch in loader:
        B, T = batch["mix"].shape
        assert B == 2
        assert T in loader.bounds
        assert batch["sources"].shape == (2, 2, T)
        assert np.all(batch["lengths"] <= T)
        assert np.all(batch["lengths"] >= 1)
        # padding beyond each row's length is zeros (collate pad contract)
        for b in range(B):
            l = batch["lengths"][b]
            assert np.all(batch["mix"][b, l:] == 0)
        seen_shapes.add(T)
        n_rows += B
    assert len(seen_shapes) >= 2, "expected multiple static bucket shapes"
    # rows kept == per-bucket counts rounded down to the batch size
    counts = {}
    for l in lens:
        counts[loader._bucket_of(l)] = counts.get(loader._bucket_of(l), 0) + 1
    assert n_rows == sum((c // 2) * 2 for c in counts.values())


def test_varlen_loader_epoch_determinism():
    ds = _RaggedBss([700, 800, 1500, 1600, 750, 1550, 820, 1580])
    def batches(epoch):
        loader = VarLenTrainLoader(ds, 2, collate_bss_eval, lengths=ds.lengths(),
                                   n_buckets=2, multiple=100, seed=7, prefetch=0)
        loader.set_epoch(epoch)
        return [b["mix"] for b in loader]

    a0, a1, b0 = batches(0), batches(1), batches(0)
    assert len(a0) == len(b0)
    for x, y in zip(a0, b0):
        np.testing.assert_array_equal(x, y)
    assert any(x.shape != y.shape or not np.array_equal(x, y)
               for x, y in zip(a0, a1)), "epochs should shuffle differently"


def test_varlen_loader_multihost_slices_partition():
    ds = _RaggedBss([700, 800, 1500, 1600, 750, 1550, 820, 1580])
    full = VarLenTrainLoader(ds, 4, collate_bss_eval, lengths=ds.lengths(),
                             n_buckets=2, multiple=100, seed=3, prefetch=0,
                             process_index=0, process_count=1)
    parts = [
        VarLenTrainLoader(ds, 4, collate_bss_eval, lengths=ds.lengths(),
                          n_buckets=2, multiple=100, seed=3, prefetch=0,
                          process_index=pi, process_count=2)
        for pi in range(2)
    ]
    for batch, p0, p1 in zip(full, iter(parts[0]), iter(parts[1])):
        np.testing.assert_array_equal(batch["mix"][:2], p0["mix"])
        np.testing.assert_array_equal(batch["mix"][2:], p1["mix"])
        np.testing.assert_array_equal(batch["lengths"][:2], p0["lengths"])
        np.testing.assert_array_equal(batch["lengths"][2:], p1["lengths"])


# ------------------------------------------------------------ train step


def test_varlen_train_step_matches_fixed_on_full_lengths(rng):
    """A var-len batch whose rows are all full-length must produce (nearly)
    the same loss as the same batch without lengths — the masked graph is
    value-equivalent up to float reduction order on full rows."""
    from tss_dprnn_tpu.models.registry import build_model
    from tss_dprnn_tpu.training.trainer import Trainer

    model = build_model(dict(
        target="dprnn_tasnet", input_size=8, feature_size=12, hidden_size=10,
        chunk_length=40, kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln"))
    cfg = dict(optimizer=dict(lr=1e-3), clip_norm=5, lr_scheduler=dict(patience=1))
    T = 800
    base = {
        "mix": rng.standard_normal((4, T)).astype(np.float32),
        "sources": rng.standard_normal((4, 2, T)).astype(np.float32),
    }

    tr_fixed = Trainer(model, dict(cfg))
    tr_fixed._ensure_state(base)
    s_fixed, loss_fixed, _ = tr_fixed._train_step(tr_fixed.state, base)

    varlen = dict(base, lengths=np.full((4,), T, np.int32))
    tr_var = Trainer(model, dict(cfg))
    tr_var._ensure_state(varlen)
    assert tr_var._varlen
    s_var, loss_var, _ = tr_var._train_step(tr_var.state, varlen)
    np.testing.assert_allclose(float(loss_fixed), float(loss_var), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_fixed.params), jax.tree.leaves(s_var.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_varlen_train_step_ignores_padding(rng):
    """Two batches identical on valid samples but with different padding
    garbage must produce identical loss and identical updated params."""
    from tss_dprnn_tpu.models.registry import build_model
    from tss_dprnn_tpu.training.trainer import Trainer

    model = build_model(dict(
        target="dprnn_tasnet", input_size=8, feature_size=12, hidden_size=10,
        chunk_length=40, kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln"))
    cfg = dict(optimizer=dict(lr=1e-3), clip_norm=5, lr_scheduler=dict(patience=1))
    T = 800
    lens = np.array([800, 517, 301, 650], np.int32)
    mix = rng.standard_normal((4, T)).astype(np.float32)
    src = rng.standard_normal((4, 2, T)).astype(np.float32)
    mask = (np.arange(T)[None, :] < lens[:, None])
    b1 = {"mix": mix * mask, "sources": src * mask[:, None, :],
          "lengths": lens}
    garbage = rng.standard_normal((4, T)).astype(np.float32) * 37.0
    b2 = {"mix": b1["mix"] + garbage * (~mask),
          "sources": b1["sources"] + (garbage * (~mask))[:, None, :],
          "lengths": lens}

    def run(batch):
        tr = Trainer(model, dict(cfg))
        tr._ensure_state(batch)
        state, loss, _ = tr._train_step(tr.state, batch)
        return float(loss), jax.tree.leaves(state.params)

    l1, p1 = run(b1)
    l2, p2 = run(b2)
    assert np.isfinite(l1)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_varlen_disables_schedule_masks_pragma(rng):
    from tss_dprnn_tpu.models.registry import build_model
    from tss_dprnn_tpu.training.trainer import Trainer

    model = build_model(dict(
        target="dprnn_tasnet", input_size=8, feature_size=12, hidden_size=10,
        chunk_length=40, kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln"))
    cfg = dict(optimizer=dict(lr=1e-3), clip_norm=5, lr_scheduler=dict(patience=1),
               schedule_masks=True)
    T = 800
    batch = {
        "mix": rng.standard_normal((4, T)).astype(np.float32),
        "sources": rng.standard_normal((4, 2, T)).astype(np.float32),
        "lengths": np.array([800, 517, 301, 650], np.int32),
    }
    tr = Trainer(model, dict(cfg))
    tr._ensure_state(batch)
    assert tr._varlen
    # padding-garbage invariance only holds if the pragma was really disabled
    garbage = np.zeros((4, T), np.float32)
    mask = (np.arange(T)[None, :] < batch["lengths"][:, None])
    garbage[~mask] = 55.0
    _, l1, _ = tr._train_step(tr.state, batch)
    tr2 = Trainer(model, dict(cfg))
    b2 = dict(batch, mix=batch["mix"] * mask + garbage)
    tr2._ensure_state(b2)
    _, l2, _ = tr2._train_step(tr2.state, b2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


# ------------------------------------------------------------------- CLI


def test_cli_varlen_workflow(tmp_path):
    """The full variable-length training surface: manifests frozen with
    segment=null -> train 1 epoch with data.variable_length -> checkpoint."""
    from tss_dprnn_tpu.cli import generate_manifests, train as train_cli

    csv = make_mini_librimix(str(tmp_path / "wavs"), n_mix=10, min_sec=0.8,
                             max_sec=2.0)
    gen_cfg = dict(
        dataset_type="librimix_spe", sample_rate=8000, n_src=2, segment=None,
        seed=0, train_path=csv, eval_path=csv, test_path=csv,
        train_out=str(tmp_path / "m/train.json"),
        eval_out=str(tmp_path / "m/eval.json"),
        test_out=str(tmp_path / "m/test.json"),
    )
    p = tmp_path / "gen.yaml"
    p.write_text(yaml.safe_dump(gen_cfg))
    generate_manifests.main(["--config", str(p)])

    tiny = dict(
        target="dprnn_spe_tasnet", input_size=8, feature_size=12, hidden_size=10,
        chunk_length=40, kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
        O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="att",
    )
    train_cfg = dict(
        name="t", is_test=False,
        data=dict(
            use_generated_train=str(tmp_path / "m/train.json"),
            use_generated_eval=str(tmp_path / "m/eval.json"),
            batch_size=2, sample_rate=8000, seed=0,
            variable_length=True, n_buckets=2, max_segment=1.6,
        ),
        model=tiny,
        optimizer=dict(lr=1e-3, weight_decay=1e-5),
        lr_scheduler=dict(patience=2, factor=0.5, decay_rate=None),
        logs=dict(metadata=dict(ids=[])),
        print_freq=100, clip_norm=5, cur_epoch=0, epochs=1, early_stop=10,
        ce_gamma=0.5, checkpoint_path=None, n_checkpoints=5,
        new_checkpoints_path=str(tmp_path / "chkpts"),
    )
    p = tmp_path / "train.yaml"
    p.write_text(yaml.safe_dump(train_cfg))
    train_cli.main(["--config", str(p), "--mode", "tss_spe"])
    ckpts = list((tmp_path / "chkpts").iterdir())
    assert ckpts, "variable-length training produced no checkpoints"
    # checkpoint format details are covered elsewhere; existence is the gate
