"""Serving export (jax.export StableHLO artifacts): round-trip through the
zip container and exactness of the padded-bucket dispatch vs a direct apply.
No reference counterpart — deployment capability beyond the torch stack
(src/inferencers/inferencer.py:33-46 requires the full model code)."""

import numpy as np
import pytest

import jax

from tss_dprnn_tpu.inference.export import (
    ServingModel,
    export_separation,
    load_artifact,
    save_artifact,
)

TINY_SPE = dict(
    input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
    kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
    O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="att",
)
TINY_BSS = dict(
    input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
    kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
)


def _roundtrip(tmp_path, model, variables, shapes, meta):
    buckets = [
        export_separation(model, variables, B, T, lstm_backend="xla")
        for B, T in shapes
    ]
    path = str(tmp_path / "model.tssx")
    save_artifact(path, buckets, meta)
    sep = load_artifact(path)
    assert isinstance(sep, ServingModel)
    return sep


def test_export_bss_roundtrip_exact(rng, tmp_path):
    from tss_dprnn_tpu.models import DPRNNTasNet

    model = DPRNNTasNet(**TINY_BSS)
    T_bucket = 2000
    mix0 = rng.standard_normal((1, T_bucket)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), mix0)
    sep = _roundtrip(tmp_path, model, variables, [(1, T_bucket), (4, T_bucket)],
                     {"spe": False, "aux_factor": 1})

    # exact-size request on the big bucket
    mix = rng.standard_normal((4, T_bucket)).astype(np.float32)
    want = np.asarray(model.apply(variables, mix))
    got = sep.call(mix)
    assert got.shape == (4, 2, T_bucket)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # smaller request: pads batch 3 -> 4 and time 1600 -> 2000; the masked
    # path must reproduce the exact-shape run on the valid region
    t = 1600
    mix = rng.standard_normal((3, t)).astype(np.float32)
    want = np.asarray(model.apply(variables, mix))
    got = sep.call(mix)
    assert got.shape == (3, 2, t)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # batch-1 low-latency bucket is picked for single requests
    assert sep._pick(1, 1500) == (1, T_bucket)

    # nothing fits -> clear error
    with pytest.raises(ValueError, match="no exported bucket fits"):
        sep.call(rng.standard_normal((5, 3000)).astype(np.float32))


def test_export_spe_roundtrip_exact(rng, tmp_path):
    from tss_dprnn_tpu.models import DPRNNSpeTasNet

    model = DPRNNSpeTasNet(**TINY_SPE)
    T_bucket = 2000
    args0 = (
        np.zeros((1, T_bucket), np.float32),
        np.zeros((1, T_bucket), np.float32),
        np.full((1,), float(T_bucket), np.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), *args0)
    sep = _roundtrip(tmp_path, model, variables, [(2, T_bucket)],
                     {"spe": True, "aux_factor": 1})

    t, ta = 1700, 1400
    mix = rng.standard_normal((2, t)).astype(np.float32)
    aux = rng.standard_normal((2, ta)).astype(np.float32)
    aux_len = np.full((2,), float(ta), np.float32)
    want = np.asarray(model.apply(variables, mix, aux, aux_len)[0])
    got = sep.call(mix, aux, aux_len)
    assert got.shape == (2, 1, t)
    np.testing.assert_allclose(got[:, 0], want, atol=1e-4, rtol=1e-4)

    with pytest.raises(ValueError, match="aux is required"):
        sep.call(mix)


def test_export_cli(rng, tmp_path):
    """End-to-end: checkpoint on disk -> CLI -> artifact -> serving call."""
    from tss_dprnn_tpu.cli import export_model
    from tss_dprnn_tpu.models import DPRNNSpeTasNet
    from tss_dprnn_tpu.utils.checkpoint import CheckpointManager, to_pure_tree

    model = DPRNNSpeTasNet(**TINY_SPE)
    T = 800  # 0.1 s at 8 kHz
    args0 = (
        np.zeros((1, T), np.float32),
        np.zeros((1, T), np.float32),
        np.full((1,), float(T), np.float32),
    )
    variables = model.init(jax.random.PRNGKey(1), *args0)
    ck = CheckpointManager(str(tmp_path / "chkpts"))
    ckpt_path = ck.save(1, {"epoch": 1, "params": to_pure_tree(variables["params"]),
                            "batch_stats": to_pure_tree(variables.get("batch_stats"))},
                        best=True)

    cfg = tmp_path / "export.yaml"
    cfg.write_text(
        "model:\n  _target_: dprnn_spe_tasnet\n"
        + "".join(f"  {k}: {v}\n" for k, v in TINY_SPE.items() if k != "fusion_type")
        + "  fusion_type: att\n"
        + f"checkpoint_path: {ckpt_path}\n"
        + "data:\n  sample_rate: 8000\n"
    )
    out = str(tmp_path / "model.tssx")
    export_model.main([
        "--config", str(cfg), "--mode", "tss_spe", "--out", out,
        "--batch", "2", "--secs", "0.1", "--backend", "xla", "--dtype", "fp32",
    ])
    sep = load_artifact(out)
    assert sep.spe and sep.meta["sample_rate"] == 8000
    assert sorted(sep.buckets) == [(1, T), (2, T)]
    mix = rng.standard_normal((2, T)).astype(np.float32)
    aux = rng.standard_normal((2, T)).astype(np.float32)
    want = np.asarray(
        model.apply(variables, mix, aux, np.full((2,), float(T), np.float32))[0]
    )
    got = sep.call(mix, aux)
    np.testing.assert_allclose(got[:, 0], want, atol=1e-5, rtol=1e-5)
