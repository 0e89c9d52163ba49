"""Windowed long-audio separation: crossfade-stitching exactness, cross-window
permutation alignment, constant-batch forward contract, and the model-backed
helpers (capability superset — the reference's eval loop is one full-length
forward per utterance, src/inferencers/inferencer.py:48-78, and cannot bound
memory for arbitrarily long inputs)."""

import numpy as np
import pytest

import jax

from tests.fixtures import SR
from tss_dprnn_tpu.inference.long_audio import (
    WindowedSeparator,
    _crossfade_weight,
    bss_windowed,
    spe_windowed,
)

TINY = dict(input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln")


def _noise(T, seed=0):
    return np.random.default_rng(seed).standard_normal(T).astype(np.float32)


def test_crossfade_weight_shape_and_interior():
    w = _crossfade_weight(100, 30)
    assert w.shape == (100,)
    assert np.all(w[30:70] == 1.0)
    assert np.all(w[:30] < 1.0) and np.all(w[-30:] < 1.0)
    np.testing.assert_allclose(w[:30], w[-30:][::-1])


def test_stitching_exact_for_consistent_model():
    """A 'model' whose window outputs agree on overlaps (pure per-sample
    function of the input) must be reconstructed exactly for any hop."""

    def fwd(x):  # [B, W] -> [B, 2, W]
        return np.stack([x, -0.5 * x], axis=1)

    T = 4096
    mix = _noise(T)
    for window, hop in [(1024, 512), (1024, 1000), (1000, 333), (4096, 2048), (8192, 4096)]:
        sep = WindowedSeparator(fwd, window, hop, batch_size=3)
        out = sep(mix)
        assert out.shape == (2, T)
        np.testing.assert_allclose(out[0], mix, atol=1e-5)
        np.testing.assert_allclose(out[1], -0.5 * mix, atol=1e-5)


def test_single_window_equals_direct_forward():
    def fwd(x):
        return np.stack([np.tanh(x), x**2], axis=1)

    T, W = 700, 1024  # shorter than one window -> zero-pad, trim back
    mix = _noise(T, 1)
    out = WindowedSeparator(fwd, W, batch_size=2)(mix)
    padded = np.zeros(W, np.float32)
    padded[:T] = mix
    ref = fwd(padded[None])[0][:, :T]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_permutation_alignment_across_windows():
    """A forward that flips its source order on every other call batch must
    still produce globally consistent sources after alignment."""
    calls = {"n": 0}

    def fwd(x):  # batch_size=1 -> one window per call
        est = np.stack([x, -x], axis=1)
        if calls["n"] % 2 == 1:
            est = est[:, ::-1]
        calls["n"] += 1
        return est

    T = 6000
    mix = _noise(T, 2)
    out = WindowedSeparator(fwd, 1024, 512, batch_size=1)(mix)
    np.testing.assert_allclose(out[0], mix, atol=1e-5)
    np.testing.assert_allclose(out[1], -mix, atol=1e-5)
    # sanity: without alignment the flipped windows corrupt the stitch
    calls["n"] = 0
    bad = WindowedSeparator(fwd, 1024, 512, batch_size=1, align_sources=False)(mix)
    assert np.abs(bad[0] - mix).max() > 0.1


def test_ragged_tail_batch_padding():
    """n_windows not divisible by batch_size: pad rows must be dropped and
    every forward must see the constant batch shape."""
    shapes = []

    def fwd(x):
        shapes.append(x.shape)
        return np.stack([x, x], axis=1)

    T, W, H, B = 5000, 1024, 512, 4
    out = WindowedSeparator(fwd, W, H, batch_size=B)(_noise(T, 3))
    assert out.shape == (2, T)
    assert all(s == (B, W) for s in shapes)
    n_win = len(list(range(0, T - W, H))) + 1
    assert len(shapes) == -(-n_win // B)


def test_bss_windowed_model_runs():
    from tss_dprnn_tpu.models import DPRNNTasNet

    model = DPRNNTasNet(**TINY)
    W = SR  # 1 s windows
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, W), np.float32))
    sep = bss_windowed(model, variables, window=W, batch_size=2, lstm_backend="xla")
    T = int(2.7 * SR)
    out = sep(_noise(T, 4))
    assert out.shape == (2, T)
    assert np.isfinite(out).all()


def test_spe_windowed_model_runs():
    from tss_dprnn_tpu.models import DPRNNSpeTasNet

    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    W = SR
    ref = _noise(SR, 5)
    z = np.zeros((1, W), np.float32)
    variables = model.init(jax.random.PRNGKey(0), z, ref[None], np.array([SR], np.float32))
    sep = spe_windowed(model, variables, ref, window=W, batch_size=2,
                       lstm_backend="xla")
    T = int(2.3 * SR)
    out = sep(_noise(T, 6))
    assert out.shape == (1, T)
    assert np.isfinite(out).all()


def test_rejects_bad_args():
    def fwd(x):
        return np.stack([x], axis=1)

    with pytest.raises(ValueError):
        WindowedSeparator(fwd, 100, hop=0)
    with pytest.raises(ValueError):
        WindowedSeparator(fwd, 100, hop=101)
    with pytest.raises(ValueError):
        WindowedSeparator(fwd, 100)(np.zeros((2, 100), np.float32))


def test_bss_windowed_wire_matches_f32():
    """The int16 wire path (device->host transfer halved) matches the exact
    fp32 path within the -96 dBFS quantization envelope."""
    import jax

    from tss_dprnn_tpu.models import DPRNNTasNet

    model = DPRNNTasNet(input_size=8, feature_size=12, hidden_size=10,
                        chunk_length=40, hop_length=20, n_repeats=1)
    W, T = 800, 2000
    mix = np.random.default_rng(0).standard_normal(T).astype(np.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, W), np.float32))
    out_wire = bss_windowed(model, variables, window=W, batch_size=2,
                            lstm_backend="xla", wire=True)(mix)
    out_f32 = bss_windowed(model, variables, window=W, batch_size=2,
                           lstm_backend="xla", wire=False)(mix)
    assert out_wire.shape == out_f32.shape == (2, T)
    peak = np.abs(out_f32).max()
    assert np.abs(out_wire - out_f32).max() <= peak / 32767 * 2 + 1e-7
