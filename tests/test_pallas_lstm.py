"""Pallas fused LSTM vs the lax.scan path (interpret mode on CPU; the same
kernel compiles natively on TPU — exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tss_dprnn_tpu.ops import rnn
from tss_dprnn_tpu.ops.pallas_lstm import lstm_scan_pallas


def _weights(rng, F, H):
    return rnn.LSTMWeights(
        rng.standard_normal((F, 4 * H)).astype(np.float32) * 0.2,
        rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2,
        rng.standard_normal(4 * H).astype(np.float32) * 0.1,
    )


@pytest.mark.parametrize("bidirectional", [False, True])
def test_pallas_matches_scan(rng, bidirectional, monkeypatch):
    # interpret=True lets the TPU kernel run on CPU for testing
    import tss_dprnn_tpu.ops.pallas_lstm as pk
    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    pk.lstm_scan_pallas._clear_cache() if hasattr(pk.lstm_scan_pallas, "_clear_cache") else None

    B, T, F, H = 3, 12, 128, 128
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H) if bidirectional else None
    ref = np.asarray(rnn.lstm(x, fwd, bwd))
    with rnn.lstm_backend("pallas"):
        got = np.asarray(rnn.lstm(x, fwd, bwd))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_pallas_masked_lengths(rng, monkeypatch):
    import functools
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    B, T, F, H = 3, 10, 128, 128
    lengths = np.array([10, 7, 4], np.int32)
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)
    ref = np.asarray(rnn.lstm(x, fwd, bwd, lengths=lengths))
    with rnn.lstm_backend("pallas"):
        got = np.asarray(rnn.lstm(x, fwd, bwd, lengths=lengths))
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(got[b, :l], ref[b, :l], atol=2e-5, rtol=2e-5)


def test_pallas_v2_matches_scan(rng, monkeypatch):
    import functools
    from jax.experimental import pallas as pl

    from tss_dprnn_tpu.ops import pallas_lstm as pk

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    B, T, F, H = 3, 20, 128, 128
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)
    ref = np.asarray(rnn.lstm(x, fwd, bwd))
    wi = np.stack([fwd.w_ih, bwd.w_ih])
    wh = np.stack([fwd.w_hh, bwd.w_hh])
    b = np.stack([fwd.b, bwd.b])
    got = np.asarray(pk.bilstm_pallas_v2(x, wi, wh, b, row_tile=8, chunk=5))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
    # pre-flipped two-buffer path with time padding
    x2 = np.stack([x, x[:, ::-1]])
    got2 = np.asarray(pk.lstm_scan_pallas_v2(x2, wi, wh, b, row_tile=8, chunk=7))
    fwd_out = got2[0]
    bwd_out = got2[1][:, ::-1]
    np.testing.assert_allclose(
        np.concatenate([fwd_out, bwd_out], -1), ref, atol=2e-5, rtol=2e-5
    )


def test_time_major_lstm_matches_batch_major(rng, monkeypatch):
    """rnn.lstm_tm ([T, R, F] layout) must equal rnn.lstm on the transposed
    input — forward and grads — on the pallas backend (interpret mode)."""
    import functools
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    # pin the time-major kernel for the inference primal too: the bitwise
    # check below relies on lstm and lstm_tm running the SAME kernel, and
    # lstm's inference primal defaults to the batch-major kernel (TSS_BM)
    monkeypatch.setenv("TSS_BM", "0")
    B, T, F, H = 3, 11, 16, 8  # T=11 also exercises the unroll-pad path
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)

    def loss_bm(x, fwd, bwd):
        return jnp.sum(jnp.square(rnn.lstm(x, fwd, bwd)))

    def loss_tm(x, fwd, bwd):
        xk = jnp.swapaxes(x, 0, 1)
        out = rnn.lstm_tm(xk, fwd, bwd)  # [T, B, 2H]
        return jnp.sum(jnp.square(out))

    with rnn.lstm_backend("pallas"):
        ref = np.asarray(rnn.lstm(x, fwd, bwd))
        got = np.asarray(jnp.swapaxes(rnn.lstm_tm(jnp.swapaxes(x, 0, 1), fwd, bwd), 0, 1))
        np.testing.assert_array_equal(got, ref)  # same kernel, same layout math
        g_bm = jax.grad(loss_bm, argnums=(0, 1, 2))(x, fwd, bwd)
        g_tm = jax.grad(loss_tm, argnums=(0, 1, 2))(x, fwd, bwd)
    for a, b in zip(jax.tree_util.tree_leaves(g_bm), jax.tree_util.tree_leaves(g_tm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_time_major_block_path_matches_batch_major(rng, monkeypatch):
    """DPRNNCore's time-major fast path (pallas, unmasked) must reproduce the
    batch-major pallas path exactly — forward and param grads."""
    import functools
    from jax.experimental import pallas as pl

    import tss_dprnn_tpu.models.dprnn as dm
    from tss_dprnn_tpu.models.dprnn import DPRNNTasNet

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setenv("TSS_TM", "1")  # the tm path is opt-in (slower on TPU)
    m = DPRNNTasNet(input_size=12, feature_size=8, hidden_size=6, chunk_length=10,
                    kernel_size=2, n_repeats=1, norm_type="ln", remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 160))
    params = m.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.sum(jnp.square(m.apply(p, x)))

    with rnn.lstm_backend("pallas"):
        out_tm = np.asarray(m.apply(params, x))
        g_tm = jax.grad(loss)(params)
    # disable the tm dispatch -> batch-major pallas path
    monkeypatch.setattr(dm.rnn_ops, "lstm_time_major_available", lambda *a, **k: False)
    with rnn.lstm_backend("pallas"):
        out_bm = np.asarray(m.apply(params, x))
        g_bm = jax.grad(loss)(params)
    np.testing.assert_allclose(out_tm, out_bm, atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_tm), jax.tree_util.tree_leaves(g_bm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_bilstm2_exact_divisor_tile(rng, monkeypatch):
    """bilstm2's inference path picks an exact-divisor row tile (>=96)
    instead of padding rows to a row_tile multiple; with an indivisible T it
    also pads time to the unroll multiple. Both shape paths must reproduce
    the lax.scan reference."""
    import functools
    from jax.experimental import pallas as pl

    from tss_dprnn_tpu.ops import pallas_lstm as pk

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    F = H = 16
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)
    wi = np.stack([fwd.w_ih, bwd.w_ih])
    wh = np.stack([fwd.w_hh, bwd.w_hh])
    b = np.stack([fwd.b, bwd.b])
    # B=192 with row_tile=128: 192 % 128 != 0 -> divisor search lands on 96
    # (no row padding); T=11 additionally exercises the time-pad masking
    for T in (10, 11):
        x = rng.standard_normal((192, T, F)).astype(np.float32)
        ref = np.asarray(rnn.lstm(x, fwd, bwd))
        o0, o1 = pk.bilstm2_forward(x, wi, b, wh, row_tile=128)
        got = np.concatenate([np.asarray(o0), np.asarray(o1)], -1)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_bilstm2_batch_major_matches_scan(rng, monkeypatch):
    """The batch-major bilstm2 kernel (blocks walk the PUBLIC [R, T, F]
    layout; unroll = time block size, forced to a multiple of 8 by the Pallas
    sublane constraint) must reproduce the lax.scan reference on both shape
    paths: T an exact multiple of the unroll and T requiring the in-kernel
    dir-1 pad masking."""
    import functools
    from jax.experimental import pallas as pl

    from tss_dprnn_tpu.ops import pallas_lstm as pk

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    F = H = 16
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)
    wi = np.stack([fwd.w_ih, bwd.w_ih])
    wh = np.stack([fwd.w_hh, bwd.w_hh])
    b = np.stack([fwd.b, bwd.b])
    # T=16: exact unroll divisor; T=11: pads to 16 with 5 masked sub-steps
    # (dir 1 starts inside the pad block). B=192 with row_tile=128 also
    # exercises the exact-divisor row-tile search.
    for T in (16, 11):
        x = rng.standard_normal((192, T, F)).astype(np.float32)
        ref = np.asarray(rnn.lstm(x, fwd, bwd))
        o0, o1 = pk.bilstm2_forward_bm(x, wi, b, wh, row_tile=128)
        got = np.concatenate([np.asarray(o0), np.asarray(o1)], -1)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_bilstm2_dense_fused_matches_unfused(rng, monkeypatch):
    """The fused SplitDense epilogue (dense mode of _bilstm2_kernel) must
    reproduce scan + explicit per-direction contraction — forward (both the
    exact-divisor T and the time-pad/masked path) and grads through the
    custom VJP (whose fwd runs the unfused resid kernel)."""
    import functools
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setenv("TSS_FUSED_DENSE", "1")  # the fused epilogue is opt-in
    F = H = 16
    Fo = 8
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)
    kernel = rng.standard_normal((2 * H, Fo)).astype(np.float32) * 0.3

    def ref_fn(x, fwd, bwd, kernel):
        o0, o1 = rnn.lstm_pair(x, fwd, bwd)
        return o0 @ kernel[:H] + o1 @ kernel[H:]

    for T in (10, 11):  # 11 pads time to the unroll multiple (masked dir-1)
        x = rng.standard_normal((192, T, F)).astype(np.float32)
        ref = np.asarray(ref_fn(x, fwd, bwd, kernel))
        with rnn.lstm_backend("pallas"):
            got = np.asarray(rnn.lstm_split_dense(x, fwd, bwd, kernel))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    x = rng.standard_normal((24, 10, F)).astype(np.float32)

    def loss_fused(x, fwd, bwd, kernel):
        return jnp.sum(jnp.square(rnn.lstm_split_dense(x, fwd, bwd, kernel)))

    def loss_ref(x, fwd, bwd, kernel):
        return jnp.sum(jnp.square(ref_fn(x, fwd, bwd, kernel)))

    with rnn.lstm_backend("pallas"):
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, fwd, bwd, kernel)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, fwd, bwd, kernel)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4)


def test_bilstm2_masked_matches_stacked_path(rng, monkeypatch):
    """Mask-aware no-stack kernel (round 3): dir-1 starts each row's backward
    scan at its own length in-kernel. On t < len both directions must equal
    the stacked masked_flip path (what lstm() runs on the XLA backend);
    dir-1's t >= len region is defined 0. Grads run the masked resid-forward
    + masked backward KERNELS and must match the stacked path whenever the
    cotangents live on the valid region (in-model they always do — every
    consumer masks; at t >= len the kernel's dir-1 output is the constant 0,
    so cotangents there are correctly discarded)."""
    import functools
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    F = H = 16
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)
    for T in (16, 11):  # exact-divisor and time-padded grids
        B = 24
        x = rng.standard_normal((B, T, F)).astype(np.float32)
        lens = rng.integers(1, T + 1, size=B).astype(np.int32)
        lens[0] = T  # include a full-length row
        ref = np.asarray(rnn.lstm(x, fwd, bwd, lengths=lens))  # xla stacked
        with rnn.lstm_backend("pallas"):
            got = np.asarray(rnn.lstm(x, fwd, bwd, lengths=lens))
        mask = (np.arange(T)[None, :] < lens[:, None])[..., None]
        np.testing.assert_allclose(np.where(mask, got, 0.0),
                                   np.where(mask, ref, 0.0),
                                   atol=2e-5, rtol=2e-5)
        # dir-1 masked region is exactly zero (held state)
        np.testing.assert_array_equal(np.where(mask, 0.0, got[..., H:]), 0.0)

    # gradients: the custom VJP runs the stacked path — must match XLA's
    B, T = 16, 12
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    lens = rng.integers(1, T + 1, size=B).astype(np.int32)
    m = (np.arange(T)[None, :] < lens[:, None])[..., None].astype(np.float32)

    def loss(x, fwd, bwd):
        out = rnn.lstm(x, fwd, bwd, lengths=lens)
        return jnp.sum(jnp.square(out * m))  # cotangent only on valid region

    with rnn.lstm_backend("pallas"):
        g_pal = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4)


def test_time_major_masked_block_path_matches_batch_major(rng, monkeypatch):
    """Round-5: the MASKED lane can run time-major too (the masked kernel
    core was already time-major — only the public entry + chunk-mask
    plumbing were missing). DPRNNCore's masked tm path must reproduce the
    masked batch-major pallas path on the valid region — forward and param
    grads — for ragged lengths including a full-length row."""
    import functools
    from jax.experimental import pallas as pl

    import tss_dprnn_tpu.models.dprnn as dm
    from tss_dprnn_tpu.models.dprnn import DPRNNTasNet

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setenv("TSS_TM", "1")
    m = DPRNNTasNet(input_size=12, feature_size=8, hidden_size=6, chunk_length=10,
                    kernel_size=2, n_repeats=2, norm_type="ln", remat=True)
    B, T = 3, 160
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T))
    lengths = jnp.array([160, 100, 47], jnp.int32)
    params = m.init(jax.random.PRNGKey(1), x)
    tmask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)

    def loss(p):
        out = m.apply(p, x, lengths=lengths)
        return jnp.sum(jnp.square(out * tmask[:, None, :]))

    with rnn.lstm_backend("pallas"):
        out_tm = np.asarray(m.apply(params, x, lengths=lengths))
        g_tm = jax.grad(loss)(params)
    monkeypatch.setattr(dm.rnn_ops, "lstm_time_major_available", lambda *a, **k: False)
    with rnn.lstm_backend("pallas"):
        out_bm = np.asarray(m.apply(params, x, lengths=lengths))
        g_bm = jax.grad(loss)(params)
    for b in range(B):
        l = int(lengths[b])
        np.testing.assert_allclose(out_tm[b, :, :l], out_bm[b, :, :l],
                                   atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_tm), jax.tree_util.tree_leaves(g_bm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_masked_tm_kernel_matches_masked_batch_major(rng, monkeypatch):
    """bilstm2_forward_masked_tm == bilstm2_forward_masked on the transposed
    input (same core; only the public swapaxes differ), incl. ragged lengths
    with a length-1 row and indivisible T."""
    import functools
    from jax.experimental import pallas as pl

    from tss_dprnn_tpu.ops import pallas_lstm as pk

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    B, T, F, H = 4, 11, 16, 8
    lengths = np.array([11, 7, 1, 4], np.int32)
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    fwd = _weights(rng, F, H)
    bwd = _weights(rng, F, H)
    wi = np.stack([fwd.w_ih, bwd.w_ih])
    wh = np.stack([fwd.w_hh, bwd.w_hh])
    b2 = np.stack([fwd.b, bwd.b])
    o0_bm, o1_bm = pk.bilstm2_forward_masked(x, lengths, wi, b2, wh)
    o0_tm, o1_tm = pk.bilstm2_forward_masked_tm(
        jnp.swapaxes(x, 0, 1), lengths, wi, b2, wh)
    np.testing.assert_array_equal(np.asarray(jnp.swapaxes(o0_tm, 0, 1)), np.asarray(o0_bm))
    np.testing.assert_array_equal(np.asarray(jnp.swapaxes(o1_tm, 0, 1)), np.asarray(o1_bm))
