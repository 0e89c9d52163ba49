"""Hand-written LSTM backward (ops/rnn._recurrence custom VJP) vs jax
autodiff of a plain scan reference — gradients must match to fp32 tolerance
for x, both weight matrices, and biases."""

import numpy as np

import jax
import jax.numpy as jnp

from tss_dprnn_tpu.ops import rnn


def _plain_bilstm(x, fwd, bwd, B, T, F, H):
    """Autodiff reference: same math, no custom_vjp."""
    xr = jnp.flip(x, axis=1)
    w_ih = jnp.stack([fwd.w_ih, bwd.w_ih])
    b = jnp.stack([fwd.b, bwd.b])
    xx = jnp.stack([x, xr])
    xp = jnp.einsum("dbtf,dfg->tdbg", xx, w_ih) + b[None, :, None, :]
    w_hh = jnp.stack([fwd.w_hh, bwd.w_hh])
    h0 = jnp.zeros((2, B, H), x.dtype)
    c0 = jnp.zeros((2, B, H), jnp.float32)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.einsum("dbh,dhg->dbg", h, w_hh)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), xp)
    out_f = jnp.transpose(hs[:, 0], (1, 0, 2))
    out_b = jnp.flip(jnp.transpose(hs[:, 1], (1, 0, 2)), axis=1)
    return jnp.concatenate([out_f, out_b], axis=-1)


def test_custom_vjp_matches_autodiff(rng):
    B, T, F, H = 3, 11, 8, 6
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    tgt = rng.standard_normal((B, T, 2 * H)).astype(np.float32)

    def weights(seed):
        r = np.random.default_rng(seed)
        return rnn.LSTMWeights(
            (r.standard_normal((F, 4 * H)) * 0.3).astype(np.float32),
            (r.standard_normal((H, 4 * H)) * 0.3).astype(np.float32),
            (r.standard_normal(4 * H) * 0.1).astype(np.float32),
        )

    fwd, bwd = weights(1), weights(2)

    def loss_custom(x, fwd, bwd):
        out = rnn.lstm(x, fwd, bwd)
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(x, fwd, bwd):
        out = _plain_bilstm(x, fwd, bwd, B, T, F, H)
        return jnp.sum((out - tgt) ** 2)

    v1, g1 = jax.value_and_grad(loss_custom, argnums=(0, 1, 2))(x, fwd, bwd)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, fwd, bwd)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_custom_vjp_trains_end_to_end(rng):
    """Gradient flows through a DPRNN block and reduces a toy loss."""
    import optax

    from tss_dprnn_tpu.models.dprnn import DPRNNBlock

    blk = DPRNNBlock(feature_size=8, hidden_size=6, norm_type="ln")
    x = rng.standard_normal((2, 4, 10, 8)).astype(np.float32)
    tgt = rng.standard_normal((2, 4, 10, 8)).astype(np.float32)
    params = blk.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        return jnp.mean((blk.apply(p, x) - tgt) ** 2)

    tx = optax.adam(1e-2)
    state = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(20):
        g = jax.grad(loss_fn)(params)
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0


def test_pallas_backend_grads_match_xla(rng, monkeypatch):
    """Training with the pallas forward (interpret mode): grads must match
    the xla-backend grads (both use the hand-written backward)."""
    import functools

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    B, T, F, H = 2, 10, 128, 128
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    tgt = rng.standard_normal((B, T, 2 * H)).astype(np.float32)

    def weights(seed):
        r = np.random.default_rng(seed)
        return rnn.LSTMWeights(
            (r.standard_normal((F, 4 * H)) * 0.1).astype(np.float32),
            (r.standard_normal((H, 4 * H)) * 0.1).astype(np.float32),
            (r.standard_normal(4 * H) * 0.05).astype(np.float32),
        )

    fwd, bwd = weights(1), weights(2)

    def loss(x, fwd, bwd):
        return jnp.sum((rnn.lstm(x, fwd, bwd) - tgt) ** 2)

    g_x = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    with rnn.lstm_backend("pallas"):
        g_p = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    for a, b in zip(jax.tree_util.tree_leaves(g_x), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_segment_checkpointed_bwd_matches_dense(rng):
    """lstm_save_every(q) (segment-checkpointed residuals) must reproduce the
    dense-residual gradients, including when q does not divide T."""
    B, T, F, H = 3, 23, 8, 6
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    tgt = rng.standard_normal((B, T, 2 * H)).astype(np.float32)

    def weights(seed):
        r = np.random.default_rng(seed)
        return rnn.LSTMWeights(
            (r.standard_normal((F, 4 * H)) * 0.3).astype(np.float32),
            (r.standard_normal((H, 4 * H)) * 0.3).astype(np.float32),
            (r.standard_normal(4 * H) * 0.1).astype(np.float32),
        )

    fwd, bwd = weights(1), weights(2)

    def loss(x, fwd, bwd):
        return jnp.sum((rnn.lstm(x, fwd, bwd) - tgt) ** 2)

    v_dense, g_dense = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    for q in (7, 23, 64):  # partial tail segment / exact / q > T
        with rnn.lstm_save_every(q):
            v_seg, g_seg = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
        np.testing.assert_allclose(float(v_seg), float(v_dense), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_seg), jax.tree_util.tree_leaves(g_dense)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_pallas_backend_grads_ragged_time(rng, monkeypatch):
    """T not divisible by the kernel unroll exercises the end-pad+flip path
    of lstm_backward (padded steps must flow zero carries)."""
    import functools

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    B, T, F, H = 2, 13, 128, 128
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    tgt = rng.standard_normal((B, T, 2 * H)).astype(np.float32)

    def weights(seed):
        r = np.random.default_rng(seed)
        return rnn.LSTMWeights(
            (r.standard_normal((F, 4 * H)) * 0.1).astype(np.float32),
            (r.standard_normal((H, 4 * H)) * 0.1).astype(np.float32),
            (r.standard_normal(4 * H) * 0.05).astype(np.float32),
        )

    fwd, bwd = weights(1), weights(2)

    def loss(x, fwd, bwd):
        return jnp.sum((rnn.lstm(x, fwd, bwd) - tgt) ** 2)

    g_x = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    with rnn.lstm_backend("pallas"):
        g_p = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    for a, b in zip(jax.tree_util.tree_leaves(g_x), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_pallas_backend_grads_row_tail(rng, monkeypatch):
    """Row counts with 128 < Rp < 256 (not a multiple of 128) exercise the
    bilstm2 backward's row-tile divisor fallback: its VMEM-motivated 128-row
    tile does not divide the resid forward's Rp there, and a truncated grid
    (Rp // tile) silently dropped the tail rows' gradients (dx rows
    uninitialized, dW missing contributions)."""
    import functools

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    B, T, F, H = 150, 10, 8, 8  # Rp = 152
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    tgt = rng.standard_normal((B, T, 2 * H)).astype(np.float32)

    def weights(seed):
        r = np.random.default_rng(seed)
        return rnn.LSTMWeights(
            (r.standard_normal((F, 4 * H)) * 0.3).astype(np.float32),
            (r.standard_normal((H, 4 * H)) * 0.3).astype(np.float32),
            (r.standard_normal(4 * H) * 0.1).astype(np.float32),
        )

    fwd, bwd = weights(1), weights(2)

    def loss(x, fwd, bwd):
        return jnp.sum((rnn.lstm(x, fwd, bwd) - tgt) ** 2)

    g_x = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    with rnn.lstm_backend("pallas"):
        g_p = jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)
    for a, b in zip(jax.tree_util.tree_leaves(g_x), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)
