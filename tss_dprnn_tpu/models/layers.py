"""Shared flax.linen building blocks for the model zoo.

Thin parameter-owning wrappers over the pure kernels in ``tss_dprnn_tpu.ops``.
Initializers mirror torch defaults (uniform ±1/sqrt(fan)) so from-scratch
training dynamics are comparable to the reference.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tss_dprnn_tpu.ops import norms as norms_ops
from tss_dprnn_tpu.ops import rnn as rnn_ops


def torch_uniform_init(fan_in: int):
    k = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init


class TorchDense(nn.Module):
    """Dense with torch nn.Linear's FULL default init: kernel ~ U(±1/√fan_in)
    (kaiming_uniform(a=√5) == variance_scaling(1/3, fan_in, uniform)) AND
    bias ~ U(±1/√fan_in) — nn.Dense can't express the bias half because flax
    bias initializers never see fan_in. Param tree (kernel [in, out] = torch
    weight.T, bias [out]) and dtype promotion are identical to nn.Dense, so
    checkpoints and the torch converter are unaffected."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (fan_in, self.features),
        )
        if not self.use_bias:
            x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
            return x @ kernel
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        return x @ kernel + bias


def make_dense(features: int, use_bias: bool = True, name: str = None, dtype=None):
    """torch-initialized Dense (kernel [in, out], so torch weight.T)."""
    return TorchDense(features, use_bias=use_bias, name=name, dtype=dtype)


class SplitDense(nn.Module):
    """Dense(2H -> features) applied to an UNCONCATENATED bidirectional pair:
    ``o0 @ kernel[:H] + o1 @ kernel[H:] + bias``.

    Param tree (kernel [2H, features], bias [features]; same names, shapes,
    and init as make_dense's TorchDense) is checkpoint- and init-compatible
    with the concat+Dense formulation — the math is identical because the
    Dense is linear in its input. Skipping the concat matters on TPU: the
    time-major pallas scan outputs live in {2,0,1} minor-to-major, and XLA
    materializes their concatenate as a pad_maximum fusion (~16 ms per scan
    at the flagship shape) before the Dense can run.

    setup-based (``in_features`` = 2H known statically) so ``promoted()`` can
    hand the weights to the fused pallas epilogue (rnn_ops.lstm_split_dense)
    BEFORE the scan runs — the contraction then happens inside the scan
    kernel and the H-wide outputs never reach HBM.
    """

    features: int
    in_features: int
    dtype: Any = None

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.in_features, self.features),
        )
        self.bias = self.param("bias", torch_uniform_init(self.in_features), (self.features,))

    def __call__(self, o0, o1):
        H = o0.shape[-1]
        o0, o1, kernel, bias = nn.dtypes.promote_dtype(
            o0, o1, self.kernel, self.bias, dtype=self.dtype
        )
        return o0 @ kernel[:H] + o1 @ kernel[H:] + bias

    def promoted(self):
        """(kernel, bias) cast to the module compute dtype — for consumers
        that fuse the contraction elsewhere (same promote as __call__)."""
        kernel, bias = nn.dtypes.promote_dtype(self.kernel, self.bias, dtype=self.dtype)
        return kernel, bias


class RNNCore(nn.Module):
    """(Bi)RNN over [B*, T, F] -> [B*, T, H*ndir] — the reference SingleRNN
    (src/models/dprnn.py:7-37) as a fused-scan kernel with torch param layout.

    rnn_type: 'LSTM' (primary, fused bidirectional scan), 'GRU', or 'RNN'.
    """

    hidden_size: int
    bidirectional: bool = True
    rnn_type: str = "LSTM"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lengths=None, time_major: bool = False, return_pair: bool = False,
                 dense_kernel=None):
        F = x.shape[-1]
        H = self.hidden_size
        u_f, u_h = torch_uniform_init(H), torch_uniform_init(H)
        if self.rnn_type == "LSTM":
            G = 4 * H
        elif self.rnn_type == "GRU":
            G = 3 * H
        elif self.rnn_type == "RNN":
            G = H
        else:
            raise ValueError(f"rnn_type must be LSTM/GRU/RNN, got {self.rnn_type}")

        def direction(tag):
            w_ih = self.param(f"w_ih_{tag}", u_f, (F, G))
            w_hh = self.param(f"w_hh_{tag}", u_h, (H, G))
            b_ih = self.param(f"b_ih_{tag}", u_h, (G,))
            b_hh = self.param(f"b_hh_{tag}", u_h, (G,))
            return w_ih, w_hh, b_ih, b_hh

        fwd = direction("f")
        bwd = direction("b") if self.bidirectional else None
        if self.dtype is not None:
            x = x.astype(self.dtype)
            fwd = jax.tree.map(lambda a: a.astype(self.dtype), fwd)
            bwd = jax.tree.map(lambda a: a.astype(self.dtype), bwd) if bwd else None
        if self.rnn_type == "LSTM":
            to_lstm = lambda w: rnn_ops.LSTMWeights(w[0], w[1], w[2] + w[3])
            if dense_kernel is not None:
                # BiLSTM -> Dense(2H -> Fo) WITHOUT bias (caller adds it):
                # on the fused pallas path the contraction runs inside the
                # scan kernel's epilogue so the H-wide outputs never reach HBM
                assert bwd is not None and not time_major and not return_pair
                return rnn_ops.lstm_split_dense(
                    x, to_lstm(fwd), to_lstm(bwd), dense_kernel, lengths
                )
            if time_major:
                # x is [T, R, F]; only valid on the fused bidirectional
                # pallas path (caller gates on lstm_time_major_available);
                # lengths [R] selects the mask-aware kernel
                assert bwd is not None
                if return_pair:
                    return rnn_ops.lstm_pair_tm(x, to_lstm(fwd), to_lstm(bwd), lengths)
                assert lengths is None
                return rnn_ops.lstm_tm(x, to_lstm(fwd), to_lstm(bwd))
            if return_pair:
                # direction pair for a SplitDense consumer (concat skipped)
                assert bwd is not None
                return rnn_ops.lstm_pair(x, to_lstm(fwd), to_lstm(bwd), lengths)
            return rnn_ops.lstm(x, to_lstm(fwd), to_lstm(bwd) if bwd else None, lengths)
        if self.rnn_type == "GRU":
            return rnn_ops.gru(x, fwd, bwd, lengths)
        return rnn_ops.vanilla_rnn(x, fwd, bwd, lengths)

    def output_size(self) -> int:
        return self.hidden_size * (2 if self.bidirectional else 1)


class GlobalNorm(nn.Module):
    """Channels-last global layer norm: 'gLN' (GlobLN, eps=1e-8) or 'ln'
    (torch GroupNorm(1, C), eps=1e-5). Reference norms.py / dprnn.py:72-77.

    ``dtype``: output dtype for the bf16 compute path — statistics are always
    computed in fp32 (bf16 variance is catastrophically imprecise)."""

    channels: int
    norm_type: str = "gLN"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, batch_axis: int = 0):
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        eps = norms_ops.GLOBLN_EPS if self.norm_type == "gLN" else norms_ops.GROUPNORM_EPS
        # statistics are always fp32 inside global_channel_norm_cl; bf16
        # inputs are passed through unconverted so x never materializes as
        # an f32 HBM tensor (upcasts happen element-wise inside fusions)
        xin = x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32)
        out = norms_ops.global_channel_norm_cl(
            xin, gamma, beta, eps=eps, mask=mask, batch_axis=batch_axis
        )
        return out.astype(self.dtype or x.dtype)


class PReLU(nn.Module):
    """torch nn.PReLU(): one shared slope, init 0.25 (reference dprnn.py:154)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("a", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class BatchNorm(nn.Module):
    """torch BatchNorm1d semantics over channels-last inputs [..., C].

    Normalizes per channel over all other axes with batch statistics when
    ``use_running_average=False`` (training), running stats otherwise.
    torch defaults: eps=1e-5, momentum=0.1 (new = 0.9*old + 0.1*batch).
    """

    channels: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        C = self.channels
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)
            if not self.is_initializing():
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                unbiased = var * (n / max(n - 1, 1))  # torch tracks unbiased var
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias
