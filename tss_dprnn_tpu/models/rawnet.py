"""RawNet3 speaker encoder — TPU-native rebuild of reference
src/models/rawnet/RawNet3.py:10-144 and RawNetBasicBlock.py:8-141.

Components:
- :class:`PreEmphasis` + masked instance norm (RawNet3.py:23-25 preprocess);
- :class:`ParamSincFB` — SincNet-style learnable analytic band-pass
  filterbank (the asteroid_filterbanks ParamSincFB the reference wraps,
  RawNet3.py:26-32): per-band learnable (low_hz, band_hz), mel-spaced init,
  each band emitting a cosine-phase and a sine-phase (Hilbert pair) filter;
- :class:`Bottle2neck` — Res2Net multi-scale dilated conv block with AFMS
  (RawNetBasicBlock.py:53-141);
- context-statistics attention pooling (RawNet3.py:57-63, 104-127).

Everything is channels-last and length-masked: zeroing the padded tail before
every 'same'-padded conv makes the bucketed run equal the reference's
exact-length eager run (the reference's own zero padding at the true boundary
coincides with our mask). The whole embedder runs in fp32 like the reference,
which explicitly disables AMP around the sinc front-end (RawNet3.py:77).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tss_dprnn_tpu.models.layers import BatchNorm, make_dense
from tss_dprnn_tpu.ops import sinc as sinc_ops
from tss_dprnn_tpu.ops.conv import conv1d
from tss_dprnn_tpu.ops.masking import masked_softmax


def _time_mask(x, lengths):
    """[B, T, C] zero-out past per-sample lengths; None -> unchanged."""
    if lengths is None:
        return x
    T = x.shape[1]
    m = (jnp.arange(T)[None, :, None] < lengths[:, None, None]).astype(x.dtype)
    return x * m


def pre_emphasis(wav, coef: float = 0.97):
    """y[t] = x[t] - coef*x[t-1], reflect-padded at the start so lengths match
    (reference RawNetBasicBlock.py:8-26)."""
    first = wav[:, 1:2]  # torch reflect pad (1, 0): x[-1] := x[1]
    padded = jnp.concatenate([first, wav], axis=1)
    return padded[:, 1:] - coef * padded[:, :-1]


def masked_instance_norm(x, lengths=None, eps: float = 1e-4, weight=1.0, bias=0.0):
    """torch nn.InstanceNorm1d(1, affine) over time for [B, T] signals."""
    if lengths is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    else:
        T = x.shape[1]
        m = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)
        n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * m, axis=1, keepdims=True) / n
        var = jnp.sum(jnp.square(x - mean) * m, axis=1, keepdims=True) / n
        x = x * m  # keep tail zero
    return (x - mean) / jnp.sqrt(var + eps) * weight + bias


class ParamSincFB(nn.Module):
    """Learnable analytic sinc filterbank (asteroid_filterbanks-compatible
    parameterization): ``n_filters // 2`` bands with learnable absolute
    (low_hz, band_hz) offsets above (min_low_hz, min_band_hz), mel-spaced
    init over [min_low_hz, sr/2 - min_low_hz - min_band_hz]; each band yields
    a cosine-phase and a sine-phase FIR of length ``kernel_size``.

    ``__call__(wav [B, T]) -> [B, T', n_filters]``, T' = (T - k)//stride + 1.
    """

    n_filters: int
    kernel_size: int
    stride: int
    sample_rate: float = 16000.0
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0

    @nn.compact
    def __call__(self, wav, lengths=None):
        n_band = self.n_filters // 2
        low_init, band_init = sinc_ops.mel_init_bands(
            n_band, self.sample_rate, self.min_low_hz, self.min_band_hz
        )
        low_hz = self.param("low_hz_", lambda k, s: jnp.asarray(low_init), (n_band, 1))
        band_hz = self.param("band_hz_", lambda k, s: jnp.asarray(band_init), (n_band, 1))
        filters = sinc_ops.sinc_filters(
            low_hz, band_hz, self.kernel_size, self.sample_rate,
            self.min_low_hz, self.min_band_hz,
        )
        out = conv1d(wav[:, None, :], filters, stride=self.stride)  # [B, n_filters, T']
        return jnp.transpose(out, (0, 2, 1))

    def out_length(self, T):
        return (T - self.kernel_size) // self.stride + 1


class AFMS(nn.Module):
    """Alpha-Feature Map Scaling (reference RawNetBasicBlock.py:29-50):
    x = (x + alpha) * sigmoid(fc(mean_t(x)))."""

    nb_dim: int

    @nn.compact
    def __call__(self, x, lengths=None):
        alpha = self.param("alpha", nn.initializers.ones, (self.nb_dim,))
        if lengths is None:
            pooled = jnp.mean(x, axis=1)  # [B, C]
        else:
            T = x.shape[1]
            m = (jnp.arange(T)[None, :, None] < lengths[:, None, None]).astype(x.dtype)
            pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
        y = nn.sigmoid(make_dense(self.nb_dim, name="fc")(pooled))  # [B, C]
        return (x + alpha) * y[:, None, :]


def _max_pool_time(x, p: int):
    B, T, C = x.shape
    n = T // p
    return jnp.max(x[:, : n * p, :].reshape(B, n, p, C), axis=2)


class Bottle2neck(nn.Module):
    """Res2Net multi-scale dilated block (reference RawNetBasicBlock.py:53-141).

    [B, T, in] -> [B, T//pool, planes] (pool=False -> no pooling)."""

    inplanes: int
    planes: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 4
    pool: int = 0

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        width = self.planes // self.scale
        nums = self.scale - 1
        num_pad = (self.kernel_size // 2) * self.dilation

        residual = x
        if self.inplanes != self.planes:
            residual = make_dense(self.planes, use_bias=False, name="residual")(x)

        out = make_dense(width * self.scale, name="conv1")(x)
        out = nn.relu(out)
        out = BatchNorm(width * self.scale, name="bn1")(out, use_running_average=not train)

        chunks = [out[..., i * width : (i + 1) * width] for i in range(self.scale)]
        outs = []
        sp = None
        for i in range(nums):
            sp = chunks[i] if i == 0 else sp + chunks[i]
            sp = _time_mask(sp, lengths)  # matches exact-run zero padding at the boundary
            spc = jnp.transpose(sp, (0, 2, 1))  # [B, width, T]
            w = self.param(
                f"convs_{i}_w",
                nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (width, width, self.kernel_size),
            )
            b = self.param(f"convs_{i}_b", nn.initializers.zeros, (width,))
            spc = conv1d(spc, w, b, padding=num_pad, dilation=self.dilation)
            sp = jnp.transpose(spc, (0, 2, 1))
            sp = nn.relu(sp)
            sp = BatchNorm(width, name=f"bns_{i}")(sp, use_running_average=not train)
            outs.append(sp)
        outs.append(chunks[nums])
        out = jnp.concatenate(outs, axis=-1)

        out = make_dense(self.planes, name="conv3")(out)
        out = nn.relu(out)
        out = BatchNorm(self.planes, name="bn3")(out, use_running_average=not train)

        out = out + residual
        new_lengths = lengths
        if self.pool:
            out = _max_pool_time(out, self.pool)
            new_lengths = None if lengths is None else lengths // self.pool
        out = AFMS(self.planes, name="afms")(out, new_lengths)
        return out, new_lengths


class RawNet3(nn.Module):
    """RawNet3 embedder (reference RawNet3.py:10-136), ECA encoder type with
    context statistics pooling, ``summed`` branch topology.

    ``__call__(wav [B, T] @16 kHz, lengths=None, train=False) -> [B, nOut]``.
    """

    model_scale: int = 8
    context: bool = True
    summed: bool = True
    C: int = 1024
    nOut: int = 256
    encoder_type: str = "ECA"
    log_sinc: bool = True
    norm_sinc: str = "mean"
    out_bn: bool = False
    sinc_stride: int = 10
    sample_rate: float = 16000.0

    @nn.compact
    def __call__(self, wav, lengths=None, train: bool = False):
        B, T = wav.shape
        C = self.C

        # preprocess (RawNet3.py:23-25): pre-emphasis + affine instance norm
        in_w = self.param("inorm_weight", nn.initializers.ones, (1,))
        in_b = self.param("inorm_bias", nn.initializers.zeros, (1,))
        x = pre_emphasis(wav)
        x = masked_instance_norm(x, lengths, eps=1e-4, weight=in_w[0], bias=in_b[0])

        # sinc front-end: |conv| -> log -> mean-norm (RawNet3.py:79-88)
        sinc = ParamSincFB(C // 4, 251, self.sinc_stride, self.sample_rate, name="conv1")
        x = jnp.abs(sinc(x))  # [B, T0, C/4]
        l0 = None if lengths is None else sinc.out_length(lengths)
        if self.log_sinc:
            x = jnp.log(x + 1e-6)
        if self.norm_sinc == "mean":
            if l0 is None:
                x = x - jnp.mean(x, axis=1, keepdims=True)
            else:
                m = (jnp.arange(x.shape[1])[None, :, None] < l0[:, None, None]).astype(x.dtype)
                mean = jnp.sum(x * m, axis=1, keepdims=True) / jnp.maximum(
                    jnp.sum(m, axis=1, keepdims=True), 1.0
                )
                x = (x - mean) * m
        elif self.norm_sinc == "mean_std":
            mean = jnp.mean(x, axis=1, keepdims=True)
            std = jnp.maximum(jnp.std(x, axis=1, keepdims=True), 0.001)
            x = (x - mean) / std
        # NB: the reference *defines* relu+bn1 after the sinc front-end but
        # never applies them in forward (RawNet3.py:33-34 vs :89-99) — we
        # reproduce the executed graph, and the converter drops bn1.*
        x = _time_mask(x, l0)

        layer1 = Bottle2neck(C // 4, C, 3, 2, self.model_scale, pool=5, name="layer1")
        layer2 = Bottle2neck(C, C, 3, 3, self.model_scale, pool=3, name="layer2")
        layer3 = Bottle2neck(C, C, 3, 4, self.model_scale, pool=0, name="layer3")

        if self.summed:  # RawNet3.py:90-93
            x1, l1 = layer1(x, l0, train)
            x2, l2 = layer2(x1, l1, train)
            x3in = _max_pool_time(x1, 3)[:, : x2.shape[1]] + x2
            x3, _ = layer3(x3in, l2, train)
        else:
            x1, l1 = layer1(x, l0, train)
            x2, l2 = layer2(x1, l1, train)
            x3, _ = layer3(x2, l2, train)

        mp_x1 = _max_pool_time(x1, 3)[:, : x2.shape[1]]
        cat = jnp.concatenate([mp_x1, x2, x3], axis=-1)  # [B, t, 3C]
        x = nn.relu(make_dense(1536, name="layer4")(cat))
        x = _time_mask(x, l2)
        t = x.shape[1]

        tm = None
        if l2 is not None:
            tm = (jnp.arange(t)[None, :, None] < l2[:, None, None]).astype(x.dtype)

        if self.context:  # RawNet3.py:104-116
            if tm is None:
                mean = jnp.mean(x, axis=1, keepdims=True)
                var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
            else:
                n = jnp.maximum(jnp.sum(tm, axis=1, keepdims=True), 1.0)
                mean = jnp.sum(x * tm, axis=1, keepdims=True) / n
                # torch.var default unbiased=True (RawNet3.py:110)
                var = jnp.sum(jnp.square((x - mean) * tm), axis=1, keepdims=True) / jnp.maximum(
                    n - 1.0, 1.0
                )
            if tm is None:
                nfrm = float(t)
                var = var * (nfrm / max(nfrm - 1.0, 1.0))  # unbiased, as torch.var
            sg = jnp.sqrt(jnp.clip(var, 1e-4, 1e4))
            global_x = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(sg, x.shape)], axis=-1
            )
        else:
            global_x = x

        # attention head (RawNet3.py:57-63)
        w = make_dense(128, name="att_conv1")(global_x)
        w = nn.relu(w)
        w = BatchNorm(128, name="att_bn")(w, use_running_average=not train)
        w = make_dense(1536 if self.encoder_type == "ECA" else 1, name="att_conv2")(w)
        w = masked_softmax(w, tm, axis=1)  # [B, t, 1536 or 1]

        mu = jnp.sum(x * w, axis=1)  # [B, 1536]
        sg = jnp.sqrt(jnp.clip(jnp.sum((x**2) * w, axis=1) - mu**2, 1e-4, 1e4))
        emb = jnp.concatenate([mu, sg], axis=-1)  # [B, 3072]
        emb = BatchNorm(3072, name="bn5")(emb, use_running_average=not train)
        emb = make_dense(self.nOut, name="fc6")(emb)
        if self.out_bn:
            emb = BatchNorm(self.nOut, name="bn6")(emb, use_running_average=not train)
        return emb
