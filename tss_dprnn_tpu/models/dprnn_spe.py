"""DPRNN-Spe: target speech separation with a SpEx+-style ResNet speaker
encoder and five fusion variants — TPU-native rebuild of reference
src/models/dprnn_spe.py (ResBlock:8, DPRNNSpe:44, DPRNNSpeTasNet:250).

Same channels-last / masked design as models/dprnn.py. Reference quirks kept
for checkpoint-level parity:

- ``aux_T`` length arithmetic uses ``kernel_size // 2`` as the stride
  regardless of the configured stride (dprnn_spe.py:159-160);
- the 'att' fusion's frozen depthwise average conv (stride=kernel, weights
  1/kernel, dprnn_spe.py:100-104) is a non-overlapping mean pool here — the
  torch module carries non-trainable weights the converter simply skips;
- 'cat' fusion widens the bottleneck 1x1 conv input to N+E (dprnn_spe.py:90);
- in the IRA subclass the mean-pool divisor for the re-embedded estimate
  still comes from the *reference* length (dprnn_spe_ira.py:84) while the
  summed positions are mixture-domain — reproduced via the split
  ``feat_lengths`` / ``aux_T`` arguments of :class:`SpeakerEncoder`.

The speaker encoder, fusion and DPRNN core are single module instances so the
IRA variant can invoke them twice with shared weights.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tss_dprnn_tpu.models.dprnn import DPRNNCore, Decoder, Encoder, _core_kwargs, _fit_length
from tss_dprnn_tpu.models.layers import BatchNorm, GlobalNorm, PReLU, make_dense
from tss_dprnn_tpu.ops import fusion as fusion_ops

FUSION_TYPES = ("cat", "add", "mul", "film", "att")


def _pool3_cl(x):
    """nn.MaxPool1d(3) on channels-last [B, L, C] -> [B, floor(L/3), C]."""
    B, L, C = x.shape
    n = L // 3
    return jnp.max(x[:, : n * 3, :].reshape(B, n, 3, C), axis=2)


class ResBlock(nn.Module):
    """Speaker-encoder residual block (reference dprnn_spe.py:8-42):
    1x1 conv -> BN -> PReLU -> 1x1 conv -> BN -> (+skip) -> PReLU -> maxpool3.
    Channels-last [B, L, C_in] -> [B, floor(L/3), C_out]."""

    in_dims: int
    out_dims: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = make_dense(self.out_dims, use_bias=False, name="conv1")(x)
        y = BatchNorm(self.out_dims, name="batch_norm1")(y, use_running_average=not train)
        y = PReLU(name="prelu1")(y)
        y = make_dense(self.out_dims, use_bias=False, name="conv2")(y)
        y = BatchNorm(self.out_dims, name="batch_norm2")(y, use_running_average=not train)
        if self.in_dims != self.out_dims:
            y = y + make_dense(self.out_dims, use_bias=False, name="conv_downsample")(x)
        else:
            y = y + x
        y = PReLU(name="prelu2")(y)
        return _pool3_cl(y)


class SpeakerEncoder(nn.Module):
    """SpEx+-style speaker embedder over TasNet-encoder features
    (reference spk_encoder, dprnn_spe.py:115-122, + mean pool :156-163).

    ``__call__(feats [B, La, N], feat_lengths, aux_T, train) -> [B, E]``

    - ``feat_lengths`` [B] int: true frame counts of ``feats`` (None = all
      valid) — drives the norm mask and which pooled frames are summed;
    - ``aux_T`` [B] float: the mean divisor, computed by the caller from the
      reference-waveform length exactly as dprnn_spe.py:159-160 does. The two
      are deliberately independent (IRA quirk, see module docstring).
    """

    O: int
    P: int
    embeddings_size: int

    @nn.compact
    def __call__(self, feats, feat_lengths=None, aux_T=None, train: bool = False):
        B, La, N = feats.shape
        feat_mask = None
        if feat_lengths is not None:
            feat_mask = (
                jnp.arange(La)[None, :, None] < feat_lengths[:, None, None]
            ).astype(feats.dtype)
        h = GlobalNorm(N, "ln", name="norm")(feats, feat_mask)
        h = make_dense(self.O, name="conv_in")(h)
        h = ResBlock(self.O, self.O, name="res1")(h, train)
        h = ResBlock(self.O, self.P, name="res2")(h, train)
        h = ResBlock(self.P, self.P, name="res3")(h, train)
        h = make_dense(self.embeddings_size, name="conv_out")(h)  # [B, L3, E]
        if feat_lengths is None:
            total = jnp.sum(h, axis=1)
            count = jnp.full((B,), float(h.shape[1]), h.dtype)
        else:
            l3 = ((feat_lengths // 3) // 3) // 3  # valid frames after 3 maxpool3s
            m = (jnp.arange(h.shape[1])[None, :, None] < l3[:, None, None]).astype(h.dtype)
            total = jnp.sum(h * m, axis=1)
            count = l3.astype(h.dtype)
        div = count if aux_T is None else aux_T.astype(h.dtype)
        return total / div[:, None]


class Fusion(nn.Module):
    """Fusion dispatch with its projection params (reference dprnn_spe.py:88-105,
    165-229). One instance per model; IRA reuses it for both passes."""

    fusion_type: str
    kernel_size: int
    features: int  # N (input_size) — projection target

    @nn.compact
    def __call__(self, aux, h, lengths=None):
        ft = self.fusion_type
        if ft not in FUSION_TYPES:
            raise ValueError(f"fusion_type must be one of {FUSION_TYPES}")
        if ft == "cat":
            return fusion_ops.concatenation(aux, h)
        if ft == "add":
            return fusion_ops.addition(make_dense(self.features, name="fusion_linear")(aux), h)
        if ft == "mul":
            return fusion_ops.multiplication(
                make_dense(self.features, name="fusion_linear")(aux), h
            )
        if ft == "film":
            return fusion_ops.film(
                make_dense(self.features, name="fusion_linear_1")(aux),
                make_dense(self.features, name="fusion_linear_2")(aux),
                h,
            )
        proj = make_dense(self.features, name="fusion_linear")(aux)
        return fusion_ops.attention(proj, h, self.kernel_size, lengths)


class DPRNNSpe(nn.Module):
    """Dual-path core + speaker branch + fusion (reference dprnn_spe.py:44-248).

    ``__call__(features [B, L, N], embeddings [B, La, N], aux_len [B],
    lengths=None, train=False) -> (masks [B, 2, L, N], logits [B, num_spks])``

    ``aux_len``: true reference-waveform sample counts (drives the reference's
    aux_T mean-pool divisor *and* the padding masks under bucketed eval).
    """

    input_size: int
    feature_size: int = 128
    hidden_size: int = 128
    chunk_length: int = 200
    hop_length: Optional[int] = None
    n_repeats: int = 6
    bidirectional: bool = True
    rnn_type: str = "LSTM"
    norm_type: str = "gLN"
    activation_type: str = "sigmoid"
    dropout: float = 0.0
    O: int = 128
    P: int = 256
    embeddings_size: int = 128
    num_spks: int = 251
    kernel_size: int = 2
    fusion_type: str = "cat"
    dtype: Any = None
    remat: bool = True

    def _hop(self) -> int:
        return self.hop_length if self.hop_length is not None else self.chunk_length // 2

    def aux_feat_len(self, aux_len):
        """True spk-encoder input length in frames — reference computes it
        with stride = kernel_size // 2 (dprnn_spe.py:159)."""
        stride = max(self.kernel_size // 2, 1)
        return (aux_len - self.kernel_size) // stride + 1

    def aux_T(self, aux_len):
        """The reference's float mean-pool divisor (dprnn_spe.py:159-161)."""
        stride = float(max(self.kernel_size // 2, 1))
        t = (aux_len.astype(jnp.float32) - self.kernel_size) // stride + 1.0
        return ((t // 3.0) // 3.0) // 3.0

    def _masks(self, lengths, L):
        time_mask = None
        chunk_lengths = None
        if lengths is not None:
            K, H = self.chunk_length, self._hop()
            time_mask = (jnp.arange(L)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
            chunk_lengths = (lengths + K) // H + 1
        return time_mask, chunk_lengths

    @nn.compact
    def __call__(self, x, embeddings, aux_len, lengths=None, train: bool = False):
        B, L, N = x.shape
        spk, fuse, bottleneck_norm, bottleneck_dense, core, pred = self._submodules()
        time_mask, chunk_lengths = self._masks(lengths, L)

        aux_len = None if aux_len is None else jnp.asarray(aux_len)
        afl = None if aux_len is None else self.aux_feat_len(aux_len.astype(jnp.int32))
        aT = None if aux_len is None else self.aux_T(aux_len)
        aux = spk(embeddings, afl, aT, train)  # [B, E]

        h = bottleneck_norm(x, time_mask)
        h = fuse(aux, h, lengths)
        h = bottleneck_dense(h)
        masks = core(h, time_mask, chunk_lengths)
        logits = pred(aux)
        return masks, logits

    def _submodules(self):
        spk = SpeakerEncoder(self.O, self.P, self.embeddings_size, name="spk_encoder")
        fuse = Fusion(self.fusion_type, self.kernel_size, self.input_size, name="fusion")
        bottleneck_norm = GlobalNorm(self.input_size, self.norm_type, name="bottleneck_norm")
        bottleneck_dense = make_dense(self.feature_size, name="bottleneck_dense")
        core = DPRNNCore(**_core_kwargs(self), name="core")
        pred = make_dense(self.num_spks, name="pred_linear")
        return spk, fuse, bottleneck_norm, bottleneck_dense, core, pred


class DPRNNSpeTasNet(nn.Module):
    """DPRNN-Spe-TasNet (reference dprnn_spe.py:250-327): one shared encoder
    for mixture and reference waveforms; decodes only the target (mask 0).

    ``__call__(mix [B, T], aux [B, Ta], aux_len [B], lengths=None,
    train=False) -> (target_wav [B, T], speaker_logits [B, num_spks])``
    """

    input_size: int
    feature_size: int = 128
    hidden_size: int = 128
    chunk_length: int = 200
    kernel_size: int = 2
    hop_length: Optional[int] = None
    n_repeats: int = 6
    bidirectional: bool = True
    rnn_type: str = "LSTM"
    norm_type: str = "gLN"
    activation_type: str = "sigmoid"
    dropout: float = 0.0
    stride: Optional[int] = None
    O: int = 128
    P: int = 256
    embeddings_size: int = 128
    num_spks: int = 251
    fusion_type: str = "cat"
    dtype: Any = None
    remat: bool = True

    separation_cls = DPRNNSpe

    def _stride(self) -> int:
        return self.stride if self.stride is not None else self.kernel_size // 2

    def feat_lengths(self, lengths):
        return (lengths - self.kernel_size) // self._stride() + 1

    def _separation_kwargs(self):
        return {}

    def _separation(self):
        return self.separation_cls(
            **self._separation_kwargs(),
            input_size=self.input_size,
            feature_size=self.feature_size,
            hidden_size=self.hidden_size,
            chunk_length=self.chunk_length,
            hop_length=self.hop_length,
            n_repeats=self.n_repeats,
            bidirectional=self.bidirectional,
            rnn_type=self.rnn_type,
            norm_type=self.norm_type,
            activation_type=self.activation_type,
            dropout=self.dropout,
            O=self.O,
            P=self.P,
            embeddings_size=self.embeddings_size,
            num_spks=self.num_spks,
            kernel_size=self.kernel_size,
            fusion_type=self.fusion_type,
            dtype=self.dtype,
            remat=self.remat,
            name="separation",
        )

    @nn.compact
    def __call__(self, mix, aux, aux_len, lengths=None, train: bool = False):
        B, T = mix.shape
        encoder = Encoder(self.kernel_size, self.input_size, self._stride(), name="encoder")
        feats = encoder(mix)  # [B, L, N]
        embeddings = encoder(aux)  # [B, La, N]
        f_lengths = self.feat_lengths(lengths) if lengths is not None else None
        masks, logits = self._separation()(
            feats, embeddings, aux_len, lengths=f_lengths, train=train
        )
        target = masks[:, 0] * feats  # only speaker 0 is decoded (ref :325)
        if f_lengths is not None:
            L = target.shape[1]
            fm = (jnp.arange(L)[None, :, None] < f_lengths[:, None, None]).astype(target.dtype)
            target = target * fm  # padded frames would smear into the last valid sample
        wav = Decoder(self.input_size, self.kernel_size, self._stride(), name="decoder")(target)
        return _fit_length(wav, T), logits
