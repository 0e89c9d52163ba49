"""DPRNN-RawNet: DPRNN-Spe with the ResNet speaker branch swapped for a
RawNet3 embedder on the raw 16 kHz reference waveform — TPU-native rebuild of
reference src/models/dprnn_rawnet.py (DPRNNRawNet:9, DPRNNRawNetTasNet:107).

Differences vs DPRNNSpe, mirroring the reference:
- the auxiliary input is the *waveform* (resampled 8->16 kHz by the input
  pipeline, reference trainer_rawnet.py:14-16), not TasNet-encoder features;
- no ``aux_len`` argument in the unmasked path (reference forward takes none,
  dprnn_rawnet.py:72); bucketed eval passes ``aux_len`` = true 16 kHz sample
  counts for the masked pools instead.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tss_dprnn_tpu.models.dprnn import DPRNNCore, Decoder, Encoder, _core_kwargs, _fit_length
from tss_dprnn_tpu.models.dprnn_spe import DPRNNSpe, DPRNNSpeTasNet, Fusion
from tss_dprnn_tpu.models.layers import GlobalNorm, make_dense
from tss_dprnn_tpu.models.rawnet import RawNet3


class DPRNNRawNet(DPRNNSpe):
    """Separation core with RawNet3 speaker branch (reference dprnn_rawnet.py:9-105).

    ``__call__(features [B, L, N], aux_wav [B, Ta] @16 kHz, aux_len=None,
    lengths=None, train=False) -> (masks [B, 2, L, N], logits)``.
    """

    rawnet_C: int = 1024
    rawnet_scale: int = 8
    rawnet_sinc_stride: int = 10
    rawnet_sample_rate: float = 16000.0

    @nn.compact
    def __call__(self, x, aux_wav, aux_len=None, lengths=None, train: bool = False):
        B, L, N = x.shape
        fuse = Fusion(self.fusion_type, self.kernel_size, self.input_size, name="fusion")
        bottleneck_norm = GlobalNorm(self.input_size, self.norm_type, name="bottleneck_norm")
        bottleneck_dense = make_dense(self.feature_size, name="bottleneck_dense")
        core = DPRNNCore(**_core_kwargs(self), name="core")
        pred = make_dense(self.num_spks, name="pred_linear")
        spk = RawNet3(
            model_scale=self.rawnet_scale,
            context=True,
            summed=True,
            C=self.rawnet_C,
            encoder_type="ECA",
            nOut=self.embeddings_size,
            out_bn=False,
            sinc_stride=self.rawnet_sinc_stride,
            log_sinc=True,
            norm_sinc="mean",
            sample_rate=self.rawnet_sample_rate,
            name="spk_encoder",
        )
        time_mask, chunk_lengths = self._masks(lengths, L)

        aux = spk(aux_wav, aux_len, train)  # [B, E]
        h = bottleneck_norm(x, time_mask)
        h = fuse(aux, h, lengths)
        h = bottleneck_dense(h)
        masks = core(h, time_mask, chunk_lengths)
        logits = pred(aux)
        return masks, logits


class DPRNNRawNetTasNet(DPRNNSpeTasNet):
    """DPRNN-RawNet-TasNet (reference dprnn_rawnet.py:107-182).

    ``__call__(mix [B, T] @8 kHz, aux [B, Ta] @16 kHz raw waveform,
    aux_len=None, lengths=None, train=False) -> (target_wav, logits)``.
    """

    separation_cls = DPRNNRawNet

    rawnet_C: int = 1024
    rawnet_scale: int = 8
    rawnet_sinc_stride: int = 10
    rawnet_sample_rate: float = 16000.0

    def _separation_kwargs(self):
        return dict(
            rawnet_C=self.rawnet_C,
            rawnet_scale=self.rawnet_scale,
            rawnet_sinc_stride=self.rawnet_sinc_stride,
            rawnet_sample_rate=self.rawnet_sample_rate,
        )

    @nn.compact
    def __call__(self, mix, aux, aux_len=None, lengths=None, train: bool = False):
        B, T = mix.shape
        encoder = Encoder(self.kernel_size, self.input_size, self._stride(), name="encoder")
        feats = encoder(mix)
        f_lengths = self.feat_lengths(lengths) if lengths is not None else None
        masks, logits = self._separation()(
            feats, aux, aux_len=aux_len, lengths=f_lengths, train=train
        )
        target = masks[:, 0] * feats
        if f_lengths is not None:
            L = target.shape[1]
            fm = (jnp.arange(L)[None, :, None] < f_lengths[:, None, None]).astype(target.dtype)
            target = target * fm
        wav = Decoder(self.input_size, self.kernel_size, self._stride(), name="decoder")(target)
        return _fit_length(wav, T), logits
