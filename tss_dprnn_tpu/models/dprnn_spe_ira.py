"""DPRNN-Spe-IRA: two-pass Iterative Refined Adaptation — TPU-native rebuild
of reference src/models/dprnn_spe_ira.py (DPRNNSpeIRA:6, DPRNNSpeIRATasNet:117).

Pass 1 embeds the clean reference (v0) and separates; the pass-1 target
estimate d0 (in encoder space) is re-embedded through the *same* speaker
encoder (v1), merged with v0 by ``aux_linear``, and the *same* fusion +
bottleneck + DPRNN stack runs again. All heavy submodules are single
instances invoked twice — weight sharing identical to the reference's module
reuse (dprnn_spe_ira.py:60-103).

Reference quirks preserved:
- the second ``_auxiliary`` call divides by aux_T computed from the
  *reference* length although it pools mixture-domain frames
  (dprnn_spe_ira.py:84) — see SpeakerEncoder's split arguments;
- the returned estimate is the *encoder-space* masked target; the TasNet
  wrapper decodes it directly (no second mask-multiply, :179-190).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tss_dprnn_tpu.models.dprnn import Decoder, Encoder, _fit_length
from tss_dprnn_tpu.models.dprnn_spe import DPRNNSpe, DPRNNSpeTasNet
from tss_dprnn_tpu.models.layers import make_dense


class DPRNNSpeIRA(DPRNNSpe):
    """Two-pass separation core (reference dprnn_spe_ira.py:6-115).

    ``__call__(features, embeddings, aux_len, lengths=None, train=False)
    -> (target_feats [B, L, N], logits [B, num_spks])``

    Unlike DPRNNSpe this returns the masked *encoder-space* target of pass 2
    (reference :107-109), not the masks.
    """

    # Pass-1 remat policy override: None -> the module-level ``remat`` policy;
    # an int k -> rematerialize only the first k pass-1 blocks (fractional
    # remat — pass 2 always runs with full residuals, and the HBM budget
    # usually fits a few more blocks' saved scan streams than zero).
    pass1_remat: Optional[int] = None
    # Shared-early-blocks lane (round-5 algorithmic lever): pass 2 reuses
    # pass 1's activation after block k and only runs blocks k..n_repeats-1
    # on it plus the segmented bottleneck DELTA (h2 - h1). Segmentation and
    # masking are linear, so k=0 is mathematically the reference algorithm;
    # k>0 approximates the first k blocks' pass-2 residual contributions by
    # their pass-1 values, cutting pass-2 cost by k/n_repeats. Adds NO
    # parameters — checkpoints interchange with share_blocks=0. Quality at
    # k>0 is an empirical question; see CONVERGENCE.md 'ira (share3)'.
    share_blocks: int = 0

    @nn.compact
    def __call__(self, x, embeddings, aux_len, lengths=None, train: bool = False):
        B, L, N = x.shape
        spk, fuse, bottleneck_norm, bottleneck_dense, core, pred = self._submodules()
        aux_linear = make_dense(self.embeddings_size, name="aux_linear")
        time_mask, chunk_lengths = self._masks(lengths, L)

        aux_len = None if aux_len is None else jnp.asarray(aux_len)
        afl = None if aux_len is None else self.aux_feat_len(aux_len.astype(jnp.int32))
        aT = None if aux_len is None else self.aux_T(aux_len)

        k = int(self.share_blocks)
        if not 0 <= k < self.n_repeats:
            raise ValueError(f"share_blocks must be in [0, n_repeats), got {k}")

        # pass 1 (reference :59-81)
        v0 = spk(embeddings, afl, aT, train)
        out_norm = bottleneck_norm(x, time_mask)  # reused by both passes (:64,96)
        h1 = bottleneck_dense(fuse(v0, out_norm, lengths))
        if k:
            masks, tap = core(h1, time_mask, chunk_lengths,
                              remat=self.pass1_remat, tap_block=k)
        else:
            masks = core(h1, time_mask, chunk_lengths, remat=self.pass1_remat)
        d0 = masks[:, 0] * x  # [B, L, N] encoder-space pass-1 estimate

        # pass 2 (reference :83-109): re-embed d0 with mixture-domain frame
        # counts but the reference-length divisor (quirk, :84)
        v1 = spk(d0, lengths, aT, train)
        v1 = aux_linear(jnp.concatenate([v0, v1], axis=-1))
        h2 = bottleneck_dense(fuse(v1, out_norm, lengths))
        # pass 2 runs with full residuals (remat=False): one pass of saved
        # scan residuals is the single-pass variants' remat-free footprint
        # (fits HBM); only pass 1 keeps the module-level remat policy. Free
        # at inference, ~13% faster training step (backward skips one full
        # core recompute).
        if k:
            masks = core(h2 - h1, time_mask, chunk_lengths, remat=False,
                         resume=(k, tap))
        else:
            masks = core(h2, time_mask, chunk_lengths, remat=False)
        d1 = masks[:, 0] * x

        logits = pred(v1)
        return d1, logits


class DPRNNSpeIRATasNet(DPRNNSpeTasNet):
    """DPRNN-Spe-IRA-TasNet (reference dprnn_spe_ira.py:117-190): decodes the
    encoder-space pass-2 target directly."""

    separation_cls = DPRNNSpeIRA

    # see DPRNNSpeIRA.pass1_remat (fractional pass-1 remat; None -> module
    # ``remat`` policy, int k -> remat only the first k pass-1 blocks)
    pass1_remat: Optional[int] = None
    # see DPRNNSpeIRA.share_blocks (pass 2 reuses pass-1 activations of the
    # first k blocks; 0 = reference-exact two full passes)
    share_blocks: int = 0

    def _separation_kwargs(self):
        return {"pass1_remat": self.pass1_remat, "share_blocks": self.share_blocks}

    @nn.compact
    def __call__(self, mix, aux, aux_len, lengths=None, train: bool = False):
        B, T = mix.shape
        encoder = Encoder(self.kernel_size, self.input_size, self._stride(), name="encoder")
        feats = encoder(mix)
        embeddings = encoder(aux)
        f_lengths = self.feat_lengths(lengths) if lengths is not None else None
        target, logits = self._separation()(
            feats, embeddings, aux_len, lengths=f_lengths, train=train
        )
        if f_lengths is not None:
            L = target.shape[1]
            fm = (jnp.arange(L)[None, :, None] < f_lengths[:, None, None]).astype(target.dtype)
            target = target * fm
        wav = Decoder(self.input_size, self.kernel_size, self._stride(), name="decoder")(target)
        return _fit_length(wav, T), logits
