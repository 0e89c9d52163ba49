"""DPRNN core and DPRNN-TasNet (BSS) — TPU-native rebuild of reference
src/models/dprnn.py (SingleRNN:7, DPRNNBlock:39, DPRNN:101, DPRNNTasNet:219).

Design departures from the torch original (behavior-preserving):

- **Channels-last everywhere inside the core** ([B, L, N] / [B, S, K, N]):
  the feature axis rides the 128-lane dimension, so every Linear/1x1-conv is
  a Dense matmul on the MXU with no transposes; the reference's [B, N, K, S]
  layout with per-block ``transpose``/``contiguous`` pairs (dprnn.py:84-97)
  disappears.
- **Segmentation/overlap-add are reshapes** (ops/chunking.py), not
  fold/unfold gathers.
- **One fused scan per (Bi)LSTM** (ops/rnn.py) instead of cuDNN calls.
- **Length-masked evaluation**: every variable-length utterance runs in a
  statically-shaped padded bucket; ``lengths`` threads masks through norms,
  the inter-chunk scan, and the chunk arithmetic so results equal the
  reference's exact-shape eager execution on the valid region.
- The chunked pipeline (segmentation -> block stack -> mask head) lives in
  :class:`DPRNNCore`, a *single module instance* per model — the IRA variant
  calls it twice per forward with shared weights, exactly as the reference
  reuses ``self.dprnn_blocks`` (dprnn_spe_ira.py:75,103).

All 1x1 convs of the reference (bottleneck start_conv1d:135, conv2d:155,
out/gate:157-158, end_conv1x1:160) are Dense layers here — identical math.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tss_dprnn_tpu.models.layers import (
    GlobalNorm,
    PReLU,
    RNNCore,
    SplitDense,
    make_dense,
    torch_uniform_init,
)
from tss_dprnn_tpu.ops import chunking
from tss_dprnn_tpu.ops import rnn as rnn_ops
from tss_dprnn_tpu.ops.conv import conv1d, conv_transpose1d


class DPRNNBlock(nn.Module):
    """One dual-path block: intra-chunk BiLSTM + inter-chunk (Bi)LSTM, each
    followed by Linear + global norm + residual (reference dprnn.py:39-99).

    Input/output: [B, S, K, N] channels-last.
    ``chunk_lengths`` ([B] = true chunk counts) masks the padded-S region.
    """

    feature_size: int
    hidden_size: int
    norm_type: str = "gLN"
    bidirectional: bool = True
    rnn_type: str = "LSTM"
    dtype: Any = None
    # time-major fast path: the block's tensors live in the pallas kernels'
    # own [time, rows, N] layout, so no transposes surround the scans (the
    # batch-major path spends ~20% of flagship inference on them — profiled).
    # Only the layout differs; params and math are identical. Valid only for
    # unmasked bidirectional-LSTM runs (DPRNNCore gates the switch).
    time_major: bool = False

    @nn.compact
    def __call__(self, x, chunk_lengths=None):
        if self.time_major:
            return self._tm_call(x, chunk_lengths)
        B, S, K, N = x.shape
        chunk_mask = None
        if chunk_lengths is not None:
            chunk_mask = (
                jnp.arange(S)[None, :, None, None] < chunk_lengths[:, None, None, None]
            ).astype(x.dtype)

        # intra-chunk pass: sequences of length K, batched over B*S.
        # Bidirectional LSTM scans feed their Dense as an unconcatenated
        # direction pair (SplitDense) — same math and param tree, but the
        # {2,0,1}-layout kernel outputs never pay the concat materialization.
        # (Moving the contraction into the scan kernel's epilogue is opt-in
        # TSS_FUSED_DENSE=1 — measured e2e net loss, see lstm_split_dense.)
        h = x.reshape(B * S, K, N)
        if self.rnn_type == "LSTM":
            sd = SplitDense(N, 2 * self.hidden_size, name="intra_linear", dtype=self.dtype)
            kernel, bias = sd.promoted()
            h = RNNCore(self.hidden_size, True, self.rnn_type, self.dtype, name="intra_rnn")(
                h, dense_kernel=kernel
            ) + bias
        else:
            h = RNNCore(self.hidden_size, True, self.rnn_type, self.dtype, name="intra_rnn")(h)
            h = make_dense(N, name="intra_linear", dtype=self.dtype)(h)
        h = h.reshape(B, S, K, N)
        h = GlobalNorm(N, self.norm_type, dtype=self.dtype, name="intra_norm")(h, chunk_mask)
        x = x + h

        # inter-chunk pass: sequences of length S, batched over B*K
        h = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * K, S, N)
        inter_lengths = None
        if chunk_lengths is not None:
            inter_lengths = jnp.repeat(chunk_lengths, K, total_repeat_length=B * K)
        if self.rnn_type == "LSTM" and self.bidirectional:
            sd = SplitDense(N, 2 * self.hidden_size, name="inter_linear", dtype=self.dtype)
            kernel, bias = sd.promoted()
            h = RNNCore(self.hidden_size, True, self.rnn_type, self.dtype, name="inter_rnn")(
                h, inter_lengths, dense_kernel=kernel
            ) + bias
        else:
            h = RNNCore(self.hidden_size, self.bidirectional, self.rnn_type, self.dtype, name="inter_rnn")(
                h, inter_lengths
            )
            h = make_dense(N, name="inter_linear", dtype=self.dtype)(h)
        h = jnp.transpose(h.reshape(B, K, S, N), (0, 2, 1, 3))
        h = GlobalNorm(N, self.norm_type, dtype=self.dtype, name="inter_norm")(h, chunk_mask)
        return x + h

    def _tm_call(self, x, chunk_lengths=None):
        """Time-major body: x [K, B, S, N] -> [K, B, S, N]. Same submodules
        (identical param tree), but each scan consumes/produces the kernel
        layout directly; the only relayouts are the two intrinsic K<->S
        transposes per block. With ``chunk_lengths`` the masked lane runs
        time-major too: the chunk mask rides [1, B, S, 1] (norm batch_axis=1)
        and the inter scan takes per-row lengths into the mask-aware tm
        kernel."""
        K, B, S, N = x.shape
        chunk_mask = None
        inter_lengths = None
        if chunk_lengths is not None:
            chunk_mask = (
                jnp.arange(S)[None, None, :, None] < chunk_lengths[None, :, None, None]
            ).astype(x.dtype)
            inter_lengths = jnp.repeat(chunk_lengths, K, total_repeat_length=B * K)

        # intra-chunk pass: time K, rows B*S (unmasked — padded chunks carry
        # zeros and their garbage outputs are masked by the norm, exactly as
        # on the batch-major path)
        h = x.reshape(K, B * S, N)
        o0, o1 = RNNCore(self.hidden_size, True, self.rnn_type, self.dtype, name="intra_rnn")(
            h, time_major=True, return_pair=True
        )
        h = SplitDense(N, 2 * self.hidden_size, name="intra_linear", dtype=self.dtype)(o0, o1)
        h = h.reshape(K, B, S, N)
        h = GlobalNorm(N, self.norm_type, dtype=self.dtype, name="intra_norm")(
            h, chunk_mask, batch_axis=1)
        x = x + h

        # inter-chunk pass: time S, rows B*K
        x = jnp.transpose(x, (2, 1, 0, 3))  # [S, B, K, N]
        h = x.reshape(S, B * K, N)
        o0, o1 = RNNCore(self.hidden_size, self.bidirectional, self.rnn_type, self.dtype, name="inter_rnn")(
            h, inter_lengths, time_major=True, return_pair=True
        )
        h = SplitDense(N, 2 * self.hidden_size, name="inter_linear", dtype=self.dtype)(o0, o1)
        h = h.reshape(S, B, K, N)
        inter_mask = None if chunk_mask is None else jnp.transpose(chunk_mask, (2, 1, 0, 3))
        h = GlobalNorm(N, self.norm_type, dtype=self.dtype, name="inter_norm")(
            h, inter_mask, batch_axis=1)
        x = x + h
        return jnp.transpose(x, (2, 1, 0, 3))  # back to [K, B, S, N]


class DPRNNCore(nn.Module):
    """Chunked dual-path pipeline: segmentation -> n_repeats blocks -> mask
    head -> overlap-add (reference dprnn.py:166-187 / dprnn_spe.py:231-248).

    ``__call__(h [B, L, F], time_mask, chunk_lengths) -> [B, 2, L, N]``.
    One instance per model; IRA calls it twice (shared weights).
    """

    input_size: int
    feature_size: int
    hidden_size: int
    chunk_length: int
    hop_length: int
    n_repeats: int
    bidirectional: bool = True
    rnn_type: str = "LSTM"
    norm_type: str = "gLN"
    activation_type: str = "sigmoid"
    dtype: Any = None
    # rematerialize each block under grad: the 12 BiLSTM scans' saved
    # residuals otherwise exceed HBM at the flagship size (~40 GB for a
    # batch-5 x 3 s step); remat trades ~1 extra forward per block for
    # peak-activation memory of a single block. Free at inference.
    remat: bool = True

    @nn.compact
    def __call__(self, h, time_mask=None, chunk_lengths=None, remat=None,
                 tap_block=None, resume=None):
        """``remat``: per-call override of the module-level policy — IRA's
        two-pass training keeps pass 1 rematerialized but runs pass 2 with
        full residuals (both passes un-remat OOM HBM temp; ONE pass of saved
        scan residuals is exactly the single-pass variants' footprint, which
        fits remat-free).

        Either policy may also be an ``int`` k: rematerialize only the first
        k blocks and keep full residuals for the rest — fractional remat for
        when the HBM budget fits more than zero but fewer than all blocks'
        saved scan streams (IRA pass 1). True == n_repeats, False == 0.
        Values are identical under any policy; only memory/recompute differ.

        ``tap_block``/``resume`` implement IRA's shared-early-blocks lane
        (DPRNNSpeIRA.share_blocks): ``tap_block=k`` additionally returns the
        chunk-layout activation after block k (k=0: the segmented input);
        ``resume=(k, tap)`` treats ``h`` as a bottleneck-output DELTA — it is
        masked/cast/segmented like a normal input, added onto ``tap``, and
        only blocks k..n_repeats-1 run. Because segmentation and masking are
        linear, ``resume=(0, tap)`` is EXACTLY the full call on h1+delta; for
        k>0 the first k blocks' residual contributions are the pass-1 ones
        (the approximation the shared lane trades for skipping k blocks)."""
        use_remat = self.remat if remat is None else remat
        n_remat = int(self.n_repeats if use_remat is True else use_remat)
        B, L, F = h.shape
        K, H = self.chunk_length, self.hop_length
        if time_mask is not None:
            h = h * time_mask  # keep the padded tail exactly zero pre-segmentation
        if self.dtype is not None:
            # bf16 path: cast BEFORE segmentation so the 2x-overlap chunked
            # tensor and every inter-block linear/norm ride bf16 HBM traffic
            # (the kernels already computed in bf16; fp32 glue was pure waste)
            h = h.astype(self.dtype)
        h = chunking.segment_cl(h, K, H)  # [B, S, K, F]
        S = h.shape[1]
        # time-major fast path (see DPRNNBlock.time_major): bidirectional-
        # LSTM runs on the fused pallas backend, masked or not (the masked
        # tm kernel pair landed in round 5)
        use_tm = (
            self.rnn_type == "LSTM"
            and self.bidirectional
            and rnn_ops.lstm_time_major_available(True, chunk_lengths)
        )
        if use_tm:
            h = jnp.transpose(h, (2, 0, 1, 3))  # [K, B, S, F]
        start = 0
        if resume is not None:
            start, tap_in = resume
            h = tap_in + h  # pass-1 residuals of blocks 0..start-1 ride in
        tap = h if tap_block == 0 else None
        remat_block_cls = nn.remat(DPRNNBlock)
        for i in range(start, self.n_repeats):
            block_cls = remat_block_cls if i < n_remat else DPRNNBlock
            h = block_cls(
                feature_size=F,
                hidden_size=self.hidden_size,
                norm_type=self.norm_type,
                bidirectional=self.bidirectional,
                rnn_type=self.rnn_type,
                dtype=self.dtype,
                time_major=use_tm,
                name=f"blocks_{i}",
            )(h, chunk_lengths)
            if tap_block is not None and i + 1 == tap_block:
                tap = h
        if use_tm:
            h = jnp.transpose(h, (1, 2, 0, 3))  # back to [B, S, K, F]
        h = PReLU(name="prelu")(h)
        h = make_dense(2 * F, name="mask_dense", dtype=self.dtype)(h)  # reference conv2d 1x1 -> 2F
        # split the 2F channels into the two sources: torch's
        # reshape(B*2, F, K, S) maps channel c=(j*F+f) to source j
        h = h.reshape(B, S, K, 2, F)
        h = jnp.transpose(h, (0, 3, 1, 2, 4)).reshape(B * 2, S, K, F)
        h = chunking.overlap_add_cl(h, L, H)  # [2B, L, F]
        h = jnp.tanh(make_dense(F, name="out_dense", dtype=self.dtype)(h)) * nn.sigmoid(
            make_dense(F, name="gate_dense", dtype=self.dtype)(h)
        )
        h = make_dense(self.input_size, use_bias=False, name="end_dense", dtype=self.dtype)(h)
        if self.activation_type == "sigmoid":
            h = nn.sigmoid(h)
        elif self.activation_type == "relu":
            h = nn.relu(h)
        else:
            raise ValueError(f"activation_type must be sigmoid/relu, got {self.activation_type}")
        out = h.reshape(B, 2, L, self.input_size)
        if tap_block is not None:
            return out, tap
        return out


def _core_kwargs(m):
    """Shared DPRNNCore construction from a model's hyperparameter fields."""
    return dict(
        input_size=m.input_size,
        feature_size=m.feature_size,
        hidden_size=m.hidden_size,
        chunk_length=m.chunk_length,
        hop_length=m.hop_length if m.hop_length is not None else m.chunk_length // 2,
        n_repeats=m.n_repeats,
        bidirectional=m.bidirectional,
        rnn_type=m.rnn_type,
        norm_type=m.norm_type,
        activation_type=m.activation_type,
        dtype=m.dtype,
        remat=getattr(m, "remat", True),
    )


class DPRNN(nn.Module):
    """Dual-path separation module (reference dprnn.py:101-187).

    ``__call__(features [B, L, N], lengths=None) -> masks [B, 2, L, N]``.
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
    dropout: float = 0.0  # accepted for API parity; reference passes it to a
    # 1-layer torch LSTM where it is a documented no-op (dprnn.py:23-28)
    dtype: Any = None
    remat: bool = True

    def _hop(self) -> int:
        return self.hop_length if self.hop_length is not None else self.chunk_length // 2

    @nn.compact
    def __call__(self, x, lengths=None):
        B, L, N = x.shape
        K, H = self.chunk_length, self._hop()
        time_mask = None
        chunk_lengths = None
        if lengths is not None:
            time_mask = (jnp.arange(L)[None, :, None] < lengths[:, None, None]).astype(x.dtype)
            chunk_lengths = (lengths + K) // H + 1
        # bottleneck: norm + 1x1 conv (reference dprnn.py:131-136)
        h = GlobalNorm(N, self.norm_type, name="bottleneck_norm")(x, time_mask)
        h = make_dense(self.feature_size, name="bottleneck_dense")(h)
        return DPRNNCore(**_core_kwargs(self), name="core")(h, time_mask, chunk_lengths)


class Encoder(nn.Module):
    """TasNet encoder: Conv1d(1 -> N, kernel, stride, no bias) + ReLU
    (reference encoder_decoder.py:5-33). [B, T] -> [B, L, N] channels-last."""

    kernel_size: int
    output_size: int
    stride: int

    @nn.compact
    def __call__(self, wav):
        w = self.param(
            "w", torch_uniform_init(self.kernel_size), (self.output_size, 1, self.kernel_size)
        )
        feats = conv1d(wav[:, None, :], w, stride=self.stride)  # [B, N, L]
        feats = nn.relu(feats)
        return jnp.transpose(feats, (0, 2, 1))

    def out_length(self, T):
        return (T - self.kernel_size) // self.stride + 1


class Decoder(nn.Module):
    """TasNet decoder: ConvTranspose1d(N -> 1, kernel, stride, no bias)
    (reference encoder_decoder.py:35-49). [B, L, N] -> [B, T_out]."""

    input_size: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, feats):
        w = self.param(
            "w", torch_uniform_init(self.kernel_size * self.input_size),
            (self.input_size, 1, self.kernel_size),
        )
        x = jnp.transpose(feats, (0, 2, 1))  # [B, N, L]
        out = conv_transpose1d(x, w, stride=self.stride)  # [B, 1, T_out]
        return out[:, 0, :]


def _fit_length(wav, T: int):
    """Pad/crop decoder output to the input length (equal already for the
    shipped kernel=2/stride=1 configs)."""
    Tp = wav.shape[-1]
    if Tp < T:
        return jnp.pad(wav, ((0, 0), (0, T - Tp)))
    if Tp > T:
        return wav[:, :T]
    return wav


class DPRNNTasNet(nn.Module):
    """DPRNN-TasNet blind source separation (reference dprnn.py:219-283).

    ``__call__(mix [B, T], lengths=None) -> [B, 2, T]`` separated waveforms.
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
    norm_type: str = "ln"
    activation_type: str = "sigmoid"
    dropout: float = 0.0
    stride: Optional[int] = None
    dtype: Any = None
    remat: bool = True

    def _stride(self) -> int:
        return self.stride if self.stride is not None else self.kernel_size // 2

    def feat_lengths(self, lengths):
        return (lengths - self.kernel_size) // self._stride() + 1

    @nn.compact
    def __call__(self, mix, lengths=None):
        B, T = mix.shape
        encoder = Encoder(self.kernel_size, self.input_size, self._stride(), name="encoder")
        feats = encoder(mix)  # [B, L, N]
        f_lengths = self.feat_lengths(lengths) if lengths is not None else None
        masks = DPRNN(
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
            dtype=self.dtype,
            remat=self.remat,
            name="separation",
        )(feats, f_lengths)  # [B, 2, L, N]
        out = masks * feats[:, None]  # [B, 2, L, N]
        L = out.shape[2]
        if f_lengths is not None:
            # zero the padded feature frames: the exact-length run has no such
            # frames, and the transposed-conv decoder would smear them into
            # the last valid output sample
            fm = (jnp.arange(L)[None, None, :, None] < f_lengths[:, None, None, None]).astype(out.dtype)
            out = out * fm
        out = out.reshape(B * 2, L, self.input_size)
        wav = Decoder(self.input_size, self.kernel_size, self._stride(), name="decoder")(out)
        return _fit_length(wav, T).reshape(B, 2, T)
