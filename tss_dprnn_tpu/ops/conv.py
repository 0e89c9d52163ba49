"""1-D convolution wrappers over ``lax.conv_general_dilated``.

Replaces the reference's torch Conv1d/ConvTranspose1d kernels
(src/models/encoder_decoder.py:5-49 TasNet encoder/decoder; the many 1x1
convs in src/models/dprnn.py:135,155-160 and dprnn_spe.py:90-121).

Weights keep the torch layouts (Conv1d: [O, I/groups, K]; ConvTranspose1d:
[I, O/groups, K]) so the PyTorch checkpoint converter is a pure relabeling;
``lax.conv_general_dilated`` consumes them via dimension numbers without any
host-side transposition. 1x1 convs lower straight onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NCH", "OIH", "NCH")


def conv1d(x, w, b=None, stride: int = 1, padding=0, dilation: int = 1, groups: int = 1):
    """x: [B, C_in, L]; w: [C_out, C_in/groups, K] (torch layout); returns [B, C_out, L_out]."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None]
    return out


def conv_transpose1d(x, w, b=None, stride: int = 1):
    """Torch-semantics ConvTranspose1d (padding=0, output_padding=0).

    x: [B, C_in, L]; w: [C_in, C_out, K] (torch layout);
    returns [B, C_out, (L-1)*stride + K].

    Implemented as the conv adjoint: dilate the input by ``stride`` and
    convolve with the time-flipped, in/out-swapped kernel — the exact gradient
    of a strided VALID conv, which is what torch's ConvTranspose1d computes.
    """
    K = w.shape[2]
    # [C_in, C_out, K] -> flip taps -> [C_out, C_in, K]
    w_adj = jnp.flip(w, axis=2).transpose(1, 0, 2)
    out = lax.conv_general_dilated(
        x,
        w_adj.astype(x.dtype),
        window_strides=(1,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None]
    return out


def avg_pool1d_exact(x, k: int):
    """Non-overlapping width-k mean pooling: [B, C, L] -> [B, C, floor(L/k)].

    Equals the reference's frozen depthwise 'average' conv (weights 1/k,
    stride=k, src/models/dprnn_spe.py:100-104) but as a reshape+mean.
    """
    B, C, L = x.shape
    n = L // k
    return jnp.mean(x[:, :, : n * k].reshape(B, C, n, k), axis=3)


def max_pool1d(x, k: int):
    """torch nn.MaxPool1d(k) (stride=k, no padding): [B, C, L] -> [B, C, floor(L/k)]."""
    B, C, L = x.shape
    n = L // k
    return jnp.max(x[:, :, : n * k].reshape(B, C, n, k), axis=3)
