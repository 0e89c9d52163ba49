"""Segmentation / overlap-add vs the torch fold/unfold oracle.

The oracle reproduces the exact call pattern of the reference DPRNN
(src/models/dprnn.py:189-217): unfold with kernel (K,1), padding (K,0),
stride (H,1); fold back to (L,1).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from tss_dprnn_tpu.ops import chunking


def torch_segment(x, K, H):
    t = torch.from_numpy(x).unsqueeze(-1)  # [B, N, L, 1]
    out = tF.unfold(t, kernel_size=(K, 1), padding=(K, 0), stride=(H, 1))
    S = out.shape[-1]
    B, N = x.shape[0], x.shape[1]
    return out.reshape(B, N, K, S).numpy(), S


def torch_overlap_add(x, L, H):
    B, N, K, S = x.shape
    t = torch.from_numpy(x).reshape(B, N * K, S)
    out = tF.fold(t, (L, 1), kernel_size=(K, 1), padding=(K, 0), stride=(H, 1))
    return out.reshape(B, N, -1).numpy()


@pytest.mark.parametrize("L,K,H", [(100, 16, 8), (250, 250, 125), (999, 250, 125), (37, 10, 5), (64, 12, 4)])
def test_segment_matches_torch_unfold(rng, L, K, H):
    x = rng.standard_normal((2, 3, L)).astype(np.float32)
    ref, S = torch_segment(x, K, H)
    got = np.asarray(chunking.segment(x, K, H))
    assert got.shape == (2, 3, K, S)
    assert chunking.num_chunks(L, K, H) == S
    np.testing.assert_allclose(got, ref, atol=0, rtol=0)


@pytest.mark.parametrize("L,K,H", [(100, 16, 8), (250, 250, 125), (999, 250, 125), (64, 12, 4)])
def test_overlap_add_matches_torch_fold(rng, L, K, H):
    S = chunking.num_chunks(L, K, H)
    x = rng.standard_normal((2, 3, K, S)).astype(np.float32)
    ref = torch_overlap_add(x, L, H)
    got = np.asarray(chunking.overlap_add(x, L, H))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("L,K,H", [(123, 20, 7)])  # hop not dividing K -> generic path
def test_generic_hop_roundtrip(rng, L, K, H):
    x = rng.standard_normal((1, 2, L)).astype(np.float32)
    ref, S = torch_segment(x, K, H)
    got = np.asarray(chunking.segment(x, K, H))
    np.testing.assert_allclose(got, ref)
    back_ref = torch_overlap_add(ref, L, H)
    back = np.asarray(chunking.overlap_add(got, L, H))
    np.testing.assert_allclose(back, back_ref, atol=1e-5, rtol=1e-5)


def test_padded_input_matches_unpadded_valid_region(rng):
    """Chunk arithmetic for bucketed eval: segmenting a zero-padded input and
    keeping only the first S_true chunks equals segmenting the exact input."""
    L, Lp, K, H = 500, 640, 250, 125
    x = rng.standard_normal((1, 2, L)).astype(np.float32)
    xp = np.pad(x, ((0, 0), (0, 0), (0, Lp - L)))
    S_true = chunking.num_chunks(L, K, H)
    exact = np.asarray(chunking.segment(x, K, H))
    padded = np.asarray(chunking.segment(xp, K, H))[:, :, :, :S_true]
    np.testing.assert_allclose(padded, exact)
