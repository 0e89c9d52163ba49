"""Norms and conv kernels vs torch oracles (reference norms.py / encoder_decoder.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from tss_dprnn_tpu.ops import conv, norms
from tss_dprnn_tpu.ops.masking import length_mask


def test_glob_ln_matches_reference_formula(rng):
    # reference norms.py: z_norm over dims 1.. with unbiased=False, eps=1e-8 in sqrt
    x = rng.standard_normal((3, 8, 50)).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    t = torch.from_numpy(x)
    mean = t.mean(dim=[1, 2], keepdim=True)
    var = torch.var(t, dim=[1, 2], keepdim=True, unbiased=False)
    ref = (t - mean) / torch.sqrt(var + 1e-8)
    ref = (torch.from_numpy(gamma) * ref.transpose(1, -1) + torch.from_numpy(beta)).transpose(1, -1)
    got = np.asarray(norms.glob_ln(x, gamma, beta))
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", [(3, 8, 50), (2, 8, 20, 7)])
def test_chan_ln_matches_torch_groupnorm(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    C = shape[1]
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    gn = torch.nn.GroupNorm(1, C)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gamma))
        gn.bias.copy_(torch.from_numpy(beta))
    ref = gn(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(norms.chan_ln(x, gamma, beta))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_masked_norm_equals_exact_norm_on_valid_region(rng):
    """Padded-input masked norm == exact-length norm on the valid region."""
    lengths = np.array([50, 37], dtype=np.int32)
    C, Lp = 8, 64
    x = rng.standard_normal((2, C, Lp)).astype(np.float32)
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    mask = np.asarray(length_mask(lengths, Lp))[:, None, :]
    got = np.asarray(norms.chan_ln(x, gamma, beta, mask=mask))
    for b, l in enumerate(lengths):
        exact = np.asarray(norms.chan_ln(x[b : b + 1, :, :l], gamma, beta))
        np.testing.assert_allclose(got[b, :, :l], exact[0], atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(got[b, :, l:], 0.0, atol=1e-6)


def test_bf16_norm_matches_f32_two_pass(rng):
    """The bf16-resident norm path (one-pass f32-accumulated stats, no f32
    materialization of x) must agree with the fp32 two-pass route to within
    bf16 resolution — masked and unmasked, both batch_axis layouts."""
    import jax.numpy as jnp

    B, S, K, C = 3, 7, 11, 16
    x = (rng.standard_normal((B, S, K, C)) * 2 + 0.5).astype(np.float32)
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    mask = (rng.uniform(size=(B, S, 1, 1)) > 0.3).astype(np.float32)
    for m in (None, mask):
        ref = np.asarray(
            norms.global_channel_norm_cl(x, gamma, beta, eps=1e-5, mask=m)
        )
        got = np.asarray(
            norms.global_channel_norm_cl(
                jnp.asarray(x, jnp.bfloat16), gamma, beta, eps=1e-5, mask=m
            ).astype(jnp.float32)
        )
        # bf16 has ~3 decimal digits; stats agreement keeps error at
        # input-rounding scale
        np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    # time-major layout: batch on axis 1
    xt = np.transpose(x, (2, 0, 1, 3))
    ref = np.asarray(norms.global_channel_norm_cl(xt, gamma, beta, eps=1e-5, batch_axis=1))
    got = np.asarray(
        norms.global_channel_norm_cl(
            jnp.asarray(xt, jnp.bfloat16), gamma, beta, eps=1e-5, batch_axis=1
        ).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("stride,k,groups,pad", [(1, 2, 1, 0), (2, 2, 1, 0), (1, 1, 1, 0), (1, 3, 4, 2), (10, 251, 1, 0)])
def test_conv1d_matches_torch(rng, stride, k, groups, pad):
    B, Cin, L = 2, 8, 300
    Cout = 12
    x = rng.standard_normal((B, Cin, L)).astype(np.float32)
    w = (rng.standard_normal((Cout, Cin // groups, k)) * 0.1).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)
    ref = tF.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, groups=groups,
    ).numpy()
    got = np.asarray(conv.conv1d(x, w, b, stride=stride, padding=pad, groups=groups))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("stride,k", [(1, 2), (2, 4), (1, 1), (3, 5)])
def test_conv_transpose1d_matches_torch(rng, stride, k):
    B, Cin, L, Cout = 2, 6, 40, 3
    x = rng.standard_normal((B, Cin, L)).astype(np.float32)
    w = (rng.standard_normal((Cin, Cout, k)) * 0.1).astype(np.float32)
    ref = tF.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w), stride=stride).numpy()
    got = np.asarray(conv.conv_transpose1d(x, w, stride=stride))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_pools_match_torch(rng):
    x = rng.standard_normal((2, 4, 31)).astype(np.float32)
    ref = tF.max_pool1d(torch.from_numpy(x), 3).numpy()
    np.testing.assert_allclose(np.asarray(conv.max_pool1d(x, 3)), ref)
    ref_avg = tF.avg_pool1d(torch.from_numpy(x), 2, stride=2).numpy()
    np.testing.assert_allclose(np.asarray(conv.avg_pool1d_exact(x, 2)), ref_avg, atol=1e-6)
