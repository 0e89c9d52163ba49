"""Bucketed variable-length eval: running a padded batch with ``lengths``
must reproduce the exact-shape run on each utterance's valid region. This is
the property that lets full-length test-set inference jit into static bucket
shapes (replacing the reference's per-utterance eager loop,
src/inferencers/inferencer.py:48-78)."""

import numpy as np
import pytest

from tests.torch_oracle import Cfg
from tss_dprnn_tpu.models import DPRNNSpeTasNet, DPRNNTasNet
from tss_dprnn_tpu.models.rawnet import RawNet3

import jax


def test_bss_padded_matches_exact(rng):
    cfg = Cfg()
    model = DPRNNTasNet(
        input_size=cfg.input_size, feature_size=cfg.feature_size, hidden_size=cfg.hidden_size,
        chunk_length=cfg.chunk_length, kernel_size=2, hop_length=cfg.hop_length,
        n_repeats=2, norm_type="ln",
    )
    T_pad = 2000
    lengths = np.array([2000, 1403], np.int32)
    mix = rng.standard_normal((2, T_pad)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), mix[:1], lengths=None)
    padded = np.asarray(model.apply(variables, mix, lengths=lengths))
    for b, l in enumerate(lengths):
        exact = np.asarray(model.apply(variables, mix[b : b + 1, :l]))
        np.testing.assert_allclose(padded[b, :, :l], exact[0], atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("fusion_type", ["att", "cat"])
def test_spe_padded_matches_exact(rng, fusion_type):
    cfg = Cfg(fusion_type=fusion_type)
    model = DPRNNSpeTasNet(
        input_size=cfg.input_size, feature_size=cfg.feature_size, hidden_size=cfg.hidden_size,
        chunk_length=cfg.chunk_length, kernel_size=2, hop_length=cfg.hop_length,
        n_repeats=2, norm_type="ln", O=cfg.O, P=cfg.P,
        embeddings_size=cfg.embeddings_size, num_spks=cfg.num_spks, fusion_type=fusion_type,
    )
    T_pad, Ta_pad = 2000, 1800
    lengths = np.array([1761, 2000], np.int32)
    aux_len = np.array([1800, 1100], np.int32)
    mix = rng.standard_normal((2, T_pad)).astype(np.float32)
    aux = rng.standard_normal((2, Ta_pad)).astype(np.float32)
    # zero padding beyond true lengths, as a bucketed loader produces
    for b in range(2):
        mix[b, lengths[b]:] = 0
        aux[b, aux_len[b]:] = 0
    variables = model.init(
        jax.random.PRNGKey(0), mix[:1], aux[:1], aux_len[:1].astype(np.float32)
    )
    wav_p, logits_p = model.apply(variables, mix, aux, aux_len, lengths=lengths)
    wav_p, logits_p = np.asarray(wav_p), np.asarray(logits_p)
    for b in range(2):
        l, la = lengths[b], aux_len[b]
        wav_e, logits_e = model.apply(
            variables, mix[b : b + 1, :l], aux[b : b + 1, :la], np.array([la], np.float32)
        )
        np.testing.assert_allclose(logits_p[b], np.asarray(logits_e)[0], atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(wav_p[b, :l], np.asarray(wav_e)[0], atol=2e-4, rtol=1e-4)


def test_rawnet_padded_matches_exact(rng):
    model = RawNet3(model_scale=4, C=64, nOut=16, sinc_stride=16)
    T_pad = 16000
    lengths = np.array([16000, 11531], np.int32)
    wav = rng.standard_normal((2, T_pad)).astype(np.float32)
    for b in range(2):
        wav[b, lengths[b]:] = 0
    variables = model.init(jax.random.PRNGKey(0), wav[:1])
    emb_p = np.asarray(model.apply(variables, wav, lengths))
    for b in range(2):
        l = lengths[b]
        emb_e = np.asarray(model.apply(variables, wav[b : b + 1, :l]))
        np.testing.assert_allclose(emb_p[b], emb_e[0], atol=3e-4, rtol=1e-3)


def test_ira_padded_matches_exact(rng):
    from tss_dprnn_tpu.models import DPRNNSpeIRATasNet

    model = DPRNNSpeIRATasNet(
        input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
        kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
        O=8, P=12, embeddings_size=8, num_spks=6, fusion_type="cat",
    )
    T_pad, Ta_pad = 1600, 1400
    lengths = np.array([1600, 1111], np.int32)
    aux_len = np.array([1400, 900], np.int32)
    mix = rng.standard_normal((2, T_pad)).astype(np.float32)
    aux = rng.standard_normal((2, Ta_pad)).astype(np.float32)
    for b in range(2):
        mix[b, lengths[b]:] = 0
        aux[b, aux_len[b]:] = 0
    variables = model.init(jax.random.PRNGKey(0), mix[:1], aux[:1], aux_len[:1].astype(np.float32))
    wav_p, logit_p = model.apply(variables, mix, aux, aux_len, lengths=lengths)
    for b in range(2):
        l, la = lengths[b], aux_len[b]
        wav_e, logit_e = model.apply(
            variables, mix[b : b + 1, :l], aux[b : b + 1, :la], np.array([la], np.float32)
        )
        np.testing.assert_allclose(np.asarray(logit_p)[b], np.asarray(logit_e)[0], atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(wav_p)[b, :l], np.asarray(wav_e)[0], atol=3e-4, rtol=1e-3)


def test_rawnet_model_padded_matches_exact(rng):
    from tss_dprnn_tpu.models import DPRNNRawNetTasNet

    model = DPRNNRawNetTasNet(
        input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
        kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
        embeddings_size=8, num_spks=6, fusion_type="att",
        rawnet_C=32, rawnet_scale=4, rawnet_sinc_stride=16,
    )
    T_pad, Ta_pad = 1600, 16000
    lengths = np.array([1600, 1205], np.int32)
    aux_len = np.array([16000, 11777], np.int32)
    mix = rng.standard_normal((2, T_pad)).astype(np.float32)
    aux = rng.standard_normal((2, Ta_pad)).astype(np.float32)
    for b in range(2):
        mix[b, lengths[b]:] = 0
        aux[b, aux_len[b]:] = 0
    variables = model.init(jax.random.PRNGKey(0), mix[:1], aux[:1])
    wav_p, logit_p = model.apply(variables, mix, aux, aux_len=aux_len, lengths=lengths)
    for b in range(2):
        l, la = lengths[b], aux_len[b]
        wav_e, logit_e = model.apply(variables, mix[b : b + 1, :l], aux[b : b + 1, :la])
        np.testing.assert_allclose(np.asarray(logit_p)[b], np.asarray(logit_e)[0], atol=5e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(wav_p)[b, :l], np.asarray(wav_e)[0], atol=5e-4, rtol=2e-3)


def test_bss_padded_matches_exact_pallas_backend(rng, monkeypatch):
    """Model-level masked == exact on the PALLAS backend (interpret mode):
    the bucketed-eval graph's inter scans dispatch to the mask-aware
    no-stack kernel (_recurrence3_masked, round 3) — the whole model must
    still reproduce per-utterance exact inference on the valid region."""
    import functools

    from jax.experimental import pallas as pl

    from tss_dprnn_tpu.ops import rnn as rnn_ops

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    model = DPRNNTasNet(
        input_size=8, feature_size=16, hidden_size=16, chunk_length=20,
        kernel_size=2, hop_length=10, n_repeats=2, norm_type="ln",
    )
    T_pad = 320
    lengths = np.array([320, 251], np.int32)
    mix = rng.standard_normal((2, T_pad)).astype(np.float32)
    for b, l in enumerate(lengths):
        mix[b, l:] = 0
    variables = model.init(jax.random.PRNGKey(0), mix[:1], lengths=None)
    with rnn_ops.lstm_backend("pallas"):
        padded = np.asarray(model.apply(variables, mix, lengths=lengths))
        for b, l in enumerate(lengths):
            exact = np.asarray(model.apply(variables, mix[b : b + 1, :l]))
            np.testing.assert_allclose(padded[b, :, :l], exact[0], atol=3e-4, rtol=3e-4)
