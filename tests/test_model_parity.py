"""End-to-end model parity: reference-format state_dict -> converter -> flax
model output must match the torch oracle bit-tightly. This is the strongest
checkpoint-compatibility evidence available without the (absent) shipped
checkpoints: same dict drives both paths.
"""

import numpy as np
import pytest
import torch

from tests.torch_oracle import Cfg, make_bss_sd, make_spe_sd, oracle_bss, oracle_ira, oracle_spe
from tss_dprnn_tpu.models import DPRNNSpeIRATasNet, DPRNNSpeTasNet, DPRNNTasNet
from tss_dprnn_tpu.utils.torch_convert import convert_state_dict, validate_against

T = 1600
ATOL = 2e-4


def _model_kwargs(cfg: Cfg, spe: bool):
    kw = dict(
        input_size=cfg.input_size,
        feature_size=cfg.feature_size,
        hidden_size=cfg.hidden_size,
        chunk_length=cfg.chunk_length,
        kernel_size=cfg.kernel_size,
        hop_length=cfg.hop_length,
        n_repeats=cfg.n_repeats,
        bidirectional=cfg.bidirectional,
        norm_type=cfg.norm_type,
        activation_type=cfg.activation_type,
    )
    if spe:
        kw.update(
            O=cfg.O, P=cfg.P, embeddings_size=cfg.embeddings_size,
            num_spks=cfg.num_spks, fusion_type=cfg.fusion_type,
        )
    return kw


@pytest.mark.parametrize("norm_type", ["ln", "gLN"])
def test_bss_parity(rng, norm_type):
    cfg = Cfg(norm_type=norm_type)
    sd = make_bss_sd(cfg, seed=1)
    mix = rng.standard_normal((2, T)).astype(np.float32)
    ref = oracle_bss(sd, cfg, torch.from_numpy(mix)).detach().numpy()

    model = DPRNNTasNet(**_model_kwargs(cfg, spe=False))
    variables = convert_state_dict(sd)
    got = np.asarray(model.apply(variables, mix))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("fusion_type", ["cat", "add", "mul", "film", "att"])
def test_spe_parity_all_fusions(rng, fusion_type):
    cfg = Cfg(fusion_type=fusion_type)
    sd = make_spe_sd(cfg, seed=2)
    mix = rng.standard_normal((2, T)).astype(np.float32)
    aux = rng.standard_normal((2, T)).astype(np.float32)
    aux_len = torch.tensor([float(T), float(T)])
    ref_wav, ref_logits = oracle_spe(sd, cfg, torch.from_numpy(mix), torch.from_numpy(aux), aux_len)

    model = DPRNNSpeTasNet(**_model_kwargs(cfg, spe=True))
    variables = convert_state_dict(sd)
    wav, logits = model.apply(variables, mix, aux, np.array([T, T], np.float32))
    np.testing.assert_allclose(np.asarray(logits), ref_logits.detach().numpy(), atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wav), ref_wav.detach().numpy(), atol=ATOL, rtol=1e-4)


def test_ira_parity(rng):
    cfg = Cfg(fusion_type="cat")
    sd = make_spe_sd(cfg, seed=3, ira=True)
    mix = rng.standard_normal((2, T)).astype(np.float32)
    aux = rng.standard_normal((2, T)).astype(np.float32)
    aux_len = torch.tensor([float(T), float(T)])
    ref_wav, ref_logits = oracle_ira(sd, cfg, torch.from_numpy(mix), torch.from_numpy(aux), aux_len)

    model = DPRNNSpeIRATasNet(**_model_kwargs(cfg, spe=True))
    variables = convert_state_dict(sd)
    wav, logits = model.apply(variables, mix, aux, np.array([T, T], np.float32))
    np.testing.assert_allclose(np.asarray(logits), ref_logits.detach().numpy(), atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wav), ref_wav.detach().numpy(), atol=ATOL, rtol=1e-4)


def test_converter_validates_shapes(rng):
    import jax

    cfg = Cfg(fusion_type="att")
    sd = make_spe_sd(cfg, seed=4)
    model = DPRNNSpeTasNet(**_model_kwargs(cfg, spe=True))
    mix = np.zeros((1, T), np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), mix, mix, np.array([T], np.float32))
    converted = convert_state_dict(sd)
    validate_against(init_vars, converted)  # must not raise
