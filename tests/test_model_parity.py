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


# ------------------------------------------------- IRA shared-early-blocks


def test_core_resume_k0_exact(rng):
    """DPRNNCore resume=(0, tap) on the bottleneck DELTA reproduces the full
    call on h2: segmentation/masking are linear, so the shared-blocks lane is
    mathematically the reference algorithm at k=0."""
    import jax

    from tss_dprnn_tpu.models.dprnn import DPRNNCore

    core = DPRNNCore(input_size=16, feature_size=24, hidden_size=20,
                     chunk_length=50, hop_length=25, n_repeats=2, norm_type="ln")
    h1 = rng.standard_normal((2, 300, 24)).astype(np.float32)
    h2 = rng.standard_normal((2, 300, 24)).astype(np.float32)
    variables = core.init(jax.random.PRNGKey(0), h1)
    full = core.apply(variables, h2)
    _, tap = core.apply(variables, h1, tap_block=0)
    resumed = core.apply(variables, h2 - h1, resume=(0, tap))
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                               atol=1e-5, rtol=1e-5)


def test_ira_share_blocks_param_free_and_masked(rng):
    """share_blocks>0 adds NO parameters (reference checkpoints load
    unchanged) and keeps masked bucketed eval == cropped exact eval."""
    import jax

    cfg = Cfg(fusion_type="cat")
    sd = make_spe_sd(cfg, seed=5, ira=True)
    variables = convert_state_dict(sd)
    mix = rng.standard_normal((2, T)).astype(np.float32)
    aux = rng.standard_normal((2, T)).astype(np.float32)

    model = DPRNNSpeIRATasNet(share_blocks=1, **_model_kwargs(cfg, spe=True))
    # the reference-format state_dict drives the shared lane directly
    wav, logits = model.apply(variables, mix, aux, np.array([T, T], np.float32))
    assert wav.shape == (2, T) and np.all(np.isfinite(np.asarray(wav)))
    assert np.all(np.isfinite(np.asarray(logits)))
    # param tree is identical to the baseline model's
    init_vars = model.init(jax.random.PRNGKey(0), mix, mix, np.array([T, T], np.float32))
    validate_against(init_vars, variables)

    # masked eval semantics survive the shared lane: padded rows equal crops
    Tshort = T - 300
    mix_p = np.concatenate([mix[:1, :Tshort], np.zeros((1, 300), np.float32)], axis=1)
    wav_p, _ = model.apply(variables, mix_p, aux[:1],
                           np.array([T], np.float32),
                           lengths=np.array([Tshort], np.int32))
    wav_c, _ = model.apply(variables, mix[:1, :Tshort], aux[:1],
                           np.array([T], np.float32),
                           lengths=np.array([Tshort], np.int32))
    np.testing.assert_allclose(np.asarray(wav_p)[0, :Tshort],
                               np.asarray(wav_c)[0], atol=2e-4, rtol=1e-3)


def test_ira_share_blocks_trains(rng):
    """Gradients through the shared lane are finite and the tap/resume pair
    composes with pass-1 remat (the training configuration)."""
    import jax
    import jax.numpy as jnp

    cfg = Cfg(fusion_type="cat")
    model = DPRNNSpeIRATasNet(share_blocks=1, **_model_kwargs(cfg, spe=True))
    mix = rng.standard_normal((2, 400)).astype(np.float32)
    aux = rng.standard_normal((2, 400)).astype(np.float32)
    al = np.array([400.0, 400.0], np.float32)
    variables = model.init(jax.random.PRNGKey(1), mix, aux, al)

    def loss(v):
        (wav, logits), _ = model.apply(v, mix, aux, al, train=True,
                                       mutable=["batch_stats"])
        return jnp.mean(wav ** 2) + 1e-3 * jnp.mean(logits ** 2)

    g = jax.grad(loss)(variables)
    flat = jax.tree_util.tree_leaves(g)
    assert flat and all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # every block receives gradient: blocks 0..k-1 through pass 1's tap,
    # blocks k.. through both passes
    gp = g["params"]["separation"]["core"]
    for name in gp:
        if name.startswith("blocks_"):
            assert any(float(np.max(np.abs(np.asarray(x)))) > 0
                       for x in jax.tree_util.tree_leaves(gp[name])), name
