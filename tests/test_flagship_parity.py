"""Flagship-size oracle parity (slow; pass --runslow).

Runs the reference's *shipped* hyperparameters (SURVEY.md §2.1: N=64,
F=H=128, K=250, 6 repeats, 3 s @ 8 kHz crops — reference
scripts/train/config_tss.yaml / src/models/dprnn_spe.py:314-327) through the
torch oracle and the flax fp32 path for all 8 variants, asserting output SNR
vs the oracle >= 60 dB. This converts the toy-size bit-tight parity
(test_model_parity.py, T=1600 / H=20) into *measured* parity at the scale the
published checkpoints use: 60 dB output SNR is far inside the 0.1 dB SI-SDR
budget (a 60 dB-accurate waveform perturbs SI-SDR by < 0.001 dB).
"""

import numpy as np
import pytest
import torch

from tests.torch_oracle import (
    Cfg,
    RawCfg,
    make_bss_sd,
    make_rawnet_model_sd,
    make_spe_sd,
    oracle_bss,
    oracle_ira,
    oracle_rawnet,
    oracle_spe,
)
from tss_dprnn_tpu.models import (
    DPRNNRawNetTasNet,
    DPRNNSpeIRATasNet,
    DPRNNSpeTasNet,
    DPRNNTasNet,
)
from tss_dprnn_tpu.utils.torch_convert import convert_state_dict

T = 24000  # 3 s @ 8 kHz, the reference's training crop
T16 = 48000  # 16 kHz aux for RawNet
MIN_SNR_DB = 60.0

FLAG = dict(input_size=64, feature_size=128, hidden_size=128, chunk_length=250,
            hop_length=125, kernel_size=2, n_repeats=6, bidirectional=True,
            norm_type="ln", activation_type="sigmoid",
            O=128, P=256, embeddings_size=128, num_spks=251)


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    err = np.sum((ref - got) ** 2)
    return float(10 * np.log10(np.sum(ref**2) / max(err, 1e-30)))


def _model_kwargs(cfg: Cfg, spe: bool):
    kw = dict(
        input_size=cfg.input_size, feature_size=cfg.feature_size,
        hidden_size=cfg.hidden_size, chunk_length=cfg.chunk_length,
        kernel_size=cfg.kernel_size, hop_length=cfg.hop_length,
        n_repeats=cfg.n_repeats, bidirectional=cfg.bidirectional,
        norm_type=cfg.norm_type, activation_type=cfg.activation_type,
    )
    if spe:
        kw.update(O=cfg.O, P=cfg.P, embeddings_size=cfg.embeddings_size,
                  num_spks=cfg.num_spks, fusion_type=cfg.fusion_type)
    return kw


@pytest.mark.slow
def test_flagship_bss_parity(rng):
    cfg = Cfg(**{k: v for k, v in FLAG.items() if hasattr(Cfg, k)})
    sd = make_bss_sd(cfg, seed=11)
    mix = rng.standard_normal((1, T)).astype(np.float32)
    ref = oracle_bss(sd, cfg, torch.from_numpy(mix)).detach().numpy()
    got = np.asarray(DPRNNTasNet(**_model_kwargs(cfg, spe=False)).apply(
        convert_state_dict(sd), mix))
    s = snr_db(ref, got)
    print(f"bss flagship SNR vs oracle: {s:.1f} dB")
    assert s >= MIN_SNR_DB


@pytest.mark.slow
@pytest.mark.parametrize("fusion_type", ["add", "att", "cat", "mul", "film"])
def test_flagship_spe_parity(rng, fusion_type):
    cfg = Cfg(**{k: v for k, v in FLAG.items() if hasattr(Cfg, k)},
              fusion_type=fusion_type)
    sd = make_spe_sd(cfg, seed=12)
    mix = rng.standard_normal((1, T)).astype(np.float32)
    aux = rng.standard_normal((1, T)).astype(np.float32)
    aux_len = torch.tensor([float(T)])
    ref_wav, _ = oracle_spe(sd, cfg, torch.from_numpy(mix), torch.from_numpy(aux), aux_len)
    wav, _ = DPRNNSpeTasNet(**_model_kwargs(cfg, spe=True)).apply(
        convert_state_dict(sd), mix, aux, np.array([T], np.float32))
    s = snr_db(ref_wav.detach().numpy(), np.asarray(wav))
    print(f"spe/{fusion_type} flagship SNR vs oracle: {s:.1f} dB")
    assert s >= MIN_SNR_DB


@pytest.mark.slow
def test_flagship_ira_parity(rng):
    cfg = Cfg(**{k: v for k, v in FLAG.items() if hasattr(Cfg, k)},
              fusion_type="cat")
    sd = make_spe_sd(cfg, seed=13, ira=True)
    mix = rng.standard_normal((1, T)).astype(np.float32)
    aux = rng.standard_normal((1, T)).astype(np.float32)
    aux_len = torch.tensor([float(T)])
    ref_wav, _ = oracle_ira(sd, cfg, torch.from_numpy(mix), torch.from_numpy(aux), aux_len)
    wav, _ = DPRNNSpeIRATasNet(**_model_kwargs(cfg, spe=True)).apply(
        convert_state_dict(sd), mix, aux, np.array([T], np.float32))
    s = snr_db(ref_wav.detach().numpy(), np.asarray(wav))
    print(f"ira flagship SNR vs oracle: {s:.1f} dB")
    assert s >= MIN_SNR_DB


@pytest.mark.slow
def test_flagship_rawnet_parity(rng):
    """RawNet at shipped sizes (C=1024, scale 8, sinc stride 10, embeddings
    256 — reference RawNet3.py defaults / config embeddings_size 256).

    The fixed 60 dB bar doesn't apply here: the sinc front-end's
    ``log(|conv| + 1e-6)`` (reference RawNet3.py:88) has unbounded derivative
    near zero, so at C=1024 *torch's own fp32 forward* sits only ~39 dB from
    a float64 oracle (measured; flax fp32 is ~39 dB too, and flax is closer
    to torch-fp32 — 51 dB on logits — than either is to fp64). The
    meaningful criterion is equidistance: the flax output must be no farther
    from the fp64 ground truth than the reference's own fp32 forward
    (within a small margin), i.e. our deviation is inside the reference
    implementation's intrinsic numerical noise."""
    cfg = Cfg(**{k: v for k, v in FLAG.items() if hasattr(Cfg, k)},
              fusion_type="att")
    cfg.embeddings_size = 256
    rcfg = RawCfg()
    rcfg.C, rcfg.model_scale, rcfg.nOut, rcfg.sinc_stride = 1024, 8, 256, 10
    sd = make_rawnet_model_sd(cfg, rcfg, seed=14)
    mix = rng.standard_normal((1, T)).astype(np.float32)
    aux = rng.standard_normal((1, T16)).astype(np.float32)
    ref32, _ = oracle_rawnet(sd, cfg, rcfg, torch.from_numpy(mix), torch.from_numpy(aux))
    sd64 = {k: v.double() for k, v in sd.items()}
    ref64, _ = oracle_rawnet(sd64, cfg, rcfg,
                             torch.from_numpy(mix).double(),
                             torch.from_numpy(aux).double())
    model = DPRNNRawNetTasNet(
        **{k: v for k, v in _model_kwargs(cfg, spe=True).items()
           if k not in ("O", "P", "fusion_type")},
        fusion_type="att",
        rawnet_C=rcfg.C, rawnet_scale=rcfg.model_scale, rawnet_sinc_stride=rcfg.sinc_stride,
    )
    wav, _ = model.apply(convert_state_dict(sd), mix, aux)
    ref64 = ref64.detach().numpy()
    s_torch32 = snr_db(ref64, ref32.detach().numpy().astype(np.float64))
    s_flax = snr_db(ref64, np.asarray(wav, np.float64))
    print(f"rawnet flagship: torch-fp32 vs fp64 {s_torch32:.1f} dB, "
          f"flax vs fp64 {s_flax:.1f} dB")
    assert s_flax >= s_torch32 - 3.0
    assert s_flax >= 18.0  # hard floor: still far above audibility of error
