"""DPRNN-RawNet parity: converter + flax model vs the torch oracle, both
driven by the same reference-format state_dict (sinc filters come from the
shared ops.sinc synthesis in both paths, so this validates the full Res2Net /
AFMS / attention-pooling stack and the converter's RawNet rules)."""

import numpy as np
import torch

from tests.torch_oracle import Cfg, RawCfg, make_rawnet_model_sd, oracle_rawnet, oracle_rawnet_emb
from tss_dprnn_tpu.models import DPRNNRawNetTasNet
from tss_dprnn_tpu.utils.torch_convert import convert_state_dict

T = 1600
T16 = 8000  # "16 kHz" aux length (small for test speed)


def test_rawnet_model_parity(rng):
    cfg = Cfg(fusion_type="att", embeddings_size=16)
    rcfg = RawCfg(nOut=16)
    sd = make_rawnet_model_sd(cfg, rcfg, seed=5)
    mix = rng.standard_normal((2, T)).astype(np.float32)
    aux = rng.standard_normal((2, T16)).astype(np.float32)
    ref_wav, ref_logits = oracle_rawnet(sd, cfg, rcfg, torch.from_numpy(mix), torch.from_numpy(aux))

    model = DPRNNRawNetTasNet(
        input_size=cfg.input_size, feature_size=cfg.feature_size, hidden_size=cfg.hidden_size,
        chunk_length=cfg.chunk_length, kernel_size=cfg.kernel_size, hop_length=cfg.hop_length,
        n_repeats=cfg.n_repeats, norm_type=cfg.norm_type,
        embeddings_size=cfg.embeddings_size, num_spks=cfg.num_spks, fusion_type="att",
        rawnet_C=rcfg.C, rawnet_scale=rcfg.model_scale, rawnet_sinc_stride=rcfg.sinc_stride,
    )
    variables = convert_state_dict(sd)
    wav, logits = model.apply(variables, mix, aux)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.detach().numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(wav), ref_wav.detach().numpy(), atol=5e-4, rtol=1e-3)
