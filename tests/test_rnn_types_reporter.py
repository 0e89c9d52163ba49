"""API parity odds-and-ends: rnn_type='GRU'/'RNN' model variants (reference
SingleRNN accepts all three, dprnn.py:23), activation_type='relu', and the
reporter's mode surface without wandb."""

import numpy as np
import pytest

import jax

from tss_dprnn_tpu.models import DPRNNTasNet
from tss_dprnn_tpu.reporters import Reporter

TINY = dict(input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln")


@pytest.mark.parametrize("rnn_type", ["GRU", "RNN"])
def test_alternate_rnn_types_forward(rng, rnn_type):
    model = DPRNNTasNet(**TINY, rnn_type=rnn_type)
    mix = rng.standard_normal((2, 1600)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), mix)
    out = model.apply(v, mix)
    assert out.shape == (2, 2, 1600)
    assert np.isfinite(np.asarray(out)).all()


def test_relu_activation_forward(rng):
    model = DPRNNTasNet(**TINY, activation_type="relu")
    mix = rng.standard_normal((1, 800)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), mix)
    assert np.isfinite(np.asarray(model.apply(v, mix))).all()


def test_reporter_modes_without_wandb(rng):
    rep = Reporter({"data": {"sample_rate": 8000}, "is_test": True})
    assert rep.wandb is None
    rep.add_and_report({"step": 1, "loss": -10.0, "metrics": None}, mode="train")
    rep.add_and_report({"step": 1, "loss": -9.0, "metrics": {"si_sdr": 10.0}}, mode="eval")
    wav = rng.standard_normal(800).astype(np.float32)
    rep.add_and_report(
        {"id": 0, "mix": wav, "target": wav, "estimated": wav, "reference": wav,
         "si_sdr": 10.0, "stoi": 0.9, "pesq": None,
         "si_sdr_imp": 5.0, "stoi_imp": 0.1, "pesq_imp": None},
        mode="test",
    )
    rep.add_and_report(
        {"step": 1, "mixtures": {0: {"mix": wav, "s1_target": wav, "s2_target": wav,
                                     "s1_estimated": wav, "s2_estimated": wav}}},
        mode="inference",
    )
    rep.add_and_report(
        {"step": 1, "mixtures": {0: {"mix": wav, "target": wav, "estimated": wav,
                                     "reference": wav}}},
        mode="inference_spe",
    )
    with pytest.raises(ValueError):
        rep.add_and_report({}, mode="nope")
    rep.wandb_finish()
