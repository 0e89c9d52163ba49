"""Fused BiLSTM scan vs torch nn.LSTM (the reference SingleRNN backend,
src/models/dprnn.py:23-37). Validates gate order, bias handling, and the
masked-flip backward direction used for bucketed variable-length eval."""

import numpy as np
import pytest
import torch

from tss_dprnn_tpu.ops import rnn


def make_torch_lstm(F, H, bidirectional, seed=0):
    torch.manual_seed(seed)
    m = torch.nn.LSTM(F, H, num_layers=1, batch_first=True, bidirectional=bidirectional)
    return m


def weights_from_torch(m, reverse=False):
    sfx = "_reverse" if reverse else ""
    w_ih = m.state_dict()[f"weight_ih_l0{sfx}"].numpy().T.copy()
    w_hh = m.state_dict()[f"weight_hh_l0{sfx}"].numpy().T.copy()
    b = (m.state_dict()[f"bias_ih_l0{sfx}"] + m.state_dict()[f"bias_hh_l0{sfx}"]).numpy()
    return rnn.LSTMWeights(w_ih, w_hh, b)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(rng, bidirectional):
    B, T, F, H = 3, 17, 8, 6
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    m = make_torch_lstm(F, H, bidirectional)
    ref, _ = m(torch.from_numpy(x))
    fwd = weights_from_torch(m)
    bwd = weights_from_torch(m, reverse=True) if bidirectional else None
    got = np.asarray(rnn.lstm(x, fwd, bwd))
    np.testing.assert_allclose(got, ref.detach().numpy(), atol=2e-5, rtol=2e-5)


def test_bilstm_masked_lengths_match_per_sequence_torch(rng):
    """Padded batch with per-sequence lengths == torch run on each exact-length
    sequence (what the reference does eagerly at full-length eval)."""
    F, H, T = 8, 6, 20
    lengths = np.array([20, 13, 7], dtype=np.int32)
    x = rng.standard_normal((3, T, F)).astype(np.float32)
    for b, l in enumerate(lengths):
        x[b, l:] = rng.standard_normal((T - l, F))  # garbage in padding
    m = make_torch_lstm(F, H, True, seed=1)
    fwd = weights_from_torch(m)
    bwd = weights_from_torch(m, reverse=True)
    got = np.asarray(rnn.lstm(x, fwd, bwd, lengths=lengths))
    for b, l in enumerate(lengths):
        ref, _ = m(torch.from_numpy(x[b : b + 1, :l]))
        np.testing.assert_allclose(got[b, :l], ref[0].detach().numpy(), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_gru_matches_torch(rng, bidirectional):
    B, T, F, H = 2, 11, 5, 4
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    torch.manual_seed(2)
    m = torch.nn.GRU(F, H, num_layers=1, batch_first=True, bidirectional=bidirectional)
    ref, _ = m(torch.from_numpy(x))
    sd = m.state_dict()

    def w(reverse):
        sfx = "_reverse" if reverse else ""
        return (
            sd[f"weight_ih_l0{sfx}"].numpy().T.copy(),
            sd[f"weight_hh_l0{sfx}"].numpy().T.copy(),
            sd[f"bias_ih_l0{sfx}"].numpy(),
            sd[f"bias_hh_l0{sfx}"].numpy(),
        )

    got = np.asarray(rnn.gru(x, w(False), w(True) if bidirectional else None))
    np.testing.assert_allclose(got, ref.detach().numpy(), atol=2e-5, rtol=2e-5)
