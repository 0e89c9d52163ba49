"""Functional torch oracle for end-to-end model parity tests.

Implements the reference models' forward math *directly from a reference-format
state_dict* (the exact key naming of the shipped checkpoints, SURVEY.md §2.1),
using torch ops as the numerical ground truth. Also builds random state_dicts
with those key names/shapes — so the same dict drives both this oracle and our
converter + flax models, proving lossless checkpoint loading.

BatchNorm runs in eval mode (running stats), the canonical behavior our
framework documents (the reference inferencers are inconsistent about it).
"""

from __future__ import annotations

from dataclasses import dataclass

import torch
import torch.nn.functional as F


@dataclass
class Cfg:
    input_size: int = 16
    feature_size: int = 24
    hidden_size: int = 20
    chunk_length: int = 50
    hop_length: int = 25
    kernel_size: int = 2
    stride: int = 1
    n_repeats: int = 2
    bidirectional: bool = True
    norm_type: str = "ln"
    activation_type: str = "sigmoid"
    O: int = 12
    P: int = 16
    embeddings_size: int = 8
    num_spks: int = 11
    fusion_type: str = "cat"


# ---------------------------------------------------------------- state dicts


def _rand(g, *shape, scale=0.15):
    return torch.randn(*shape, generator=g) * scale


def _norm_entries(sd, prefix, C, norm_type, g):
    if norm_type == "gLN":
        sd[prefix + "gamma"] = 1.0 + 0.1 * _rand(g, C)
        sd[prefix + "beta"] = 0.1 * _rand(g, C)
    else:
        sd[prefix + "weight"] = 1.0 + 0.1 * _rand(g, C)
        sd[prefix + "bias"] = 0.1 * _rand(g, C)


def _lstm_entries(sd, prefix, F_in, H, bidirectional, g):
    for sfx in [""] + (["_reverse"] if bidirectional else []):
        sd[prefix + f"weight_ih_l0{sfx}"] = _rand(g, 4 * H, F_in)
        sd[prefix + f"weight_hh_l0{sfx}"] = _rand(g, 4 * H, H)
        sd[prefix + f"bias_ih_l0{sfx}"] = _rand(g, 4 * H)
        sd[prefix + f"bias_hh_l0{sfx}"] = _rand(g, 4 * H)


def _bn_entries(sd, prefix, C, g):
    sd[prefix + "weight"] = 1.0 + 0.1 * _rand(g, C)
    sd[prefix + "bias"] = 0.1 * _rand(g, C)
    sd[prefix + "running_mean"] = 0.2 * _rand(g, C)
    sd[prefix + "running_var"] = (1.0 + 0.2 * _rand(g, C)).abs()
    sd[prefix + "num_batches_tracked"] = torch.tensor(7)


def make_separation_sd(cfg: Cfg, g):
    """Shared DPRNN separation entries (bottleneck + blocks + mask head)."""
    sd = {}
    N, Fd, H = cfg.input_size, cfg.feature_size, cfg.hidden_size
    _norm_entries(sd, "separation.bottleneck.0.", N, cfg.norm_type, g)
    in_ch = N + cfg.embeddings_size if cfg.fusion_type == "cat" else N
    sd["separation.bottleneck.1.weight"] = _rand(g, Fd, in_ch, 1)
    sd["separation.bottleneck.1.bias"] = _rand(g, Fd)
    for i in range(cfg.n_repeats):
        p = f"separation.dprnn_blocks.{i}."
        _lstm_entries(sd, p + "intra_rnn.rnn.", Fd, H, True, g)
        sd[p + "intra_linear.weight"] = _rand(g, Fd, 2 * H)
        sd[p + "intra_linear.bias"] = _rand(g, Fd)
        _norm_entries(sd, p + "intra_norm.", Fd, cfg.norm_type, g)
        _lstm_entries(sd, p + "inter_rnn.rnn.", Fd, H, cfg.bidirectional, g)
        out_sz = 2 * H if cfg.bidirectional else H
        sd[p + "inter_linear.weight"] = _rand(g, Fd, out_sz)
        sd[p + "inter_linear.bias"] = _rand(g, Fd)
        _norm_entries(sd, p + "inter_norm.", Fd, cfg.norm_type, g)
    sd["separation.prelu.weight"] = torch.tensor([0.25]) + 0.05 * _rand(g, 1)
    sd["separation.conv2d.weight"] = _rand(g, 2 * Fd, Fd, 1, 1)
    sd["separation.conv2d.bias"] = _rand(g, 2 * Fd)
    sd["separation.out.0.weight"] = _rand(g, Fd, Fd, 1)
    sd["separation.out.0.bias"] = _rand(g, Fd)
    sd["separation.gate.0.weight"] = _rand(g, Fd, Fd, 1)
    sd["separation.gate.0.bias"] = _rand(g, Fd)
    sd["separation.end_conv1x1.weight"] = _rand(g, N, Fd, 1)
    return sd


def make_bss_sd(cfg: Cfg, seed=0):
    g = torch.Generator().manual_seed(seed)
    cfg_nocat = Cfg(**{**cfg.__dict__, "fusion_type": "none"})
    sd = make_separation_sd(cfg_nocat, g)
    sd["encoder.conv1d.weight"] = _rand(g, cfg.input_size, 1, cfg.kernel_size)
    sd["decoder.weight"] = _rand(g, cfg.input_size, 1, cfg.kernel_size)
    return sd


def _resblock_entries(sd, prefix, c_in, c_out, g):
    sd[prefix + "conv1.weight"] = _rand(g, c_out, c_in, 1)
    _bn_entries(sd, prefix + "batch_norm1.", c_out, g)
    sd[prefix + "prelu1.weight"] = torch.tensor([0.25])
    sd[prefix + "conv2.weight"] = _rand(g, c_out, c_out, 1)
    _bn_entries(sd, prefix + "batch_norm2.", c_out, g)
    sd[prefix + "prelu2.weight"] = torch.tensor([0.25])
    if c_in != c_out:
        sd[prefix + "conv_downsample.weight"] = _rand(g, c_out, c_in, 1)


def make_spe_sd(cfg: Cfg, seed=0, ira=False):
    g = torch.Generator().manual_seed(seed)
    sd = make_separation_sd(cfg, g)
    N, E = cfg.input_size, cfg.embeddings_size
    sd["encoder.conv1d.weight"] = _rand(g, N, 1, cfg.kernel_size)
    sd["decoder.weight"] = _rand(g, N, 1, cfg.kernel_size)
    if cfg.fusion_type in ("add", "mul", "att"):
        sd["separation.fusion_linear.weight"] = _rand(g, N, E)
        sd["separation.fusion_linear.bias"] = _rand(g, N)
    if cfg.fusion_type == "film":
        sd["separation.fusion_linear_1.weight"] = _rand(g, N, E)
        sd["separation.fusion_linear_1.bias"] = _rand(g, N)
        sd["separation.fusion_linear_2.weight"] = _rand(g, N, E)
        sd["separation.fusion_linear_2.bias"] = _rand(g, N)
    if cfg.fusion_type == "att":
        sd["separation.average.weight"] = torch.ones(N, 1, cfg.kernel_size) / cfg.kernel_size
        sd["separation.average.bias"] = torch.zeros(N)
    sd["separation.spk_encoder.0.weight"] = 1.0 + 0.1 * _rand(g, N)
    sd["separation.spk_encoder.0.bias"] = 0.1 * _rand(g, N)
    sd["separation.spk_encoder.1.weight"] = _rand(g, cfg.O, N, 1)
    sd["separation.spk_encoder.1.bias"] = _rand(g, cfg.O)
    _resblock_entries(sd, "separation.spk_encoder.2.", cfg.O, cfg.O, g)
    _resblock_entries(sd, "separation.spk_encoder.3.", cfg.O, cfg.P, g)
    _resblock_entries(sd, "separation.spk_encoder.4.", cfg.P, cfg.P, g)
    sd["separation.spk_encoder.5.weight"] = _rand(g, E, cfg.P, 1)
    sd["separation.spk_encoder.5.bias"] = _rand(g, E)
    sd["separation.pred_linear.weight"] = _rand(g, cfg.num_spks, E)
    sd["separation.pred_linear.bias"] = _rand(g, cfg.num_spks)
    if ira:
        sd["separation.aux_linear.weight"] = _rand(g, E, 2 * E)
        sd["separation.aux_linear.bias"] = _rand(g, E)
    return sd


# ------------------------------------------------------------------- forward


def _norm(x, sd, prefix, norm_type):
    if norm_type == "gLN":
        gamma, beta = sd[prefix + "gamma"], sd[prefix + "beta"]
        dims = list(range(1, x.dim()))
        mean = x.mean(dim=dims, keepdim=True)
        var = torch.var(x, dim=dims, keepdim=True, unbiased=False)
        y = (x - mean) / torch.sqrt(var + 1e-8)
        return (gamma * y.transpose(1, -1) + beta).transpose(1, -1)
    return F.group_norm(x, 1, sd[prefix + "weight"], sd[prefix + "bias"], eps=1e-5)


def _lstm(x, sd, prefix, hidden, bidirectional):
    # functional torch.lstm (same kernel nn.LSTM dispatches to) so gradients
    # flow back into the sd tensors — required by the multi-step training-
    # trajectory equivalence tests (tests/test_trajectory.py)
    flat = []
    for sfx in [""] + (["_reverse"] if bidirectional else []):
        flat += [sd[prefix + f"weight_ih_l0{sfx}"], sd[prefix + f"weight_hh_l0{sfx}"],
                 sd[prefix + f"bias_ih_l0{sfx}"], sd[prefix + f"bias_hh_l0{sfx}"]]
    ndir = 2 if bidirectional else 1
    h0 = x.new_zeros(ndir, x.shape[0], hidden)
    out, _, _ = torch.lstm(x, (h0, h0), flat, True, 1, 0.0, False, bidirectional, True)
    return out


def _block(x, sd, prefix, cfg: Cfg):
    B, N, K, S = x.shape
    h = x.transpose(1, -1).reshape(B * S, K, N)
    h = _lstm(h, sd, prefix + "intra_rnn.rnn.", cfg.hidden_size, True)
    h = F.linear(h, sd[prefix + "intra_linear.weight"], sd[prefix + "intra_linear.bias"])
    h = h.reshape(B, S, K, N).transpose(1, -1)
    x = x + _norm(h, sd, prefix + "intra_norm.", cfg.norm_type)
    h = x.transpose(1, 2).transpose(2, -1).reshape(B * K, S, N)
    h = _lstm(h, sd, prefix + "inter_rnn.rnn.", cfg.hidden_size, cfg.bidirectional)
    h = F.linear(h, sd[prefix + "inter_linear.weight"], sd[prefix + "inter_linear.bias"])
    h = h.reshape(B, K, S, N).transpose(1, -1).transpose(2, -1).contiguous()
    return x + _norm(h, sd, prefix + "inter_norm.", cfg.norm_type)


def _mask_head(h, sd, cfg: Cfg, B, L):
    K, hop, Fd = cfg.chunk_length, cfg.hop_length, cfg.feature_size
    seg = F.unfold(h.unsqueeze(-1), (K, 1), padding=(K, 0), stride=(hop, 1))
    S = seg.shape[-1]
    seg = seg.reshape(B, Fd, K, S)
    for i in range(cfg.n_repeats):
        seg = _block(seg, sd, f"separation.dprnn_blocks.{i}.", cfg)
    x = F.prelu(seg, sd["separation.prelu.weight"])
    x = F.conv2d(x, sd["separation.conv2d.weight"], sd["separation.conv2d.bias"])
    x = x.reshape(B * 2, Fd, K, S)
    x = F.fold(x.reshape(B * 2, Fd * K, S), (L, 1), (K, 1), padding=(K, 0), stride=(hop, 1))
    x = x.reshape(B * 2, Fd, L)
    x = torch.tanh(F.conv1d(x, sd["separation.out.0.weight"], sd["separation.out.0.bias"])) * torch.sigmoid(
        F.conv1d(x, sd["separation.gate.0.weight"], sd["separation.gate.0.bias"])
    )
    x = F.conv1d(x, sd["separation.end_conv1x1.weight"])
    x = torch.sigmoid(x) if cfg.activation_type == "sigmoid" else F.relu(x)
    return x.reshape(B, 2, cfg.input_size, L)


def _encoder(wav, sd, cfg: Cfg):
    return F.relu(F.conv1d(wav.unsqueeze(1), sd["encoder.conv1d.weight"], stride=cfg.stride))


def _decoder(feats, sd, cfg: Cfg):
    return F.conv_transpose1d(feats, sd["decoder.weight"], stride=cfg.stride).squeeze(1)


def oracle_bss(sd, cfg: Cfg, mix):
    enc = _encoder(mix, sd, cfg)  # [B, N, L]
    B, _, L = enc.shape
    h = _norm(enc, sd, "separation.bottleneck.0.", cfg.norm_type)
    h = F.conv1d(h, sd["separation.bottleneck.1.weight"], sd["separation.bottleneck.1.bias"])
    masks = _mask_head(h, sd, cfg, B, L)
    out = masks * enc.unsqueeze(1)
    return torch.stack([_decoder(out[:, i], sd, cfg) for i in range(2)], dim=1)


def _resblock(x, sd, prefix, training=False):
    # training=True uses batch statistics and updates the running buffers in
    # place (torch train-mode BN) — the trajectory tests train through this
    y = F.conv1d(x, sd[prefix + "conv1.weight"])
    y = F.batch_norm(
        y, sd[prefix + "batch_norm1.running_mean"], sd[prefix + "batch_norm1.running_var"],
        sd[prefix + "batch_norm1.weight"], sd[prefix + "batch_norm1.bias"], training, 0.1, 1e-5,
    )
    y = F.prelu(y, sd[prefix + "prelu1.weight"])
    y = F.conv1d(y, sd[prefix + "conv2.weight"])
    y = F.batch_norm(
        y, sd[prefix + "batch_norm2.running_mean"], sd[prefix + "batch_norm2.running_var"],
        sd[prefix + "batch_norm2.weight"], sd[prefix + "batch_norm2.bias"], training, 0.1, 1e-5,
    )
    if prefix + "conv_downsample.weight" in sd:
        y = y + F.conv1d(x, sd[prefix + "conv_downsample.weight"])
    else:
        y = y + x
    y = F.prelu(y, sd[prefix + "prelu2.weight"])
    return F.max_pool1d(y, 3)


def _spk_encoder(emb, sd, cfg: Cfg, aux_len, training=False):
    h = F.group_norm(emb, 1, sd["separation.spk_encoder.0.weight"], sd["separation.spk_encoder.0.bias"], eps=1e-5)
    h = F.conv1d(h, sd["separation.spk_encoder.1.weight"], sd["separation.spk_encoder.1.bias"])
    h = _resblock(h, sd, "separation.spk_encoder.2.", training)
    h = _resblock(h, sd, "separation.spk_encoder.3.", training)
    h = _resblock(h, sd, "separation.spk_encoder.4.", training)
    h = F.conv1d(h, sd["separation.spk_encoder.5.weight"], sd["separation.spk_encoder.5.bias"])
    aux_T = (aux_len - cfg.kernel_size) // (cfg.kernel_size // 2) + 1
    aux_T = ((aux_T // 3) // 3) // 3
    return torch.sum(h, -1) / aux_T.view(-1, 1).float()


def _fusion(aux_v, h, sd, cfg: Cfg, L):
    ft = cfg.fusion_type
    if ft == "cat":
        rep = aux_v.unsqueeze(-1).repeat(1, 1, L)
        return torch.cat([h, rep], 1)
    if ft in ("add", "mul"):
        proj = F.linear(aux_v, sd["separation.fusion_linear.weight"], sd["separation.fusion_linear.bias"])
        proj = proj.unsqueeze(-1).repeat(1, 1, L)
        return h + proj if ft == "add" else h * proj
    if ft == "film":
        p1 = F.linear(aux_v, sd["separation.fusion_linear_1.weight"], sd["separation.fusion_linear_1.bias"])
        p2 = F.linear(aux_v, sd["separation.fusion_linear_2.weight"], sd["separation.fusion_linear_2.bias"])
        return h * p1.unsqueeze(-1).repeat(1, 1, L) + p2.unsqueeze(-1).repeat(1, 1, L)
    # att (reference dprnn_spe.py:178-183, 214-222)
    avg = F.conv1d(
        h, sd["separation.average.weight"], sd["separation.average.bias"],
        stride=cfg.kernel_size, groups=cfg.input_size,
    )
    proj = F.linear(aux_v, sd["separation.fusion_linear.weight"], sd["separation.fusion_linear.bias"])
    proj = proj.unsqueeze(-1).repeat(1, 1, avg.shape[-1])
    att = torch.sum(avg * proj, 1, keepdim=True)
    att = F.softmax(att, -1)
    att = att * proj + proj
    att = torch.nn.Upsample(size=L, mode="nearest")(att)
    return h * att


def oracle_spe(sd, cfg: Cfg, mix, aux, aux_len, training=False):
    enc = _encoder(mix, sd, cfg)
    emb = _encoder(aux, sd, cfg)
    B, _, L = enc.shape
    aux_v = _spk_encoder(emb, sd, cfg, aux_len, training)
    h = _norm(enc, sd, "separation.bottleneck.0.", cfg.norm_type)
    h = _fusion(aux_v, h, sd, cfg, L)
    h = F.conv1d(h, sd["separation.bottleneck.1.weight"], sd["separation.bottleneck.1.bias"])
    masks = _mask_head(h, sd, cfg, B, L)
    logits = F.linear(aux_v, sd["separation.pred_linear.weight"], sd["separation.pred_linear.bias"])
    out = masks * enc.unsqueeze(1)
    return _decoder(out[:, 0], sd, cfg), logits


def oracle_ira(sd, cfg: Cfg, mix, aux, aux_len):
    enc = _encoder(mix, sd, cfg)
    emb = _encoder(aux, sd, cfg)
    B, _, L = enc.shape
    v0 = _spk_encoder(emb, sd, cfg, aux_len)
    out_norm = _norm(enc, sd, "separation.bottleneck.0.", cfg.norm_type)

    h = _fusion(v0, out_norm, sd, cfg, L)
    h = F.conv1d(h, sd["separation.bottleneck.1.weight"], sd["separation.bottleneck.1.bias"])
    masks = _mask_head(h, sd, cfg, B, L)
    d0 = (masks * enc.unsqueeze(1))[:, 0]

    v1 = _spk_encoder(d0, sd, cfg, aux_len)
    v1 = F.linear(torch.cat((v0, v1), dim=1), sd["separation.aux_linear.weight"], sd["separation.aux_linear.bias"])

    h = _fusion(v1, out_norm, sd, cfg, L)
    h = F.conv1d(h, sd["separation.bottleneck.1.weight"], sd["separation.bottleneck.1.bias"])
    masks = _mask_head(h, sd, cfg, B, L)
    d1 = (masks * enc.unsqueeze(1))[:, 0]

    logits = F.linear(v1, sd["separation.pred_linear.weight"], sd["separation.pred_linear.bias"])
    return _decoder(d1, sd, cfg), logits


# ------------------------------------------------------------------ RawNet3


@dataclass
class RawCfg:
    C: int = 64
    model_scale: int = 4
    nOut: int = 16
    sinc_stride: int = 16
    sinc_kernel: int = 251
    sample_rate: float = 16000.0


def make_rawnet_sd(sd, rcfg: RawCfg, g, prefix="separation.spk_encoder."):
    """Append RawNet3 entries (reference RawNet3.py module tree) to ``sd``."""
    C, s = rcfg.C, rcfg.model_scale
    width = C // s
    sd[prefix + "preprocess.0.flipped_filter"] = torch.tensor([[[-0.97, 1.0]]])
    sd[prefix + "preprocess.1.weight"] = 1.0 + 0.1 * _rand(g, 1)
    sd[prefix + "preprocess.1.bias"] = 0.1 * _rand(g, 1)
    from tss_dprnn_tpu.ops.sinc import mel_init_bands

    low, band = mel_init_bands(C // 8, rcfg.sample_rate)
    sd[prefix + "conv1.filterbank.low_hz_"] = torch.from_numpy(low) * (1 + 0.05 * _rand(g, C // 8, 1))
    sd[prefix + "conv1.filterbank.band_hz_"] = torch.from_numpy(band) * (1 + 0.05 * _rand(g, C // 8, 1))
    _bn_entries(sd, prefix + "bn1.", C // 4, g)  # defined-but-unused in forward
    for lyr, (c_in, pool) in {"layer1": (C // 4, 5), "layer2": (C, 3), "layer3": (C, 0)}.items():
        p = prefix + lyr + "."
        sd[p + "conv1.weight"] = _rand(g, width * s, c_in, 1)
        sd[p + "conv1.bias"] = _rand(g, width * s)
        _bn_entries(sd, p + "bn1.", width * s, g)
        for i in range(s - 1):
            sd[p + f"convs.{i}.weight"] = _rand(g, width, width, 3)
            sd[p + f"convs.{i}.bias"] = _rand(g, width)
            _bn_entries(sd, p + f"bns.{i}.", width, g)
        sd[p + "conv3.weight"] = _rand(g, C, width * s, 1)
        sd[p + "conv3.bias"] = _rand(g, C)
        _bn_entries(sd, p + "bn3.", C, g)
        if c_in != C:
            sd[p + "residual.0.weight"] = _rand(g, C, c_in, 1)
        sd[p + "afms.alpha"] = torch.ones(C, 1) + 0.1 * _rand(g, C, 1)
        sd[p + "afms.fc.weight"] = _rand(g, C, C)
        sd[p + "afms.fc.bias"] = _rand(g, C)
    sd[prefix + "layer4.weight"] = _rand(g, 1536, 3 * C, 1)
    sd[prefix + "layer4.bias"] = _rand(g, 1536)
    sd[prefix + "attention.0.weight"] = _rand(g, 128, 1536 * 3, 1)
    sd[prefix + "attention.0.bias"] = _rand(g, 128)
    _bn_entries(sd, prefix + "attention.2.", 128, g)
    sd[prefix + "attention.3.weight"] = _rand(g, 1536, 128, 1)
    sd[prefix + "attention.3.bias"] = _rand(g, 1536)
    _bn_entries(sd, prefix + "bn5.", 3072, g)
    sd[prefix + "fc6.weight"] = _rand(g, rcfg.nOut, 3072)
    sd[prefix + "fc6.bias"] = _rand(g, rcfg.nOut)
    return sd


def make_rawnet_model_sd(cfg: Cfg, rcfg: RawCfg, seed=0):
    """Full DPRNNRawNetTasNet state_dict (fusion att, RawNet3 spk branch)."""
    g = torch.Generator().manual_seed(seed)
    sd = make_separation_sd(cfg, g)
    N, E = cfg.input_size, cfg.embeddings_size
    sd["encoder.conv1d.weight"] = _rand(g, N, 1, cfg.kernel_size)
    sd["decoder.weight"] = _rand(g, N, 1, cfg.kernel_size)
    if cfg.fusion_type in ("add", "mul", "att"):
        sd["separation.fusion_linear.weight"] = _rand(g, N, E)
        sd["separation.fusion_linear.bias"] = _rand(g, N)
    if cfg.fusion_type == "att":
        sd["separation.average.weight"] = torch.ones(N, 1, cfg.kernel_size) / cfg.kernel_size
        sd["separation.average.bias"] = torch.zeros(N)
    sd["separation.pred_linear.weight"] = _rand(g, cfg.num_spks, E)
    sd["separation.pred_linear.bias"] = _rand(g, cfg.num_spks)
    make_rawnet_sd(sd, rcfg, g)
    return sd


def _bn_eval(x, sd, p):
    return F.batch_norm(
        x, sd[p + "running_mean"], sd[p + "running_var"],
        sd[p + "weight"], sd[p + "bias"], False, 0.1, 1e-5,
    )


def _t_bottle2neck(x, sd, p, rcfg: RawCfg, dilation, pool):
    C, s = rcfg.C, rcfg.model_scale
    width = C // s
    num_pad = dilation  # floor(3/2) * dilation
    if p + "residual.0.weight" in sd:
        residual = F.conv1d(x, sd[p + "residual.0.weight"])
    else:
        residual = x
    out = F.conv1d(x, sd[p + "conv1.weight"], sd[p + "conv1.bias"])
    out = F.relu(out)
    out = _bn_eval(out, sd, p + "bn1.")
    spx = torch.split(out, width, 1)
    for i in range(s - 1):
        sp = spx[i] if i == 0 else sp + spx[i]
        sp = F.conv1d(sp, sd[p + f"convs.{i}.weight"], sd[p + f"convs.{i}.bias"],
                      dilation=dilation, padding=num_pad)
        sp = F.relu(sp)
        sp = _bn_eval(sp, sd, p + f"bns.{i}.")
        out = sp if i == 0 else torch.cat((out, sp), 1)
    out = torch.cat((out, spx[s - 1]), 1)
    out = F.conv1d(out, sd[p + "conv3.weight"], sd[p + "conv3.bias"])
    out = F.relu(out)
    out = _bn_eval(out, sd, p + "bn3.")
    out = out + residual
    if pool:
        out = F.max_pool1d(out, pool)
    # AFMS
    y = F.adaptive_avg_pool1d(out, 1).view(out.size(0), -1)
    y = torch.sigmoid(F.linear(y, sd[p + "afms.fc.weight"], sd[p + "afms.fc.bias"]))
    out = (out + sd[p + "afms.alpha"]) * y.unsqueeze(-1)
    return out


def oracle_rawnet_emb(sd, wav, rcfg: RawCfg, prefix="separation.spk_encoder."):
    """RawNet3 forward (reference RawNet3.py:72-136), eval-mode BN, with sinc
    filters synthesized by our shared ops.sinc implementation."""
    from tss_dprnn_tpu.ops.sinc import sinc_filters
    import numpy as _np

    x = wav.unsqueeze(1)
    x = F.pad(x, (1, 0), "reflect")
    x = F.conv1d(x, sd[prefix + "preprocess.0.flipped_filter"])
    x = F.instance_norm(x, None, None, sd[prefix + "preprocess.1.weight"],
                        sd[prefix + "preprocess.1.bias"], True, 0.1, 1e-4)
    filters = _np.asarray(sinc_filters(
        sd[prefix + "conv1.filterbank.low_hz_"].numpy(),
        sd[prefix + "conv1.filterbank.band_hz_"].numpy(),
        rcfg.sinc_kernel, rcfg.sample_rate,
    ))
    x = torch.abs(F.conv1d(x, torch.from_numpy(filters).to(x.dtype), stride=rcfg.sinc_stride))
    x = torch.log(x + 1e-6)
    x = x - torch.mean(x, dim=-1, keepdim=True)
    x1 = _t_bottle2neck(x, sd, prefix + "layer1.", rcfg, dilation=2, pool=5)
    x2 = _t_bottle2neck(x1, sd, prefix + "layer2.", rcfg, dilation=3, pool=3)
    x3 = _t_bottle2neck(F.max_pool1d(x1, 3) + x2, sd, prefix + "layer3.", rcfg, dilation=4, pool=0)
    x = F.conv1d(torch.cat((F.max_pool1d(x1, 3), x2, x3), dim=1),
                 sd[prefix + "layer4.weight"], sd[prefix + "layer4.bias"])
    x = F.relu(x)
    t = x.size()[-1]
    global_x = torch.cat(
        (x,
         torch.mean(x, dim=2, keepdim=True).repeat(1, 1, t),
         torch.sqrt(torch.var(x, dim=2, keepdim=True).clamp(min=1e-4, max=1e4)).repeat(1, 1, t)),
        dim=1,
    )
    w = F.conv1d(global_x, sd[prefix + "attention.0.weight"], sd[prefix + "attention.0.bias"])
    w = F.relu(w)
    w = _bn_eval(w, sd, prefix + "attention.2.")
    w = F.conv1d(w, sd[prefix + "attention.3.weight"], sd[prefix + "attention.3.bias"])
    w = F.softmax(w, dim=2)
    mu = torch.sum(x * w, dim=2)
    sg = torch.sqrt((torch.sum((x ** 2) * w, dim=2) - mu ** 2).clamp(min=1e-4, max=1e4))
    x = torch.cat((mu, sg), 1)
    x = _bn_eval(x, sd, prefix + "bn5.")
    return F.linear(x, sd[prefix + "fc6.weight"], sd[prefix + "fc6.bias"])


def oracle_rawnet(sd, cfg: Cfg, rcfg: RawCfg, mix, aux16):
    """DPRNNRawNetTasNet forward (reference dprnn_rawnet.py:72-101,171-182)."""
    enc = _encoder(mix, sd, cfg)
    B, _, L = enc.shape
    aux_v = oracle_rawnet_emb(sd, aux16, rcfg)
    h = _norm(enc, sd, "separation.bottleneck.0.", cfg.norm_type)
    h = _fusion(aux_v, h, sd, cfg, L)
    h = F.conv1d(h, sd["separation.bottleneck.1.weight"], sd["separation.bottleneck.1.bias"])
    masks = _mask_head(h, sd, cfg, B, L)
    logits = F.linear(aux_v, sd["separation.pred_linear.weight"], sd["separation.pred_linear.bias"])
    out = masks * enc.unsqueeze(1)
    return _decoder(out[:, 0], sd, cfg), logits
