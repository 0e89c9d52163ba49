"""Inverse converter: flax variables -> reference-format torch ``state_dict``.

Lets checkpoints trained in this framework load into the reference's torch
models (strict load), completing round-trip portability. Exact inverse of
utils/torch_convert.py for all four families (DPRNN / Spe / IRA / RawNet);
frozen tensors the reference carries (the 'att' fusion average conv, the
PreEmphasis flipped filter, the ParamSincFB window/n buffers, BatchNorm
num_batches_tracked, the dead ``bn1``) are synthesized — they are
deterministic functions of the config, not learned state.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x):
    return np.asarray(x).T.copy()


def _conv1x1(kernel):  # Dense kernel [I, O] -> torch conv1d [O, I, 1]
    return np.asarray(kernel).T[:, :, None].copy()


def _norm_names(norm_type: str):
    return ("gamma", "beta") if norm_type == "gLN" else ("weight", "bias")


def _rnn_entries(out, torch_prefix, tree):
    for tag, sfx in (("f", ""), ("b", "_reverse")):
        if f"w_ih_{tag}" not in tree:
            continue
        out[f"{torch_prefix}.weight_ih_l0{sfx}"] = _t(tree[f"w_ih_{tag}"])
        out[f"{torch_prefix}.weight_hh_l0{sfx}"] = _t(tree[f"w_hh_{tag}"])
        out[f"{torch_prefix}.bias_ih_l0{sfx}"] = np.asarray(tree[f"b_ih_{tag}"]).copy()
        out[f"{torch_prefix}.bias_hh_l0{sfx}"] = np.asarray(tree[f"b_hh_{tag}"]).copy()


def _norm_entries(out, torch_prefix, tree, norm_type):
    wname, bname = _norm_names(norm_type)
    out[f"{torch_prefix}.{wname}"] = np.asarray(tree["gamma"]).copy()
    out[f"{torch_prefix}.{bname}"] = np.asarray(tree["beta"]).copy()


def _bn_entries(out, torch_prefix, params_tree, stats_tree):
    out[f"{torch_prefix}.weight"] = np.asarray(params_tree["scale"]).copy()
    out[f"{torch_prefix}.bias"] = np.asarray(params_tree["bias"]).copy()
    out[f"{torch_prefix}.running_mean"] = np.asarray(stats_tree["mean"]).copy()
    out[f"{torch_prefix}.running_var"] = np.asarray(stats_tree["var"]).copy()
    out[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _dense_entries(out, torch_prefix, tree, conv: bool = False):
    out[f"{torch_prefix}.weight"] = _conv1x1(tree["kernel"]) if conv else _t(tree["kernel"])
    if "bias" in tree:
        out[f"{torch_prefix}.bias"] = np.asarray(tree["bias"]).copy()


def _resblock_entries(out, torch_prefix, p, s):
    _dense_entries(out, f"{torch_prefix}.conv1", p["conv1"], conv=True)
    _bn_entries(out, f"{torch_prefix}.batch_norm1", p["batch_norm1"], s["batch_norm1"])
    out[f"{torch_prefix}.prelu1.weight"] = np.asarray(p["prelu1"]["a"]).copy()
    _dense_entries(out, f"{torch_prefix}.conv2", p["conv2"], conv=True)
    _bn_entries(out, f"{torch_prefix}.batch_norm2", p["batch_norm2"], s["batch_norm2"])
    out[f"{torch_prefix}.prelu2.weight"] = np.asarray(p["prelu2"]["a"]).copy()
    if "conv_downsample" in p:
        _dense_entries(out, f"{torch_prefix}.conv_downsample", p["conv_downsample"], conv=True)


def _bn_default(out, torch_prefix, channels: int):
    """Torch-default BatchNorm tensors for modules the reference defines but
    never runs (RawNet3's ``bn1``, RawNet3.py:34) — their checkpoint values
    are untrained noise, so defaults are the faithful export."""
    out[f"{torch_prefix}.weight"] = np.ones(channels, np.float32)
    out[f"{torch_prefix}.bias"] = np.zeros(channels, np.float32)
    out[f"{torch_prefix}.running_mean"] = np.zeros(channels, np.float32)
    out[f"{torch_prefix}.running_var"] = np.ones(channels, np.float32)
    out[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _rawnet_export(out, tp: str, sk, sk_stats, sinc_kernel: int,
                   sample_rate: float) -> None:
    """Inverse of torch_convert._rawnet_entry (reference RawNet3.py:23-70
    module tree). ``tp`` = 'separation.spk_encoder'."""
    # preprocess: PreEmphasis frozen filter (RawNetBasicBlock.py:8-26) +
    # learned InstanceNorm affine
    out[f"{tp}.preprocess.0.flipped_filter"] = np.array([[[-0.97, 1.0]]], np.float32)
    out[f"{tp}.preprocess.1.weight"] = np.asarray(sk["inorm_weight"]).copy()
    out[f"{tp}.preprocess.1.bias"] = np.asarray(sk["inorm_bias"]).copy()
    # ParamSincFB: learnable band params + deterministic buffers
    low = np.asarray(sk["conv1"]["low_hz_"])
    out[f"{tp}.conv1.filterbank.low_hz_"] = low.copy()
    out[f"{tp}.conv1.filterbank.band_hz_"] = np.asarray(sk["conv1"]["band_hz_"]).copy()
    half = sinc_kernel // 2
    out[f"{tp}.conv1.filterbank.window_"] = np.hamming(sinc_kernel)[:half].astype(np.float32)
    out[f"{tp}.conv1.filterbank.n_"] = (
        2.0 * np.pi * np.arange(-half, 0.0, dtype=np.float32) / sample_rate
    ).reshape(1, -1)
    C = 8 * low.shape[0]  # ParamSincFB(C//4 filters) -> C//8 bands
    _bn_default(out, f"{tp}.bn1", C // 4)  # defined-but-unused (RawNet3.py:34)
    for lyr in ("layer1", "layer2", "layer3"):
        lp_t = f"{tp}.{lyr}"
        p = sk[lyr]
        s = sk_stats.get(lyr, {})
        _dense_entries(out, f"{lp_t}.conv1", p["conv1"], conv=True)
        _bn_entries(out, f"{lp_t}.bn1", p["bn1"], s["bn1"])
        i = 0
        while f"convs_{i}_w" in p:
            out[f"{lp_t}.convs.{i}.weight"] = np.asarray(p[f"convs_{i}_w"]).copy()
            out[f"{lp_t}.convs.{i}.bias"] = np.asarray(p[f"convs_{i}_b"]).copy()
            _bn_entries(out, f"{lp_t}.bns.{i}", p[f"bns_{i}"], s[f"bns_{i}"])
            i += 1
        _dense_entries(out, f"{lp_t}.conv3", p["conv3"], conv=True)
        _bn_entries(out, f"{lp_t}.bn3", p["bn3"], s["bn3"])
        if "residual" in p:
            out[f"{lp_t}.residual.0.weight"] = _conv1x1(p["residual"]["kernel"])
        out[f"{lp_t}.afms.alpha"] = np.asarray(p["afms"]["alpha"]).reshape(-1, 1).copy()
        _dense_entries(out, f"{lp_t}.afms.fc", p["afms"]["fc"])
    _dense_entries(out, f"{tp}.layer4", sk["layer4"], conv=True)
    _dense_entries(out, f"{tp}.attention.0", sk["att_conv1"], conv=True)
    _bn_entries(out, f"{tp}.attention.2", sk["att_bn"], sk_stats["att_bn"])
    _dense_entries(out, f"{tp}.attention.3", sk["att_conv2"], conv=True)
    for bn in ("bn5", "bn6"):
        if bn in sk:
            _bn_entries(out, f"{tp}.{bn}", sk[bn], sk_stats[bn])
    _dense_entries(out, f"{tp}.fc6", sk["fc6"])


def export_state_dict(variables: Mapping[str, Any], norm_type: str = "ln",
                      kernel_size: int = 2, fusion_type: str = None,
                      sinc_kernel: int = 251,
                      sinc_sample_rate: float = 16000.0) -> Dict[str, np.ndarray]:
    """flax variables (params [+ batch_stats]) -> reference torch state_dict
    (numpy values; wrap with torch.tensor for torch.save)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sep = params["separation"]
    sep_stats = stats.get("separation", {})
    out: Dict[str, np.ndarray] = {}

    out["encoder.conv1d.weight"] = np.asarray(params["encoder"]["w"]).copy()
    out["decoder.weight"] = np.asarray(params["decoder"]["w"]).copy()

    _norm_entries(out, "separation.bottleneck.0", sep["bottleneck_norm"], norm_type)
    _dense_entries(out, "separation.bottleneck.1", sep["bottleneck_dense"], conv=True)

    core = sep["core"]
    i = 0
    while f"blocks_{i}" in core:
        blk = core[f"blocks_{i}"]
        tp = f"separation.dprnn_blocks.{i}"
        _rnn_entries(out, f"{tp}.intra_rnn.rnn", blk["intra_rnn"])
        _dense_entries(out, f"{tp}.intra_linear", blk["intra_linear"])
        _norm_entries(out, f"{tp}.intra_norm", blk["intra_norm"], norm_type)
        _rnn_entries(out, f"{tp}.inter_rnn.rnn", blk["inter_rnn"])
        _dense_entries(out, f"{tp}.inter_linear", blk["inter_linear"])
        _norm_entries(out, f"{tp}.inter_norm", blk["inter_norm"], norm_type)
        i += 1
    out["separation.prelu.weight"] = np.asarray(core["prelu"]["a"]).copy()
    mk = np.asarray(core["mask_dense"]["kernel"])  # [F, 2F]
    out["separation.conv2d.weight"] = mk.T[:, :, None, None].copy()
    out["separation.conv2d.bias"] = np.asarray(core["mask_dense"]["bias"]).copy()
    _dense_entries(out, "separation.out.0", core["out_dense"], conv=True)
    _dense_entries(out, "separation.gate.0", core["gate_dense"], conv=True)
    out["separation.end_conv1x1.weight"] = _conv1x1(core["end_dense"]["kernel"])

    if "fusion" in sep:
        fz = sep["fusion"]
        for name in ("fusion_linear", "fusion_linear_1", "fusion_linear_2"):
            if name in fz:
                _dense_entries(out, f"separation.{name}", fz[name])
        if fusion_type == "att":
            # 'att' carries the frozen average conv in torch (dprnn_spe.py:100-104)
            N = out["encoder.conv1d.weight"].shape[0]
            out["separation.average.weight"] = np.ones((N, 1, kernel_size), np.float32) / kernel_size
            out["separation.average.bias"] = np.zeros(N, np.float32)

    if "spk_encoder" in sep:
        sk = sep["spk_encoder"]
        sk_stats = sep_stats.get("spk_encoder", {})
        if "norm" not in sk:
            # RawNet3 branch (no GroupNorm head; inorm/conv1/layers tree)
            _rawnet_export(out, "separation.spk_encoder", sk, sk_stats,
                           sinc_kernel, sinc_sample_rate)
            if "pred_linear" in sep:
                _dense_entries(out, "separation.pred_linear", sep["pred_linear"])
            if "aux_linear" in sep:
                _dense_entries(out, "separation.aux_linear", sep["aux_linear"])
            return out
        wname, bname = "weight", "bias"  # spk_encoder[0] is GroupNorm in torch
        out[f"separation.spk_encoder.0.{wname}"] = np.asarray(sk["norm"]["gamma"]).copy()
        out[f"separation.spk_encoder.0.{bname}"] = np.asarray(sk["norm"]["beta"]).copy()
        _dense_entries(out, "separation.spk_encoder.1", sk["conv_in"], conv=True)
        for idx, res in (("2", "res1"), ("3", "res2"), ("4", "res3")):
            _resblock_entries(out, f"separation.spk_encoder.{idx}", sk[res], sk_stats.get(res, {}))
        _dense_entries(out, "separation.spk_encoder.5", sk["conv_out"], conv=True)

    if "pred_linear" in sep:
        _dense_entries(out, "separation.pred_linear", sep["pred_linear"])
    if "aux_linear" in sep:
        _dense_entries(out, "separation.aux_linear", sep["aux_linear"])
    return out
