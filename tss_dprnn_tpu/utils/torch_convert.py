"""Lossless PyTorch ``state_dict`` -> flax variables converter.

Keyed to the exact parameter naming of the reference checkpoints
(``torch.save({'epoch', 'optimizer', 'model'})``, reference
src/trainers/trainer.py:294-306) for all 8 model variants (SURVEY.md §2.1):

    encoder.conv1d.weight                         -> params/encoder/w
    separation.bottleneck.0.{gamma,beta|weight,bias} -> .../bottleneck_norm
    separation.bottleneck.1.{weight,bias}          -> .../bottleneck_dense
    separation.dprnn_blocks.{i}.intra_rnn.rnn.*    -> .../core/blocks_{i}/intra_rnn/*
    ... (full table in _RULES below)

Layout conventions: torch Linear/1x1-conv weights transpose into Dense
kernels; Conv1d/ConvTranspose1d waveform kernels keep the torch layout (our
ops consume them natively); LSTM weights transpose to [F, 4H] with torch
(i, f, g, o) gate order preserved; BatchNorm running stats land in the
``batch_stats`` collection. Frozen/non-tensors (the 'att' fusion's average
conv, PreEmphasis buffer, num_batches_tracked) are skipped.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

Path = Tuple[str, ...]


def _t(x):  # torch Linear/1x1 weight -> Dense kernel
    return np.asarray(x).T.copy()


def _conv1x1(x):  # [O, I, 1] -> [I, O]
    x = np.asarray(x)
    return x[:, :, 0].T.copy()


def _conv1x1_2d(x):  # [O, I, 1, 1] -> [I, O]
    x = np.asarray(x)
    return x[:, :, 0, 0].T.copy()


def _id(x):
    return np.asarray(x).copy()


def _squeeze1(x):  # [C, 1] -> [C]
    return np.asarray(x).reshape(-1).copy()


_SKIP = re.compile(
    r"(num_batches_tracked$)|(\baverage\.)|(preprocess\.0\.)|(\bconv1\.filterbank\.window_)|(\bconv1\.filterbank\.n_)"
)


def _norm_param(name: str) -> str:
    # GlobLN stores gamma/beta, GroupNorm weight/bias — both -> gamma/beta
    return {"weight": "gamma", "bias": "beta", "gamma": "gamma", "beta": "beta"}[name]


def _lstm_rule(prefix: Path, rest: str, value):
    """rest like 'weight_ih_l0' / 'bias_hh_l0_reverse' (reference SingleRNN's
    nn.LSTM/GRU/RNN, dprnn.py:23-28)."""
    m = re.fullmatch(r"(weight|bias)_(ih|hh)_l0(_reverse)?", rest)
    if not m:
        raise KeyError(rest)
    kind, which, rev = m.groups()
    tag = "b" if rev else "f"
    if kind == "weight":
        return ("params", prefix + (f"w_{which}_{tag}",), _t(value))
    return ("params", prefix + (f"b_{which}_{tag}",), _id(value))


def _bn_rule(prefix: Path, rest: str, value):
    """torch BatchNorm1d tensors -> our BatchNorm params/batch_stats."""
    table = {
        "weight": ("params", "scale", _id),
        "bias": ("params", "bias", _id),
        "running_mean": ("batch_stats", "mean", _id),
        "running_var": ("batch_stats", "var", _id),
    }
    coll, leaf, fn = table[rest]
    return (coll, prefix + (leaf,), fn(value))


def _resblock_entry(res_path: Path, rest: str, value):
    """reference ResBlock children (dprnn_spe.py:16-29)."""
    part, _, leaf = rest.partition(".")
    if part in ("conv1", "conv2", "conv_downsample"):
        return ("params", res_path + (part, "kernel"), _conv1x1(value))
    if part in ("batch_norm1", "batch_norm2"):
        return _bn_rule(res_path + (part,), leaf, value)
    if part in ("prelu1", "prelu2"):
        return ("params", res_path + (part, "a"), _id(value))
    raise KeyError(rest)


def _rawnet_entry(base: Path, rest: str, value):
    """RawNet3 spk_encoder children (reference RawNet3.py:23-70)."""
    if rest.startswith("preprocess.1."):
        leaf = rest.rsplit(".", 1)[1]
        name = {"weight": "inorm_weight", "bias": "inorm_bias"}[leaf]
        return ("params", base + (name,), _id(value))
    if rest.startswith("conv1.filterbank."):
        leaf = rest.rsplit(".", 1)[1]  # low_hz_ / band_hz_
        return ("params", base + ("conv1", leaf), _id(value))
    if re.fullmatch(r"bn1\..+", rest):
        return None  # defined but unused in the reference forward (RawNet3.py:34)
    m = re.fullmatch(r"layer([123])\.(.+)", rest)
    if m:
        lyr, sub = m.groups()
        lp = base + (f"layer{lyr}",)
        for cname in ("conv1", "conv3"):
            if sub.startswith(cname + "."):
                leaf = sub.rsplit(".", 1)[1]
                return ("params", lp + (cname, "kernel" if leaf == "weight" else "bias"),
                        _conv1x1(value) if leaf == "weight" else _id(value))
        m2 = re.fullmatch(r"convs\.(\d+)\.(weight|bias)", sub)
        if m2:
            i, leaf = m2.groups()
            if leaf == "weight":
                return ("params", lp + (f"convs_{i}_w",), _id(value))  # keep [O, I, K]
            return ("params", lp + (f"convs_{i}_b",), _id(value))
        m2 = re.fullmatch(r"(bn[13]|bns\.(\d+))\.(.+)", sub)
        if m2:
            head = m2.group(1)
            name = head if head.startswith("bn") and "." not in head else head
            if name.startswith("bns."):
                name = f"bns_{m2.group(2)}"
            name = name.replace("bns.", "bns_")
            return _bn_rule(lp + (name,), m2.group(3), value)
        if sub == "afms.alpha":
            return ("params", lp + ("afms", "alpha"), _squeeze1(value))
        m2 = re.fullmatch(r"afms\.fc\.(weight|bias)", sub)
        if m2:
            leaf = m2.group(1)
            return ("params", lp + ("afms", "fc", "kernel" if leaf == "weight" else "bias"),
                    _t(value) if leaf == "weight" else _id(value))
        m2 = re.fullmatch(r"residual\.0\.weight", sub)
        if m2:
            return ("params", lp + ("residual", "kernel"), _conv1x1(value))
        raise KeyError(rest)
    m = re.fullmatch(r"layer4\.(weight|bias)", rest)
    if m:
        leaf = m.group(1)
        return ("params", base + ("layer4", "kernel" if leaf == "weight" else "bias"),
                _conv1x1(value) if leaf == "weight" else _id(value))
    m = re.fullmatch(r"attention\.([023])\.(.+)", rest)
    if m:
        idx, sub = m.groups()
        if idx == "0":
            return ("params", base + ("att_conv1", "kernel" if sub == "weight" else "bias"),
                    _conv1x1(value) if sub == "weight" else _id(value))
        if idx == "2":
            return _bn_rule(base + ("att_bn",), sub, value)
        return ("params", base + ("att_conv2", "kernel" if sub == "weight" else "bias"),
                _conv1x1(value) if sub == "weight" else _id(value))
    m = re.fullmatch(r"(bn5|bn6)\.(.+)", rest)
    if m:
        return _bn_rule(base + (m.group(1),), m.group(2), value)
    m = re.fullmatch(r"fc6\.(weight|bias)", rest)
    if m:
        leaf = m.group(1)
        return ("params", base + ("fc6", "kernel" if leaf == "weight" else "bias"),
                _t(value) if leaf == "weight" else _id(value))
    raise KeyError(rest)


def _convert_one(key: str, value) -> Tuple[str, Path, np.ndarray]:
    """One torch state_dict entry -> (collection, flax path, array)."""
    if key == "encoder.conv1d.weight":
        return ("params", ("encoder", "w"), _id(value))
    if key == "decoder.weight":
        return ("params", ("decoder", "w"), _id(value))
    if not key.startswith("separation."):
        raise KeyError(key)
    rest = key[len("separation.") :]
    sep: Path = ("separation",)

    m = re.fullmatch(r"bottleneck\.0\.(weight|bias|gamma|beta)", rest)
    if m:
        return ("params", sep + ("bottleneck_norm", _norm_param(m.group(1))), _id(value))
    m = re.fullmatch(r"bottleneck\.1\.(weight|bias)", rest)
    if m:
        leaf = m.group(1)
        return ("params", sep + ("bottleneck_dense", "kernel" if leaf == "weight" else "bias"),
                _conv1x1(value) if leaf == "weight" else _id(value))

    m = re.fullmatch(r"dprnn_blocks\.(\d+)\.(.+)", rest)
    if m:
        i, sub = m.groups()
        bp = sep + ("core", f"blocks_{i}")
        m2 = re.fullmatch(r"(intra|inter)_rnn\.rnn\.(.+)", sub)
        if m2:
            side, lstm_key = m2.groups()
            return _lstm_rule(bp + (f"{side}_rnn",), lstm_key, value)
        m2 = re.fullmatch(r"(intra|inter)_linear\.(weight|bias)", sub)
        if m2:
            side, leaf = m2.groups()
            return ("params", bp + (f"{side}_linear", "kernel" if leaf == "weight" else "bias"),
                    _t(value) if leaf == "weight" else _id(value))
        m2 = re.fullmatch(r"(intra|inter)_norm\.(weight|bias|gamma|beta)", sub)
        if m2:
            side, leaf = m2.groups()
            return ("params", bp + (f"{side}_norm", _norm_param(leaf)), _id(value))
        raise KeyError(key)

    if rest == "prelu.weight":
        return ("params", sep + ("core", "prelu", "a"), _id(value))
    m = re.fullmatch(r"conv2d\.(weight|bias)", rest)
    if m:
        leaf = m.group(1)
        return ("params", sep + ("core", "mask_dense", "kernel" if leaf == "weight" else "bias"),
                _conv1x1_2d(value) if leaf == "weight" else _id(value))
    m = re.fullmatch(r"(out|gate)\.0\.(weight|bias)", rest)
    if m:
        which, leaf = m.groups()
        return ("params", sep + ("core", f"{which}_dense", "kernel" if leaf == "weight" else "bias"),
                _conv1x1(value) if leaf == "weight" else _id(value))
    if rest == "end_conv1x1.weight":
        return ("params", sep + ("core", "end_dense", "kernel"), _conv1x1(value))

    # --- Spe additions (dprnn_spe.py:88-123) ---
    m = re.fullmatch(r"(fusion_linear(?:_[12])?)\.(weight|bias)", rest)
    if m:
        name, leaf = m.groups()
        return ("params", sep + ("fusion", name, "kernel" if leaf == "weight" else "bias"),
                _t(value) if leaf == "weight" else _id(value))
    m = re.fullmatch(r"pred_linear\.(weight|bias)", rest)
    if m:
        leaf = m.group(1)
        return ("params", sep + ("pred_linear", "kernel" if leaf == "weight" else "bias"),
                _t(value) if leaf == "weight" else _id(value))
    m = re.fullmatch(r"aux_linear\.(weight|bias)", rest)
    if m:
        leaf = m.group(1)
        return ("params", sep + ("aux_linear", "kernel" if leaf == "weight" else "bias"),
                _t(value) if leaf == "weight" else _id(value))

    if rest.startswith("spk_encoder."):
        sub = rest[len("spk_encoder.") :]
        base = sep + ("spk_encoder",)
        # ResNet speaker encoder (Sequential indices, dprnn_spe.py:115-122)
        m = re.fullmatch(r"0\.(weight|bias)", sub)
        if m:
            return ("params", base + ("norm", _norm_param(m.group(1))), _id(value))
        m = re.fullmatch(r"1\.(weight|bias)", sub)
        if m:
            leaf = m.group(1)
            return ("params", base + ("conv_in", "kernel" if leaf == "weight" else "bias"),
                    _conv1x1(value) if leaf == "weight" else _id(value))
        m = re.fullmatch(r"([234])\.(.+)", sub)
        if m:
            idx, leaf = m.groups()
            res = {"2": "res1", "3": "res2", "4": "res3"}[idx]
            return _resblock_entry(base + (res,), leaf, value)
        m = re.fullmatch(r"5\.(weight|bias)", sub)
        if m:
            leaf = m.group(1)
            return ("params", base + ("conv_out", "kernel" if leaf == "weight" else "bias"),
                    _conv1x1(value) if leaf == "weight" else _id(value))
        # RawNet3 speaker encoder
        return _rawnet_entry(base, sub, value)

    raise KeyError(key)


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference torch ``state_dict`` (tensors or numpy) -> flax variables
    dict ``{'params': ..., 'batch_stats': ...}`` (batch_stats only if BN
    tensors are present)."""
    out: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if _SKIP.search(key):
            continue
        if hasattr(value, "detach"):  # torch tensor without importing torch
            value = value.detach().cpu().numpy()
        try:
            entry = _convert_one(key, value)
        except KeyError as e:
            raise KeyError(f"don't know how to convert checkpoint entry {key!r}") from e
        if entry is None:
            continue
        coll, path, arr = entry
        node = out.setdefault(coll, {})
        for part in path[:-1]:
            node = node.setdefault(part, {})
        if path[-1] in node:
            raise ValueError(f"duplicate conversion target for {key!r}")
        node[path[-1]] = arr
    return out


def validate_against(variables, converted) -> None:
    """Check the converted tree is shape-exact vs a model-initialized tree
    (raises with a readable diff otherwise)."""
    def flatten(tree, prefix=()):
        flat = {}
        for k, v in dict(tree).items():
            if isinstance(v, Mapping):
                flat.update(flatten(v, prefix + (k,)))
            else:
                flat[prefix + (k,)] = tuple(np.shape(v))
        return flat

    a = flatten(variables)
    b = flatten(converted)
    missing = sorted(set(a) - set(b))
    extra = sorted(set(b) - set(a))
    mismatched = sorted(p for p in set(a) & set(b) if a[p] != b[p])
    problems = []
    if missing:
        problems.append(f"missing in checkpoint: {missing[:8]}{'...' if len(missing) > 8 else ''}")
    if extra:
        problems.append(f"unexpected in checkpoint: {extra[:8]}{'...' if len(extra) > 8 else ''}")
    if mismatched:
        problems.append(
            "shape mismatches: "
            + ", ".join(f"{p}: model {a[p]} vs ckpt {b[p]}" for p in mismatched[:8])
        )
    if problems:
        raise ValueError("; ".join(problems))
