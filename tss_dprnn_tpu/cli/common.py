"""Shared CLI plumbing: mode dispatch (the reference's ``import_classes``,
scripts/train/train.py:11-27) and dataset/loader construction from config."""

from __future__ import annotations

from typing import Any, Dict

from tss_dprnn_tpu.data.librimix import Librimix, LibrimixSpe
from tss_dprnn_tpu.data.loader import collate_bss, collate_spe
from tss_dprnn_tpu.utils.logging_util import get_logger

MODES = ("bss", "tss_spe", "tss_rawnet")


def dataset_for(config: Dict[str, Any], split: str, spe: bool):
    """split: 'train' | 'eval' | 'test'. Uses a frozen manifest when
    ``data.use_generated_<split>`` is set (the reference's pickle slot,
    librimix.py:146-148), else builds from ``data.<split>_path`` CSV."""
    data = config["data"]
    cls = LibrimixSpe if spe else Librimix
    cache_wav = bool(data.get("cache_wav", False))
    manifest_path = data.get(f"use_generated_{split}")
    if manifest_path:
        if str(manifest_path).endswith(".pkl"):
            # the reference's pickled Dataset artifacts load directly
            from tss_dprnn_tpu.data.reference_compat import load_reference_pickle

            manifest = load_reference_pickle(
                manifest_path, path_prefix=data.get("path_prefix")
            )
            return cls(manifest=manifest, cache_wav=cache_wav)
        return cls(manifest_path=manifest_path, cache_wav=cache_wav)
    csv_path = data.get(f"{split}_path")
    if not csv_path:
        raise ValueError(f"config.data needs use_generated_{split} or {split}_path")
    return cls(
        csv_path=csv_path,
        sample_rate=data.get("sample_rate", 8000),
        n_src=data.get("n_src", 2),
        nrows=data.get(f"nrows_{split}"),
        segment=data.get("segment") if split != "test" else None,
        seed=data.get("seed", 0),
        cache_wav=cache_wav,
    )


def train_components(mode: str):
    """(spe?, collate_fn, TrainerClass) for a mode."""
    from tss_dprnn_tpu.training import Trainer, TrainerRawNet, TrainerSpe

    if mode == "bss":
        return False, collate_bss, Trainer
    if mode == "tss_spe":
        return True, collate_spe, TrainerSpe
    if mode == "tss_rawnet":
        def collate_rawnet(items):
            return collate_spe(items, resample_ref_to=16000)

        return True, collate_rawnet, TrainerRawNet
    raise ValueError(f"Invalid mode: {mode} (choose from {MODES})")


def inference_components(mode: str):
    from tss_dprnn_tpu.inference import Inferencer, InferencerRawNet, InferencerSpe

    if mode == "bss":
        return False, Inferencer
    if mode == "tss_spe":
        return True, InferencerSpe
    if mode == "tss_rawnet":
        return True, InferencerRawNet
    raise ValueError(f"Invalid mode: {mode} (choose from {MODES})")


def eval_mixtures_from(config, eval_set, spe: bool, logger=None):
    """Demo fixtures for the reporter (reference train.py:51-75)."""
    logger = logger or get_logger("cli")
    ids = ((config.get("logs") or {}).get("metadata") or {}).get("ids") or []
    mixtures = {}
    for id_ in ids:
        if id_ >= len(eval_set):
            logger.info("Mixture id is out of bound (len of eval_set is %d)!", len(eval_set))
            raise ValueError(f"eval mixture id {id_} out of bounds")
        if spe:
            mix, target, reference, _ = eval_set[id_]
            mixtures[id_] = {"mix": mix, "target": target, "reference": reference}
        else:
            mix, sources = eval_set[id_]
            mixtures[id_] = {"mix": mix, "s1_target": sources[0], "s2_target": sources[1]}
    return mixtures
