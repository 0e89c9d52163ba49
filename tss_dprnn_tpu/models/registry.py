"""Model registry: config-string -> model class (replaces the reference's
Hydra ``_target_`` instantiation, scripts/train/train.py:85 /
scripts/test/test.py:58). Accepts both our short names and the reference's
fully-qualified torch targets so reference YAML configs port unchanged.
"""

from __future__ import annotations

from typing import Any, Dict

from tss_dprnn_tpu.models.dprnn import DPRNNTasNet
from tss_dprnn_tpu.models.dprnn_rawnet import DPRNNRawNetTasNet
from tss_dprnn_tpu.models.dprnn_spe import DPRNNSpeTasNet
from tss_dprnn_tpu.models.dprnn_spe_ira import DPRNNSpeIRATasNet

MODEL_REGISTRY = {
    "dprnn_tasnet": DPRNNTasNet,
    "dprnn_spe_tasnet": DPRNNSpeTasNet,
    "dprnn_spe_ira_tasnet": DPRNNSpeIRATasNet,
    "dprnn_rawnet_tasnet": DPRNNRawNetTasNet,
    # reference Hydra targets (config_bss.yaml:15 / config_tss.yaml:17 ...)
    "src.models.dprnn.DPRNNTasNet": DPRNNTasNet,
    "src.models.dprnn_spe.DPRNNSpeTasNet": DPRNNSpeTasNet,
    "src.models.dprnn_spe_ira.DPRNNSpeIRATasNet": DPRNNSpeIRATasNet,
    "src.models.dprnn_rawnet.DPRNNRawNetTasNet": DPRNNRawNetTasNet,
}


def build_model(model_config: Dict[str, Any]):
    """Instantiate a model from a config dict with a ``target`` (or Hydra
    ``_target_``) key; remaining keys are constructor kwargs."""
    cfg = dict(model_config)
    target = cfg.pop("target", None) or cfg.pop("_target_", None)
    if target is None:
        raise ValueError("model config needs a 'target' (or '_target_') key")
    if target not in MODEL_REGISTRY:
        raise ValueError(f"unknown model target {target!r}; known: {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[target]
    if isinstance(cfg.get("dtype"), str):  # YAML configs say e.g. dtype: bfloat16
        import jax.numpy as jnp

        cfg["dtype"] = jnp.dtype(cfg["dtype"]).type
    return cls(**cfg)
