"""Single config system (YAML -> dict with dotted overrides).

Replaces the reference's fragile Hydra + argparse double parse (train.py:29-35,
test.py:29-35 — SURVEY.md §5.6): one YAML file, a ``--mode`` flag, and
``key.path=value`` overrides. Reference YAML configs port unchanged: the
model section's Hydra ``_target_`` is resolved by models.registry, and the
optimizer section's ``_target_`` is ignored in favor of its lr/weight_decay.
"""

from __future__ import annotations

import copy
import re
from typing import Any, Dict, List, Optional

import yaml


def load_config(path: str, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    with open(path) as f:
        config = yaml.safe_load(f) or {}
    for item in overrides or []:
        key, _, raw = item.partition("=")
        set_by_path(config, key.strip(), _parse_override(raw))
    apply_jax_settings(config)
    return config


_SCI_FLOAT = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)[eE][+-]?\d+$")


def _parse_override(raw: str) -> Any:
    """YAML-parse an override value, patching YAML 1.1's one numeric gap:
    bare scientific notation (``--set lr=5e-4``) parses as a STRING because
    YAML 1.1 floats require a dot. Only that exact shape is coerced —
    blanket int()/float() fallback would mangle intentional strings
    (``name=007`` -> 7, and int() accepts underscores: ``tag=1_2`` -> 12)."""
    value = yaml.safe_load(raw)
    if isinstance(value, str) and _SCI_FLOAT.match(value):
        return float(value)
    return value


DEFAULT_COMPILE_CACHE = "~/.cache/tss_dprnn_tpu_xla"


def apply_jax_settings(config: Dict[str, Any]) -> None:
    """Optional top-level ``jax:`` section: persistent compilation cache and
    platform pinning.

        jax:
          compilation_cache_dir: /path   # or null to disable
          platforms: tpu                 # optional override

    The compilation cache is ON BY DEFAULT (``~/.cache/tss_dprnn_tpu_xla``):
    XLA compiles of the flagship graphs take 30-120 s per bucket shape (a
    cold 48-utterance eval CLI run spends most of its wall-clock compiling
    4 bucket shapes), and the persistent cache makes warm runs skip them on
    standard hosts and on the CPU mesh. Caveat (measured 2026-08-19): through
    a remote-compile relay (the axon dev tunnel) the cache does NOT shortcut
    compilation — compiles happen relay-side — and adds serialization
    overhead; set ``jax.compilation_cache_dir: null`` there."""
    import os

    jc = config.get("jax") or {}
    cache_dir = jc.get("compilation_cache_dir", DEFAULT_COMPILE_CACHE)
    if not (cache_dir or jc.get("platforms") or jc.get("distributed")):
        return  # nothing to set — don't pay the jax import (pure-data CLIs)

    import jax

    if cache_dir:
        cache_dir = os.path.expanduser(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jc.get("platforms"):
        jax.config.update("jax_platforms", str(jc["platforms"]))
    if jc.get("distributed"):
        # Multi-host bring-up (TPU pod / multi-slice): one call per host
        # BEFORE any device use; afterwards jax.devices() spans all hosts,
        # the trainer's default mesh covers them, and TrainLoader slices each
        # global batch per process (data/loader.py lockstep-SPMD semantics).
        #   jax:
        #     distributed: true                  # auto-detect on Cloud TPU
        #     coordinator_address: host:port    # explicit (non-TPU clusters)
        #     num_processes: 4
        #     process_id: 0
        from tss_dprnn_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=jc.get("coordinator_address"),
            num_processes=jc.get("num_processes"),
            process_id=jc.get("process_id"),
        )


def set_by_path(config: Dict[str, Any], dotted: str, value: Any) -> None:
    node = config
    parts = dotted.split(".")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def merged(base: Dict[str, Any], extra: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                rec(dst[k], v)
            else:
                dst[k] = v

    rec(out, extra)
    return out


def model_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """The model section, normalized for models.registry.build_model."""
    mc = dict(config.get("model") or {})
    if "_target_" in mc and "target" not in mc:
        mc["target"] = mc.pop("_target_")
    return mc


def optimizer_config(config: Dict[str, Any]) -> Dict[str, Any]:
    oc = dict(config.get("optimizer") or {})
    oc.pop("_target_", None)  # torch class path in reference configs
    return oc
