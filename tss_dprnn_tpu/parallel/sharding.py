"""Sharding rules: params + batches -> NamedShardings over the mesh.

Data parallelism: batch arrays shard axis 0 over ``data``; params replicate.
Optional tensor parallelism (``model`` axis > 1): the wide gate/mask
projections shard their output dimension; GSPMD inserts the all-gathers /
reduce-scatters. Rules are path-regex -> PartitionSpec so new model families
inherit sensible defaults without touching the trainer.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec applied to the *last* dims of the array)
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    # LSTM input/hidden projections: shard the fused 4H gate dim
    (r".*(w_ih|w_hh)_[fb]$", P(None, "model")),
    (r".*b_(ih|hh)_[fb]$", P("model")),
    # wide 1x1 heads
    (r".*mask_dense/kernel$", P(None, "model")),
    (r".*(out|gate)_dense/kernel$", P(None, "model")),
    (r".*(intra|inter)_linear/kernel$", P("model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(variables, mesh: Mesh, tp_rules: Optional[List[Tuple[str, P]]] = None):
    """Pytree of NamedShardings matching ``variables``. With a size-1 model
    axis everything is effectively replicated."""
    use_tp = mesh.shape.get("model", 1) > 1
    rules = DEFAULT_TP_RULES if tp_rules is None else tp_rules

    def assign(path, leaf):
        if use_tp:
            ps = _path_str(path)
            for pat, spec in rules:
                if re.fullmatch(pat, ps):
                    if len(spec) <= leaf.ndim:
                        full = P(*([None] * (leaf.ndim - len(spec)) + list(spec)))
                        return NamedSharding(mesh, full)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, variables)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Axis-0 data sharding for a rank-``ndim`` batch array."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh):
    """device_put a dict/pytree of numpy batch arrays with axis-0 sharded
    over ``data`` (scalars and rank-0 leaves replicate).

    Cross-host assembly happens only when ``mesh`` itself spans processes
    (training's global mesh): each host passes only its LOCAL rows (the
    per-host slice TrainLoader yields, SURVEY.md §5.8) and
    ``jax.make_array_from_process_local_data`` assembles the global
    [B_global, ...] array. A host-local mesh (multi-host EVAL, where
    BucketedEvalLoader gives each host disjoint whole batches and loops
    host-locally with no collectives) takes the plain device_put path even
    when other processes exist."""
    multihost = jax.process_count() > 1 and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )

    def put(leaf):
        import numpy as np

        arr = np.asarray(leaf)
        if arr.ndim == 0:
            return jax.device_put(arr, replicated(mesh))
        sharding = batch_sharding(mesh, arr.ndim)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(put, batch)
