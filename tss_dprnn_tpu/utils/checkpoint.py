"""Orbax checkpointing with the reference's naming/retention semantics.

Reference behavior (src/trainers/trainer.py:82, 288-306): checkpoints are
saved as ``{epoch}_{best|last}`` under ``new_checkpoints_path``; a deque of
``n_checkpoints`` paths evicts oldest-first; warm start loads the ``model``
entry of a checkpoint; inference *requires* a checkpoint. Improvements kept
from SURVEY.md §5: a failed load is a hard error (the reference silently
trains from random init, trainer.py:71-76), and the resume epoch comes from
the checkpoint itself when the config doesn't override it.

Also loads reference ``.pt`` checkpoints directly (torch.load +
utils.torch_convert) so shipped torch weights drop in losslessly.
"""

from __future__ import annotations

import os
import shutil
from collections import deque
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, n_checkpoints: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.queue: deque = deque(maxlen=n_checkpoints)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, epoch: int, best: bool) -> str:
        return os.path.join(self.directory, f"{epoch}_{'best' if best else 'last'}")

    def save(self, epoch: int, state_tree: Dict[str, Any], best: bool = False) -> str:
        """state_tree: plain pytree (params/batch_stats/opt_state/epoch...)."""
        path = self._path(epoch, best)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, state_tree)
        self._ckpt.wait_until_finished()
        if self.queue.maxlen and len(self.queue) == self.queue.maxlen:
            evicted = self.queue[0]
            if os.path.exists(evicted):
                shutil.rmtree(evicted)
        self.queue.append(path)
        return path

    def restore(self, path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        return self._ckpt.restore(os.path.abspath(path), target)


def load_checkpoint_variables(path: str, target_variables=None) -> Dict[str, Any]:
    """Load model variables from either an Orbax directory (ours) or a
    reference torch ``.pt`` file ({'epoch','optimizer','model'},
    reference trainer.py:294-306). Returns {'variables', 'epoch'}."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        ck = ocp.StandardCheckpointer()
        tree = ck.restore(path)
        variables = {"params": tree["params"]}
        if tree.get("batch_stats"):
            variables["batch_stats"] = tree["batch_stats"]
        if target_variables is not None:
            from tss_dprnn_tpu.utils.torch_convert import validate_against

            validate_against(target_variables, variables)  # hard-fail on mismatch
        # optional exact-resume payload (trainer save_optimizer: true)
        extras = {
            k: tree[k]
            for k in ("opt_named", "opt_leaves", "step", "scheduler", "run")
            if k in tree and tree[k] is not None
        }
        return {"variables": variables, "epoch": int(tree.get("epoch", 0)),
                "extras": extras}
    # torch checkpoint
    import torch

    from tss_dprnn_tpu.utils.torch_convert import convert_state_dict, validate_against

    cpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = cpt["model"] if isinstance(cpt, dict) and "model" in cpt else cpt
    variables = convert_state_dict(sd)
    if target_variables is not None:
        validate_against(target_variables, variables)  # hard-fail on mismatch
    epoch = int(cpt.get("epoch", 0)) if isinstance(cpt, dict) else 0
    return {"variables": variables, "epoch": epoch}


def to_pure_tree(x) -> Any:
    """Device arrays -> host numpy (for orbax save)."""
    return jax.tree.map(lambda a: np.asarray(a), x)
