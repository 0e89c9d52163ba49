"""Device mesh construction.

Axes:
- ``data``  — batch data parallelism (the one that pays for these models:
  ~10-60 MB of params vs large activations, SURVEY.md §2.3);
- ``model`` — optional tensor parallelism over the LSTM/Dense hidden
  dimension (plumbing in sharding.py; size 1 by default).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host / multi-slice bring-up: one call per host before any device
    use (``jax.distributed.initialize``). On Cloud TPU the arguments
    auto-detect from the environment; afterwards ``jax.devices()`` spans all
    hosts and :func:`make_mesh` lays the global mesh out with ICI inside a
    slice and DCN across slices (jax device ordering is ICI-major). The
    reference has no distributed path at all (SURVEY.md §2.3); this is the
    capability-superset hook."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over available devices with axes ('data', 'model').

    Defaults to all devices on the data axis. ``data * model`` must divide
    the device count evenly (extra devices are dropped with the same
    ordering jax.devices() gives, which follows ICI locality).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    use = data * model
    if use > n:
        raise ValueError(f"mesh {data}x{model} needs {use} devices, have {n}")
    arr = np.array(devices[:use]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
