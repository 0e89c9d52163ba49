"""SPMD scaling layer: device mesh + sharding rules.

The reference trains single-process single-GPU (SURVEY.md §2.3: no DDP/NCCL
anywhere); here scaling is a first-class axis of the design — jitted step
functions are written once and run identically on 1 chip or N chips because
parallelism is expressed as ``jax.sharding`` annotations over a ``Mesh``
(XLA inserts the ICI collectives), never as per-process communication calls.
"""

from tss_dprnn_tpu.parallel.mesh import initialize_distributed, make_mesh  # noqa: F401
from tss_dprnn_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)
