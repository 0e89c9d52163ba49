"""Training layer (L4): jitted SPMD train/eval steps + epoch orchestration.

Replaces the reference trainers (src/trainers/trainer.py:16-306,
trainer_spe.py, trainer_rawnet.py): same epoch/best-loss/early-stop/rolling
checkpoint semantics, but each optimization step is one compiled XLA program
(loss + grads + clip + Adam update fused on device, batch sharded over the
mesh's ``data`` axis) instead of an eager torch loop.
"""

from tss_dprnn_tpu.training.schedulers import ExponentialDecay, ReduceLROnPlateau  # noqa: F401
from tss_dprnn_tpu.training.train_state import TrainState, make_optimizer  # noqa: F401
from tss_dprnn_tpu.training.trainer import Trainer  # noqa: F401
from tss_dprnn_tpu.training.trainer_spe import TrainerSpe  # noqa: F401
from tss_dprnn_tpu.training.trainer_rawnet import TrainerRawNet  # noqa: F401
