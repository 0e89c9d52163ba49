"""Inference/eval layer (L4') — reference src/inferencers/.

The reference evaluates one utterance at a time, eagerly, with a fresh shape
every item (inferencer.py:48-78). Here full-test-set evaluation is *batched
and bucketed*: utterances group into a few static padded shapes, the forward
jits once per bucket, and per-utterance metrics are computed on host from the
exact-length slices (masked forward == exact forward, tests/test_masked_eval).
"""

from tss_dprnn_tpu.inference.inferencer import Inferencer  # noqa: F401
from tss_dprnn_tpu.inference.inferencer_spe import InferencerSpe  # noqa: F401
from tss_dprnn_tpu.inference.inferencer_rawnet import InferencerRawNet  # noqa: F401
from tss_dprnn_tpu.inference.export import (  # noqa: F401
    ServingModel,
    export_separation,
    load_artifact,
    save_artifact,
)
from tss_dprnn_tpu.inference.long_audio import (  # noqa: F401
    WindowedSeparator,
    bss_windowed,
    spe_windowed,
)
