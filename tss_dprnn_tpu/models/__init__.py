"""Model zoo (L1-L2): the 8 reference variants, TPU-native.

Reference classes (SURVEY.md §2.1):
- ``DPRNNTasNet``        — BSS           (src/models/dprnn.py:219)
- ``DPRNNSpeTasNet``     — TSS, 5 fusions (src/models/dprnn_spe.py:250)
- ``DPRNNSpeIRATasNet``  — 2-pass TSS    (src/models/dprnn_spe_ira.py:117)
- ``DPRNNRawNetTasNet``  — RawNet3 TSS   (src/models/dprnn_rawnet.py:107)
"""

from tss_dprnn_tpu.models.dprnn import DPRNN, DPRNNBlock, DPRNNTasNet  # noqa: F401
from tss_dprnn_tpu.models.dprnn_spe import DPRNNSpe, DPRNNSpeTasNet, ResBlock  # noqa: F401
from tss_dprnn_tpu.models.dprnn_spe_ira import DPRNNSpeIRA, DPRNNSpeIRATasNet  # noqa: F401
from tss_dprnn_tpu.models.dprnn_rawnet import DPRNNRawNet, DPRNNRawNetTasNet  # noqa: F401
from tss_dprnn_tpu.models.registry import MODEL_REGISTRY, build_model  # noqa: F401
