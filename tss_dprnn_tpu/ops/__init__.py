"""Pure-function TPU kernels (the L0 layer).

Replaces the implicit cuDNN/torch kernels of the reference
(src/models/norms.py, encoder_decoder.py, dprnn.py:189-217 fold/unfold,
nn.LSTM) with XLA-native implementations designed for the MXU/VPU:

- ``norms``     — z-norm / global layer norm / channelwise LN, mask-aware.
- ``conv``      — 1-D conv & transposed conv wrappers over ``lax.conv``.
- ``chunking``  — segmentation / overlap-add as reshapes (no gather/scatter).
- ``rnn``       — bidirectional LSTM: both directions fused into one lax.scan.
- ``losses``    — SI-SDR, pairwise matrices, PIT resolution, CE.
- ``fusion``    — the five speaker-fusion ops (add/att/cat/mul/FiLM).
- ``masking``   — length-mask helpers shared by the above.
"""

from tss_dprnn_tpu.ops import chunking, conv, fusion, losses, masking, norms, rnn  # noqa: F401
