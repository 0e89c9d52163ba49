"""tss_dprnn_tpu — TPU-native speech separation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``Aleksashka-i/tss-with-dprnn`` reference (blind + target speech separation on
Libri2Mix with DPRNN-TasNet and its Spe / Spe-IRA / RawNet3 variants), designed
TPU-first:

- all compute-path kernels are XLA/Pallas (fused bidirectional LSTM scans,
  reshape-only chunk segmentation / overlap-add, masked global layer norms),
- jitted, bucketed, batch inference replaces the reference's per-utterance
  Python loop,
- scaling is expressed with ``jax.sharding`` over a device ``Mesh`` (data /
  model axes), not per-process communication calls,
- checkpointing is Orbax with best/last + rolling-retention semantics, plus a
  lossless PyTorch ``state_dict`` converter for the reference checkpoints.

Reference layer map: see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"

_MODEL_EXPORTS = (
    "DPRNNTasNet",
    "DPRNNSpeTasNet",
    "DPRNNSpeIRATasNet",
    "DPRNNRawNetTasNet",
)


def __getattr__(name):
    # lazy: importing the package must not pull in flax/model code
    if name in _MODEL_EXPORTS:
        import tss_dprnn_tpu.models as models

        return getattr(models, name)
    raise AttributeError(name)
