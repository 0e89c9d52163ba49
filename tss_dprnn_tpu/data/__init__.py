"""Host input pipeline (L3): WAV I/O, frozen dataset manifests, datasets and
device-feeding loaders.

Replaces the reference's soundfile + pandas + torch DataLoader stack
(src/datasets/librimix.py, librimix_spe.py) and its pickled-Dataset freezing
(scripts/helpers/generate_datasets.py) with:

- ``wav``        — numpy RIFF reader/writer with partial reads (soundfile is
                   not part of this image's stack);
- ``manifest``   — CSV -> frozen JSON manifests (crops, speaker map,
                   same-speaker reference picks) — the reproducibility
                   interface the reference implements with .pkl files;
- ``librimix``   — Librimix / LibrimixSpe datasets over manifests or CSVs;
- ``loader``     — shuffled fixed-shape train batches and length-bucketed
                   eval batches that keep jitted shapes static;
- ``resample``   — windowed-sinc polyphase resampling (8 kHz -> 16 kHz for
                   the RawNet reference branch, torchaudio-style).
"""

from tss_dprnn_tpu.data import librimix, loader, manifest, resample, wav  # noqa: F401
