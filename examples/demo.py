"""Minimal runnable demo (the reference's example.ipynb as a script).

Builds the flagship DPRNN-Spe-TasNet with the published hyperparameters,
loads a checkpoint (reference .pt or our Orbax dir) if given, runs one
separation forward on either a provided mixture/reference WAV pair or a
synthetic two-sine mixture, and writes the separated target to disk.

    python examples/demo.py [--checkpoint path] [--mix m.wav --ref r.wav] \
        [--out target.wav]

CPU-runnable (like the reference notebook): pass JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from tss_dprnn_tpu.data import wav
from tss_dprnn_tpu.models import DPRNNSpeTasNet

PUBLISHED = dict(  # example.ipynb hyperparameters (SURVEY.md §2.1)
    input_size=64, feature_size=128, hidden_size=128, chunk_length=250,
    kernel_size=2, hop_length=125, n_repeats=6, norm_type="ln",
    activation_type="sigmoid", O=128, P=256, embeddings_size=128,
    num_spks=251, fusion_type="att",
)
SR = 8000


def synthetic_pair(seconds=3.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    s1 = 0.5 * np.sin(2 * np.pi * 280 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 2.7 * t))
    s2 = 0.5 * np.sin(2 * np.pi * 523 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 1.9 * t))
    mix = s1 + s2 + 0.01 * rng.standard_normal(len(t))
    ref = 0.5 * np.sin(2 * np.pi * 275 * t + 0.3)  # same "speaker", other utterance
    return mix.astype(np.float32), ref.astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint")
    ap.add_argument("--mix")
    ap.add_argument("--ref")
    ap.add_argument("--out", default="separated_target.wav")
    args = ap.parse_args(argv)

    import jax

    model = DPRNNSpeTasNet(**PUBLISHED)
    if args.mix and args.ref:
        mix, sr = wav.read(args.mix)
        ref, _ = wav.read(args.ref)
        assert sr == SR, f"expected 8 kHz input, got {sr}"
    else:
        print("no --mix/--ref given; using a synthetic two-tone mixture")
        mix, ref = synthetic_pair()

    mix_b = mix[None]
    ref_b = ref[None]
    aux_len = np.array([len(ref)], np.float32)
    if args.checkpoint:
        from tss_dprnn_tpu.utils.checkpoint import load_checkpoint_variables

        target_vars = model.init(jax.random.PRNGKey(0), mix_b, ref_b, aux_len)
        variables = load_checkpoint_variables(args.checkpoint, target_vars)["variables"]
    else:
        print("no --checkpoint given; using random initialization (shape demo only)")
        variables = model.init(jax.random.PRNGKey(0), mix_b, ref_b, aux_len)

    est, logits = jax.jit(model.apply)(variables, mix_b, ref_b, aux_len)
    est = np.asarray(est)[0]
    print(f"separated {len(est) / SR:.2f}s of audio; speaker logits argmax={int(np.argmax(logits))}")
    wav.write(args.out, est, SR)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
