"""Synthetic LibriMix-style fixtures: WAV files + metadata CSV matching the
reference's on-disk layout (mixture/source file naming
``<spk>-<chap>-<utt>_<spk>-<chap>-<utt>.wav``, CSV columns mixture_ID,
mixture_path, source_*_path, length). Used in place of the Zenodo
MiniLibriMix download (zero-egress test environment)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from tss_dprnn_tpu.data import wav

SR = 8000


def make_mini_librimix(root, n_mix=8, n_speakers=4, min_sec=2.0, max_sec=4.0,
                       seed=0, n_src=2, noisy=False, sample_rate=SR):
    """Creates wavs + mixture CSV under ``root``; returns csv_path.

    ``n_src=3`` emits a Libri3Mix-style corpus: three-speaker mixture stems
    (``u1_u2_u3``), an ``s3`` source dir, and a ``source_3_path`` CSV column
    (the layout the reference evaluated for its published Libri3Mix row,
    metrics/dprnn-spe/final_metrics_attention_libri3mix.json).

    ``noisy=True`` emits a LibriMix ``mix_both`` corpus: the mixture carries
    an additional WHAM-style noise component that is NOT any source (the
    condition of the reference's published noisy row,
    metrics/dprnn-spe/final_metrics_attention_noisy.json)."""
    rng = np.random.default_rng(seed)
    sr = int(sample_rate)
    mix_dir = "mix_both" if noisy else "mix_clean"
    os.makedirs(f"{root}/{mix_dir}", exist_ok=True)
    for j in range(n_src):
        os.makedirs(f"{root}/s{j + 1}", exist_ok=True)
    rows = []
    utt_counter = {}
    for i in range(n_mix):
        spks = rng.choice(n_speakers, size=n_src, replace=False) + 1000
        utts, srcs = [], []
        T = int(sr * rng.uniform(min_sec, max_sec))
        t = np.arange(T) / sr
        for j, spk in enumerate(spks):
            utt_counter[spk] = utt_counter.get(spk, 0) + 1
            utts.append(f"{spk}-{(j + 1) * 100 + i}-{utt_counter[spk]:04d}")
            f = rng.uniform(100, 800)
            # amplitude scaled so the mixture can't clip the int16 WAV range
            # (n_src=2 keeps the original 0.4 exactly)
            amp = 0.4 * 2 / n_src
            s = (amp * np.sin(2 * np.pi * f * t + j) * rng.uniform(0.5, 1.0)).astype(np.float32)
            s += 0.03 * rng.standard_normal(T).astype(np.float32) if n_src > 2 else \
                0.05 * rng.standard_normal(T).astype(np.float32)
            srcs.append(s)
        mix = np.sum(srcs, axis=0).astype(np.float32)
        if noisy:
            # band-limited babble-ish noise, ~8 dB below the mixture
            noise = rng.standard_normal(T).astype(np.float32)
            noise = np.convolve(noise, np.ones(5, np.float32) / 5.0, mode="same")
            noise *= 0.4 * np.std(mix) / (np.std(noise) + 1e-9)
            mix = mix + noise
        stem = "_".join(utts)
        mix_path = f"{root}/{mix_dir}/{stem}.wav"
        wav.write(mix_path, mix, sr)
        row = dict(mixture_ID=stem, mixture_path=mix_path, length=T)
        for j, s in enumerate(srcs):
            p = f"{root}/s{j + 1}/{stem}.wav"
            wav.write(p, s, sr)
            row[f"source_{j + 1}_path"] = p
        rows.append(row)
    csv_path = f"{root}/mixture_test_{mix_dir}.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path
