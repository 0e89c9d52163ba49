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


def make_mini_librimix(root, n_mix=8, n_speakers=4, min_sec=2.0, max_sec=4.0, seed=0):
    """Creates wavs + mixture CSV under ``root``; returns csv_path."""
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/mix_clean", exist_ok=True)
    os.makedirs(f"{root}/s1", exist_ok=True)
    os.makedirs(f"{root}/s2", exist_ok=True)
    rows = []
    utt_counter = {}
    for i in range(n_mix):
        spk1, spk2 = rng.choice(n_speakers, size=2, replace=False) + 1000
        utt_counter[spk1] = utt_counter.get(spk1, 0) + 1
        utt_counter[spk2] = utt_counter.get(spk2, 0) + 1
        u1 = f"{spk1}-{100 + i}-{utt_counter[spk1]:04d}"
        u2 = f"{spk2}-{200 + i}-{utt_counter[spk2]:04d}"
        T = int(SR * rng.uniform(min_sec, max_sec))
        t = np.arange(T) / SR
        f1, f2 = rng.uniform(100, 800, size=2)
        s1 = (0.4 * np.sin(2 * np.pi * f1 * t) * rng.uniform(0.5, 1.0)).astype(np.float32)
        s2 = (0.4 * np.sin(2 * np.pi * f2 * t + 1.0) * rng.uniform(0.5, 1.0)).astype(np.float32)
        s1 += 0.05 * rng.standard_normal(T).astype(np.float32)
        s2 += 0.05 * rng.standard_normal(T).astype(np.float32)
        mix = s1 + s2
        stem = f"{u1}_{u2}"
        mix_path = f"{root}/mix_clean/{stem}.wav"
        s1_path = f"{root}/s1/{stem}.wav"
        s2_path = f"{root}/s2/{stem}.wav"
        wav.write(mix_path, mix, SR)
        wav.write(s1_path, s1, SR)
        wav.write(s2_path, s2, SR)
        rows.append(
            dict(mixture_ID=stem, mixture_path=mix_path, source_1_path=s1_path,
                 source_2_path=s2_path, length=T)
        )
    csv_path = f"{root}/mixture_test_mix_clean.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path
