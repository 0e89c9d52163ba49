"""Frozen dataset manifests: the reproducibility interface.

The reference freezes all dataset randomness (per-utterance crop offsets,
same-speaker reference picks) by pickling whole Dataset objects
(scripts/helpers/generate_datasets.py, src/datasets/librimix.py:55-64,
librimix_spe.py:78-159). Pickles are brittle and class-coupled; here the same
information is a plain JSON manifest:

    {"kind": "librimix"|"librimix_spe", "sample_rate": 8000, "n_src": 2,
     "segment": 3 | null,
     "entries": [{"mixture_path", "source_paths": [...], "length",
                  "start", "stop",                        # frozen crop
                  "speaker_id", "speaker_idx",            # TSS only
                  "reference_path", "start_ref", "stop_ref"}, ...],
     "speakers": {"1234": 0, ...}}

Reference-pick semantics mirror librimix_spe.py:78-159: for each mixture, the
reference utterance is drawn from *other* mixtures' source columns whose
speaker (from the filename stem ``<spk>-<chap>-<utt>_...``) matches the
mixture's first speaker, excluding the identical utterance.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import pandas as pd


def _stem(path: str) -> str:
    return os.path.basename(path).rsplit(".", 1)[0]


def _mixture_utt_ids(mixture_path: str) -> List[str]:
    # '5400-34479-0005_4973-24515-0007.wav' -> ['5400-34479-0005', ...]
    return _stem(mixture_path).split("_")


def _speaker_of(utt_id: str) -> str:
    return utt_id.split("-")[0]


def load_csv(csv_path: str, nrows: Optional[int] = None) -> pd.DataFrame:
    return pd.read_csv(csv_path, nrows=nrows)


def build_manifest(
    csv_path: str,
    sample_rate: int = 8000,
    n_src: int = 2,
    segment: Optional[float] = 3,
    nrows: Optional[int] = None,
    spe: bool = False,
    seed: int = 0,
) -> dict:
    """CSV -> manifest dict. ``spe=True`` adds speaker map + reference picks
    (LibrimixSpe); ``segment=None`` keeps full lengths (test mode)."""
    rng = random.Random(seed)
    df = load_csv(csv_path, nrows)
    seg_len = int(segment * sample_rate) if segment is not None else None
    n_total = len(df)
    if seg_len is not None:
        df = df[df["length"] >= seg_len]
    src_cols = [f"source_{i + 1}_path" for i in range(n_src)]

    entries = []
    speakers: Dict[str, int] = {}
    # speaker map in row order, as _map_speakers does (librimix_spe.py:67-76)
    if spe:
        for _, row in df.iterrows():
            spk = _speaker_of(_mixture_utt_ids(row["mixture_path"])[0])
            if spk not in speakers:
                speakers[spk] = len(speakers)
        # candidate pool: (speaker, utt_id) -> list of (path, length)
        pool: Dict[str, List] = {}
        for _, row in df.iterrows():
            utt_ids = _mixture_utt_ids(row["mixture_path"])
            for col, utt in zip(src_cols, utt_ids):
                spk = _speaker_of(utt)
                pool.setdefault(spk, []).append((utt, row[col], int(row["length"])))

    for _, row in df.iterrows():
        length = int(row["length"])
        if seg_len is not None:
            start = rng.randint(0, length - seg_len)
            stop = start + seg_len
        else:
            start, stop = 0, None
        e = dict(
            mixture_path=row["mixture_path"],
            source_paths=[row[c] for c in src_cols],
            length=length,
            start=start,
            stop=stop,
        )
        if spe:
            utt_ids = _mixture_utt_ids(row["mixture_path"])
            target_utt = utt_ids[0]
            spk = _speaker_of(target_utt)
            candidates = [c for c in pool.get(spk, []) if c[0] != target_utt]
            if not candidates:  # degenerate tiny sets: allow same utterance
                candidates = pool.get(spk, [])
            ref_utt, ref_path, ref_len = rng.choice(candidates)
            if seg_len is not None:
                start_ref = rng.randint(0, max(ref_len - seg_len, 0))
                stop_ref = start_ref + seg_len
            else:
                start_ref, stop_ref = 0, None
            e.update(
                speaker_id=spk,
                speaker_idx=speakers[spk],
                reference_path=ref_path,
                start_ref=start_ref,
                stop_ref=stop_ref,
            )
        entries.append(e)

    manifest = dict(
        kind="librimix_spe" if spe else "librimix",
        csv_path=os.path.abspath(csv_path),
        sample_rate=sample_rate,
        n_src=n_src,
        segment=segment,
        dropped_short=n_total - len(df),
        seed=seed,
        entries=entries,
    )
    if spe:
        manifest["speakers"] = speakers
    return manifest


def save_manifest(manifest: dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(manifest, f)


def load_manifest(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
