"""Loader for the reference's pickled Dataset artifacts.

The reference freezes its datasets by pickling whole ``Librimix`` /
``LibrimixSpe`` instances (scripts/helpers/generate_datasets.py ->
datasets/{bss,tss}/*.pkl). Those pickles reference the classes by module path
(``src.datasets.librimix[_spe]``); this module installs lightweight shim
classes under those names so the pickles unpickle without the reference
package or torch, then converts the captured state (df, start/stop crop
lists, reference picks, speaker map) into our JSON-manifest schema
(data/manifest.py) — so the exact published crops/reference choices are
reproducible in this framework.
"""

from __future__ import annotations

import pickle
import sys
import types
from typing import Optional


class _ShimLibrimix:
    """Attribute bag standing in for the reference Dataset classes."""


class _ShimLibrimixSpe(_ShimLibrimix):
    pass


def _install_shims():
    for name in ("src", "src.datasets"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    lm = types.ModuleType("src.datasets.librimix")
    lm.Librimix = _ShimLibrimix
    lms = types.ModuleType("src.datasets.librimix_spe")
    lms.LibrimixSpe = _ShimLibrimixSpe
    sys.modules.setdefault("src.datasets.librimix", lm)
    sys.modules.setdefault("src.datasets.librimix_spe", lms)
    # keep real shims even if placeholders existed
    sys.modules["src.datasets.librimix"].Librimix = _ShimLibrimix
    sys.modules["src.datasets.librimix_spe"].LibrimixSpe = _ShimLibrimixSpe


def load_reference_pickle(path: str, path_prefix: Optional[str] = None) -> dict:
    """Reference ``*_set.pkl`` -> manifest dict.

    ``path_prefix``: optional replacement for the relative ``../../Libri2Mix``
    roots stored inside the pickles (reference ran from scripts/ dirs).
    """
    _install_shims()
    with open(path, "rb") as f:
        obj = pickle.load(f)
    state = obj.__dict__
    df = state["df"]
    spe = isinstance(obj, _ShimLibrimixSpe) or "reference" in df.columns
    n_src = int(state.get("n_src", 2))
    seg_len = state.get("seg_len")
    sample_rate = int(state.get("sample_rate", 8000))
    segment = state.get("segment")
    starts = list(state.get("start", []))
    stops = list(state.get("stop", []))
    starts_ref = list(state.get("start_ref", []))
    stops_ref = list(state.get("stop_ref", []))
    speakers = dict(state.get("speakers_mapping", {}))

    def fix(p):
        if path_prefix is None or not isinstance(p, str):
            return p
        marker = "Libri2Mix/"
        i = p.find(marker)
        return path_prefix.rstrip("/") + "/" + p[i:] if i >= 0 else p

    src_cols = [f"source_{i + 1}_path" for i in range(n_src)]
    entries = []
    for pos, (_, row) in enumerate(df.iterrows()):
        e = dict(
            mixture_path=fix(row["mixture_path"]),
            source_paths=[fix(row[c]) for c in src_cols],
            length=int(row["length"]),
            start=int(starts[pos]) if pos < len(starts) else 0,
            stop=(int(stops[pos]) if stops[pos] is not None else None) if pos < len(stops) else None,
        )
        if spe:
            stem = str(row["mixture_path"]).split("/")[-1].split(".")[0]
            spk = stem.split("_")[0].split("-")[0]
            e.update(
                speaker_id=spk,
                speaker_idx=int(speakers.get(spk, 0)),
                reference_path=fix(row["reference"]),
                start_ref=int(starts_ref[pos]) if pos < len(starts_ref) else 0,
                stop_ref=(int(stops_ref[pos]) if stops_ref[pos] is not None else None)
                if pos < len(stops_ref) else None,
            )
        entries.append(e)

    manifest = dict(
        kind="librimix_spe" if spe else "librimix",
        csv_path=str(state.get("csv_path")),
        sample_rate=sample_rate,
        n_src=n_src,
        segment=segment,
        dropped_short=0,
        seed=None,
        source="reference_pickle:" + path,
        entries=entries,
    )
    if spe:
        manifest["speakers"] = speakers
    return manifest
