"""Librimix / LibrimixSpe datasets over frozen manifests or CSVs.

Replaces reference src/datasets/librimix.py:19-143 (BSS) and
librimix_spe.py:17-208 (TSS). Items are numpy float32 arrays.

Differences from the reference (documented, deliberate):
- randomness is frozen in the JSON manifest (not in pickled objects); crops
  can optionally be re-drawn per epoch (``crop_mode='per_epoch'``) — the
  reference freezes them at construction forever (librimix.py:55-64), which
  is kept as the default for reproducibility;
- the broken CSV runtime path of the reference (missing n_src /
  valid_path keys, librimix.py:150-173) is simply a working constructor here;
- ``cache_wav=True`` memoizes decoded files in RAM so epochs >1 skip the
  disk+decode pass entirely — the reference re-decodes every access
  (librimix.py:66-77). Opt-in: costs ~4 bytes/sample of host RAM
  (~350 MB for a 3 h corpus), a clear win on CPU-starved hosts.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

from tss_dprnn_tpu.data import manifest as manifest_mod
from tss_dprnn_tpu.data import wav


class Librimix:
    """BSS dataset: (mixture [T], sources [n_src, T]) (+ ids)."""

    def __init__(
        self,
        csv_path: Optional[str] = None,
        sample_rate: int = 8000,
        n_src: int = 2,
        nrows: Optional[int] = None,
        segment: Optional[float] = 3,
        return_id: bool = False,
        manifest: Optional[dict] = None,
        manifest_path: Optional[str] = None,
        crop_mode: str = "frozen",  # 'frozen' | 'per_epoch'
        seed: int = 0,
        cache_wav: bool = False,
    ):
        if manifest is None and manifest_path is not None:
            manifest = manifest_mod.load_manifest(manifest_path)
        if manifest is None:
            if csv_path is None:
                raise ValueError("need csv_path or manifest/manifest_path")
            manifest = manifest_mod.build_manifest(
                csv_path, sample_rate, n_src, segment, nrows,
                spe=self._spe, seed=seed,
            )
        self.manifest = manifest
        self.entries = manifest["entries"]
        self.sample_rate = manifest["sample_rate"]
        self.n_src = manifest["n_src"]
        self.segment = manifest["segment"]
        self.seg_len = int(self.segment * self.sample_rate) if self.segment else None
        self.return_id = return_id
        self.crop_mode = crop_mode
        self._rng = random.Random(seed ^ 0x5EED)
        self.cache_wav = cache_wav
        self._wav_cache: dict = {}

    _spe = False

    def __len__(self):
        return len(self.entries)

    def _crop(self, entry):
        if self.seg_len is None or self.crop_mode == "frozen":
            return entry["start"], entry["stop"]
        start = self._rng.randint(0, max(entry["length"] - self.seg_len, 0))
        return start, start + self.seg_len

    def _read(self, path, start=0, stop=None):
        """wav.read with optional whole-file memoization (``cache_wav``)."""
        if not self.cache_wav:
            return wav.read(path, start, stop)[0]
        full = self._wav_cache.get(path)
        if full is None:
            full = self._wav_cache[path] = wav.read(path)[0]
        return full[start:stop]

    def __getitem__(self, idx):
        e = self.entries[idx]
        start, stop = self._crop(e)
        sources = [self._read(p, start, stop) for p in e["source_paths"]]
        mixture = self._read(e["mixture_path"], start, stop)
        sources = np.stack(sources, axis=0)
        if not self.return_id:
            return mixture, sources
        ids = manifest_mod._mixture_utt_ids(e["mixture_path"])
        return mixture, sources, ids

    def lengths(self):
        if self.seg_len is not None:
            return [self.seg_len] * len(self)
        return [e["length"] for e in self.entries]

    # ------------------------------------------------- batched native decode

    def _batch_specs(self, idx):
        """(paths, starts, counts) of every WAV read item ``idx`` needs, plus
        the per-read split layout — mixture first, then sources (reference
        read order of __getitem__ is sources-then-mixture, but reads are
        pure so order only matters for per-epoch crop rng, drawn here)."""
        e = self.entries[idx]
        start, stop = self._crop(e)
        count = (stop - start) if stop is not None else (e["length"] - start)
        paths = [e["mixture_path"]] + list(e["source_paths"])
        return paths, [start] * len(paths), [count] * len(paths)

    def _assemble(self, idx, rows, counts):
        mixture = rows[0][: counts[0]]
        sources = np.stack([rows[1 + j][: counts[1 + j]]
                            for j in range(len(rows) - 1)], axis=0)
        return mixture, sources

    def items_batch(self, indices):
        """Decode a whole batch of items with ONE call into the native
        threaded WAV decoder (native/wavio.cpp ``read_batch``) — the loader's
        eval/varlen materialization uses this instead of n_items x n_files
        Python-level reads. Falls back to per-item ``__getitem__`` when the
        native library is unavailable or a mode needs the Python path
        (return_id, cache_wav). Bitwise-identical items either way
        (tests/test_data.py::test_items_batch_matches_getitem)."""
        from tss_dprnn_tpu.data import native

        if self.return_id or self.cache_wav or not native.available():
            return [self[int(i)] for i in indices]
        import os

        specs = [self._batch_specs(int(i)) for i in indices]
        paths = [p for s in specs for p in s[0]]
        starts = [st for s in specs for st in s[1]]
        counts = [c for s in specs for c in s[2]]
        seg_len = max(counts) if counts else 0
        flat = native.read_batch(paths, starts, counts, seg_len,
                                 n_threads=min(4, os.cpu_count() or 1))
        items, off = [], 0
        for i, (p, _s, c) in zip(indices, specs):
            items.append(self._assemble(int(i), flat[off : off + len(p)], c))
            off += len(p)
        return items

    @classmethod
    def mini_from_download(cls, nrows=None, segment=3, **kwargs):
        """MiniLibriMix train/val datasets (reference librimix.py:100-118);
        requires network access (Zenodo)."""
        import os

        meta = _download_mini()

        def csv_for(split):
            for cand in (f"{split}/mixture_{split}_mix_clean.csv",
                         f"mixture_{split}_mix_clean.csv"):
                p = os.path.join(meta, cand)
                if os.path.isfile(p):
                    return p
            raise FileNotFoundError(f"MiniLibriMix csv for {split} not found under {meta}")

        train = cls(csv_path=csv_for("train"), sample_rate=8000, n_src=2,
                    nrows=nrows, segment=segment)
        val = cls(csv_path=csv_for("val"), sample_rate=8000, n_src=2,
                  nrows=nrows, segment=segment)
        return train, val

    @classmethod
    def loaders_from_mini(cls, batch_size=4, nrows=None, segment=3, **kwargs):
        """MiniLibriMix train/val TrainLoaders (reference librimix.py:91-98 /
        librimix_spe.py:161-166: the Spe variant yields only the val loader)."""
        from tss_dprnn_tpu.data.loader import TrainLoader, collate_bss, collate_spe

        sets = cls.mini_from_download(nrows=nrows, segment=segment, **kwargs)
        collate = collate_spe if cls._spe else collate_bss
        if isinstance(sets, tuple):
            train, val = sets
            return (TrainLoader(train, batch_size, collate, shuffle=True, drop_last=True),
                    TrainLoader(val, batch_size, collate, shuffle=False, drop_last=True))
        return TrainLoader(sets, batch_size, collate, shuffle=False, drop_last=True)


MINI_URL = "https://zenodo.org/record/3871592/files/MiniLibriMix.zip?download=1"


def _download_mini(root: str = "./MiniLibriMix") -> str:
    """Download + unpack MiniLibriMix (reference librimix.py:120-143).
    Returns the metadata dir. Raises a clear error in offline environments."""
    import os
    import urllib.request
    import zipfile

    os.makedirs(root, exist_ok=True)
    zip_path = os.path.join(root, "MiniLibriMix.zip")
    if not os.path.isfile(zip_path):
        try:
            urllib.request.urlretrieve(MINI_URL, zip_path)
        except Exception as e:  # zero-egress environments
            raise RuntimeError(
                "MiniLibriMix download failed (offline?). Generate a synthetic "
                "fixture instead: tests/fixtures.py:make_mini_librimix"
            ) from e
    meta = os.path.join(os.path.dirname(root) or ".", "MiniLibriMix", "metadata")
    if not os.path.isdir(meta):
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(os.path.dirname(root) or ".")
    return meta


class LibrimixSpe(Librimix):
    """TSS dataset: (mixture [T], target [T], reference [Tr], speaker_idx)
    (+ first-speaker utterance id). Reference selection frozen in the
    manifest (same-speaker different-utterance, librimix_spe.py:78-159)."""

    _spe = True

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.speakers_mapping = self.manifest.get("speakers", {})

    @property
    def num_speakers(self):
        return len(self.speakers_mapping)

    def __getitem__(self, idx):
        e = self.entries[idx]
        start, stop = self._crop(e)
        mixture = self._read(e["mixture_path"], start, stop)
        target = self._read(e["source_paths"][0], start, stop)
        reference = self._read(e["reference_path"], e["start_ref"], e["stop_ref"])
        spk_idx = int(e["speaker_idx"])
        if not self.return_id:
            return mixture, target, reference, spk_idx
        utt_id = manifest_mod._mixture_utt_ids(e["mixture_path"])[0]
        return mixture, target, reference, spk_idx, utt_id

    def ref_lengths(self):
        if self.seg_len is not None:
            return [self.seg_len] * len(self)
        return [wav.info(e["reference_path"])["frames"] for e in self.entries]

    def _batch_specs(self, idx):
        e = self.entries[idx]
        start, stop = self._crop(e)
        count = (stop - start) if stop is not None else (e["length"] - start)
        ref_stop = e["stop_ref"]
        if ref_stop is None:  # full-length reference (segment=null manifests)
            ref_stop = wav.info(e["reference_path"])["frames"]
        paths = [e["mixture_path"], e["source_paths"][0], e["reference_path"]]
        return paths, [start, start, e["start_ref"]], [count, count, ref_stop - e["start_ref"]]

    def _assemble(self, idx, rows, counts):
        e = self.entries[idx]
        return (rows[0][: counts[0]], rows[1][: counts[1]], rows[2][: counts[2]],
                int(e["speaker_idx"]))

    @classmethod
    def mini_from_download(cls, nrows=None, segment=3, **kwargs):
        """MiniLibriMix **val** dataset only (reference librimix_spe.py:168-183
        — the Spe mini helper never builds the train split). Same-speaker
        reference selection is frozen into the manifest at construction."""
        import os

        if kwargs.get("task", "sep_clean") not in ("sep_clean", "sep_noisy"):
            raise ValueError("Only clean/noisy separation in MiniLibriMix")
        if kwargs.get("sample_rate", 8000) != 8000:
            raise ValueError("Only 8 kHz supported in MiniLibriMix")
        meta = _download_mini()
        for cand in ("val/mixture_val_mix_clean.csv", "mixture_val_mix_clean.csv"):
            p = os.path.join(meta, cand)
            if os.path.isfile(p):
                return cls(csv_path=p, sample_rate=8000, n_src=2,
                           nrows=nrows, segment=segment)
        raise FileNotFoundError(f"MiniLibriMix val csv not found under {meta}")
