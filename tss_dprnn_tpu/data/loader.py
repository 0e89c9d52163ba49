"""Device-feeding loaders.

Replaces torch DataLoader (reference librimix.py:145-183): the train loader
yields fixed-shape shuffled numpy batches (shuffle, drop_last, like
DataLoader(shuffle=True, drop_last=True)); the eval/test loader *buckets* by
length so variable-length full-utterance inference jits into a handful of
static shapes instead of the reference's shape-per-utterance eager loop.

Batches are plain dicts of numpy arrays — the jitted step functions take them
directly, and `jax.device_put` with a sharding distributes them over the mesh.
A double-buffered prefetch thread keeps the host decode off the device's
critical path (the reference used DataLoader worker processes).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def _pad_to(x: np.ndarray, T: int) -> np.ndarray:
    if x.shape[0] >= T:
        return x[:T]
    return np.pad(x, [(0, T - x.shape[0])] + [(0, 0)] * (x.ndim - 1))


def collate_bss(items) -> Dict[str, np.ndarray]:
    mix = np.stack([it[0] for it in items]).astype(np.float32)
    src = np.stack([it[1] for it in items]).astype(np.float32)
    return {"mix": mix, "sources": src}


def collate_spe(items, resample_ref_to: Optional[int] = None, sample_rate: int = 8000):
    """TSS batch; with ``resample_ref_to`` the reference waveform is
    resampled on host (RawNet path, reference trainer_rawnet.py:14-16,31)."""
    from tss_dprnn_tpu.data.resample import resample as _resample

    mix = np.stack([it[0] for it in items]).astype(np.float32)
    target = np.stack([it[1] for it in items]).astype(np.float32)
    refs = [np.asarray(it[2], np.float32) for it in items]
    if resample_ref_to is not None:
        refs = [_resample(r, sample_rate, resample_ref_to) for r in refs]
    ref_len = np.array([r.shape[0] for r in refs], np.float32)
    T = max(r.shape[0] for r in refs)
    ref = np.stack([_pad_to(r, T) for r in refs]).astype(np.float32)
    spk = np.array([it[3] for it in items], np.int32)
    return {"mix": mix, "target": target, "reference": ref, "ref_len": ref_len, "spk_idx": spk}


class TrainLoader:
    """Shuffled fixed-shape batches with optional background prefetch."""

    def __init__(self, dataset, batch_size: int, collate_fn, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> List[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        if self.prefetch <= 0:
            for b in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in b])
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self.collate_fn([self.dataset[int(i)] for i in b]))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def bucket_boundaries(lengths: Sequence[int], n_buckets: int = 8,
                      multiple: int = 2000) -> List[int]:
    """Length quantiles rounded up to ``multiple`` -> static bucket sizes."""
    ls = np.sort(np.asarray(lengths))
    qs = np.linspace(0, 1, n_buckets + 1)[1:]
    bounds = sorted({int(-(-int(ls[min(int(q * (len(ls) - 1)), len(ls) - 1)]) // multiple) * multiple)
                     for q in qs})
    if bounds and bounds[-1] < ls[-1]:
        bounds[-1] = int(-(-int(ls[-1]) // multiple) * multiple)
    return bounds


def collate_bss_eval(items, bucket_T: int) -> Dict[str, np.ndarray]:
    mix = np.stack([_pad_to(np.asarray(it[0], np.float32), bucket_T) for it in items])
    src = np.stack(
        [np.stack([_pad_to(np.asarray(s, np.float32), bucket_T) for s in it[1]]) for it in items]
    )
    return {"mix": mix, "sources": src}


def make_collate_spe_eval(resample_ref_to: Optional[int] = None, sample_rate: int = 8000,
                          ref_bucket_multiple: int = 2000):
    """Eval collate for TSS: pads mixture/target to the bucket and references
    to a rounded common length (true ``ref_len`` preserved for masking)."""
    from tss_dprnn_tpu.data.resample import resample as _resample

    def collate(items, bucket_T: int) -> Dict[str, np.ndarray]:
        mix = np.stack([_pad_to(np.asarray(it[0], np.float32), bucket_T) for it in items])
        target = np.stack([_pad_to(np.asarray(it[1], np.float32), bucket_T) for it in items])
        refs = [np.asarray(it[2], np.float32) for it in items]
        if resample_ref_to is not None:
            refs = [_resample(r, sample_rate, resample_ref_to) for r in refs]
        ref_len = np.array([r.shape[0] for r in refs], np.float32)
        Tr = max(r.shape[0] for r in refs)
        Tr = -(-Tr // ref_bucket_multiple) * ref_bucket_multiple
        ref = np.stack([_pad_to(r, Tr) for r in refs])
        spk = np.array([it[3] for it in items], np.int32)
        return {"mix": mix, "target": target, "reference": ref, "ref_len": ref_len, "spk_idx": spk}

    return collate


class BucketedEvalLoader:
    """Groups utterances into length buckets; each batch is zero-padded to its
    bucket size and carries true ``lengths`` — masked model eval then equals
    per-utterance exact evaluation (tests/test_masked_eval.py).

    ``collate_fn(items, bucket_T) -> dict`` (see collate_bss_eval /
    make_collate_spe_eval)."""

    def __init__(self, dataset, batch_size: int, collate_fn, lengths: Sequence[int],
                 n_buckets: int = 8, multiple: int = 2000):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.lengths = np.asarray(lengths)
        self.bounds = bucket_boundaries(lengths, n_buckets, multiple)

    def _bucket_of(self, length: int) -> int:
        for b in self.bounds:
            if length <= b:
                return b
        return self.bounds[-1]

    def __iter__(self):
        groups: Dict[int, List[int]] = {}
        for i, l in enumerate(self.lengths):
            groups.setdefault(self._bucket_of(int(l)), []).append(i)
        for bucket_T, idxs in sorted(groups.items()):
            for i0 in range(0, len(idxs), self.batch_size):
                chunk = idxs[i0 : i0 + self.batch_size]
                items = [self.dataset[int(i)] for i in chunk]
                batch = self.collate_fn(items, bucket_T)
                batch["lengths"] = self.lengths[chunk].astype(np.int32)
                batch["indices"] = np.asarray(chunk, np.int32)
                yield batch
