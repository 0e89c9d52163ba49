"""ctypes bindings for the native WAV decoder (native/wavio.cpp).

Builds the shared library on first use with the toolchain g++ (cached next to
the source); falls back silently to the pure-numpy reader (data/wav.py) when
no compiler is available. ``read_batch`` decodes a whole batch of crops into
one dense buffer with a thread pool — the native replacement for the
reference's DataLoader worker processes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "wavio.cpp")
_LIB_PATH = os.path.join(_HERE, "..", "native", "_wavio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wavio_read.restype = ctypes.c_long
        lib.wavio_read.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                                   ctypes.POINTER(ctypes.c_float)]
        lib.wavio_info.restype = ctypes.c_int
        lib.wavio_info.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_long)] * 3
        lib.wavio_read_batch.restype = ctypes.c_int
        lib.wavio_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def read(path: str, start: int = 0, stop: Optional[int] = None) -> np.ndarray:
    """Native single-file read (channel 0), float32 in [-1, 1]."""
    lib = get_lib()
    assert lib is not None
    if stop is None:
        rate = ctypes.c_long()
        ch = ctypes.c_long()
        frames = ctypes.c_long()
        rc = lib.wavio_info(path.encode(), ctypes.byref(rate), ctypes.byref(ch),
                            ctypes.byref(frames))
        if rc != 0:
            raise IOError(f"wavio_info({path}) failed: {rc}")
        stop = frames.value
    count = stop - start
    out = np.empty(count, np.float32)
    got = lib.wavio_read(path.encode(), start, count,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        raise IOError(f"wavio_read({path}) failed: {got}")
    return out[:got]


def read_batch(paths: Sequence[str], starts: Sequence[int], counts: Sequence[int],
               seg_len: int, n_threads: int = 4) -> np.ndarray:
    """Decode ``len(paths)`` crops concurrently -> [n, seg_len] float32
    (zero-padded); counts[i] < 0 means 'to EOF (capped at seg_len)'."""
    lib = get_lib()
    assert lib is not None
    n = len(paths)
    out = np.zeros((n, seg_len), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = (ctypes.c_long * n)(*[int(s) for s in starts])
    c_counts = (ctypes.c_long * n)(*[int(c) for c in counts])
    rc = lib.wavio_read_batch(
        c_paths, c_starts, c_counts, n, seg_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if rc != 0:
        raise IOError(f"wavio_read_batch failed: {rc}")
    return out
