"""Persistent XLA compilation cache for the CLIs and benches.

First compiles of the flagship graphs cost 30-120 s each through the TPU
compile path (one per bucket shape on the eval side); a persistent on-disk
cache makes every later process start warm — serving restarts, re-runs of
the test CLI, and bench re-measurement all skip straight to execution.
``bench.py`` has carried this since round 2; this module makes it a
framework feature instead of a bench-only trick.

Opt out (or redirect) with ``TSS_XLA_CACHE=0`` / ``TSS_XLA_CACHE=/path``.
"""

from __future__ import annotations

import os


def enable() -> None:
    env = os.environ.get("TSS_XLA_CACHE", "")
    if env == "0":
        return
    cache = env or os.path.expanduser("~/.cache/tss_dprnn_tpu_xla")
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass
