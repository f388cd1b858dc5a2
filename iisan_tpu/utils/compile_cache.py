"""Persistent XLA compilation cache.

First compilation of the train/eval programs through a remote-attached TPU
costs minutes; enabling JAX's on-disk compilation cache makes every
subsequent process start (re-runs, sweeps, the benchmark harness) reuse the
compiled executables.  No reference analog (torch eager has no compile
step) - this is TPU-runtime plumbing.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("iisan_tpu")

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str = "") -> None:
    import jax

    path = cache_dir or os.environ.get("IISAN_COMPILE_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, not just slow-to-compile programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - older jax configs
        log.warning("compilation cache unavailable: %s", e)
