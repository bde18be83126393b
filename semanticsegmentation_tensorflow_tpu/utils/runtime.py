"""Process-level runtime setup shared by all CLI entry points."""

from __future__ import annotations

import os

import jax


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compile cache (and future runtime knobs).

    A cold FCN-8s train-step compile costs minutes on a tunneled TPU; with
    the persistent cache a re-invocation of any script reuses it.
    """
    cache_dir = cache_dir or os.environ.get(
        "SEG_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/seg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
