"""Persistent XLA compilation cache.

First compilation of the 448px detector/train step is expensive (tens of
seconds on TPU, worse over remote-compile links); enabling JAX's persistent
cache makes every later process start warm.  Called by the CLI and bench
entry points.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "YOLO_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/yolo_v1_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
