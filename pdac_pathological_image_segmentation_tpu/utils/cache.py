"""Persistent XLA compilation cache setup.

First TPU compiles are expensive (tens of seconds; minutes on
remote-compile backends); the persistent cache makes every subsequent
process start warm.  Called by the CLIs and the bench harness.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/pdac_tpu_jax")


def enable_compile_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "PDAC_TPU_COMPILE_CACHE", DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
