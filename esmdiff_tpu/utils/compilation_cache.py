"""Persistent XLA compilation cache.

The 1.4B-trunk sampler costs minutes of XLA compile per (batch, length)
bucket; enabling jax's persistent cache makes every subsequent process reuse
them.  Called by the CLIs and bench at startup.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "ESMDIFF_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/esmdiff_tpu_xla"),
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[warn] persistent compilation cache unavailable: {e}")
