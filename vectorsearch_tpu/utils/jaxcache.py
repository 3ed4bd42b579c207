"""Persistent XLA compilation cache setup.

First compilation of the query/build kernels costs 20-40s per shape on TPU;
the persistent cache makes warm process starts near-instant. Call
`enable_persistent_cache()` early (bench.py and __graft_entry__ do).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    if os.environ.get("VSTPU_COMPILE_CACHE") == "off":
        return
    cache_dir = path or os.environ.get(
        "VSTPU_COMPILE_CACHE", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags: skip silently
        pass
