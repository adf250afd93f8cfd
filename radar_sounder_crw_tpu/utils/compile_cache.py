"""Persistent XLA/Mosaic compilation cache setup.

Compiles in this deployment go through a remote-execution relay, and the
heavyweight programs (the full train step, the 100-frame propagation scan)
cost minutes of compile time per process. JAX's persistent compilation
cache works through that relay (measured: second-process propagation setup
36 s -> 7 s), so every entry point enables it by default.

Layering: entry points (bench.py, scripts/*) call `enable_persistent_cache()`
once, before building any jitted computation. Library code never calls it —
embedding applications keep control of their own cache policy.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the directory used.

    Resolution order: explicit arg > JAX_COMPILATION_CACHE_DIR (already
    honored by JAX itself — left untouched) > `~/.cache/rscrw_tpu/jax`.
    Set RSCRW_NO_COMPILE_CACHE=1 to disable. Never raises: an unwritable
    directory just leaves caching off (returns None).
    """
    if os.environ.get("RSCRW_NO_COMPILE_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "rscrw_tpu", "jax"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold (1 s) skips small kernels; keep those too — the
        # relay round-trip makes even sub-second compiles worth caching
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)
    except Exception:
        return None
    return cache_dir
