"""Process-level JAX runtime setup.

Enables the persistent compilation cache (first XLA compile of the full
render graph takes minutes on this host; cached reloads take seconds) and
centralizes platform knobs. Imported by the CLIs, bench, and graft entries.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None):
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__))), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup on it
    return cache_dir
