"""Runtime configuration helpers (compilation cache, backend selection)."""
from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str = "/tmp/etmppo_jax_cache") -> None:
    """Persistent XLA compilation cache — first compiles of the fused training
    program are expensive (especially via remote-compile TPU tunnels); cache
    them across processes."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    except Exception:
        pass
