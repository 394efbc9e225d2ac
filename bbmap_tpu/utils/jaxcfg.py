"""JAX runtime configuration helpers."""

import os


def enable_compilation_cache(path: str = None) -> None:
    """Persist compiled XLA/Mosaic binaries across processes — first
    compiles of the wavefront DP and quickmap programs are expensive
    (minutes via remote compile)."""
    import jax
    if path is None:
        path = os.environ.get("BBMAP_COMPILE_CACHE",
                              "/root/.cache/jax_comp")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
