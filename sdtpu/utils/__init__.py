def enable_compilation_cache(cache_dir: str = "") -> str:
    """Persistent XLA compilation cache (SURVEY.md §7 recompilation control):
    jitted programs survive process restarts, so CLI/server cold starts skip
    the 20-40 s first-compile.  Returns the cache directory used."""
    import os

    import jax

    cache_dir = cache_dir or os.environ.get(
        "SDTPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sdtpu", "xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


from .logging import (  # noqa: F401,E402
    log_debug,
    log_error,
    log_info,
    log_warn,
    pretty_progress,
    set_log_callback,
    set_log_level,
)
