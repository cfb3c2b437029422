"""Persistent XLA compilation cache.

First HRNet/Pallas compiles through the remote-compile tunnel cost minutes;
caching compiled executables on disk makes every subsequent process start
warm. Called by the CLIs, bench and the graft entry.

Caveat: cached CPU AOT executables bake in the compiling machine's ISA
features; moving the cache directory between heterogeneous hosts can load a
mismatched executable (XLA logs a feature-mismatch warning). Set
MINDPOSE_XLA_CACHE to a host-local path in such setups.
"""
import logging
import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "mindpose_tpu_xla")


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("MINDPOSE_XLA_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never fatal
        logging.info("compilation cache disabled: %s", e)
