"""Persistent XLA compilation cache.

First HRNet/Pallas compiles through the remote-compile tunnel cost minutes;
caching compiled executables on disk makes every subsequent process start
warm. Called by the CLIs, bench and the graft entry.

Cached CPU AOT executables bake in the compiling machine's ISA features;
loading one on a different host generation risks SIGILL (XLA logs a
feature-mismatch error). The cache path therefore includes a host ISA
fingerprint, so heterogeneous hosts sharing one cache directory (NFS, a
reused CI volume) each get their own namespace.
"""
import hashlib
import logging
import os

__all__ = ["enable_compilation_cache", "host_fingerprint"]

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "mindpose_tpu_xla")


def host_fingerprint() -> str:
    """Short stable hash of this host's CPU ISA feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = ""
    except OSError:
        import platform

        feats = platform.processor() or platform.machine()
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("MINDPOSE_XLA_CACHE", _DEFAULT_DIR)
    cache_dir = os.path.join(cache_dir, host_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never fatal
        logging.info("compilation cache disabled: %s", e)
