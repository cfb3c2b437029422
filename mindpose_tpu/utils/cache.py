"""Persistent XLA compilation cache.

First HRNet/Pallas compiles through the remote-compile tunnel cost minutes;
caching compiled executables on disk makes every subsequent process start
warm. Called by the CLIs, bench and the graft entry.

Cached CPU AOT executables bake in the compiling machine's ISA features;
loading one on a different host generation risks SIGILL (XLA logs a
feature-mismatch error). The cache path therefore includes a host ISA
fingerprint, so heterogeneous hosts sharing one cache directory (NFS, a
reused CI volume) each get their own namespace.

Note: XLA's cpu_aot_loader still logs a feature-mismatch error for
``+prefer-no-scatter``/``+prefer-no-gather`` even on a same-host cache hit —
those are LLVM *tuning* preferences baked into the compile-time feature
string but never present in the loader's host-detection list. When they are
the only differences the warning is cosmetic (identical ISA, no SIGILL
risk); real generation mismatches are what the fingerprint prevents.
"""
import hashlib
import logging
import os

__all__ = ["enable_compilation_cache", "host_fingerprint"]

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "mindpose_tpu_xla")


def host_fingerprint() -> str:
    """Short stable hash of this host's CPU identity.

    Includes the model name, not just the cpuinfo flag set: distinct CPU
    generations can expose identical kernel flag lists while LLVM derives
    different tuning features (e.g. ``prefer-no-gather``) from cpuid, which
    is exactly the AOT feature-mismatch the cache key must separate. The
    jax version is included too — AOT serialization is not stable across it.
    """
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name") and len(parts) == 0:
                    parts.append(line.split(":", 1)[1].strip())
                elif line.startswith("flags"):
                    parts.append(
                        " ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    if not parts:
        import platform

        parts = [platform.processor() or platform.machine()]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def _configured_platform() -> str:
    """The platform jax WILL use, without initializing any backend.

    ``jax.default_backend()`` would instantiate the default PJRT client —
    on this image that is the axon TPU plugin, so calling it from a process
    that wants CPU (the driver's dryrun, a test subprocess) grabs or blocks
    on the real chip's tunnel. Read the configured platform list instead;
    "" means "auto", which on this image resolves to the TPU plugin.
    """
    import jax

    plats = (jax.config.jax_platforms or
             os.environ.get("JAX_PLATFORMS", "")).strip()
    return plats.split(",")[0] if plats else ""


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("MINDPOSE_XLA_CACHE", _DEFAULT_DIR)
    # "" = auto, which on an accelerator image resolves to the TPU plugin;
    # callers that want CPU pin it first (apply_platform_env / _force_cpu_devices)
    if _configured_platform() == "cpu":
        # only CPU AOT results bake in host ISA features; TPU executables
        # are host-independent and should share one cache across hosts
        cache_dir = os.path.join(cache_dir, host_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never fatal
        logging.info("compilation cache disabled: %s", e)
