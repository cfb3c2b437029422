"""Honor JAX_PLATFORMS in environments that pre-register a TPU plugin.

Some TPU launch environments register their PJRT plugin from a
``sitecustomize`` at interpreter start and pin the platform selection, so
``JAX_PLATFORMS=cpu python tools/train.py`` silently still grabs the real
chip — and two concurrent TPU client processes crash the worker. An explicit
``jax.config.update("jax_platforms", ...)`` before first backend use always
wins, so every CLI calls this first.
"""
import os

__all__ = ["apply_platform_env"]


def apply_platform_env() -> None:
    """Pin jax's platform list to $JAX_PLATFORMS if set (no-op otherwise).

    Must run before any jax backend use (jax.devices(), jnp ops, ...).
    """
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plats:
        return
    import jax

    jax.config.update("jax_platforms", plats)
