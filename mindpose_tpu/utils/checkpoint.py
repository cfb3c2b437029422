"""Checkpoint save/restore for train state and pretrained backbones.

TPU-native counterpart of MindSpore save_checkpoint/load_checkpoint usage
(/root/reference/mindpose/callbacks/eval_callback.py:189,201 and
tools/train.py:163-167, models/backbones/utils.py:10-42): the full pytree
(params + batch_stats + opt_state + step) is serialized with flax msgpack;
backbone-pretrained loading is non-strict subtree copy by matching names.
"""
import logging
import os
import threading
from typing import Any, Dict

import jax
from flax import serialization

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_variables",
    "restore_train_state",
    "load_pretrained_backbone",
    "wait_pending_checkpoints",
]


def load_variables(path: str, init_variables: Any = None) -> Dict[str, Any]:
    """Read a checkpoint into eval-ready ``{"params", "batch_stats"}``.

    Accepts either a full saved TrainState msgpack or a raw param pytree;
    a missing ``batch_stats`` collection falls back to ``init_variables``
    (a freshly initialized model's) when given. The one restore idiom for
    every CLI / serving / teacher-loading site.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    fallback = (init_variables or {}).get("batch_stats", {})
    return {
        "params": raw.get("params", raw),
        "batch_stats": raw.get("batch_stats", fallback),
    }

# per-path writer threads for async saves (ordering: a new save to the same
# path joins the previous one first, so the file always ends at the newest
# state and tmp files never collide)
_WRITERS: Dict[str, threading.Thread] = {}
_WRITERS_LOCK = threading.Lock()


def _write_atomic(path: str, state: Any) -> None:
    data = serialization.to_bytes(state)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(path: str, state: Any, async_write: bool = False) -> None:
    """Serialize a pytree (e.g. TrainState) to ``path`` atomically.

    ``async_write=True`` snapshots the state to host synchronously (cheap:
    one device_get) and moves the msgpack serialization + disk write to a
    background thread — at ViT-H scale that is multiple GB per save, which
    would otherwise stall the train loop. Threads are non-daemon, so an
    exiting process finishes in-flight writes; call
    :func:`wait_pending_checkpoints` to block explicitly (e.g. before
    reading the file back).
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = jax.device_get(state)
    if not async_write:
        _write_atomic(path, state)
        return
    key = os.path.abspath(path)

    # read-prev and register-new must be one critical section: otherwise two
    # concurrent saves to the same path can both chain onto the same
    # predecessor and race, leaving the file at the OLDER state
    with _WRITERS_LOCK:
        prev = _WRITERS.get(key)

        def run(prev=prev):
            if prev is not None:
                prev.join()
            _write_atomic(path, state)

        t = threading.Thread(target=run, name=f"ckpt-write:{path}")
        _WRITERS[key] = t
    t.start()


def wait_pending_checkpoints() -> None:
    """Block until every async checkpoint write has finished."""
    with _WRITERS_LOCK:
        threads = list(_WRITERS.values())
    for t in threads:
        t.join()


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree with the structure of ``target`` from ``path``."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def restore_train_state(path: str, state: Any) -> Any:
    """Resume net + optimizer state from one checkpoint (ref train.py:163-167)."""
    logging.info("Resuming train state from %s", path)
    return load_checkpoint(path, state)


def load_pretrained_backbone(
    path: str, variables: Dict[str, Any], backbone_key: str = "backbone"
) -> Dict[str, Any]:
    """Non-strict load of backbone params/stats from a full-net checkpoint.

    Accepts a local path or URL (downloaded with md5-less caching, parity
    with models/backbones/utils.py:10-42); the source may be a serialized
    TrainState-like dict or a raw variables dict. Copies the ``backbone``
    subtree where array shapes match, leaving the rest untouched.
    """
    if path.startswith("file://"):
        path = path[len("file://"):]
    elif path.startswith(("http://", "https://")):
        from .download import DownLoad

        path = DownLoad().download_url(path, path="./cache/pretrained")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"pretrained backbone checkpoint not found: {path!r}"
        )

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def merge(dst, src):
        out = {}
        n_loaded = 0
        for k, v in dst.items():
            if isinstance(v, dict):
                if isinstance(src.get(k), dict):
                    merged, n = merge(v, src[k])
                    out[k] = merged
                    n_loaded += n
                else:
                    out[k] = v
            else:
                s = src.get(k)
                s_shape = getattr(s, "shape", None)
                if s is not None and s_shape == v.shape:
                    out[k] = s
                    n_loaded += 1
                elif (
                    k == "pos_embedding"
                    and s_shape is not None
                    and len(s_shape) == len(v.shape) == 4
                    and s_shape[-1] == v.shape[-1]
                ):
                    # A ViT position-embedding grid trained at another
                    # resolution: bilinearly resize onto the target token
                    # grid (ViTPose §3 fine-tuning practice) instead of
                    # silently dropping it.
                    import jax.numpy as jnp

                    resized = jax.image.resize(
                        jnp.asarray(s, jnp.float32), v.shape,
                        method="bilinear")
                    out[k] = jax.device_get(resized).astype(v.dtype)
                    logging.info(
                        "Interpolated pos_embedding %s -> %s",
                        tuple(s_shape), tuple(v.shape))
                    n_loaded += 1
                else:
                    out[k] = v
        return out, n_loaded

    new_vars = dict(variables)
    n_total = 0
    # params + BN moving stats, like the reference's non-strict
    # load_param_into_net (models/backbones/utils.py:40-42)
    for coll in ("params", "batch_stats"):
        if coll not in new_vars:
            continue
        src_coll = raw.get(coll, raw if coll == "params" else None)
        if not isinstance(src_coll, dict):
            continue
        src_backbone = src_coll.get(backbone_key, src_coll)
        dst_coll = dict(new_vars[coll])
        if backbone_key in dst_coll and isinstance(src_backbone, dict):
            merged, n = merge(dst_coll[backbone_key], src_backbone)
            dst_coll[backbone_key] = merged
            n_total += n
        new_vars[coll] = dst_coll
    if n_total == 0:
        logging.warning("No pretrained backbone tensors matched from %s", path)
    else:
        logging.info(
            "Loaded %d pretrained backbone tensors from %s", n_total, path
        )
    return new_vars
