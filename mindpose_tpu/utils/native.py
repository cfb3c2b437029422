"""ctypes bridge to the C++ evaluation kernels (csrc/coco_native.cpp).

Auto-builds the shared library on first import if a compiler is available;
every consumer falls back to the pure-numpy implementation when the native
library is missing, so the framework never hard-depends on a toolchain.
"""
import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["get_native", "native_available", "set_native_enabled"]

_LIB_NAME = "_coco_native.so"
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "coco_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), _LIB_NAME)

_lib: Optional[ctypes.CDLL] = None
_tried = False
# MINDPOSE_NATIVE=0 forces the pure-numpy paths (also used by the
# native-vs-numpy parity tests)
_enabled = os.environ.get("MINDPOSE_NATIVE", "1") != "0"


def set_native_enabled(flag: bool) -> None:
    """Toggle the native fast path at runtime (numpy fallback when off)."""
    global _enabled
    _enabled = bool(flag)


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.isfile(src):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        logging.info("native build skipped: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _enabled:
        return None
    if _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logging.info("native load failed: %s", e)
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.compute_oks_row.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_double, dp, dp, dp,
    ]
    lib.compute_oks_row.restype = None
    lib.oks_iou_pairs.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_double, dp, dp,
        ctypes.c_double, dp,
    ]
    lib.oks_iou_pairs.restype = None
    lib.decode_rle.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p,
    ]
    lib.decode_rle.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def get_native() -> Optional[ctypes.CDLL]:
    return _load()


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def compute_oks_row(
    gt: np.ndarray,
    dts: np.ndarray,
    gt_area: float,
    gt_bbox: Optional[np.ndarray],
    variances: np.ndarray,
) -> Optional[np.ndarray]:
    """Native OKS of one gt vs [D, K*3] detections; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    gt = np.ascontiguousarray(gt, np.float64)
    dts = np.ascontiguousarray(dts, np.float64)
    variances = np.ascontiguousarray(variances, np.float64)
    num_kpts = len(variances)
    out = np.empty(len(dts), np.float64)
    bbox_ptr = (
        _dp(np.ascontiguousarray(gt_bbox, np.float64))
        if gt_bbox is not None
        else ctypes.POINTER(ctypes.c_double)()
    )
    lib.compute_oks_row(
        _dp(gt), _dp(dts), len(dts), num_kpts, float(gt_area), bbox_ptr,
        _dp(variances), _dp(out),
    )
    return out


def oks_iou_pairs(
    g: np.ndarray,
    d: np.ndarray,
    a_g: float,
    a_d: np.ndarray,
    variances: np.ndarray,
    vis_thr: Optional[float],
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    g = np.ascontiguousarray(g, np.float64)
    d = np.ascontiguousarray(d, np.float64)
    a_d = np.ascontiguousarray(a_d, np.float64)
    variances = np.ascontiguousarray(variances, np.float64)
    out = np.empty(len(d), np.float64)
    lib.oks_iou_pairs(
        _dp(g), _dp(d), len(d), len(variances), float(a_g), _dp(a_d),
        _dp(variances), -1.0 if vis_thr is None else float(vis_thr), _dp(out),
    )
    return out


def decode_rle_native(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, np.int64)
    out = np.zeros(h * w, np.uint8)
    rc = lib.decode_rle(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"RLE counts sum != h*w ({h}x{w})")
    return out.reshape(h, w)
