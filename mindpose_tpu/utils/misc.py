"""Misc: metric averaging + cross-process reduction + throughput meter.

Parity: /root/reference/mindpose/utils/misc.py:7-35 (Allreduce cell,
AverageMeter), plus a StepTimer for the images/sec/chip metric the reference
never measured (BASELINE.md).
"""
import time
from typing import Optional

import numpy as np

__all__ = ["AverageMeter", "allreduce_mean", "StepTimer"]


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0.0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def allreduce_mean(value: np.ndarray) -> np.ndarray:
    """Mean across processes (the reference's loss AllReduce/device_num,
    eval_callback.py:127-131). In-jit reductions use lax.pmean; this is the
    host-side variant for logging in multi-host runs."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(value)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(value)).mean(axis=0)
    )


class StepTimer:
    """Throughput meter: images/sec (per chip when divided by device count)."""

    def __init__(self) -> None:
        self._t0: Optional[float] = None
        self._images = 0
        self._steps = 0
        self._elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, num_images: int) -> None:
        assert self._t0 is not None
        self._elapsed += time.perf_counter() - self._t0
        self._images += num_images
        self._steps += 1
        self._t0 = None

    @property
    def images_per_sec(self) -> float:
        return self._images / self._elapsed if self._elapsed else 0.0

    @property
    def avg_step_time(self) -> float:
        return self._elapsed / self._steps if self._steps else 0.0
