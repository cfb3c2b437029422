"""Profiling / tracing helpers.

The reference has no profiler (SURVEY.md §5.1 — only epoch-level scalar
summaries). Here: a context manager over ``jax.profiler`` writing TensorBoard
trace files, plus annotation helpers for step markup. Wired into tools/train.py
via ``--cfg-options profile=True profile_dir=...``.
"""
import contextlib
import logging
from typing import Iterator, Optional

__all__ = ["trace", "annotate", "StepTraceContext"]


@contextlib.contextmanager
def trace(log_dir: Optional[str], enabled: bool = True) -> Iterator[None]:
    """Capture a device trace for the enclosed block (no-op when disabled)."""
    if not enabled or not log_dir:
        yield
        return
    import jax

    logging.info("profiler trace -> %s", log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace done")


def annotate(name: str):
    """Named trace annotation for a region (shows up in the trace viewer)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTraceContext:
    """Annotate train steps: ``with StepTraceContext('train', step):``."""

    def __init__(self, name: str, step: int) -> None:
        import jax

        self._ctx = jax.profiler.StepTraceAnnotation(name, step_num=step)

    def __enter__(self):
        return self._ctx.__enter__()

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)
