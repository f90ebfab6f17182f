"""Profiling helpers (SURVEY.md §5: the reference has only a wall-clock
Timer; the TPU equivalent is jax.profiler traces + per-stage timers)."""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[Optional[str]]:
    """Capture a jax.profiler trace (viewable in XProf/TensorBoard).

    With log_dir None (or VBX_TPU_TRACE_DIR unset), a no-op — safe to leave
    in production paths. Yields the directory the trace is written to."""
    import jax

    log_dir = log_dir or os.environ.get("VBX_TPU_TRACE_DIR")
    if not log_dir:
        yield None
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline
    (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
