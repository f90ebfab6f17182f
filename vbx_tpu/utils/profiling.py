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


def parse_trace_executable_us(log_dir: str) -> Optional[float]:
    """Total device EXECUTABLE time (microseconds) from the newest
    TensorBoard trace under `log_dir` — the tunnel-independent ground
    truth for on-device cost (the wall clock includes dispatch latency
    and tunnel jitter; see BENCHMARKS.md 'trust model').

    Aggregates 'X' (complete) events on device-stream pids and sums the
    top-level 'jit*' executable spans (the trace nests executable >
    while-loop > kernel, so the flat sum double-counts). Returns None —
    never a fabricated number — when no trace file exists, when no
    device process can be identified, or when no 'jit*' span is found
    (op naming varies across jax/libtpu versions; a flat sum of
    unidentified events could double-count nested spans or include host
    threads, and the caller publishes this value as the benchmark's
    tunnel-independent ground truth)."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    files = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not files:
        return None
    with gzip.open(files[-1], "rt") as f:
        events = json.load(f)["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    if not dev_pids:
        return None
    # per-PID accumulation, then MAX over devices: an SPMD program's
    # executable span is replicated on every device pid, so a flat sum
    # over a multi-device (mesh) trace would read ~n_devices x the
    # actual device time; the busiest device's executable total is the
    # honest per-batch cost
    per_pid_jit = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        if pid not in dev_pids:
            continue
        if e.get("name", "").startswith("jit"):
            per_pid_jit[pid] += e["dur"]
    return max(per_pid_jit.values()) if per_pid_jit else None
