"""Persistent XLA compilation cache.

Corpus runs pay tens of seconds per compiled engine shape through the
tunnel-attached chip (BENCHMARKS.md); the persistent cache removes that
cost for every shape seen before, across processes and sessions (verified
working with the axon PJRT plugin: 1.3s compile -> 0.2s reload). Enabled
by the pipeline/CLI/bench entry points; library users call `enable()`
themselves. Opt out with VBX_TPU_COMPILE_CACHE=off.
"""

from __future__ import annotations

import os
from typing import Optional

_OFF = ("0", "off", "none", "disabled")


def enable(path: Optional[str] = None) -> Optional[str]:
    """Idempotently enable the persistent compilation cache.

    Respects an already-configured jax_compilation_cache_dir (returns it
    unchanged). Default location: $VBX_TPU_COMPILE_CACHE, else
    ~/.cache/vbx_tpu/xla. Returns the active cache dir, or None if
    disabled."""
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = path or os.environ.get("VBX_TPU_COMPILE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "vbx_tpu", "xla")
    if path.lower() in _OFF:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything nontrivial; engine shapes compile in 2-250s
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
