"""Accelerator probe / picker — the TPU-native analogue of the
reference's `free_gpu.sh` (free_gpu.sh:54-82 picks an idle GPU via
nvidia-smi and exports CUDA_VISIBLE_DEVICES).

TPUs have no nvidia-smi and no shared-device etiquette: a chip is claimed
EXCLUSIVELY by one process, and a claimed (or dead-tunnel) chip hangs the
next process at backend initialization — which cannot be interrupted
in-process. So the probe runs a tiny jitted matmul in a SUBPROCESS under a
timeout (the same preflight bench.py uses) and reports whether the default
accelerator is usable; `pick_backend()` turns that into the JAX_PLATFORMS
value a wrapper script should export before launching real work.

    python -m vbx_tpu.utils.devices [--timeout S]

prints one JSON line: {"backend", "usable", "devices", "probe_s"} and
exits 0 iff an accelerator is usable (exit 1 = fall back to CPU), so
shell recipes can gate like the reference's `gpus=$(free_gpu.sh)`.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from typing import Optional

_PROBE = ("import jax, jax.numpy as jnp; "
          "d = jax.devices(); "
          "x = float((jnp.ones((64, 64)) @ jnp.ones((64, 64)))[0, 0]); "
          "print(jax.default_backend(), len(d), x)")


def probe_accelerator(timeout_s: float = 120.0) -> dict:
    """Probe the DEFAULT backend in a subprocess. Returns
    {backend, usable, devices, probe_s, error}: usable=False means the
    probe timed out (claimed/dead chip), crashed, or resolved to CPU."""
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE],
                           timeout=timeout_s, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        return {"backend": None, "usable": False, "devices": 0,
                "probe_s": round(time.perf_counter() - t0, 2),
                "error": f"probe timed out after {timeout_s:.0f}s "
                         f"(chip claimed by another process, or the "
                         f"tunnel is unresponsive)"}
    dt = round(time.perf_counter() - t0, 2)
    if r.returncode != 0:
        return {"backend": None, "usable": False, "devices": 0,
                "probe_s": dt,
                "error": (r.stderr or "probe crashed").strip()[-400:]}
    backend, n_dev, val = r.stdout.split()[:3]
    ok = float(val) == 64.0 and backend != "cpu"
    return {"backend": backend, "usable": ok, "devices": int(n_dev),
            "probe_s": dt, "error": None}


def pick_backend(timeout_s: float = 120.0) -> str:
    """'JAX_PLATFORMS' value for a new worker process: the probed default
    backend when an accelerator answers, else 'cpu' (the reference's
    free-GPU fallback is an empty CUDA_VISIBLE_DEVICES,
    free_gpu.sh:74-81)."""
    info = probe_accelerator(timeout_s)
    return info["backend"] if info["usable"] else "cpu"


def main(argv: Optional[list] = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    timeout_s = 120.0
    if "--timeout" in args:
        timeout_s = float(args[args.index("--timeout") + 1])
    info = probe_accelerator(timeout_s)
    print(json.dumps(info))
    return 0 if info["usable"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
