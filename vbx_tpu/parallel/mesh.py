"""Device-mesh construction for the diarization engine.

Axes:
  'dp' — data parallel over recordings (across hosts / DCN: recordings are
         embarrassingly parallel, matching the reference's per-recording
         task fan-out, AMI_run.sh:53-58)
  'sp' — sequence parallel over frames within a recording (across a host's
         chips / ICI: boundary-operator collectives, see fb_blockwise)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_dp: Optional[int] = None, n_sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('dp', 'sp') mesh over `n_dp * n_sp` devices.

    With n_dp omitted, uses all available devices split by n_sp. On real
    TPU slices jax's device order already follows the torus; for the
    CPU fake backend any order is fine.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        if len(devices) % n_sp:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"n_sp={n_sp}")
        n_dp = len(devices) // n_sp
    need = n_dp * n_sp
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_dp, n_sp)
    return Mesh(arr, ("dp", "sp"))


def parse_mesh(spec: Optional[str]) -> Optional[Mesh]:
    """CLI mesh spec 'DPxSP' (e.g. '4x2') -> Mesh, or None for None/''.
    Shared by the diarize and serve CLIs."""
    if not spec:
        return None
    try:
        n_dp, n_sp = (int(v) for v in spec.lower().split("x"))
    except ValueError:
        raise ValueError(f"mesh spec must look like 4x2, got {spec!r}")
    return make_mesh(n_dp=n_dp, n_sp=n_sp)


def parse_mesh_arg(spec: Optional[str]) -> Optional[Mesh]:
    """parse_mesh with CLI error semantics: a bad spec (or a spec needing
    more devices than available) exits with a clean `--mesh: ...` message
    instead of a traceback. The ONE wrapper every CLI shares (diarize,
    serve, run_corpus)."""
    try:
        return parse_mesh(spec)
    except ValueError as exc:
        raise SystemExit(f"--mesh: {exc}")
