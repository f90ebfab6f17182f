"""Multi-host initialization for pod slices.

The reference's "cluster interface" is text task files handed to a grid
engine (AMI_run.sh:30-33,53-58); here a corpus run on an N-host slice is N
identical processes that call `initialize()` and then shard recordings over
the 'dp' mesh axis (DCN) while each host's chips frame-shard over 'sp'
(ICI). Recordings are embarrassingly parallel across hosts, so DCN traffic
is only the corpus scatter/result gather — the reference's process model,
minus the grid engine.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op on a single
    process with no configuration."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return                          # single-process run
    kw = {}
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    elif "NUM_PROCESSES" in os.environ:
        kw["num_processes"] = int(os.environ["NUM_PROCESSES"])
    if process_id is not None:
        kw["process_id"] = process_id
    elif "PROCESS_ID" in os.environ:
        kw["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kw)


def local_recording_slice(n_recordings: int) -> slice:
    """The contiguous slice of a recording list owned by this process
    (corpus sharding over hosts)."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_recordings // n)
    return slice(p * per, min((p + 1) * per, n_recordings))
