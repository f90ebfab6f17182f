"""Distributed execution: device meshes, frame-sharded forward-backward,
and the sharded VB-HMM engine.

The reference has NO distributed runtime — its only concurrency is shell
job fan-out per recording (reference: AMI_run.sh:30-33,53-58, extract.sh:20-36).
This package introduces the TPU-native equivalents (SURVEY.md §2.3):

- a 2-D ``Mesh(('dp', 'sp'))``: recordings data-parallel over 'dp', frames
  sequence-parallel over 'sp' (the HMM analogue of context parallelism),
- XLA collectives over ICI (psum for M-step sufficient statistics and the
  ELBO; all-gather of S x S block-transfer operators for the frame-sharded
  forward-backward) replacing the nonexistent NCCL/MPI layer,
- ``jax.distributed`` multi-host initialization for pod slices, where 'dp'
  rides DCN (embarrassingly parallel recordings) and 'sp' rides ICI.
"""

from vbx_tpu.parallel.mesh import make_mesh
from vbx_tpu.parallel.fb_blockwise import (
    forward_backward_blockwise, forward_backward_blockwise_pallas)
from vbx_tpu.parallel.engine import vbx_sharded

__all__ = ["make_mesh", "forward_backward_blockwise",
           "forward_backward_blockwise_pallas", "vbx_sharded"]
