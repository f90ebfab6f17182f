"""TPU compute ops: log-space forward-backward (structured O(S) scan,
associative-scan, and dense variants), VB E/M-steps, pairwise similarities,
and score calibration. Everything here is jittable, vmappable, shardable."""

from vbx_tpu.ops.lse import NEG_INF, masked_logsumexp  # noqa: F401
from vbx_tpu.ops.forward_backward import (  # noqa: F401
    forward_backward_dense,
    forward_backward_structured,
    forward_backward_assoc,
)
from vbx_tpu.ops.vb_steps import (  # noqa: F401
    vb_m_step, vb_log_likelihoods, vb_elbo_model_term,
)
from vbx_tpu.ops.similarity import (  # noqa: F401
    cos_similarity, plda_scoring_in_lda_space,
)
from vbx_tpu.ops.calibration import two_gmm_calib_lin  # noqa: F401
