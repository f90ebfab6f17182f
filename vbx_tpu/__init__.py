"""vbx_tpu — a TPU-native speaker-diarization framework.

A brand-new JAX/XLA/Pallas implementation of the VBx diarization recipe
(x-vector extraction -> AHC initialization -> VB-HMM refinement -> RTTM
-> DER/JER scoring), designed TPU-first:

- the VB-HMM E-step (PLDA-space log-likelihoods + log-space forward-backward)
  and M-step (speaker posterior statistics) are fused, batched XLA/Pallas
  programs exploiting the rank-1 + diagonal transition structure for an
  exact O(S)-per-frame recursion,
- recordings batch over a data axis and frames shard over chips (ICI) via
  `jax.sharding` / `shard_map` with collective reductions for global
  sufficient statistics and ELBO convergence,
- AHC initialization is a batched pairwise-similarity kernel plus a native
  C++ nearest-neighbor-chain average-linkage step,
- the ResNet101 x-vector extractor is a Flax module compiled by XLA:TPU.

Capability parity target: BUTSpeechFIT/VBx (see SURVEY.md).
"""

__version__ = "0.1.0"

from vbx_tpu.config import (  # noqa: F401
    DATASET_PRESETS, DiarizationConfig, config_from_dict, config_to_dict,
    get_preset,
)
