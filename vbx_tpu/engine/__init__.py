"""The batched VB-HMM inference engine and the diarization pipeline built
around it (AHC / random initialization, label post-processing).

The NN extraction stack (engine.extractor, needs flax) and the debug
oracle (engine.debug, needs scipy.optimize) are NOT imported eagerly —
diarization/scoring paths don't depend on them; import those modules
directly."""

from vbx_tpu.engine.vbhmm import (  # noqa: F401
    VBxResult, vbx, vbx_batched, vbx_batched_checkpointed)
from vbx_tpu.engine.ahc import (  # noqa: F401
    ahc_labels, random_labels, smooth_labels_to_gamma,
)
from vbx_tpu.engine.pipeline import (  # noqa: F401
    diarize_xvectors, diarize_ark, DiarizationOutput,
)
