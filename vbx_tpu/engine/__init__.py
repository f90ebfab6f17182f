"""The batched VB-HMM inference engine and the diarization pipeline built
around it (AHC / random initialization, label post-processing)."""

from vbx_tpu.engine.vbhmm import VBxResult, vbx, vbx_batched  # noqa: F401
from vbx_tpu.engine.ahc import ahc_labels  # noqa: F401
from vbx_tpu.engine.pipeline import (  # noqa: F401
    diarize_xvectors, diarize_ark, DiarizationOutput,
)
