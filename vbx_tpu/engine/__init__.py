"""The batched VB-HMM inference engine and the diarization pipeline built
around it (AHC / random initialization, label post-processing)."""

from vbx_tpu.engine.vbhmm import VBxResult, vbx, vbx_batched  # noqa: F401
from vbx_tpu.engine.ahc import (  # noqa: F401
    ahc_labels, random_labels, smooth_labels_to_gamma,
)
from vbx_tpu.engine.debug import frame_der, vbx_debug  # noqa: F401
from vbx_tpu.engine.extractor import (  # noqa: F401
    XVectorExtractor, extract_to_ark,
)
from vbx_tpu.engine.pipeline import (  # noqa: F401
    diarize_xvectors, diarize_ark, DiarizationOutput,
)
