"""Host-side file-format codecs (Kaldi ark/segments/PLDA, HDF5 transform,
RTTM, VAD labels, wav). All pure Python/NumPy — I/O stays on the host; only
tensors cross to the TPU."""

from vbx_tpu.io.ark import (  # noqa: F401
    read_vec_ark, write_vec_ark, iter_vec_ark, group_by_recording,
    write_txt_vectors, read_txt_vectors,
)
from vbx_tpu.io.kaldi_matrix import (  # noqa: F401
    iter_mat_ark, read_mat_ark, read_mat_binary, read_sparse_mat,
    write_mat_ark)
from vbx_tpu.io.onnx import read_onnx  # noqa: F401
from vbx_tpu.io.plda import read_plda  # noqa: F401
from vbx_tpu.io.transform import read_xvec_transform  # noqa: F401
from vbx_tpu.io.rttm import write_rttm, read_rttm, RttmSegment  # noqa: F401
from vbx_tpu.io.segments import (  # noqa: F401
    read_segments, read_xvector_timing_dict,
)
from vbx_tpu.io.vad import read_lab  # noqa: F401
