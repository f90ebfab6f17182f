"""x-vector transform loader (HDF5 with keys mean1, lda, mean2).

The transform maps raw 256-d embeddings to the 128-d PLDA space:
l2norm(lda^T @ l2norm(x - mean1)^T)^T - mean2 (reference: vbhmm.py:125-129).
Asset layout verified on models/ResNet101_16kHz/transform.h5
(mean1 in R^256, lda in R^256x128, mean2 in R^128).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def read_xvec_transform(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    import h5py

    with h5py.File(path, "r") as f:
        mean1 = np.array(f["mean1"], dtype=np.float64)
        lda = np.array(f["lda"], dtype=np.float64)
        mean2 = np.array(f["mean2"], dtype=np.float64)
    return mean1, lda, mean2
