"""AHC initialization: TPU pairwise similarity + 2-GMM threshold calibration
feeding the native average-linkage merge and flat cut.

Pipeline parity with the reference diarization CLI (vbhmm.py:131-146):
similarity matrix -> utterance-specific calibration threshold -> condensed
negative-similarity matrix -> average linkage -> distance cut at
-(thr + threshold_bias), implemented with the reference's nonnegative-shift
('adjust') transformation of the linkage distances.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vbx_tpu.clustering import (
    fcluster_by_distance, linkage, squareform_condensed)
from vbx_tpu.ops.calibration import two_gmm_calib_lin_binned
from vbx_tpu.ops.similarity import cos_similarity, kaldi_plda_scoring_dense


def ahc_labels(
    x: np.ndarray,
    threshold_bias: float,
    similarity: str = "cosine",
    plda: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    target_energy: float = 1.0,
    pca_dim: Optional[int] = None,
    linkage_backend: Optional[str] = None,
    compute_backend: str = "host",
) -> np.ndarray:
    """Cluster x-vectors; returns 0-based integer labels [N].

    x is the transformed (PLDA-space, length-normalized) x-vector matrix.
    `similarity` selects cosine (reference default, vbhmm.py:135) or the
    Kaldi-equivalent dense PLDA scoring (diarization_lib.py:59-93).

    `compute_backend='host'` (default) runs the similarity matrix and the
    2-GMM calibration in float64 NumPy: the calibration threshold feeds the
    linkage cut, so it decides the AHC cluster count, and f32 perturbations
    there measurably shift the VB init (observed: 31 -> 32 clusters on the
    ES2005a golden run). The init chain is O(N^2 D) once per recording —
    host-cheap next to the VB loop. 'device' computes the similarity matrix
    and calibration on the accelerator in its dtype (for very long
    recordings where the N x N matmul dominates); the calibration then runs
    in f64 on the host over the device-computed scores.
    """
    n = x.shape[0]
    if n == 1:
        return np.zeros(1, dtype=np.int32)

    if similarity == "cosine":
        if compute_backend == "host":
            x64 = np.asarray(x, dtype=np.float64)
            xn = x64 / (np.sqrt((x64 * x64).sum(axis=1, keepdims=True)) + 1e-32)
            scr_mx = xn @ xn.T
        else:
            scr_mx = np.asarray(cos_similarity(jnp.asarray(x)))
    elif similarity == "plda":
        if plda is None:
            raise ValueError("similarity='plda' requires a plda model")
        scr_mx = kaldi_plda_scoring_dense(
            plda, np.asarray(x), target_energy=target_energy, pca_dim=pca_dim)
    else:
        raise ValueError(f"unknown similarity {similarity!r}")

    # utterance-specific calibration threshold over all N^2 scores
    # (vbhmm.py:137), in f64 on host for cut-threshold parity.
    thr = two_gmm_calib_lin_binned(scr_mx)

    condensed = squareform_condensed(scr_mx, negate=True)
    Z = linkage(condensed, method="average", backend=linkage_backend)
    # shift distances nonnegative exactly as the reference does
    # (vbhmm.py:143-146) so the cut threshold transforms identically
    adjust = abs(Z[:, 2].min())
    Z = Z.copy()
    Z[:, 2] += adjust
    labels = fcluster_by_distance(Z, -(thr + threshold_bias) + adjust,
                                  backend=linkage_backend)
    return labels.astype(np.int32)


def smooth_labels_to_gamma(labels: np.ndarray, smoothing: float,
                           n_speakers: Optional[int] = None) -> np.ndarray:
    """Hard labels -> soft responsibilities: softmax(onehot * smoothing)
    (reference: vbhmm.py:150-152)."""
    labels = np.asarray(labels)
    S = int(labels.max()) + 1 if n_speakers is None else n_speakers
    onehot = np.zeros((len(labels), S))
    onehot[np.arange(len(labels)), labels] = 1.0
    z = onehot * smoothing
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def random_labels(n: int, n_speakers: int, seed: int = 0) -> np.ndarray:
    """Uniform random speaker assignment — the reference README's
    `random_<number>` init for long recordings where AHC is too slow
    (README.md:24; absent from the reference snapshot's CLI)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, n_speakers, size=n).astype(np.int32)
