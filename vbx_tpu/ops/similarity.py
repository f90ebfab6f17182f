"""Pairwise-similarity kernels for AHC initialization.

The reference computes an N x N cosine matrix in memory-bounded NumPy chunks
(diarization_lib.py:190-213); on TPU this is simply one MXU matmul — the
chunking machinery is obsolete by design. PLDA LLR scoring
(diarization_lib.py:34-56) likewise maps to a single rank-D matmul plus
rank-1 row/column corrections.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jax.Array, eps: float = 0.0, axis: int = -1) -> jax.Array:
    """Row-wise L2 normalization (reference: diarization_lib.l2_norm:172-187,
    eps=0; cos_similarity uses eps=1e-32 at :201)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / (norm + eps)


def cos_similarity(x: jax.Array) -> jax.Array:
    """N x N cosine similarity: one batched matmul on the MXU
    (semantics of diarization_lib.cos_similarity:190-213, sans chunking)."""
    xn = l2_normalize(x, eps=1e-32)
    return jnp.matmul(xn, xn.T, preferred_element_type=xn.dtype)


def plda_scoring_in_lda_space(Fe: jax.Array, Ft: jax.Array,
                              diag_ac: jax.Array) -> jax.Array:
    """Pairwise PLDA log-likelihood-ratio scores for LDA-transformed,
    length-normalized vectors with diagonal across-class covariance diag_ac
    (reference: diarization_lib.PLDA_scoring_in_LDA_space:34-56, following
    Burget et al., ICASSP 2011 eqs. 7-8). Returns [N, M]."""
    dtype = Fe.dtype
    diag_ac = diag_ac.astype(dtype)
    iTC = 1.0 / (1.0 + diag_ac)
    iWC2AC = 1.0 / (1.0 + 2.0 * diag_ac)
    ld_tc = jnp.sum(jnp.log1p(diag_ac))
    ld_wc2ac = jnp.sum(jnp.log1p(2.0 * diag_ac))
    gamma_ = -0.25 * (iWC2AC + 1.0 - 2.0 * iTC)
    lambda_ = -0.5 * (iWC2AC - 1.0)
    k = -0.5 * (ld_wc2ac - 2.0 * ld_tc)
    cross = jnp.matmul(Fe * lambda_, Ft.T, preferred_element_type=dtype)
    qe = jnp.matmul(Fe * Fe, gamma_[:, None], preferred_element_type=dtype)
    qt = jnp.matmul(Ft * Ft, gamma_[:, None], preferred_element_type=dtype)
    return cross + qe + qt.T + k


def kaldi_plda_scoring_dense(
    plda: Tuple[np.ndarray, np.ndarray, np.ndarray],
    x: np.ndarray,
    target_energy: float = 0.1,
    pca_dim: Optional[int] = None,
) -> np.ndarray:
    """Kaldi-recipe-equivalent dense PLDA similarity matrix with
    per-recording PCA (reference: diarization_lib.
    kaldi_ivector_plda_scoring_dense:59-93).

    The tiny per-recording eigendecompositions (R x R with R <= 256) run on
    the host in float64 — they are model prep, not throughput work; the
    resulting N x N scoring matmul runs through `plda_scoring_in_lda_space`
    on device.
    """
    import scipy.linalg

    from vbx_tpu.utils.hostblas import single_thread_blas

    plda_mu, plda_tr, plda_psi = plda
    cov = np.cov(x.T, bias=True)   # O(N*R^2) dgemm: keeps the full pool
    # tiny (<=256x256) per-recording LAPACK: pinned to one BLAS thread —
    # the multi-threaded path is load-dependently ~200x slower at this
    # size (utils/hostblas.py)
    with single_thread_blas():
        energy, PCA = scipy.linalg.eigh(cov)
        if pca_dim is None:
            energy = np.cumsum(energy[::-1])
            # at least 2 dims: 2 extra are always added (reference :81-82)
            pca_dim = int(np.sum(energy / energy[-1] <= target_energy) + 2)
        PCA = PCA[:, :-pca_dim - 1:-1]

        plda_tr_inv_pca = PCA.T @ np.linalg.inv(plda_tr)
        W = plda_tr_inv_pca @ plda_tr_inv_pca.T
        B = (plda_tr_inv_pca * plda_psi) @ plda_tr_inv_pca.T
        acvar, wccn = scipy.linalg.eigh(B, W)
    x = (x - plda_mu) @ PCA @ wccn
    # kaldi-style length norm (reference :92)
    x *= np.sqrt(x.shape[1] / (x ** 2 @ (1.0 / (acvar + 1.0))))[:, None]
    scores = plda_scoring_in_lda_space(
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(acvar))
    return np.asarray(scores)


# NOTE: the x-vector transform (vbhmm.py:125-129) deliberately has NO
# device-side implementation here: it feeds the AHC init chain, whose
# calibration threshold and linkage cut are float64-sensitive, so the
# authoritative implementation is host f64 in engine.pipeline.Diarizer
# .transform_xvectors (see CLAUDE.md invariants).
