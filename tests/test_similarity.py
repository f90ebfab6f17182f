"""Similarity/scoring ops vs the reference implementation."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from vbx_tpu.io.plda import read_plda
from vbx_tpu.ops.calibration import two_gmm_calib_with_llrs
from vbx_tpu.ops.similarity import (cos_similarity, kaldi_plda_scoring_dense,
                                    l2_normalize, plda_scoring_in_lda_space)

from .util import import_reference

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(f"{REF}/VBx"),
                               reason="reference not mounted")


def _ref_lib():
    return import_reference("diarization_lib")


@needs_ref
def test_cos_similarity_matches_reference():
    lib = _ref_lib()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 24))
    ours = np.asarray(cos_similarity(jnp.asarray(x)))
    theirs = lib.cos_similarity(x)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@needs_ref
def test_plda_scoring_in_lda_space_matches_reference():
    lib = _ref_lib()
    rng = np.random.default_rng(1)
    Fe = rng.standard_normal((7, 16))
    Ft = rng.standard_normal((9, 16))
    ac = rng.uniform(0.1, 4.0, 16)
    ours = np.asarray(plda_scoring_in_lda_space(
        jnp.asarray(Fe), jnp.asarray(Ft), jnp.asarray(ac)))
    theirs = lib.PLDA_scoring_in_LDA_space(Fe, Ft, ac)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-10)


@needs_ref
def test_kaldi_plda_scoring_dense_matches_reference():
    lib = _ref_lib()
    plda = read_plda(f"{REF}/VBx/models/ResNet101_16kHz/plda")
    rng = np.random.default_rng(2)
    # PLDA-space-ish vectors: 128-d like the transformed x-vectors
    x = rng.standard_normal((40, 128))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ours = kaldi_plda_scoring_dense(plda, x, target_energy=0.3)
    theirs = lib.kaldi_ivector_plda_scoring_dense(plda, x, target_energy=0.3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


@needs_ref
def test_two_gmm_calib_with_llrs_matches_reference():
    lib = _ref_lib()
    rng = np.random.default_rng(3)
    s = np.concatenate([rng.normal(-1, 0.4, 3000), rng.normal(1, 0.4, 800)])
    thr_ref, llrs_ref = lib.twoGMMcalib_lin(s.copy())
    thr, llrs = two_gmm_calib_with_llrs(jnp.asarray(s))
    assert abs(float(thr) - thr_ref) < 1e-8
    np.testing.assert_allclose(np.asarray(llrs), llrs_ref, atol=1e-7)


def test_l2_normalize():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((5, 8))
    y = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, rtol=1e-12)


@needs_ref
def test_two_gmm_llrs_match_reference_before_convergence():
    """The reference returns lls computed at the TOP of the final EM
    iteration (params one update behind the threshold); with few iterations
    on slowly-separating data the distinction is measurable."""
    lib = _ref_lib()
    rng = np.random.default_rng(7)
    # barely-bimodal: EM still moving at every iteration count tested
    s = np.concatenate([rng.normal(0.0, 1.0, 4000),
                        rng.normal(0.45, 1.0, 2500)])
    for niters in (1, 3, 20):
        thr_ref, llrs_ref = lib.twoGMMcalib_lin(s.copy(), niters=niters)
        thr, llrs = two_gmm_calib_with_llrs(jnp.asarray(s), niters=niters)
        assert abs(float(thr) - thr_ref) < 1e-6, niters
        np.testing.assert_allclose(np.asarray(llrs), llrs_ref, atol=1e-6,
                                   err_msg=f"niters={niters}")
