"""Forward-backward kernels vs the float64 log-domain oracle."""

import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from vbx_tpu.ops.forward_backward import (
    forward_backward_assoc, forward_backward_dense,
    forward_backward_structured)

from .oracle import (forward_backward_oracle, random_hmm_problem,
                     structured_transition)

IMPLS = {
    "structured": forward_backward_structured,
    "assoc": forward_backward_assoc,
}


@pytest.mark.parametrize("impl", sorted(IMPLS))
@pytest.mark.parametrize("T,S", [(1, 3), (2, 2), (17, 5), (301, 12)])
def test_matches_oracle_f64(impl, T, S):
    # deterministic per-case seed (hash() is salted per process and would
    # make the parity data unreproducible across pytest invocations)
    rng = np.random.default_rng(
        zlib.crc32(f"{impl}-{T}-{S}".encode()))
    log_p, pi, loop_prob = random_hmm_problem(rng, T, S)
    tr = structured_transition(pi, loop_prob)
    g_ref, log_px_ref, lfw_ref, lbw_ref, pi_stat_ref = \
        forward_backward_oracle(log_p, tr, pi)

    r = IMPLS[impl](jnp.asarray(log_p), jnp.asarray(pi), loop_prob)
    np.testing.assert_allclose(np.asarray(r.gamma), g_ref, atol=1e-8)
    np.testing.assert_allclose(float(r.log_px), log_px_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(r.lfw), lfw_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r.lbw), lbw_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r.pi_stat), pi_stat_ref,
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("T,S", [(3, 2), (64, 7)])
def test_dense_matches_oracle_general_transition(T, S):
    rng = np.random.default_rng(T * 100 + S)
    log_p, _, _ = random_hmm_problem(rng, T, S)
    tr = rng.dirichlet(np.ones(S), size=S)      # arbitrary stochastic matrix
    ip = rng.dirichlet(np.ones(S))
    g_ref, log_px_ref, _, _, pi_stat_ref = forward_backward_oracle(
        log_p, tr, ip)
    r = forward_backward_dense(jnp.asarray(log_p), jnp.asarray(tr),
                               jnp.asarray(ip))
    np.testing.assert_allclose(np.asarray(r.gamma), g_ref, atol=1e-8)
    np.testing.assert_allclose(float(r.log_px), log_px_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(r.pi_stat), pi_stat_ref, rtol=1e-7)


@pytest.mark.parametrize("impl", sorted(IMPLS))
def test_f32_stays_exact_at_long_T(impl):
    """The motivating bug: unnormalized log recursions drift in f32 once
    cumulative scores reach ~1e4. The scaled forms must keep posteriors
    within ~1e-4 of the f64 oracle even at T where |log_px| ~ 1e5."""
    rng = np.random.default_rng(7)
    T, S = 1500, 23
    log_p, pi, loop_prob = random_hmm_problem(rng, T, S, scale=5.0)
    tr = structured_transition(pi, loop_prob)
    g_ref, log_px_ref, _, _, pi_stat_ref = forward_backward_oracle(log_p, tr, pi)

    r = IMPLS[impl](jnp.asarray(log_p, jnp.float32),
                    jnp.asarray(pi, jnp.float32), loop_prob)
    assert abs(float(log_px_ref)) > 3e4
    # the sequential scaled form is per-frame exact; the assoc form
    # accumulates rounding through its log2(T) composition rounds
    tol = 2e-4 if impl == "structured" else 2e-3
    np.testing.assert_allclose(np.asarray(r.gamma), g_ref, atol=tol)
    np.testing.assert_allclose(float(r.log_px), log_px_ref, rtol=1e-5)
    # pi_stat entries are sums of per-frame probabilities (magnitudes up to
    # ~T); require ~4 significant digits relative to the largest entry
    np.testing.assert_allclose(np.asarray(r.pi_stat), pi_stat_ref,
                               atol=tol * pi_stat_ref.max())


@pytest.mark.parametrize("impl", sorted(IMPLS))
def test_padding_is_exact(impl):
    """A padded run restricted to the valid prefix must equal the unpadded
    run bit-for-bit in what it returns (gamma zeroed on padding)."""
    rng = np.random.default_rng(3)
    T, S, pad = 97, 6, 31
    log_p, pi, loop_prob = random_hmm_problem(rng, T + pad, S)
    mask = np.arange(T + pad) < T

    full = IMPLS[impl](jnp.asarray(log_p[:T]), jnp.asarray(pi), loop_prob)
    padded = IMPLS[impl](jnp.asarray(log_p), jnp.asarray(pi), loop_prob,
                         frame_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(padded.gamma[:T]),
                               np.asarray(full.gamma), atol=1e-12)
    assert np.all(np.asarray(padded.gamma[T:]) == 0.0)
    np.testing.assert_allclose(float(padded.log_px), float(full.log_px),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(padded.pi_stat),
                               np.asarray(full.pi_stat), rtol=1e-10)


def test_gamma_rows_sum_to_one():
    rng = np.random.default_rng(11)
    log_p, pi, loop_prob = random_hmm_problem(rng, 200, 9)
    r = forward_backward_structured(jnp.asarray(log_p), jnp.asarray(pi),
                                    loop_prob)
    np.testing.assert_allclose(np.asarray(r.gamma).sum(1), 1.0, atol=1e-9)


def test_single_speaker():
    rng = np.random.default_rng(13)
    log_p, _, _ = random_hmm_problem(rng, 40, 1)
    r = forward_backward_structured(jnp.asarray(log_p), jnp.ones((1,)), 0.9)
    np.testing.assert_allclose(np.asarray(r.gamma), 1.0, atol=1e-12)
