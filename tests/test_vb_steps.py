"""E/M-step kernels vs oracle formulas (reference math VBx/VBx.py:87-104)."""

import jax.numpy as jnp
import numpy as np

from vbx_tpu.ops.vb_steps import (vb_elbo_model_term, vb_log_likelihoods,
                                  vb_m_step, vb_pi_update, vb_precompute)

from .oracle import random_vb_problem


def _setup(seed=0, T=157, S=9, D=24):
    rng = np.random.default_rng(seed)
    X, phi, gamma, pi = random_vb_problem(rng, T, S, D)
    return X, phi, gamma, pi


def test_precompute():
    X, phi, _, _ = _setup()
    G, rho = vb_precompute(jnp.asarray(X), jnp.asarray(phi))
    D = X.shape[1]
    G_ref = -0.5 * ((X ** 2).sum(1, keepdims=True) + D * np.log(2 * np.pi))
    np.testing.assert_allclose(np.asarray(G), G_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rho), X * np.sqrt(phi), rtol=1e-12)


def test_m_step_and_log_likelihoods_and_elbo():
    X, phi, gamma, _ = _setup()
    Fa, Fb = 0.4, 11.0
    G, rho = vb_precompute(jnp.asarray(X), jnp.asarray(phi))
    invL, alpha = vb_m_step(jnp.asarray(gamma), rho, jnp.asarray(phi), Fa / Fb)

    rho_ref = X * np.sqrt(phi)
    invL_ref = 1.0 / (1.0 + (Fa / Fb) * gamma.sum(0)[:, None] * phi[None, :])
    alpha_ref = (Fa / Fb) * invL_ref * (gamma.T @ rho_ref)
    np.testing.assert_allclose(np.asarray(invL), invL_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(alpha), alpha_ref, rtol=1e-10)

    log_p = vb_log_likelihoods(rho, G, invL, alpha, jnp.asarray(phi), Fa)
    G_ref = -0.5 * ((X ** 2).sum(1) + X.shape[1] * np.log(2 * np.pi))
    log_p_ref = Fa * (rho_ref @ alpha_ref.T
                      - 0.5 * ((invL_ref + alpha_ref ** 2) @ phi)[None, :]
                      + G_ref[:, None])
    np.testing.assert_allclose(np.asarray(log_p), log_p_ref, rtol=1e-9,
                               atol=1e-9)

    elbo_term = vb_elbo_model_term(invL, alpha, Fb)
    ref = Fb * 0.5 * np.sum(np.log(invL_ref) - invL_ref - alpha_ref ** 2 + 1)
    np.testing.assert_allclose(float(elbo_term), ref, rtol=1e-10)


def test_pi_update():
    rng = np.random.default_rng(5)
    S = 7
    gamma0 = rng.dirichlet(np.ones(S))
    pi = rng.dirichlet(np.ones(S))
    pi_stat = rng.uniform(0, 50, S)
    loopP = 0.8
    out = vb_pi_update(jnp.asarray(gamma0), jnp.asarray(pi),
                       jnp.asarray(pi_stat), loopP)
    ref = gamma0 + (1 - loopP) * pi * pi_stat
    ref /= ref.sum()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12)


def test_padded_speakers_contribute_zero_elbo():
    """Padded speakers (gamma column zero) must give invL=1, alpha=0 and so
    exactly zero ELBO model-term contribution."""
    X, phi, gamma, _ = _setup(seed=2)
    gamma = gamma.copy()
    gamma[:, -2:] = 0.0
    G, rho = vb_precompute(jnp.asarray(X), jnp.asarray(phi))
    invL, alpha = vb_m_step(jnp.asarray(gamma), rho, jnp.asarray(phi), 0.05)
    np.testing.assert_allclose(np.asarray(invL[-2:]), 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(alpha[-2:]), 0.0, atol=1e-15)

    full = vb_elbo_model_term(invL, alpha, 10.0)
    trimmed = vb_elbo_model_term(invL[:-2], alpha[:-2], 10.0)
    np.testing.assert_allclose(float(full), float(trimmed), rtol=1e-12)
