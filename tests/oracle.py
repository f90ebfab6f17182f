"""Float64 NumPy oracle implementations for kernel/engine parity tests.

Independent re-derivations of the VBx math (Landini et al. 2022, eqs. as
mapped in SURVEY.md §3.3; reference semantics VBx/VBx.py:27-175) written
against which the JAX/TPU kernels are validated. Everything here is plain
log-domain float64 NumPy — slow and exact, never used in the product path.
"""

from __future__ import annotations

import numpy as np
from scipy.special import logsumexp, softmax


def forward_backward_oracle(log_p, tr, ip, eps=1e-8):
    """Sequential log-domain smoother for an arbitrary transition matrix.

    Returns (gamma, log_px, lfw, lbw, pi_stat) with the same regularization
    as the reference (log of tr+eps / ip+eps)."""
    T, S = log_p.shape
    ltr = np.log(tr + eps)
    lfw = np.empty((T, S))
    lbw = np.zeros((T, S))
    lfw[0] = log_p[0] + np.log(ip + eps)
    for t in range(1, T):
        lfw[t] = log_p[t] + logsumexp(lfw[t - 1][:, None] + ltr, axis=0)
    for t in range(T - 2, -1, -1):
        lbw[t] = logsumexp(ltr + log_p[t + 1] + lbw[t + 1], axis=1)
    log_px = logsumexp(lfw[-1])
    gamma = np.exp(lfw + lbw - log_px)
    pi_stat = np.exp(
        logsumexp(lfw[:-1], axis=1)[:, None] + log_p[1:] + lbw[1:] - log_px
    ).sum(axis=0)
    return gamma, log_px, lfw, lbw, pi_stat


def structured_transition(pi, loop_prob):
    S = len(pi)
    return loop_prob * np.eye(S) + (1.0 - loop_prob) * np.tile(pi, (S, 1))


def vbx_oracle(X, phi, loop_prob, Fa, Fb, pi, gamma, max_iters=40,
               epsilon=1e-6, alpha=None, invL=None):
    """Full VB-HMM EM loop in float64 (reference semantics VBx/VBx.py:27-126:
    iteration 0 never converges; the Delta-ELBO < eps check runs after the
    state update so the crossing iteration's update is kept; a provided
    (alpha, invL) model skips the first M-step)."""
    X = np.asarray(X, np.float64)
    phi = np.asarray(phi, np.float64)
    pi = np.asarray(pi, np.float64).copy()
    gamma = np.asarray(gamma, np.float64).copy()
    T, D = X.shape
    S = pi.shape[0]

    G = -0.5 * ((X ** 2).sum(1) + D * np.log(2 * np.pi))
    rho = X * np.sqrt(phi)
    elbos = []
    for it in range(max_iters):
        if it == 0 and alpha is not None and invL is not None:
            a, iL = np.asarray(alpha, np.float64), np.asarray(invL, np.float64)
        else:
            iL = 1.0 / (1.0 + (Fa / Fb) * gamma.sum(0)[:, None] * phi[None, :])
            a = (Fa / Fb) * iL * (gamma.T @ rho)
        log_p = Fa * (rho @ a.T - 0.5 * ((iL + a ** 2) @ phi)[None, :]
                      + G[:, None])
        tr = structured_transition(pi, loop_prob)
        g, log_px, lfw, lbw, pi_stat = forward_backward_oracle(log_p, tr, pi)
        elbo = log_px + Fb * 0.5 * np.sum(np.log(iL) - iL - a ** 2 + 1.0)
        new_pi = g[0] + (1.0 - loop_prob) * pi * pi_stat
        pi = new_pi / new_pi.sum()
        gamma = g
        elbos.append(elbo)
        if it > 0 and elbos[-1] - elbos[-2] < epsilon:
            break
    return gamma, pi, np.array(elbos), a, iL


def smooth_labels_oracle(labels, smoothing):
    S = int(labels.max()) + 1
    onehot = np.eye(S)[labels]
    return softmax(onehot * smoothing, axis=1)


def random_hmm_problem(rng, T, S, scale=3.0):
    """Random structured-HMM inputs: log_p with plausible magnitudes, a
    normalized prior, and a loop probability."""
    log_p = scale * rng.standard_normal((T, S)) - 30.0
    pi = rng.dirichlet(np.ones(S))
    loop_prob = rng.uniform(0.3, 0.99)
    return log_p, pi, loop_prob


def random_vb_problem(rng, T, S, D):
    """Random VB inputs resembling PLDA-space features: cluster-structured
    X so the EM has something to find."""
    centers = rng.standard_normal((S, D)) * 2.0
    z = rng.integers(0, S, size=T)
    X = centers[z] + rng.standard_normal((T, D))
    phi = rng.uniform(0.5, 5.0, size=D)
    gamma = rng.dirichlet(np.ones(S), size=T)
    pi = np.full(S, 1.0 / S)
    return X, phi, gamma, pi
