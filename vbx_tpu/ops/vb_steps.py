"""VB-HMM E/M-step compute kernels (XLA).

Model: zero-mean PLDA-space Gaussians with diagonal across-class covariance
Phi and identity within-class covariance; speaker posteriors q(y_s) are
Gaussians with mean alpha[s] and diagonal precision-inverse invL[s]
(reference math: VBx/VBx.py:87-100, eqs. (16)-(25) of Landini et al. 2022).

Shapes: T frames x S speakers x D dims. The two matmuls ([S,T]x[T,D] stats
and [T,D]x[D,S] log-liks) are the MXU work; everything else fuses into them.
All functions are pure, jittable, vmappable; padded speakers/frames are
handled by zeroed gamma rows/columns (their invL becomes 1 and alpha 0, so
they contribute exactly 0 to the ELBO model term, matching an unpadded run).

Every dot here is pinned to Precision.HIGHEST: these functions are the
reference-faithful f32 path, and the TPU's DEFAULT matmul precision feeds
the MXU bfloat16-rounded inputs. At AMI scale (T~1e4, |ELBO|~1e6) that
rounding puts ~0.5-absolute noise on the ELBO, which fires the
delta<epsilon stop rule (VBx/VBx.py:122) 3x early — measured on the chip:
default precision converged 18 meetings in 5-13 iterations with one
meeting at 62% label agreement vs the reference (corpus DER 3.78), while
HIGHEST reproduces the CPU trajectory (9-40 iterations, >=99.2%
agreement, corpus DER 0.09 — BENCHMARKS.md "Matmul precision at corpus
scale", round 4). The dots are HBM-bound at these shapes, so the extra
MXU passes are nearly free (f32 pallas corpus wall 44.9 s at HIGHEST vs
46.6 s at DEFAULT, same battery).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def vb_precompute(X: jax.Array, phi: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-recording constants: G[t] = -0.5*(sum_d X[t]^2 + D*log(2*pi)) and
    rho = X * sqrt(phi) (reference: VBx.py:87-89)."""
    D = X.shape[-1]
    G = -0.5 * (jnp.sum(X * X, axis=-1, keepdims=True)
                + D * jnp.log(2 * jnp.pi).astype(X.dtype))
    rho = X * jnp.sqrt(phi).astype(X.dtype)
    return G, rho


def vb_m_step(gamma: jax.Array, rho: jax.Array, phi: jax.Array,
              fa_over_fb) -> Tuple[jax.Array, jax.Array]:
    """Speaker-model update: invL[s,d] = 1/(1 + Fa/Fb * N_s * phi_d),
    alpha = Fa/Fb * invL * (gamma^T rho) (reference: VBx.py:95-96).

    gamma: [T, S] responsibilities (padded frames must be zero rows).
    rho:   [T, D].
    Returns (invL, alpha), both [S, D].
    """
    dtype = rho.dtype
    fa_over_fb = jnp.asarray(fa_over_fb, dtype)
    counts = jnp.sum(gamma, axis=0)  # [S] — the cross-frame reduction (psum
    # over the frame-sharded axis in the distributed engine)
    invL = 1.0 / (1.0 + fa_over_fb * counts[:, None] * phi[None, :].astype(dtype))
    stats = jnp.einsum("ts,td->sd", gamma, rho,
                       preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)  # [S, D]
    alpha = fa_over_fb * invL * stats
    return invL, alpha


def vb_log_likelihoods(rho: jax.Array, G: jax.Array, invL: jax.Array,
                       alpha: jax.Array, phi: jax.Array, fa) -> jax.Array:
    """Per-frame per-speaker expected log-likelihoods
    log_p[t,s] = Fa*(rho[t]@alpha[s] - 0.5*(invL[s]+alpha[s]^2)@phi + G[t])
    (reference: VBx.py:97). Returns [T, S]."""
    dtype = rho.dtype
    fa = jnp.asarray(fa, dtype)
    cross = jnp.einsum("td,sd->ts", rho, alpha, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
    quad = jnp.einsum("sd,d->s", invL + alpha * alpha, phi.astype(dtype),
                      preferred_element_type=dtype,
                      precision=jax.lax.Precision.HIGHEST)
    return fa * (cross - 0.5 * quad[None, :] + G)


def vb_elbo_model_term(invL: jax.Array, alpha: jax.Array, fb) -> jax.Array:
    """Speaker-model KL part of the ELBO:
    Fb * 0.5 * sum(log(invL) - invL - alpha^2 + 1) (reference: VBx.py:100).
    Padded speakers (invL==1, alpha==0) contribute exactly 0."""
    dtype = invL.dtype
    fb = jnp.asarray(fb, dtype)
    return fb * 0.5 * jnp.sum(jnp.log(invL) - invL - alpha * alpha + 1.0)


def vb_pi_update(gamma0: jax.Array, pi: jax.Array, pi_stat: jax.Array,
                 loop_prob) -> jax.Array:
    """Speaker-prior update pi <- gamma[0] + (1-loopP)*pi*pi_stat, normalized
    (reference: VBx.py:101-104). Padded speakers keep pi == 0 since both
    terms vanish there."""
    dtype = pi.dtype
    loop_prob = jnp.asarray(loop_prob, dtype)
    new_pi = gamma0 + (1.0 - loop_prob) * pi * pi_stat
    return new_pi / jnp.sum(new_pi)
