"""Sharded VB-HMM engine: recordings x frames over a ('dp', 'sp') mesh.

The EM loop of engine.vbhmm, distributed (SURVEY.md §2.3):
- recordings sharded over 'dp' (independent; no cross-'dp' communication,
  mirroring the reference's per-recording process fan-out),
- frames sharded over 'sp' with psum'd M-step sufficient statistics
  (sum_t gamma and gamma^T rho — the reductions at VBx/VBx.py:95-96) and the
  blockwise boundary-exchange forward-backward (fb_blockwise),
- per-recording convergence masking identical to the single-chip engine:
  chips in an 'sp' group compute identical (psum-replicated) ELBOs, so
  their while_loops stay in lockstep without extra synchronization.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vbx_tpu.ops.lse import NEG_INF, masked_fill
from vbx_tpu.ops.vb_steps import (vb_elbo_model_term, vb_log_likelihoods,
                                  vb_pi_update, vb_precompute)
from vbx_tpu.parallel.fb_blockwise import forward_backward_blockwise


class ShardedVBxResult(NamedTuple):
    gamma: jax.Array    # [B, T, S] sharded ('dp', 'sp', None)
    pi: jax.Array       # [B, S] sharded ('dp', None)
    elbo: jax.Array     # [B, max_iters]
    n_iters: jax.Array  # [B]


class _State(NamedTuple):
    it: jax.Array
    converged: jax.Array
    gamma: jax.Array
    pi: jax.Array
    elbo: jax.Array
    last_elbo: jax.Array


def _vb_em_sharded_single(X, phi, gamma, pi, frame_mask, speaker_mask,
                          loop_prob, fa, fb, epsilon, converged0,
                          last_elbo0, *,
                          max_iters: int, axis_name: str):
    """One recording, local frame block [Tl, ...]; runs inside
    vmap(recordings) inside shard_map(mesh). converged0/last_elbo0
    resume a run mid-EM (engine-state checkpointing, same semantics as
    the unsharded engine: a fresh lane carries NEG_INF and may not
    converge on its first iteration)."""
    dtype = X.dtype
    G, rho = vb_precompute(X, phi)
    fa_over_fb = fa / fb

    gamma = (gamma * frame_mask[:, None].astype(dtype)
             * speaker_mask[None, :].astype(dtype))
    pi = pi * speaker_mask.astype(dtype)
    fresh = last_elbo0 == jnp.asarray(NEG_INF, dtype)

    def one_iteration(state: _State) -> _State:
        first = jnp.logical_and(state.it == 0, fresh)
        # M-step with cross-chip frame reductions (VBx.py:95-96 -> psum)
        counts = jax.lax.psum(jnp.sum(state.gamma, axis=0), axis_name)
        stats = jax.lax.psum(
            jnp.einsum("ts,td->sd", state.gamma, rho,
                       preferred_element_type=dtype), axis_name)
        invL = 1.0 / (1.0 + fa_over_fb * counts[:, None]
                      * phi[None, :].astype(dtype))
        alpha = fa_over_fb * invL * stats

        log_p = vb_log_likelihoods(rho, G, invL, alpha, phi, fa)
        log_p = masked_fill(log_p, speaker_mask[None, :])
        fbr = forward_backward_blockwise(
            log_p, state.pi, loop_prob, frame_mask=frame_mask,
            axis_name=axis_name)
        elbo_val = fbr.log_px + vb_elbo_model_term(invL, alpha, fb)
        new_pi = vb_pi_update(fbr.gamma0, state.pi, fbr.pi_stat, loop_prob)

        now_converged = jnp.logical_and(
            jnp.logical_not(first), elbo_val - state.last_elbo < epsilon)
        keep = state.converged

        def sel(old, new):
            return jnp.where(keep, old, new)

        return _State(
            it=state.it + 1,
            converged=jnp.logical_or(keep, now_converged),
            gamma=sel(state.gamma, fbr.gamma),
            pi=sel(state.pi, new_pi),
            elbo=sel(state.elbo, state.elbo.at[state.it].set(elbo_val)),
            last_elbo=sel(state.last_elbo, elbo_val),
        )

    def cond(state: _State):
        return jnp.logical_and(state.it < max_iters,
                               jnp.logical_not(state.converged))

    init = _State(
        it=jnp.zeros((), jnp.int32),
        converged=converged0,
        gamma=gamma,
        pi=pi,
        elbo=jnp.full((max_iters,), jnp.nan, dtype=dtype),
        last_elbo=last_elbo0.astype(dtype),
    )
    final = jax.lax.while_loop(cond, one_iteration, init)
    return final.gamma, final.pi, final.elbo, final.it


def vbx_sharded(
    mesh: Mesh,
    X: jax.Array,            # [B, T, D]
    phi: jax.Array,          # [D]
    gamma: jax.Array,        # [B, T, S]
    pi: jax.Array,           # [B, S]
    frame_mask: jax.Array,   # [B, T] bool (padding must be a suffix)
    speaker_mask: jax.Array,  # [B, S] bool
    loop_prob: float,
    Fa: float,
    Fb: float,
    max_iters: int = 40,
    epsilon: float = 1e-6,
    converged0=None,
    last_elbo0=None,
) -> ShardedVBxResult:
    """Batched VB-HMM over a ('dp', 'sp') mesh.

    B must divide by |'dp'| and T by |'sp'|. Semantics identical to
    engine.vbhmm.vbx_batched (validated in tests/test_parallel.py),
    including converged0/last_elbo0 mid-EM resume (engine-state
    checkpointing — vbx_batched_checkpointed(mesh=...))."""
    dtype = X.dtype
    B = gamma.shape[0]
    loop_prob = jnp.asarray(loop_prob, dtype)
    fa = jnp.asarray(Fa, dtype)
    fb = jnp.asarray(Fb, dtype)
    epsilon = jnp.asarray(epsilon, dtype)
    if converged0 is None:
        converged0 = jnp.zeros((B,), bool)
    if last_elbo0 is None:
        last_elbo0 = jnp.full((B,), NEG_INF, dtype)

    def block_fn(X_l, phi_r, gamma_l, pi_l, fm_l, sm_l, c0_l, le0_l,
                 lp, fa_, fb_, eps_):
        run = functools.partial(
            _vb_em_sharded_single, max_iters=max_iters, axis_name="sp")
        return jax.vmap(
            lambda x, g, p, f, s, c0, le0: run(x, phi_r, g, p, f, s,
                                               lp, fa_, fb_, eps_, c0, le0)
        )(X_l, gamma_l, pi_l, fm_l, sm_l, c0_l, le0_l)

    shmapped = jax.shard_map(
        block_fn, mesh=mesh,
        in_specs=(P("dp", "sp", None), P(), P("dp", "sp", None),
                  P("dp", None), P("dp", "sp"), P("dp", None),
                  P("dp"), P("dp"),
                  P(), P(), P(), P()),
        out_specs=(P("dp", "sp", None), P("dp", None), P("dp", None),
                   P("dp")),
        check_vma=False)

    g, p_out, elbo, iters = jax.jit(shmapped)(
        X, jnp.asarray(phi, dtype), gamma, pi, frame_mask, speaker_mask,
        jnp.asarray(converged0, bool), jnp.asarray(last_elbo0, dtype),
        loop_prob, fa, fb, epsilon)
    return ShardedVBxResult(g, p_out, elbo, iters)
