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

from vbx_tpu.engine.vbhmm import _plateau_step
from vbx_tpu.ops.lse import NEG_INF, masked_fill
from vbx_tpu.ops.vb_steps import (vb_elbo_model_term, vb_log_likelihoods,
                                  vb_pi_update, vb_precompute)
from vbx_tpu.parallel.fb_blockwise import (
    forward_backward_blockwise, forward_backward_blockwise_pallas)


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
    plateau: jax.Array


def _vb_em_sharded_single(X, phi, gamma, pi, frame_mask, speaker_mask,
                          loop_prob, fa, fb, epsilon, converged0,
                          last_elbo0, plateau_ulps, plateau_iters,
                          plateau0, *,
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
                       preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST), axis_name)
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

        delta = elbo_val - state.last_elbo
        new_plateau, plateau_hit = _plateau_step(
            delta, elbo_val, state.plateau, plateau_ulps, plateau_iters,
            jnp.asarray(jnp.finfo(dtype).eps, dtype))
        now_converged = jnp.logical_and(
            jnp.logical_not(first),
            jnp.logical_or(delta < epsilon, plateau_hit))
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
            plateau=sel(state.plateau, new_plateau),
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
        plateau=plateau0,
    )
    final = jax.lax.while_loop(cond, one_iteration, init)
    return final.gamma, final.pi, final.elbo, final.it


def _vb_em_sharded_batched_pallas(X, phi, gamma_tsb, pi, frame_mask,
                                  speaker_mask, loop_prob, fa, fb, epsilon,
                                  converged0, last_elbo0, plateau_ulps,
                                  plateau_iters, plateau0, *,
                                  max_iters: int, axis_name: str,
                                  interpret: bool, io_dtype):
    """The local recording batch in ONE program: [Bl] recordings x [Tl]
    local frames, everything in the [T, S, B] sublane layout of
    engine.vbhmm._vbx_batched_pallas_sb_jit, with the two cross-chip
    differences of the sharded EM: psum'd M-step sufficient statistics
    (VBx/VBx.py:95-96) and the blockwise-boundary Pallas smoother
    (forward_backward_blockwise_pallas). Runs INSIDE shard_map — no vmap,
    so both Pallas kernels see the whole local batch on their lanes.
    Convergence freezing is per recording; ELBOs are psum-replicated
    within an 'sp' group so the while_loops stay in lockstep."""
    dtype = jnp.float32
    io_dt = jnp.dtype(io_dtype)
    Bl, Tl, D = X.shape
    S = gamma_tsb.shape[1]
    X = X.astype(dtype)
    phi = phi.astype(dtype)
    fa_over_fb = fa / fb

    fmask_bt = frame_mask.astype(dtype)                   # [Bl, Tl]
    valid_tb = fmask_bt.T                                 # [Tl, Bl]
    smask = speaker_mask.astype(dtype)                    # [Bl, S]

    G_bt = -0.5 * (jnp.sum(X * X, axis=-1)
                   + D * jnp.log(2 * jnp.pi).astype(dtype))     # [Bl, Tl]
    rho = (X * jnp.sqrt(phi)[None, None, :]).astype(io_dt)      # [Bl, Tl, D]

    gamma_tsb = (gamma_tsb.astype(dtype) * valid_tb[:, None, :]
                 * smask.T[None]).astype(io_dt)
    pi = pi.astype(dtype) * smask

    vmapped_elbo_term = jax.vmap(vb_elbo_model_term, in_axes=(0, 0, None))
    vmapped_pi_update = jax.vmap(vb_pi_update, in_axes=(0, 0, 0, None))
    fresh = last_elbo0 == jnp.asarray(NEG_INF, dtype)            # [Bl]

    # f32 streams get HIGHEST-precision dots (ops/vb_steps.py module
    # docstring has the corpus-scale measurement); bf16 streams keep
    # DEFAULT (already bf16 inputs, natively f32-accumulated)
    prec = (jax.lax.Precision.HIGHEST if io_dt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def m_step(g_tsb, counts_sb):
        invL = 1.0 / (1.0 + fa_over_fb * counts_sb.T[:, :, None]
                      * phi[None, None, :])                      # [Bl,S,D]
        stats = jax.lax.psum(
            jnp.einsum("tsb,btd->bsd", g_tsb, rho,
                       preferred_element_type=dtype, precision=prec),
            axis_name)
        alpha = fa_over_fb * invL * stats.astype(dtype)
        return invL, alpha

    counts0 = jax.lax.psum(jnp.sum(gamma_tsb.astype(dtype), axis=0),
                           axis_name)                            # [S, Bl]

    def one_iteration(state):
        (it, converged, gamma, counts, pi_c, elbo, last_elbo,
         plateau) = state
        first = jnp.logical_and(it == 0, fresh)                  # [Bl]
        invL, alpha = m_step(gamma, counts)

        # E-step dot in its NATIVE [B,T,S] layout into the blockwise
        # smoother (round-4 solo-engine port: the tsb form cost a full
        # f32 relayout copy per iteration — fb_scan_pallas_sb_logp_bts)
        cross = jnp.einsum("btd,bsd->bts", rho, alpha.astype(io_dt),
                           preferred_element_type=dtype,
                           precision=prec).astype(io_dt)
        quad = jnp.einsum("bsd,d->bs", invL + alpha * alpha, phi,
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST)
        log_p = fa * (cross.astype(dtype) - 0.5 * quad[:, None, :]
                      + G_bt[:, :, None])
        log_p = masked_fill(log_p, smask[:, None, :].astype(bool))

        fbr = forward_backward_blockwise_pallas(
            log_p, pi_c, loop_prob, frame_mask=valid_tb.astype(bool),
            speaker_mask=speaker_mask, axis_name=axis_name,
            interpret=interpret, io_dtype=io_dt, layout="bts")
        keep = converged

        def sel(old, new, bdim):
            shape = [1] * old.ndim
            shape[bdim] = keep.shape[0]
            return jnp.where(keep.reshape(shape), old, new)

        # freeze-select fused into the gamma producer; counts from the
        # SELECTED gamma (bit-identical for frozen lanes — same io_dt
        # values re-reduced; engine.vbhmm has the derivation)
        g_next = sel(gamma, fbr.gamma.astype(io_dt), 2)
        new_counts = jax.lax.psum(jnp.sum(g_next.astype(dtype), axis=0),
                                  axis_name)

        elbo_val = fbr.log_px + vmapped_elbo_term(invL, alpha, fb)   # [Bl]
        new_pi = vmapped_pi_update(fbr.gamma0.T, pi_c, fbr.pi_stat.T,
                                   loop_prob)

        delta = elbo_val - last_elbo
        new_plateau, plateau_hit = _plateau_step(
            delta, elbo_val, plateau, plateau_ulps, plateau_iters,
            jnp.asarray(jnp.finfo(dtype).eps, dtype))
        now_conv = jnp.logical_and(jnp.logical_not(first),
                                   jnp.logical_or(delta < epsilon,
                                                  plateau_hit))
        # a frozen lane's elbo column `it` was NaN in both branches of a
        # whole-array select (nothing ever wrote it); one NaN-masked
        # scatter is equivalent (engine.vbhmm round-4)
        new_elbo = elbo.at[:, it].set(
            jnp.where(keep, jnp.asarray(jnp.nan, dtype), elbo_val))

        return (it + 1,
                jnp.logical_or(keep, now_conv),
                g_next,
                new_counts,
                sel(pi_c, new_pi, 0),
                new_elbo,
                sel(last_elbo, elbo_val, 0),
                sel(plateau, new_plateau, 0))

    def cond(state):
        it, converged = state[0], state[1]
        return jnp.logical_and(it < max_iters,
                               jnp.logical_not(jnp.all(converged)))

    init = (jnp.zeros((), jnp.int32), converged0, gamma_tsb, counts0, pi,
            jnp.full((Bl, max_iters), jnp.nan, dtype),
            last_elbo0.astype(dtype), plateau0)
    final = jax.lax.while_loop(cond, one_iteration, init)
    _, _, g_fin, _, pi_fin, elbo_fin, _, _ = final
    n_iters = jnp.sum(jnp.logical_not(jnp.isnan(elbo_fin)),
                      axis=1).astype(jnp.int32)
    g_out = jnp.transpose(g_fin, (2, 0, 1)).astype(dtype)   # [Bl, Tl, S]
    return g_out, pi_fin, elbo_fin, n_iters


@functools.lru_cache(maxsize=64)
def _sharded_pallas_jit(mesh, max_iters: int, io_dtype: str,
                        interpret: bool):
    """Cached jitted sharded-pallas program. vbx_sharded is called once
    per VB bucket (and per chained bench rep): rebuilding the shard_map
    closure each call would defeat jax's jit cache and recompile every
    time (measured: ~2 s per call at T=32768 — the whole EM's cost)."""
    def block_fn(X_l, phi_r, gamma_l, pi_l, fm_l, sm_l, c0_l, le0_l,
                 pl0_l, lp, fa_, fb_, eps_, pu, pit):
        gamma_tsb = jnp.transpose(gamma_l, (1, 2, 0))        # [Tl, S, Bl]
        return _vb_em_sharded_batched_pallas(
            X_l, phi_r, gamma_tsb, pi_l, fm_l, sm_l, lp, fa_, fb_, eps_,
            c0_l, le0_l, pu, pit, pl0_l, max_iters=max_iters,
            axis_name="sp", interpret=interpret, io_dtype=io_dtype)

    shmapped = jax.shard_map(
        block_fn, mesh=mesh,
        in_specs=(P("dp", "sp", None), P(), P("dp", "sp", None),
                  P("dp", None), P("dp", "sp"), P("dp", None),
                  P("dp"), P("dp"), P("dp"),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P("dp", "sp", None), P("dp", None), P("dp", None),
                   P("dp")),
        check_vma=False)
    return jax.jit(shmapped)


def _vbx_sharded_pallas(mesh, X, phi, gamma, pi, frame_mask, speaker_mask,
                        loop_prob, fa, fb, epsilon, converged0, last_elbo0,
                        plateau_ulps, plateau_iters, plateau0,
                        *, max_iters: int, io_dtype) -> ShardedVBxResult:
    fn = _sharded_pallas_jit(mesh, max_iters, str(io_dtype),
                             jax.default_backend() == "cpu")
    g, p_out, elbo, iters = fn(
        X, phi, gamma, pi, frame_mask, speaker_mask,
        converged0, last_elbo0, plateau0, loop_prob, fa, fb, epsilon,
        plateau_ulps, plateau_iters)
    return ShardedVBxResult(g, p_out, elbo, iters)


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
    fb_impl: str = None,
    plateau_ulps: float = 0.0,
    plateau_iters: int = 2,
    plateau0=None,
) -> ShardedVBxResult:
    """Batched VB-HMM over a ('dp', 'sp') mesh.

    B must divide by |'dp'| and T by |'sp'|. Semantics identical to
    engine.vbhmm.vbx_batched (validated in tests/test_parallel.py),
    including converged0/last_elbo0 mid-EM resume (engine-state
    checkpointing — vbx_batched_checkpointed(mesh=...)).

    fb_impl: None/'structured' (default) runs the XLA-scan blockwise
    smoother — BIT-identical to the single-device engine on a 1-'sp'-chip
    mesh (the smoother short-circuits to the sequential program) and
    reduction-order-comparable across 'sp' shards (measured at T=32768,
    K=8: gamma <= 1e-5/iter, identical labels and n_iters, ELBO within
    2 f32 ulps — tests/test_parallel.py long-T pin). 'pallas' /
    'pallas_bf16' run both local passes of every chip's frame block
    through the fused Pallas kernels (forward_backward_blockwise_pallas)
    — the throughput path for long recordings, tolerance-parity (~5e-5
    gamma per iteration) like the single-chip pallas engine; '_bf16'
    additionally stores the large per-iteration streams in bfloat16."""
    dtype = X.dtype
    B = gamma.shape[0]
    if plateau0 is None:
        plateau0 = jnp.zeros((B,), jnp.int32)
    plateau0 = jnp.asarray(plateau0, jnp.int32)
    if fb_impl in ("pallas", "pallas_bf16"):
        if gamma.shape[-1] > 128:
            import warnings
            warnings.warn(
                f"fb_impl={fb_impl!r} supports at most 128 speakers; got "
                f"S={gamma.shape[-1]} — falling back to the structured "
                f"sharded engine", stacklevel=2)
        else:
            f32 = jnp.float32
            return _vbx_sharded_pallas(
                mesh, jnp.asarray(X, f32), jnp.asarray(phi, f32),
                jnp.asarray(gamma, f32), jnp.asarray(pi, f32),
                jnp.asarray(frame_mask, bool),
                jnp.asarray(speaker_mask, bool),
                jnp.float32(loop_prob), jnp.float32(Fa), jnp.float32(Fb),
                jnp.float32(epsilon),
                (jnp.zeros((B,), bool) if converged0 is None
                 else jnp.asarray(converged0, bool)),
                (jnp.full((B,), NEG_INF, f32) if last_elbo0 is None
                 else jnp.asarray(last_elbo0, f32)),
                jnp.float32(plateau_ulps),
                jnp.asarray(plateau_iters, jnp.int32), plateau0,
                max_iters=max_iters,
                io_dtype=("bfloat16" if fb_impl == "pallas_bf16"
                          else "float32"))
    elif fb_impl not in (None, "structured"):
        raise ValueError(f"vbx_sharded: unknown fb_impl {fb_impl!r}")
    loop_prob = jnp.asarray(loop_prob, dtype)
    fa = jnp.asarray(Fa, dtype)
    fb = jnp.asarray(Fb, dtype)
    epsilon = jnp.asarray(epsilon, dtype)
    if converged0 is None:
        converged0 = jnp.zeros((B,), bool)
    if last_elbo0 is None:
        last_elbo0 = jnp.full((B,), NEG_INF, dtype)

    fn = _sharded_structured_jit(mesh, max_iters)
    g, p_out, elbo, iters = fn(
        X, jnp.asarray(phi, dtype), gamma, pi, frame_mask, speaker_mask,
        jnp.asarray(converged0, bool), jnp.asarray(last_elbo0, dtype),
        plateau0, loop_prob, fa, fb, epsilon,
        jnp.asarray(plateau_ulps, dtype),
        jnp.asarray(plateau_iters, jnp.int32))
    return ShardedVBxResult(g, p_out, elbo, iters)


@functools.lru_cache(maxsize=64)
def _sharded_structured_jit(mesh, max_iters: int):
    """Cached jitted sharded-structured program (see _sharded_pallas_jit:
    a per-call shard_map closure would recompile on every invocation)."""
    def block_fn(X_l, phi_r, gamma_l, pi_l, fm_l, sm_l, c0_l, le0_l,
                 pl0_l, lp, fa_, fb_, eps_, pu, pit):
        run = functools.partial(
            _vb_em_sharded_single, max_iters=max_iters, axis_name="sp")
        return jax.vmap(
            lambda x, g, p, f, s, c0, le0, pl0: run(
                x, phi_r, g, p, f, s, lp, fa_, fb_, eps_, c0, le0,
                pu, pit, pl0)
        )(X_l, gamma_l, pi_l, fm_l, sm_l, c0_l, le0_l, pl0_l)

    shmapped = jax.shard_map(
        block_fn, mesh=mesh,
        in_specs=(P("dp", "sp", None), P(), P("dp", "sp", None),
                  P("dp", None), P("dp", "sp"), P("dp", None),
                  P("dp"), P("dp"), P("dp"),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P("dp", "sp", None), P("dp", None), P("dp", None),
                   P("dp")),
        check_vma=False)
    return jax.jit(shmapped)
