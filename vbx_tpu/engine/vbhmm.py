"""Batched VB-HMM diarization engine.

Runs the VBx EM loop — M-step speaker-model estimation, per-frame expected
log-likelihoods, structured O(S)-per-frame forward-backward, ELBO and
speaker-prior updates — as one jitted program. Semantics match the reference
loop (VBx/VBx.py:27-126) at the EM-fixed-point level:

- iteration 0 never triggers the convergence check (VBx.py:122),
- convergence is Delta-ELBO < epsilon, checked after state update, so the
  crossing iteration's gamma/pi are kept,
- optionally-provided (alpha, invL) skip the first M-step (VBx.py:94),
- pi update uses the alpha-recursion occupation statistic (VBx.py:101-104).

TPU-first design notes:
- the whole EM loop is a `lax.while_loop` with per-recording convergence
  *masking* under vmap: a batch keeps stepping until every recording has
  converged, but converged recordings freeze (their state stops changing),
  which reproduces the reference's per-recording early stopping exactly,
- recordings are padded to common [T, S] with boolean masks; padding is
  exact (see ops.forward_backward / ops.vb_steps docstrings),
- everything runs in one dtype (float32 on TPU, float64 available on CPU
  for oracle parity testing).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vbx_tpu.ops.forward_backward import (
    forward_backward_assoc, forward_backward_structured)
from vbx_tpu.ops.lse import NEG_INF, masked_fill
from vbx_tpu.ops.vb_steps import (
    vb_elbo_model_term, vb_log_likelihoods, vb_m_step, vb_pi_update,
    vb_precompute)

_FB_IMPLS = {
    "structured": forward_backward_structured,
    "assoc": forward_backward_assoc,
}


class VBxResult(NamedTuple):
    gamma: jax.Array       # [T, S] final responsibilities
    pi: jax.Array          # [S] final speaker priors
    elbo: jax.Array        # [max_iters] ELBO trace (NaN past convergence)
    n_iters: jax.Array     # scalar int32: iterations actually run
    alpha: jax.Array       # [S, D] final speaker means
    invL: jax.Array        # [S, D] final speaker posterior covariances


class _State(NamedTuple):
    it: jax.Array
    converged: jax.Array
    gamma: jax.Array
    pi: jax.Array
    elbo: jax.Array
    last_elbo: jax.Array
    plateau: jax.Array
    alpha: jax.Array
    invL: jax.Array


def _plateau_step(delta, elbo_val, counter, plateau_ulps, plateau_iters,
                  eps_machine):
    """Opt-in f32 plateau stop (PARITY.md deviation 3: at |ELBO|~1e6 the
    f32 quantum ~0.06 >> epsilon=1e-6, so a lane can cycle at +-a-few
    quanta per iteration and run to max_iters while contributing nothing —
    and under batched convergence freezing ONE such lane keeps the whole
    padded batch stepping).

    A lane's counter increments when |Delta-ELBO| is within `plateau_ulps`
    machine quanta of its ELBO's magnitude and resets otherwise; reaching
    `plateau_iters` consecutive small deltas freezes the lane exactly like
    the reference epsilon rule (VBx/VBx.py:122-125). plateau_ulps <= 0
    disables (the default — reference semantics exactly). The quantum
    scales with the ENGINE dtype, so an f64 oracle run is never touched by
    an f32-tuned setting."""
    quantum = eps_machine * jnp.maximum(jnp.abs(elbo_val), 1.0)
    small = jnp.abs(delta) <= plateau_ulps * quantum
    new_counter = jnp.where(small, counter + 1, 0)
    hit = jnp.logical_and(plateau_ulps > 0, new_counter >= plateau_iters)
    return new_counter, hit


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "fb_impl", "has_initial_model"))
def _vbx_jit(X, phi, gamma, pi, frame_mask, speaker_mask,
             loop_prob, fa, fb, epsilon,
             alpha0, invL0, converged0, last_elbo0,
             plateau_ulps, plateau_iters, plateau0,
             *, max_iters: int, fb_impl: str, has_initial_model: bool):
    dtype = X.dtype
    T, D = X.shape
    S = gamma.shape[1]
    fb_fn = _FB_IMPLS[fb_impl]

    G, rho = vb_precompute(X, phi)
    fa_over_fb = fa / fb

    # zero out padded frames/speakers in the initial responsibilities
    gamma = (gamma * frame_mask[:, None].astype(dtype)
             * speaker_mask[None, :].astype(dtype))
    pi = pi * speaker_mask.astype(dtype)
    # a resumed run (finite last_elbo0, engine-state checkpointing) is
    # mid-trajectory: its first slice iteration may trigger convergence
    # against the carried ELBO, exactly as it would have mid-run
    fresh = last_elbo0 == jnp.asarray(NEG_INF, dtype)

    def one_iteration(state: _State) -> _State:
        first = jnp.logical_and(state.it == 0, fresh)
        if has_initial_model:
            # use the provided model on iteration 0 (reference: VBx.py:94)
            est_invL, est_alpha = vb_m_step(state.gamma, rho, phi, fa_over_fb)
            invL = jnp.where(first, state.invL, est_invL)
            alpha = jnp.where(first, state.alpha, est_alpha)
        else:
            invL, alpha = vb_m_step(state.gamma, rho, phi, fa_over_fb)

        log_p = vb_log_likelihoods(rho, G, invL, alpha, phi, fa)
        log_p = masked_fill(log_p, speaker_mask[None, :])
        fbr = fb_fn(log_p, state.pi, loop_prob, frame_mask=frame_mask)
        elbo_val = fbr.log_px + vb_elbo_model_term(invL, alpha, fb)
        new_pi = vb_pi_update(fbr.gamma[0], state.pi, fbr.pi_stat, loop_prob)

        delta = elbo_val - state.last_elbo
        new_plateau, plateau_hit = _plateau_step(
            delta, elbo_val, state.plateau, plateau_ulps, plateau_iters,
            jnp.asarray(jnp.finfo(dtype).eps, dtype))
        now_converged = jnp.logical_and(
            jnp.logical_not(first),
            jnp.logical_or(delta < epsilon, plateau_hit))

        # freeze recordings that converged on a PREVIOUS iteration; the
        # iteration that crosses the threshold keeps its update (VBx.py:122-125)
        keep = state.converged

        def sel(old, new):
            return jnp.where(keep, old, new)

        new_state = _State(
            it=state.it + 1,
            converged=jnp.logical_or(keep, now_converged),
            gamma=sel(state.gamma, fbr.gamma),
            pi=sel(state.pi, new_pi),
            elbo=sel(state.elbo, state.elbo.at[state.it].set(elbo_val)),
            last_elbo=sel(state.last_elbo, elbo_val),
            plateau=sel(state.plateau, new_plateau),
            alpha=sel(state.alpha, alpha),
            invL=sel(state.invL, invL),
        )
        return new_state

    def cond(state: _State):
        return jnp.logical_and(state.it < max_iters,
                               jnp.logical_not(state.converged))

    init = _State(
        it=jnp.zeros((), jnp.int32),
        converged=converged0,
        gamma=gamma,
        pi=pi,
        elbo=jnp.full((max_iters,), jnp.nan, dtype=dtype),
        last_elbo=last_elbo0,
        plateau=plateau0,
        alpha=(alpha0 if has_initial_model
               else jnp.zeros((S, D), dtype)),
        invL=(invL0 if has_initial_model
              else jnp.ones((S, D), dtype)),
    )
    final = jax.lax.while_loop(cond, one_iteration, init)
    return VBxResult(final.gamma, final.pi, final.elbo, final.it,
                     final.alpha, final.invL)


def vbx(
    X: jax.Array,
    phi: jax.Array,
    loop_prob: float = 0.9,
    Fa: float = 1.0,
    Fb: float = 1.0,
    pi=10,
    gamma: Optional[jax.Array] = None,
    max_iters: int = 10,
    epsilon: float = 1e-4,
    alpha_q_init: float = 1.0,
    rng: Optional[jax.Array] = None,
    frame_mask: Optional[jax.Array] = None,
    speaker_mask: Optional[jax.Array] = None,
    alpha: Optional[jax.Array] = None,
    invL: Optional[jax.Array] = None,
    fb_impl: str = "structured",
    dtype=None,
    plateau_ulps: float = 0.0,
    plateau_iters: int = 2,
) -> VBxResult:
    """Single-recording VB-HMM (API parity with reference VBx.VBx:27-126).

    X:       [T, D] PLDA-space features.
    phi:     [D] across-class covariance diagonal.
    pi:      int S (max speakers, uniform prior) or [S] prior vector.
    gamma:   [T, S] initial responsibilities; if None, sampled from a flat
             Dirichlet with concentration alpha_q_init (requires rng).
    plateau_ulps/plateau_iters: opt-in ELBO plateau stop (see
             _plateau_step); plateau_ulps=0 (default) keeps the
             reference's absolute-epsilon rule exactly.
    """
    if fb_impl not in _FB_IMPLS:
        raise ValueError(
            f"vbx() supports fb_impl in {sorted(_FB_IMPLS)}; the fused "
            f"'pallas' path is batched-only (use vbx_batched)")
    dtype = dtype or X.dtype
    X = jnp.asarray(X, dtype)
    phi = jnp.asarray(phi, dtype)
    T = X.shape[0]

    if isinstance(pi, (int, np.integer)):
        pi = jnp.ones((int(pi),), dtype) / int(pi)
    else:
        pi = jnp.asarray(pi, dtype)
    S = pi.shape[0]

    if gamma is None:
        if rng is None:
            raise ValueError("gamma=None requires an rng key for the "
                             "Dirichlet initialization")
        g = jax.random.gamma(rng, alpha_q_init, shape=(T, S), dtype=dtype)
        gamma = g / jnp.sum(g, axis=1, keepdims=True)
    else:
        gamma = jnp.asarray(gamma, dtype)
    if gamma.shape != (T, S):
        raise ValueError(f"gamma shape {gamma.shape} != {(T, S)}")

    if frame_mask is None:
        frame_mask = jnp.ones((T,), bool)
    if speaker_mask is None:
        speaker_mask = jnp.ones((S,), bool)

    has_model = alpha is not None and invL is not None
    alpha0 = (jnp.asarray(alpha, dtype) if has_model
              else jnp.zeros((S, X.shape[1]), dtype))
    invL0 = (jnp.asarray(invL, dtype) if has_model
             else jnp.ones((S, X.shape[1]), dtype))

    return _vbx_jit(
        X, phi, gamma, pi, frame_mask, speaker_mask,
        jnp.asarray(loop_prob, dtype), jnp.asarray(Fa, dtype),
        jnp.asarray(Fb, dtype), jnp.asarray(epsilon, dtype),
        alpha0, invL0,
        jnp.zeros((), bool), jnp.asarray(NEG_INF, dtype),
        jnp.asarray(plateau_ulps, dtype),
        jnp.asarray(plateau_iters, jnp.int32), jnp.zeros((), jnp.int32),
        max_iters=max_iters, fb_impl=fb_impl,
        has_initial_model=has_model)


class _PState(NamedTuple):
    it: jax.Array
    converged: jax.Array      # [B]
    gamma: jax.Array          # [T, S, B] (time-major, speakers-on-sublanes)
    counts: jax.Array         # [S, B] f32 sum_t gamma (combine-kernel
    #                           accumulated; carried so the M-step never
    #                           re-reads the gamma stream for its reduce)
    pi: jax.Array             # [B, S]
    elbo: jax.Array           # [B, max_iters]
    last_elbo: jax.Array      # [B]
    plateau: jax.Array        # [B] int32 consecutive-small-delta counter


@functools.partial(
    jax.jit, static_argnames=("max_iters", "interpret", "io_dtype"))
def _vbx_batched_pallas_sb_jit(X, phi, gamma, pi, frame_mask, speaker_mask,
                               loop_prob, fa, fb, epsilon,
                               converged0, last_elbo0,
                               plateau_ulps, plateau_iters, plateau0,
                               *, max_iters: int, interpret: bool,
                               io_dtype: str = "float32"):
    """Batched EM around the speakers-on-sublanes fused kernel
    (ops.fb_pallas.fb_scan_pallas_sb). Everything lives in [T, S, B]
    layout through the loop — the einsums emit/consume it directly, so no
    per-iteration transposes, and kernel arrays pad the speaker axis to a
    multiple of 8 sublanes instead of 128 lanes (~4x less HBM traffic at
    S~32 than the [T, B, S->128] path). Semantics identical to `_vbx_jit`
    under vmap (tests/test_pallas.py).

    io_dtype='bfloat16' stores the iteration's LARGE streams — rho, the
    gamma loop state, w, and the kernel's ahat/bhat — in bfloat16, roughly
    halving per-iteration HBM traffic (the bound resource). All reductions
    accumulate in float32: the T-axis sums upcast elementwise (the convert
    fuses into the reduce), the einsums set preferred_element_type=f32
    (bf16 MXU inputs, f32 accumulator), and the per-frame normalizers,
    ELBO, and pi updates never leave f32. Fixed-point accuracy is bounded
    by tests (gamma within ~2e-2 of the f32 path, identical labels on the
    golden recording); it is an opt-in throughput mode, not the default."""
    from vbx_tpu.ops.fb_pallas import fb_scan_pallas_sb_logp_bts

    dtype = jnp.float32
    io_dt = jnp.dtype(io_dtype)
    B, T, D = X.shape
    S = gamma.shape[-1]
    X = X.astype(dtype)
    phi = phi.astype(dtype)
    eps = jnp.asarray(1e-8, dtype)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    fmask = frame_mask.astype(dtype)                  # [B, T]
    valid_tb = fmask.T                                # [T, B]

    G_bt = -0.5 * (jnp.sum(X * X, axis=-1)
                   + D * jnp.log(2 * jnp.pi).astype(dtype))      # [B, T]
    rho = (X * jnp.sqrt(phi)[None, None, :]).astype(io_dt)  # [B, T, D]
    fa_over_fb = fa / fb

    gamma = (gamma.astype(dtype) * fmask[:, :, None]
             * speaker_mask.astype(dtype)[:, None, :])
    gamma_tsb = jnp.transpose(gamma, (1, 2, 0)).astype(io_dt)  # [T, S, B]
    pi = pi.astype(dtype) * speaker_mask.astype(dtype)

    vmapped_elbo_term = jax.vmap(vb_elbo_model_term, in_axes=(0, 0, None))
    vmapped_pi_update = jax.vmap(vb_pi_update, in_axes=(0, 0, 0, None))
    # resumed recordings (finite last_elbo0) are mid-trajectory: their
    # first slice iteration may converge against the carried ELBO
    fresh = last_elbo0 == jnp.asarray(NEG_INF, dtype)          # [B]

    # f32 streams get HIGHEST-precision dots (the TPU DEFAULT rounds MXU
    # inputs to bf16, which at corpus scale fires the stop rules early —
    # ops/vb_steps.py module docstring has the measurement); bf16 streams
    # keep DEFAULT (their inputs are already bf16, natively f32-accumulated)
    prec = (jax.lax.Precision.HIGHEST if io_dt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def m_step(g_tsb, counts_sb):
        # counts come pre-accumulated (f32) from the combine kernel; only
        # the cross-stats einsum still reads the gamma stream
        invL = 1.0 / (1.0 + fa_over_fb * counts_sb.T[:, :, None]
                      * phi[None, None, :])                       # [B,S,D]
        stats = jnp.einsum("tsb,btd->bsd", g_tsb, rho,
                           preferred_element_type=dtype, precision=prec)
        alpha = fa_over_fb * invL * stats.astype(dtype)
        return invL, alpha

    counts0 = jnp.sum(gamma_tsb.astype(dtype), axis=0)            # [S, B]

    def one_iteration(state: _PState) -> _PState:
        first = jnp.logical_and(state.it == 0, fresh)          # [B]
        invL, alpha = m_step(state.gamma, state.counts)

        # the E-step dot stays in its NATIVE [B, T, S] output layout all
        # the way into the w producer (fb_scan_pallas_sb_logp_bts): the
        # [T, S, B] form cost a full f32 relayout copy per iteration.
        # The dot's OUTPUT is materialized at the stream dtype (f32
        # accumulation on the MXU, rounded on store): under bf16 streams
        # the structural [B,T,S]->[T,S,B] relayout and both its readers
        # (the max-shift reduce and the exp producer) then move half the
        # bytes. The added rounding is the same order as the bf16 w
        # storage the mode already has (log_p error ~fa*0.5ulp(cross),
        # tolerance-parity contract unchanged — tests/test_pallas.py).
        cross = jnp.einsum("btd,bsd->bts", rho, alpha.astype(io_dt),
                           preferred_element_type=dtype,
                           precision=prec).astype(io_dt)
        quad = jnp.einsum("bsd,d->bs", invL + alpha * alpha, phi,
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST)
        log_p = fa * (cross.astype(dtype) - 0.5 * quad[:, None, :]
                      + G_bt[:, :, None])
        log_p = masked_fill(log_p, speaker_mask[:, None, :].astype(bool))

        # w is computed OUTSIDE the kernel's sequential walk on purpose
        # (moving the max/exp into the walk was measured 10% slower — the
        # walk is latency-bound), but INSIDE the kernel wrapper's jit so
        # max/exp/masking/padding fuse into ONE producer of the padded
        # stream (fb_scan_pallas_sb_logp). gamma/denominator/counts/
        # pi_stat stay XLA fusions: a pallas combine kernel doing the
        # same single pass over (ahat, bhat, w) measured 4% SLOWER
        # same-process (46.8k vs 48.7k rec/s — grid + slab-loop overhead
        # exceeded the saved re-reads; negative result in BENCHMARKS.md)
        col = (1.0 - loop_prob) * state.pi + eps      # [B, S]
        pinit = state.pi + eps
        # recip=True: the walk normalizes by reciprocal-multiply instead
        # of a full-tile divide — measured 6.5% faster end-to-end on the
        # chip (5.80 vs 6.18 ms/batch same-process), 1-ulp different
        # normalization within the pallas path's tolerance contract
        ahat, bhat, cfw, m, w = fb_scan_pallas_sb_logp_bts(
            log_p, speaker_mask.astype(dtype), valid_tb, col.T, pinit.T,
            loop_prob, interpret=interpret, io_dtype=io_dtype, recip=True)
        ab = ahat.astype(dtype) * bhat.astype(dtype)
        denom = jnp.maximum(jnp.sum(ab, axis=1, keepdims=True), tiny)
        gn = (ab / denom) * valid_tb[:, None, :]
        keep = state.converged                        # [B]

        def sel(old, new, bdim):
            shape = [1] * old.ndim
            shape[bdim] = keep.shape[0]
            return jnp.where(keep.reshape(shape), old, new)

        # convergence freezing is applied INSIDE the gamma producer (the
        # select masks before the .astype(io_dt) store), so the [T, S, B]
        # stream is written exactly once per iteration. The previous form
        # — materialize new_gamma (it had three consumers), then
        # sel(old, new) as a separate whole-array pass — emitted two
        # gamma-sized copies per iteration, 15.4% of on-device time in the
        # battery_r3 trace (VERDICT r3 #2).
        g_next = sel(state.gamma, gn.astype(io_dt), 2)
        # counts from the SELECTED gamma (the reduce fuses into the same
        # producer): for live lanes identical to reducing new_gamma; for
        # frozen lanes sum(g_next) re-reduces the very io_dt values whose
        # f32 sum produced the carried counts — bit-identical, so the
        # counts select (and its copy) is gone too
        new_counts = jnp.sum(g_next.astype(dtype), axis=0)
        log_px = jnp.sum(valid_tb * (m + jnp.log(cfw)), axis=0)
        # pi_stat keeps the direct w*bhat/(denom*cfw) form: the
        # algebraically equivalent (ab/denom)/(lp*ahat_{t-1}+col) — which
        # would reuse the gamma producer's streams — needs a SHIFTED read
        # of ahat, and XLA materializes the shifted operand as a full
        # f32 copy (measured: 3.68 -> 5.09 ms/batch; negative result,
        # round 4). The separate w+bhat pass is the cheaper of the two.
        not_first = valid_tb.at[0].set(0.0)
        terms = (w.astype(dtype) * bhat.astype(dtype)
                 / (denom * cfw[:, None, :]))
        pi_stat_sb = jnp.sum(terms * not_first[:, None, :], axis=0)
        # frozen lanes' pi update is discarded by sel below, so reading
        # gamma[0] from g_next (old gamma there) is equivalent
        gamma0_sb = g_next[0].astype(dtype)

        elbo_val = log_px + vmapped_elbo_term(invL, alpha, fb)    # [B]
        new_pi = vmapped_pi_update(gamma0_sb.T, state.pi, pi_stat_sb.T,
                                   loop_prob)

        delta = elbo_val - state.last_elbo
        new_plateau, plateau_hit = _plateau_step(
            delta, elbo_val, state.plateau, plateau_ulps, plateau_iters,
            jnp.asarray(jnp.finfo(dtype).eps, dtype))
        now_conv = jnp.logical_and(jnp.logical_not(first),
                                   jnp.logical_or(delta < epsilon,
                                                  plateau_hit))

        # a frozen lane's column `it` was NaN in both branches of the old
        # whole-array select (it converged on an EARLIER iteration, so
        # nothing ever wrote column `it`): one NaN-masked scatter is
        # equivalent and drops the [B, max_iters] select
        new_elbo = state.elbo.at[:, state.it].set(
            jnp.where(keep, jnp.asarray(jnp.nan, dtype), elbo_val))

        return _PState(
            it=state.it + 1,
            converged=jnp.logical_or(keep, now_conv),
            gamma=g_next,
            counts=new_counts,
            pi=sel(state.pi, new_pi, 0),
            elbo=new_elbo,
            last_elbo=sel(state.last_elbo, elbo_val, 0),
            plateau=sel(state.plateau, new_plateau, 0),
        )

    def cond(state: _PState):
        return jnp.logical_and(state.it < max_iters,
                               jnp.logical_not(jnp.all(state.converged)))

    init = _PState(
        it=jnp.zeros((), jnp.int32),
        converged=converged0,
        gamma=gamma_tsb,
        counts=counts0,
        pi=pi,
        elbo=jnp.full((B, max_iters), jnp.nan, dtype),
        last_elbo=last_elbo0.astype(dtype),
        plateau=plateau0,
    )
    final = jax.lax.while_loop(cond, one_iteration, init)

    n_iters = jnp.sum(jnp.logical_not(jnp.isnan(final.elbo)),
                      axis=1).astype(jnp.int32)
    g_out = jnp.transpose(final.gamma, (2, 0, 1)).astype(dtype)  # [B, T, S]
    # speaker model recomputed from the FINAL responsibilities (one extra
    # M-step): the scan paths return the model of the crossing iteration
    # (computed from the previous gamma); both are valid converged models
    # and agree to within the convergence tolerance
    invL_f, alpha_f = m_step(final.gamma, final.counts)
    return VBxResult(g_out, final.pi, final.elbo, n_iters, alpha_f, invL_f)


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "fb_impl"))
def _vbx_batched_jit(X, phi, gamma, pi, frame_mask, speaker_mask,
                     loop_prob, fa, fb, epsilon, converged0, last_elbo0,
                     plateau_ulps, plateau_iters, plateau0,
                     *, max_iters: int, fb_impl: str):
    B, T, S = gamma.shape
    D = X.shape[-1]
    zeros_a = jnp.zeros((B, S, D), X.dtype)
    ones_l = jnp.ones((B, S, D), X.dtype)
    fn = functools.partial(
        _vbx_jit.__wrapped__,  # call through vmap, jit applied outside
        max_iters=max_iters, fb_impl=fb_impl, has_initial_model=False)
    return jax.vmap(
        lambda x, g, p, fm, sm, a0, l0, c0, le0, pl0: fn(
            x, phi, g, p, fm, sm, loop_prob, fa, fb, epsilon, a0, l0,
            c0, le0, plateau_ulps, plateau_iters, pl0)
    )(X, gamma, pi, frame_mask, speaker_mask, zeros_a, ones_l,
      converged0, last_elbo0, plateau0)


def vbx_batched(
    X: jax.Array,            # [B, T, D] padded features
    phi: jax.Array,          # [D]
    gamma: jax.Array,        # [B, T, S] padded initial responsibilities
    pi: jax.Array,           # [B, S] padded initial priors
    frame_mask: jax.Array,   # [B, T] bool
    speaker_mask: jax.Array,  # [B, S] bool
    loop_prob: float,
    Fa: float,
    Fb: float,
    max_iters: int = 40,
    epsilon: float = 1e-6,
    fb_impl: Optional[str] = None,
    converged0: Optional[jax.Array] = None,   # [B] resume: already-done mask
    last_elbo0: Optional[jax.Array] = None,   # [B] resume: carried ELBO
    plateau_ulps: float = 0.0,
    plateau_iters: int = 2,
    plateau0: Optional[jax.Array] = None,     # [B] resume: carried counter
    _pallas_strict: bool = False,
) -> VBxResult:
    """Batched VB-HMM over padded recordings with per-recording convergence.

    This is the throughput path: the batch keeps stepping until the slowest
    recording converges, with converged recordings frozen (bit-identical to
    running each recording alone). Bucket recordings by comparable T to
    minimize the padding + straggler waste (vbx_tpu.utils.bucketing).

    fb_impl: 'structured' (default — XLA compiles the scan into a tight
    on-device loop; measured at parity with or ahead of the Pallas kernel
    on v5e and it supports float64 on CPU), 'pallas' (the fused
    natively-batched kernel path, ops.fb_pallas), 'pallas_bf16' (same
    kernel path with the large per-iteration streams stored in bfloat16 —
    f32 accumulation throughout; lowest HBM traffic, tolerance-parity
    only — see _vbx_batched_pallas_sb_jit), or 'assoc' (work-parallel
    associative scan for very long recordings). The pallas sb kernel
    holds speakers on SUBLANES — S up to 256 runs the kernel (round 5;
    the old 128 cap was the lanes-layout limit); past 256 the engine
    falls back to 'structured' with a UserWarning (the reference NumPy
    loop has no S limit, VBx.py:97-98).

    converged0/last_elbo0 resume a run from engine-state checkpointing
    (vbx_batched_checkpointed): a resumed slice behaves exactly as the
    continuation of the original run — its first iteration may converge
    against the carried ELBO, and already-converged recordings stay
    frozen from iteration 0.

    plateau_ulps/plateau_iters: opt-in f32 plateau stop (_plateau_step;
    PARITY.md deviation 3) — a lane whose |Delta-ELBO| stays within
    plateau_ulps machine quanta of |ELBO| for plateau_iters consecutive
    iterations freezes, so one quantum-cycling recording cannot tax the
    whole padded batch with max_iters device time. Default OFF
    (plateau_ulps=0): the reference's absolute-epsilon rule, VBx.py:122-125.
    plateau0 carries the counter across checkpoint slices.
    """
    B = gamma.shape[0]
    if converged0 is None:
        converged0 = jnp.zeros((B,), bool)
    if plateau0 is None:
        plateau0 = jnp.zeros((B,), jnp.int32)
    if last_elbo0 is None:
        # the fresh-start sentinel must be created in the ENGINE dtype:
        # NEG_INF is not float32-representable exactly, so an f32 default
        # upcast into an f64 engine would no longer compare equal to
        # jnp.asarray(NEG_INF, f64) and every lane would look "resumed"
        last_elbo0 = jnp.full((B,), NEG_INF, X.dtype)
    if fb_impl is None:
        fb_impl = "structured"
    from vbx_tpu.ops.fb_pallas import S_PAD_SB
    if fb_impl in ("pallas", "pallas_bf16") and gamma.shape[-1] > S_PAD_SB:
        # beyond the sb kernel's sublane extent; fall back to the
        # structured engine — LOUDLY, so a user benchmarking "pallas*"
        # on a many-speaker corpus knows a different engine ran
        # (the reference NumPy loop has no S limit, VBx/VBx.py:97-98)
        import warnings
        warnings.warn(
            f"fb_impl={fb_impl!r} supports at most {S_PAD_SB} speakers "
            f"(the kernel holds speakers on sublanes); got "
            f"S={gamma.shape[-1]} — falling back to fb_impl='structured'",
            stacklevel=2)
        fb_impl = "structured"
    if fb_impl in ("pallas", "pallas_bf16"):
        interpret = jax.default_backend() == "cpu"
        # one engine for every B (small B pays lane padding, but small B is
        # not the throughput regime). A recording's result is batch-size-
        # independent up to float rounding (XLA blocks the einsums shape-
        # dependently; tests bound the drift at ~1e-5) — for bit-exact
        # batched==streaming behavior use the default 'structured' path.
        try:
            return _vbx_batched_pallas_sb_jit(
                X, jnp.asarray(phi), gamma, pi, frame_mask, speaker_mask,
                jnp.float32(loop_prob), jnp.float32(Fa), jnp.float32(Fb),
                jnp.float32(epsilon), jnp.asarray(converged0, bool),
                jnp.asarray(last_elbo0, jnp.float32),
                jnp.float32(plateau_ulps),
                jnp.asarray(plateau_iters, jnp.int32),
                jnp.asarray(plateau0, jnp.int32),
                max_iters=max_iters, interpret=interpret,
                io_dtype=("bfloat16" if fb_impl == "pallas_bf16"
                          else "float32"))
        except Exception:
            if gamma.shape[-1] <= 128 or _pallas_strict:
                # the long-proven range: surface the real bug. Strict
                # callers (vbx_batched_checkpointed) must see the failure
                # themselves — a silent engine swap here would leave them
                # committed to the pallas f32 state dtype and '+pallas'
                # checkpoint header while structured actually ran.
                raise
            # the S in (128, 256] extension is interpret-validated; if a
            # backend's Mosaic rejects the wider sublane extent at
            # compile time, degrade to the structured engine instead of
            # failing the recording (round 5 — safety net for the cap
            # raise)
            import warnings
            warnings.warn(
                f"pallas engine failed to compile at S={gamma.shape[-1]}"
                f" — falling back to fb_impl='structured'", stacklevel=2)
            fb_impl = "structured"
    dtype = X.dtype
    return _vbx_batched_jit(
        X, jnp.asarray(phi, dtype), gamma, pi, frame_mask, speaker_mask,
        jnp.asarray(loop_prob, dtype), jnp.asarray(Fa, dtype),
        jnp.asarray(Fb, dtype), jnp.asarray(epsilon, dtype),
        jnp.asarray(converged0, bool), jnp.asarray(last_elbo0, dtype),
        jnp.asarray(plateau_ulps, dtype),
        jnp.asarray(plateau_iters, jnp.int32),
        jnp.asarray(plateau0, jnp.int32),
        max_iters=max_iters, fb_impl=fb_impl)


def vbx_batched_checkpointed(
    X: jax.Array,
    phi: jax.Array,
    gamma: jax.Array,
    pi: jax.Array,
    frame_mask: jax.Array,
    speaker_mask: jax.Array,
    loop_prob: float,
    Fa: float,
    Fb: float,
    max_iters: int = 40,
    epsilon: float = 1e-6,
    fb_impl: Optional[str] = None,
    iters_per_slice: int = 10,
    checkpoint_path: Optional[str] = None,
    mesh=None,
    plateau_ulps: float = 0.0,
    plateau_iters: int = 2,
) -> VBxResult:
    """vbx_batched with mid-EM engine-state checkpointing (SURVEY.md §5:
    the reference's only durability is whole files per recording; a
    preempted long batch here resumes mid-recording).

    `mesh`: a ('dp', 'sp') jax.sharding.Mesh runs every slice through
    the SHARDED engine (parallel.vbx_sharded) — the pod-scale variant: a
    preempted slice of hour-long frame-sharded meetings resumes exactly.
    Under a mesh fb_impl='pallas'/'pallas_bf16' selects the Pallas
    blockwise smoother (tolerance-parity); anything else runs the
    structured blockwise smoother.

    The EM runs in host-visible slices of `iters_per_slice` iterations.
    After each slice the full loop state — (gamma, pi, converged,
    last_elbo, stitched ELBO trace) — is on the host and, if
    `checkpoint_path` is given, written atomically (tmp + rename). A rerun
    with the same arguments loads the file and continues from the last
    completed slice; the file is removed on successful completion.

    Slicing is EXACT, not approximate: the loop state is externalized
    (vbx_batched's converged0/last_elbo0), so a sliced run follows the
    same trajectory as one long run — bit-identical on the default
    'structured' engine (f32 and f64) at a fixed padded shape
    (tests/test_engine.py).
    """
    import os

    if iters_per_slice < 1:
        raise ValueError(f"iters_per_slice must be >= 1, got "
                         f"{iters_per_slice}")
    B, T, S = gamma.shape
    # carry the loop state in the ENGINE dtype: the pallas paths run f32
    # regardless of input, the structured path runs in X.dtype (f64 on
    # CPU) — an f32 downcast there would quantize sub-f32 ELBO deltas to
    # zero and flag convergence early
    from vbx_tpu.ops.fb_pallas import S_PAD_SB
    s_cap = 128 if mesh is not None else S_PAD_SB   # sharded kernels: 128
    if S > s_cap and (fb_impl or "").startswith("pallas"):
        # the engines fall back to 'structured' above the kernels'
        # capacity; committing to the pallas f32 state dtype (and a
        # '+pallas' checkpoint header) here would quantize an f64
        # structured trajectory's deltas and misdescribe the run. Warn
        # ONCE and resolve the fallback now, so the per-slice engine
        # calls don't re-warn either.
        import warnings
        warnings.warn(
            f"fb_impl={fb_impl!r} supports at most {s_cap} speakers "
            f"here; got S={S} — checkpointed run proceeds with the "
            f"structured engine", stacklevel=2)
        fb_impl = None
    fb = fb_impl or "structured"
    mesh_pallas = mesh is not None and fb in ("pallas", "pallas_bf16")
    if mesh is not None:
        fb = (f"sharded[{','.join(f'{k}={v}' for k, v in mesh.shape.items())}]"
              + (f"+{fb_impl}" if mesh_pallas else ""))
        dt = np.dtype(np.float32 if mesh_pallas else np.asarray(X).dtype)
    else:
        dt = np.dtype(np.float32 if fb.startswith("pallas")
                      else np.asarray(X).dtype)
    it_done = 0
    elbo_full = np.full((B, max_iters), np.nan, dt)
    converged = np.zeros((B,), bool)
    last_elbo = np.full((B,), NEG_INF, dt)
    plateau = np.zeros((B,), np.int32)
    g_cur = jnp.asarray(gamma)
    pi_cur = jnp.asarray(pi)

    # the hyperparameters that define the trajectory: a checkpoint from a
    # differently-configured run must not silently resume
    header = {"shape": np.array([B, T, S]), "fb_impl": np.str_(fb),
              "dtype": np.str_(np.dtype(dt).name),
              "hp": np.array([float(loop_prob), float(Fa), float(Fb),
                              float(epsilon), float(max_iters),
                              float(plateau_ulps), float(plateau_iters)])}

    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        for key, want in header.items():
            got = ck[key] if key in ck.files else None
            if (key == "hp" and got is not None
                    and np.asarray(got).shape == (5,)
                    and plateau_ulps == 0.0 and plateau_iters == 2):
                # round-2 checkpoints carried a 5-element hp (no plateau
                # fields) and no 'plateau' array; they resume under the
                # implied defaults (plateau off) rather than forcing a
                # preempted long run upgraded mid-flight back to iteration
                # 0 (ADVICE round 3)
                want = np.asarray(want)[:5]
            if got is None or np.asarray(got).shape != np.asarray(
                    want).shape or not np.all(np.asarray(got) == want):
                raise ValueError(
                    f"checkpoint {checkpoint_path} was written by a "
                    f"differently-configured run ({key}: {got!r} != "
                    f"{want!r}); delete it or use a distinct path")
        it_done = int(ck["it_done"])
        elbo_full[:, :it_done] = ck["elbo"][:, :it_done]
        converged = ck["converged"]
        last_elbo = ck["last_elbo"].astype(dt)
        plateau = (ck["plateau"].astype(np.int32) if "plateau" in ck.files
                   else np.zeros((B,), np.int32))
        g_cur = jnp.asarray(ck["gamma"])
        pi_cur = jnp.asarray(ck["pi"])

    res = None
    while it_done < max_iters and not converged.all():
        k = min(iters_per_slice, max_iters - it_done)
        if mesh is not None:
            from vbx_tpu.parallel.engine import vbx_sharded
            res = vbx_sharded(
                mesh, jnp.asarray(X), jnp.asarray(phi), g_cur, pi_cur,
                jnp.asarray(frame_mask), jnp.asarray(speaker_mask),
                loop_prob=loop_prob, Fa=Fa, Fb=Fb, max_iters=k,
                epsilon=epsilon, converged0=jnp.asarray(converged),
                last_elbo0=jnp.asarray(last_elbo),
                fb_impl=(fb_impl if mesh_pallas else None),
                plateau_ulps=plateau_ulps, plateau_iters=plateau_iters,
                plateau0=jnp.asarray(plateau))
        else:
            try:
                # strict: a pallas compile failure must surface HERE, not
                # silently swap engines inside vbx_batched — this run is
                # committed to the pallas state dtype and checkpoint
                # header (the round-5 S>128 safety net would otherwise
                # recreate the f32-quantized-structured-trajectory bug
                # the S-cap guard above exists to prevent)
                res = vbx_batched(
                    X, phi, g_cur, pi_cur, frame_mask, speaker_mask,
                    loop_prob, Fa, Fb, max_iters=k, epsilon=epsilon,
                    fb_impl=fb_impl, converged0=jnp.asarray(converged),
                    last_elbo0=jnp.asarray(last_elbo),
                    plateau_ulps=plateau_ulps, plateau_iters=plateau_iters,
                    plateau0=jnp.asarray(plateau), _pallas_strict=True)
            except Exception:
                if (it_done == 0 and 128 < S
                        and (fb_impl or "").startswith("pallas")):
                    # nothing persisted yet: restart the whole
                    # checkpointed run on the structured engine with the
                    # correct state dtype and header
                    import warnings
                    warnings.warn(
                        f"pallas engine failed to compile at S={S} — "
                        f"restarting the checkpointed run on "
                        f"fb_impl='structured'", stacklevel=2)
                    return vbx_batched_checkpointed(
                        X, phi, gamma, pi, frame_mask, speaker_mask,
                        loop_prob, Fa, Fb, max_iters=max_iters,
                        epsilon=epsilon, fb_impl=None,
                        iters_per_slice=iters_per_slice,
                        checkpoint_path=checkpoint_path, mesh=mesh,
                        plateau_ulps=plateau_ulps,
                        plateau_iters=plateau_iters)
                raise
        g_cur, pi_cur = res.gamma, res.pi
        elbo_k = np.asarray(res.elbo).astype(dt, copy=False)  # [B, k]
        n_k = np.sum(~np.isnan(elbo_k), axis=1)            # per-rec iters
        elbo_full[:, it_done:it_done + k] = elbo_k
        ran = n_k > 0
        idx = np.arange(B)
        new_last = elbo_k[idx, np.maximum(n_k - 1, 0)]
        # the device freezes a recording on the iteration AFTER its
        # crossing delta, so convergence exactly equals "the last recorded
        # delta is below epsilon" — recompute it on host (same engine-dtype
        # values the device compared) because a recording that crosses on
        # the slice's final iteration is otherwise indistinguishable from
        # one still running (n_k == k either way)
        prev_of_last = np.where(
            n_k >= 2, elbo_k[idx, np.maximum(n_k - 2, 0)], last_elbo)
        last_delta = new_last - prev_of_last               # engine dtype
        converged_new = (ran & (n_k < k)) \
            | (ran & (last_delta < dt.type(epsilon)))
        if plateau_ulps > 0:
            # replay the device's counter over this slice's recorded
            # deltas (same engine-dtype values, same operation grouping as
            # _plateau_step) — needed for the same reason as last_delta: a
            # lane whose plateau fires on the slice's final iteration has
            # n_k == k, and the counter must carry into the next slice
            was_conv = converged
            c = plateau.copy()
            prev = last_elbo.copy()
            eps_m = dt.type(np.finfo(dt).eps)
            pu = dt.type(plateau_ulps)
            for j in range(k):
                active = (~was_conv) & (n_k > j)
                cur = elbo_k[:, j]
                quantum = eps_m * np.maximum(np.abs(cur), dt.type(1.0))
                small = np.abs((cur - prev).astype(dt)) <= pu * quantum
                c = np.where(active, np.where(small, c + 1, 0), c)
                prev = np.where(active, cur, prev)
            plateau = c.astype(np.int32)
            converged_new |= ran & (plateau >= plateau_iters)
        converged = converged | converged_new
        last_elbo = np.where(ran, new_last, last_elbo)
        it_done += k
        if checkpoint_path:
            tmp = checkpoint_path + ".tmp.npz"   # .npz: savez won't rename
            np.savez(tmp, gamma=np.asarray(res.gamma),
                     pi=np.asarray(res.pi), converged=converged,
                     last_elbo=last_elbo, plateau=plateau,
                     elbo=elbo_full, it_done=it_done,
                     **header)
            os.replace(tmp, checkpoint_path)

    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)

    n_iters = np.sum(~np.isnan(elbo_full), axis=1).astype(np.int32)

    # final speaker model recomputed from the FINAL responsibilities (the
    # pallas engine's convention): a recording frozen in an earlier slice
    # would otherwise surface that slice's — or no — model. Both this and
    # the crossing-iteration model are valid converged models and agree to
    # within the convergence tolerance (see _vbx_batched_pallas_sb_jit).
    def final_model(x, g):
        _, rho = vb_precompute(x, jnp.asarray(phi, x.dtype))
        return vb_m_step(g, rho, jnp.asarray(phi, x.dtype),
                         jnp.asarray(Fa / Fb, x.dtype))

    invL_f, alpha_f = jax.vmap(final_model)(jnp.asarray(X), g_cur)
    return VBxResult(g_cur, pi_cur, jnp.asarray(elbo_full),
                     jnp.asarray(n_iters), alpha_f, invL_f)
