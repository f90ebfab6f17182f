"""HMM forward-backward smoothers, TPU-first.

All variants match the reference recursion (VBx/VBx.py:146-175) including its
`log(tr + eps)` / `log(ip + eps)` regularization semantics, but none of them
run the reference's unnormalized log-domain recursion: forward scores grow to
magnitude ~70*T, where float32 resolution is ~1e-2 and the accumulated drift
does NOT cancel in `lfw + lbw - log_px` (measured: posterior mass errors
> 1.0 at T ~ 1000 in f32). Instead the sequential variants use the *scaled*
linear-domain form:

    w_t   = exp(log_p[t] - m_t),              m_t = max_s log_p[t, s]
    a_t   = w_t * (ahat_{t-1} @ (tr + eps)),  c_t = sum_s a_t,  ahat_t = a_t/c_t
    b_t   = (tr + eps) @ (w_{t+1} * bhat_{t+1}),  normalized likewise

Every tensor in the scan body is O(1), so f32 is exact to ~1e-6 per frame
with no T-dependence; the only long accumulation is the scalar
log-normalizer sequence (m_t + log c_t), summed post-hoc with an XLA tree
reduction (absolute error ~1e-2 at |log_px| ~ 1e5 — far below any
EM-relevant scale). The scan body is pure multiply-add: no log/exp inside
the loop, which is also the faster form on the TPU VPU.

Posteriors and the pi-update statistic come out exactly in linear domain.
With lfw[t] = log ahat_t + Cf_t, lbw[t] = log bhat_t + Cb_t substituted into
the reference expressions (VBx/VBx.py:101-103,174) and sum_s ahat_t = 1:

    gamma_t   = ahat_t * bhat_t / sum_s(ahat_t[s] * bhat_t[s])
    pi_stat_s = sum_{t>=1} w_t[s] * bhat_t[s] * r_t / c_t,
                r_t = 1 / sum_s(ahat_t[s] * bhat_t[s])

(both scale-invariant in bhat, so backward bookkeeping only matters for the
reconstructed lfw/lbw debug outputs).

Three algorithms:

1. `forward_backward_structured` — exploits tr = loopP*I + (1-loopP)*1 pi^T
   (VBx/VBx.py:98): because the +eps regularizer is constant across entries,
   the S^2 inner product collapses EXACTLY to O(S) per frame:
       a_t = w_t * (loopP * ahat_{t-1} + ((1-loopP)*pi + eps))
   (using sum_s ahat = 1). The default engine path; batched via vmap.

2. `forward_backward_dense` — general dense-transition smoother (any HMM),
   O(S^2) per frame; the parity oracle for (1) and the public API for
   arbitrary transition matrices.

3. `forward_backward_assoc` — work-parallel form: per-frame transition
   operators composed in the (logsumexp, +) semiring with
   `jax.lax.associative_scan`. Each element is a max-normalized [S, S]
   log-matrix plus a scalar log-scale, so composed operators stay O(1) and
   f32-exact at any T; per-frame outputs (gamma, pi_stat) are assembled from
   within-frame-normalized quantities only, so no large-magnitude
   cancellation survives anywhere. No sequential T dependency -> the
   long-recording / frame-sharded building block (the HMM analogue of
   blockwise attention); the multi-chip variant in vbx_tpu.parallel
   exchanges S x S block summaries over ICI.

All functions accept a boolean `frame_mask` (True = real frame) whose False
entries must form a suffix; padded frames are skipped exactly (forward
carries freeze, backward messages pass through, normalizer contributions are
zeroed), so batched padded recordings produce bit-identical posteriors to
their unpadded runs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vbx_tpu.ops.lse import NEG_INF, logsumexp


class FBResult(NamedTuple):
    gamma: jax.Array        # [T, S] posteriors (zeroed at padded frames)
    log_px: jax.Array       # scalar total log-likelihood
    lfw: jax.Array          # [T, S] log forward probabilities
    lbw: jax.Array          # [T, S] log backward probabilities
    pi_stat: jax.Array      # [S] transition-occupation stat for the pi update:
    #   sum_{t>=1} exp(LSE_j lfw[t-1,j] + log_p[t] + lbw[t] - log_px)
    #   (the reference computes this inline at VBx/VBx.py:101-103)


def _default_mask(log_p):
    return jnp.ones(log_p.shape[0], dtype=bool)


def _normalize_logp(log_p, valid):
    """Per-frame max-shift: (w = exp(log_p - m), m). Padded frames get
    uniform w at m = 0 (they are carried through by the scans anyway)."""
    dtype = log_p.dtype
    m = jnp.max(log_p, axis=-1)
    m = jnp.where(valid, m, jnp.zeros_like(m))
    w = jnp.exp(log_p - m[:, None])
    w = jnp.where(valid[:, None], w, jnp.ones_like(w) / log_p.shape[-1])
    return w.astype(dtype), m.astype(dtype)


def _finish(ahat, bhat, w, cf_steps, cb_steps, cfw, valid):
    """Assemble FBResult from scaled quantities.

    ahat, bhat: [T, S] normalized forward/backward messages (rows sum to 1).
    cf_steps:   [T] forward log-normalizer increments (m_t + log c_t), zero
                at padded frames; cf_steps[0] covers frame 0.
    cb_steps:   [T] backward increments (cb_steps[T-1] = log S so that
                lbw[T-1] reconstructs to exactly 0).
    cfw:        [T] linear forward normalizers c_t (1 at padded frames).
    """
    dtype = ahat.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    log_px = jnp.sum(cf_steps)

    ab = ahat * bhat
    denom = jnp.maximum(jnp.sum(ab, axis=-1, keepdims=True), tiny)
    gamma = (ab / denom) * valid[:, None].astype(dtype)

    r_over_c = 1.0 / (denom[1:, 0] * cfw[1:])
    terms = w[1:] * bhat[1:] * r_over_c[:, None]
    pi_stat = jnp.sum(terms * valid[1:, None].astype(dtype), axis=0)

    # reference-scale lfw/lbw for debugging/tests:
    cf = jnp.cumsum(cf_steps)
    cb = jnp.flip(jnp.cumsum(jnp.flip(cb_steps)))
    lfw = jnp.log(jnp.maximum(ahat, tiny)) + cf[:, None]
    lbw = jnp.log(jnp.maximum(bhat, tiny)) + cb[:, None]
    return FBResult(gamma, log_px, lfw, lbw, pi_stat)


def _scaled_fb(log_p, init_vec, fwd_apply, bwd_apply, valid) -> FBResult:
    """Shared driver for the sequential scaled smoothers: runs both
    normalized scans given the transition applications
    fwd_apply(prev_row_vec) and bwd_apply(next_col_vec)."""
    dtype = log_p.dtype
    S = log_p.shape[1]
    w, m = _normalize_logp(log_p, valid)

    a0 = w[0] * init_vec
    c0 = jnp.sum(a0)
    ahat0 = a0 / c0

    def fwd_step(prev, inp):
        w_t, m_t, valid_t = inp
        a = w_t * fwd_apply(prev)                 # sum_s prev == 1
        c = jnp.sum(a)
        ahat = jnp.where(valid_t, a / c, prev)
        step = jnp.where(valid_t, m_t + jnp.log(c), jnp.zeros_like(c))
        cfw = jnp.where(valid_t, c, jnp.ones_like(c))
        return ahat, (ahat, step, cfw)

    def bwd_step(nxt, inp):
        w_next, m_next, valid_next = inp
        b = bwd_apply(w_next * nxt)
        c = jnp.sum(b)
        bhat = jnp.where(valid_next, b / c, nxt)
        step = jnp.where(valid_next, m_next + jnp.log(c), jnp.zeros_like(c))
        return bhat, (bhat, step)

    # ONE merged scan runs the forward recursion ascending and the backward
    # recursion descending in the same step (they are independent): half
    # the sequential step count, which dominates — the per-step arithmetic
    # is tiny [B, S] multiply-adds, so loop control is the cost. The
    # backward inputs/outputs are pre-/post-flipped; per-step math is
    # unchanged from the separate-scan form. unroll=8, not 16: at 16 XLA's
    # codegen rounds differently for padded-batched vs unpadded shapes,
    # which can flip a convergence decision at epsilon and break the
    # batched==streaming bit-parity invariant
    # (tests/test_pipeline_batched.py).
    bhat_last = jnp.ones((S,), dtype) / S         # lbw[T-1] = 0, scale log S
    xs_f = (w[1:], m[1:], valid[1:])
    xs_b = jax.tree.map(lambda x: jnp.flip(x, 0), xs_f)

    def fb_step(carry, inp):
        fprev, bnext = carry
        fin, bin_ = inp
        fnew, fout = fwd_step(fprev, fin)
        bnew, bout = bwd_step(bnext, bin_)
        return (fnew, bnew), (fout, bout)

    _, (fouts, bouts) = jax.lax.scan(
        fb_step, (ahat0, bhat_last), (xs_f, xs_b), unroll=8)
    ahat_rest, cf_rest, cfw_rest = fouts
    bhat_rest = jnp.flip(bouts[0], 0)
    cb_rest = jnp.flip(bouts[1], 0)

    ahat = jnp.concatenate([ahat0[None], ahat_rest], axis=0)
    cf_steps = jnp.concatenate([(m[0] + jnp.log(c0))[None], cf_rest])
    cfw = jnp.concatenate([c0[None], cfw_rest])
    bhat = jnp.concatenate([bhat_rest, bhat_last[None]], axis=0)
    logS = jnp.log(jnp.asarray(S, dtype))
    cb_steps = jnp.concatenate([cb_rest, logS[None]])

    return _finish(ahat, bhat, w, cf_steps, cb_steps, cfw, valid)


def forward_backward_structured(
    log_p: jax.Array,
    pi: jax.Array,
    loop_prob,
    eps: float = 1e-8,
    frame_mask: Optional[jax.Array] = None,
) -> FBResult:
    """O(S)-per-frame exact smoother for tr = loopP*I + (1-loopP)*1 pi^T."""
    dtype = log_p.dtype
    pi = pi.astype(dtype)
    valid = _default_mask(log_p) if frame_mask is None else frame_mask
    loop_prob = jnp.asarray(loop_prob, dtype)
    eps = jnp.asarray(eps, dtype)
    col = (1.0 - loop_prob) * pi + eps   # constant transition column + eps
    return _scaled_fb(
        log_p, pi + eps,
        lambda prev: loop_prob * prev + col,
        lambda u: loop_prob * u + jnp.sum(col * u),   # row-constant term
        valid)


def forward_backward_dense(
    log_p: jax.Array,
    tr: jax.Array,
    ip: jax.Array,
    eps: float = 1e-8,
    frame_mask: Optional[jax.Array] = None,
) -> FBResult:
    """General dense-transition scaled smoother (any S x S tr)."""
    dtype = log_p.dtype
    valid = _default_mask(log_p) if frame_mask is None else frame_mask
    tr_eps = tr.astype(dtype) + jnp.asarray(eps, dtype)
    ip_eps = ip.astype(dtype) + jnp.asarray(eps, dtype)
    # HIGHEST: the general path is reference-faithful; TPU DEFAULT would
    # round the per-step matvec inputs to bf16 (ops/vb_steps.py docstring)
    return _scaled_fb(
        log_p, ip_eps,
        lambda prev: jnp.dot(prev, tr_eps,
                             precision=jax.lax.Precision.HIGHEST),
        lambda u: jnp.dot(tr_eps, u,
                          precision=jax.lax.Precision.HIGHEST),
        valid)


def _log_matmul_scaled(a, b):
    """(logsumexp, +) semiring composition of max-normalized operators.

    Elements are (mat [..., S, S], scale [...]); compose then re-normalize
    so matrix entries stay O(1) in f32 at any composition depth.
    """
    a_mat, a_scale = a
    b_mat, b_scale = b
    out = logsumexp(a_mat[..., :, :, None] + b_mat[..., None, :, :], axis=-2)
    mx = jnp.max(out, axis=(-2, -1), keepdims=True)
    mx = jnp.maximum(mx, jnp.asarray(NEG_INF, out.dtype))
    return out - mx, a_scale + b_scale + mx[..., 0, 0]


def forward_backward_assoc(
    log_p: jax.Array,
    pi: jax.Array,
    loop_prob,
    eps: float = 1e-8,
    frame_mask: Optional[jax.Array] = None,
) -> FBResult:
    """Work-parallel smoother via associative operator scans (see module
    docstring). O(T log T * S^2) elementwise work, no sequential T
    dependency."""
    dtype = log_p.dtype
    T, S = log_p.shape
    pi = pi.astype(dtype)
    valid = _default_mask(log_p) if frame_mask is None else frame_mask

    loop_prob = jnp.asarray(loop_prob, dtype=dtype)
    eps_c = jnp.asarray(eps, dtype)
    ltr = jnp.log(jnp.eye(S, dtype=dtype) * loop_prob
                  + (1.0 - loop_prob) * pi[None, :] + eps_c)
    log_eye = jnp.where(jnp.eye(S, dtype=bool), jnp.asarray(0.0, dtype),
                        jnp.asarray(NEG_INF, dtype))

    lfw0 = log_p[0] + jnp.log(pi + eps_c)
    lfw0_m = jnp.max(lfw0)
    lfw0_hat = lfw0 - lfw0_m

    # Per-frame operators A_t[j, i] = ltr[j, i] + log_p[t, i] for t >= 1,
    # identity at padded frames, max-normalized with separate scales.
    a_mat = ltr[None] + log_p[1:, None, :]
    a_mat = jnp.where(valid[1:, None, None], a_mat, log_eye[None])
    a_scale = jnp.max(a_mat, axis=(-2, -1))
    a_mat = a_mat - a_scale[:, None, None]

    pre_mat, pre_scale = jax.lax.associative_scan(
        _log_matmul_scaled, (a_mat, a_scale), axis=0)
    lfw_rest = logsumexp(lfw0_hat[None, :, None] + pre_mat, axis=1) \
        + (lfw0_m + pre_scale)[:, None]
    lfw = jnp.concatenate([lfw0[None], lfw_rest], axis=0)

    # reverse=True composes elements in descending index order, so swap the
    # operands to get suffix[t] = A_t (x) A_{t+1} (x) ... (x) A_{T-1}
    suf_mat, suf_scale = jax.lax.associative_scan(
        lambda x, y: _log_matmul_scaled(y, x), (a_mat, a_scale),
        axis=0, reverse=True)
    lbw_rest = logsumexp(suf_mat, axis=2) + suf_scale[:, None]
    lbw = jnp.concatenate([lbw_rest, jnp.zeros((1, S), dtype)], axis=0)

    log_px = logsumexp(lfw[-1])

    # gamma via per-frame normalization: within a frame every lfw/lbw entry
    # shares its composed-operator scale, so relative precision is O(eps_f32)
    # regardless of T.
    z = lfw + lbw
    z = z - jnp.max(z, axis=1, keepdims=True)
    ez = jnp.exp(z)
    gamma = ez / jnp.sum(ez, axis=1, keepdims=True)
    gamma = gamma * valid[:, None].astype(dtype)

    # pi_stat without large-magnitude cancellation. Substituting the forward
    # recursion lfw[t] = LSE_j(lfw[t-1, j] + ltr[j, s]) + log_p[t, s] into
    # the reference expression and normalizing per frame
    # (fhat = lfw[t-1] - LSE(lfw[t-1]), ghat = lbw[t] - max(lbw[t])):
    #   terms[t, s] = exp(log_p[t, s] + ghat[t, s] - D_t)
    #   D_t = LSE_s( LSE_j(fhat[j] + ltr[j, s]) + log_p[t, s] + ghat[t, s] )
    # — every operand is O(1); the absolute scales cancel identically.
    fhat = lfw[:-1] - logsumexp(lfw[:-1], axis=1)[:, None]
    ghat = lbw[1:] - jnp.max(lbw[1:], axis=1, keepdims=True)
    # structured transition: LSE_j(fhat[j] + ltr[j, s]) =
    #   log(loopP * exp(fhat[s]) + ((1-loopP) pi_s + eps) * sum_j exp(fhat)_j)
    ef = jnp.exp(fhat)
    trans = jnp.log(loop_prob * ef
                    + ((1.0 - loop_prob) * pi + eps_c)[None, :]
                    * jnp.sum(ef, axis=1, keepdims=True))
    log_terms_hat = log_p[1:] + ghat
    D = logsumexp(trans + log_terms_hat, axis=1)
    terms = jnp.exp(log_terms_hat - D[:, None])
    pi_stat = jnp.sum(terms * valid[1:, None].astype(dtype), axis=0)
    return FBResult(gamma, log_px, lfw, lbw, pi_stat)
