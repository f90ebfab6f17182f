"""Log-space HMM forward-backward smoothers, TPU-first.

Three interchangeable algorithms (all match the reference recursion
VBx/VBx.py:146-175 including its `log(tr + eps)` / `log(ip + eps)`
regularization semantics):

1. `forward_backward_structured` — exploits the VBx transition structure
   tr = loopP*I + (1-loopP)*1 pi^T  (VBx/VBx.py:98). Because the +eps
   regularizer is a constant added to *every* entry, the dense S^2 inner
   logsumexp collapses EXACTLY to an O(S) step:

       sum_j exp(lfw[j]) * (loopP*d_ij + (1-loopP)*pi_i + eps)
         = loopP*exp(lfw[i]) + ((1-loopP)*pi_i + eps) * sum_j exp(lfw[j])

   so each frame costs one logaddexp + one logsumexp over S — the default
   engine path, batched over recordings via vmap (the scan body then does
   [B, S] VPU work per step).

2. `forward_backward_dense` — general dense-transition smoother (any HMM),
   O(S^2) per frame via lax.scan; the parity oracle for (1) and the public
   API for non-VBx transition matrices.

3. `forward_backward_assoc` — work-parallel form: per-frame transition
   operators composed in the (logsumexp, +) semiring with
   `jax.lax.associative_scan`, O(T log T * S^2) elementwise work with no
   sequential T dependency. This is the long-recording / frame-sharded
   building block (the HMM analogue of blockwise attention); the multi-chip
   variant in vbx_tpu.parallel exchanges S x S block summaries over ICI.

All functions accept a boolean `frame_mask` (True = real frame) whose False
entries must form a suffix; padded frames are skipped exactly (forward
carries freeze, backward messages pass through), so batched padded
recordings produce bit-identical posteriors to their unpadded runs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vbx_tpu.ops.lse import NEG_INF, logaddexp, logsumexp


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


def _safe_log(x, dtype):
    return jnp.maximum(jnp.log(jnp.asarray(x, dtype=dtype)),
                       jnp.asarray(NEG_INF, dtype=dtype))


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

    loop_prob = jnp.asarray(loop_prob, dtype=dtype)
    log_loop = _safe_log(loop_prob, dtype)
    # c_i = (1-loopP)*pi_i + eps: the constant column of the transition matrix
    log_c = jnp.log((1.0 - loop_prob) * pi + jnp.asarray(eps, dtype))

    lfw0 = log_p[0] + jnp.log(pi + jnp.asarray(eps, dtype))

    def fwd_step(prev, inp):
        lp_t, valid_t = inp
        lse_prev = logsumexp(prev)
        new = lp_t + logaddexp(log_loop + prev, log_c + lse_prev)
        new = jnp.where(valid_t, new, prev)
        return new, (new, lse_prev)

    _, (lfw_rest, lse_fw_prev) = jax.lax.scan(
        fwd_step, lfw0, (log_p[1:], valid[1:]))
    lfw = jnp.concatenate([lfw0[None], lfw_rest], axis=0)

    def bwd_step(nxt, inp):
        lp_next, valid_next = inp
        m = lp_next + nxt
        new = logaddexp(log_loop + m, logsumexp(log_c + m))
        new = jnp.where(valid_next, new, nxt)
        return new, new

    lbw_last = jnp.zeros_like(lfw0)
    _, lbw_rest = jax.lax.scan(
        bwd_step, lbw_last, (log_p[1:], valid[1:]), reverse=True)
    lbw = jnp.concatenate([lbw_rest, lbw_last[None]], axis=0)

    log_px = logsumexp(lfw[-1])
    gamma = jnp.exp(lfw + lbw - log_px) * valid[:, None].astype(dtype)

    # transition-occupation stat for the pi update (t = 1..T-1)
    log_terms = lse_fw_prev[:, None] + log_p[1:] + lbw[1:] - log_px
    pi_stat = jnp.sum(jnp.exp(log_terms) * valid[1:, None].astype(dtype), axis=0)
    return FBResult(gamma, log_px, lfw, lbw, pi_stat)


def forward_backward_dense(
    log_p: jax.Array,
    tr: jax.Array,
    ip: jax.Array,
    eps: float = 1e-8,
    frame_mask: Optional[jax.Array] = None,
) -> FBResult:
    """General dense-transition log-space smoother (any S x S tr)."""
    dtype = log_p.dtype
    valid = _default_mask(log_p) if frame_mask is None else frame_mask
    ltr = jnp.log(tr.astype(dtype) + jnp.asarray(eps, dtype))

    lfw0 = log_p[0] + jnp.log(ip.astype(dtype) + jnp.asarray(eps, dtype))

    def fwd_step(prev, inp):
        lp_t, valid_t = inp
        lse_prev = logsumexp(prev)
        new = lp_t + logsumexp(prev[:, None] + ltr, axis=0)
        new = jnp.where(valid_t, new, prev)
        return new, (new, lse_prev)

    _, (lfw_rest, lse_fw_prev) = jax.lax.scan(
        fwd_step, lfw0, (log_p[1:], valid[1:]))
    lfw = jnp.concatenate([lfw0[None], lfw_rest], axis=0)

    def bwd_step(nxt, inp):
        lp_next, valid_next = inp
        m = lp_next + nxt
        new = logsumexp(ltr + m[None, :], axis=1)
        new = jnp.where(valid_next, new, nxt)
        return new, new

    lbw_last = jnp.zeros_like(lfw0)
    _, lbw_rest = jax.lax.scan(
        bwd_step, lbw_last, (log_p[1:], valid[1:]), reverse=True)
    lbw = jnp.concatenate([lbw_rest, lbw_last[None]], axis=0)

    log_px = logsumexp(lfw[-1])
    gamma = jnp.exp(lfw + lbw - log_px) * valid[:, None].astype(dtype)
    log_terms = lse_fw_prev[:, None] + log_p[1:] + lbw[1:] - log_px
    pi_stat = jnp.sum(jnp.exp(log_terms) * valid[1:, None].astype(dtype), axis=0)
    return FBResult(gamma, log_px, lfw, lbw, pi_stat)


def _log_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """(logsumexp, +) semiring composition: out[..., i, k] =
    LSE_j(a[..., i, j] + b[..., j, k])."""
    return logsumexp(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def forward_backward_assoc(
    log_p: jax.Array,
    pi: jax.Array,
    loop_prob,
    eps: float = 1e-8,
    frame_mask: Optional[jax.Array] = None,
) -> FBResult:
    """Work-parallel smoother via associative operator scans.

    Forward messages satisfy lfw[t] = lfw[0] (x) A_1 (x) ... (x) A_t with
    A_t[j, i] = ltr[j, i] + log_p[t, i] composed in the (logsumexp, +)
    semiring, so all prefixes come from one `lax.associative_scan` — the
    T-sequential dependency of the scan variants becomes log2(T) rounds of
    batched [S, S] semiring matmuls (VPU-friendly, trivially frame-shardable).
    Padded frames contribute identity operators, preserving exactness.
    """
    dtype = log_p.dtype
    T, S = log_p.shape
    pi = pi.astype(dtype)
    valid = _default_mask(log_p) if frame_mask is None else frame_mask

    loop_prob = jnp.asarray(loop_prob, dtype=dtype)
    ltr = jnp.log(jnp.eye(S, dtype=dtype) * loop_prob
                  + (1.0 - loop_prob) * pi[None, :] + jnp.asarray(eps, dtype))
    log_eye = jnp.where(jnp.eye(S, dtype=bool), jnp.asarray(0.0, dtype),
                        jnp.asarray(NEG_INF, dtype))

    lfw0 = log_p[0] + jnp.log(pi + jnp.asarray(eps, dtype))

    # Forward prefix operators over t = 1..T-1 (identity at padded frames).
    a_fwd = ltr[None] + log_p[1:, None, :]
    a_fwd = jnp.where(valid[1:, None, None], a_fwd, log_eye[None])
    prefix = jax.lax.associative_scan(_log_matmul, a_fwd, axis=0)
    lfw_rest = logsumexp(lfw0[None, :, None] + prefix, axis=1)
    lfw = jnp.concatenate([lfw0[None], lfw_rest], axis=0)

    # Backward suffix operators: lbw[t] = B_{t+1} (x) ... (x) B_{T-1} applied
    # to zeros, with B_t[j, i] = ltr[j, i] + log_p[t, i].
    suffix = jax.lax.associative_scan(_log_matmul, a_fwd, axis=0, reverse=True)
    lbw_rest = logsumexp(suffix, axis=2)
    lbw = jnp.concatenate([lbw_rest, jnp.zeros_like(lfw0)[None]], axis=0)

    log_px = logsumexp(lfw[-1])
    gamma = jnp.exp(lfw + lbw - log_px) * valid[:, None].astype(dtype)
    lse_fw_prev = logsumexp(lfw[:-1], axis=1)
    log_terms = lse_fw_prev[:, None] + log_p[1:] + lbw[1:] - log_px
    pi_stat = jnp.sum(jnp.exp(log_terms) * valid[1:, None].astype(dtype), axis=0)
    return FBResult(gamma, log_px, lfw, lbw, pi_stat)
