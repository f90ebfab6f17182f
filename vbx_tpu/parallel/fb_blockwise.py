"""Frame-sharded (sequence-parallel) forward-backward for the VBx HMM.

The HMM smoother is the one sequential dependency in the VB loop (reference
hot loop: VBx/VBx.py:164-171). To shard the frame axis across chips this
module uses the classic block-decomposition of a linear recurrence — the
HMM analogue of ring/blockwise attention:

With per-frame operators N_t = (tr + eps) @ diag(w_t) (scaled linear domain,
see ops.forward_backward), forward messages satisfy
a_t = a_{t-1} @ N_t and backward messages b_{t-1} = N_t @ b_t — the SAME
operator chain read in both directions. Each chip therefore:

1. computes its block's operator product F_k = prod_t N_t with one local
   [S, S]-carry scan (max-normalized, scalar log-scale),
2. all-gathers the K = |'sp'| block operators (K * S^2 numbers — tiny; this
   is the only inter-chip traffic, riding ICI),
3. redundantly computes every block's incoming boundary messages (one K-step
   [S]-vector scan — microseconds) and the global log-likelihood,
4. runs two local O(S)-per-frame vector passes to produce exact per-frame
   posteriors for its own block.

The result is bit-comparable (up to f32 rounding) to the sequential scaled
smoother: gamma, pi_stat and gamma[0] are assembled from within-frame
normalized quantities only, so precision does not degrade with T or K.

Cost: the matrix pass is O(T/K * S^2) per chip vs O(T * S) sequential, so
frame sharding wins when K exceeds ~S/2 or when the vector passes are
memory-bound; it is the scaling path for hour-long recordings
(the reference's acknowledged weakness, README.md:24).

All functions run INSIDE shard_map over the 'sp' mesh axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vbx_tpu.ops.forward_backward import _normalize_logp


class BlockFBResult(NamedTuple):
    gamma: jax.Array      # [Tb, S] posteriors for the local block
    log_px: jax.Array     # scalar total log-likelihood (replicated)
    pi_stat: jax.Array    # [S] global transition-occupation stat (psum'd)
    gamma0: jax.Array     # [S] posterior of the global first frame (psum'd)


def forward_backward_blockwise(
    log_p: jax.Array,
    pi: jax.Array,
    loop_prob,
    eps: float = 1e-8,
    frame_mask: Optional[jax.Array] = None,
    axis_name: str = "sp",
) -> BlockFBResult:
    """Scaled structured-transition smoother over the local frame block.

    log_p:      [Tb, S] local block of expected log-likelihoods (the global
                frame axis is sharded over `axis_name`; padded frames — a
                suffix of the LAST block — are masked False in frame_mask).
    pi:         [S] speaker prior (replicated).
    Matches the sequential `forward_backward_structured` exactly, including
    the reference's +eps transition regularization (VBx/VBx.py:98,163).
    """
    dtype = log_p.dtype
    Tb, S = log_p.shape
    pi = pi.astype(dtype)
    valid = (jnp.ones(Tb, bool) if frame_mask is None else frame_mask)
    loop_prob = jnp.asarray(loop_prob, dtype)
    eps_c = jnp.asarray(eps, dtype)
    col = (1.0 - loop_prob) * pi + eps_c

    k = jax.lax.axis_index(axis_name)
    K = jax.lax.axis_size(axis_name)
    # global-first-frame flag for each local frame
    gfirst = (jnp.arange(Tb) == 0) & (k == 0)

    w, m = _normalize_logp(log_p, valid)

    # ---- 1. local block operator product F_k = prod_t N_t --------------
    # (frame 0 of block 0 is pure emission diag(w_0): no transition before
    # the first frame, matching lfw[0] = log_p[0] + log(pi + eps))
    def mat_step(carry, inp):
        A, scale = carry
        w_t, m_t, valid_t, first_t = inp
        rowsum = jnp.sum(A, axis=1, keepdims=True)
        A_tr = loop_prob * A + rowsum * col[None, :]
        A_new = jnp.where(first_t, A, A_tr) * w_t[None, :]
        mx = jnp.max(A_new)
        A_new = A_new / mx
        new_scale = scale + m_t + jnp.log(mx)
        return (jnp.where(valid_t, A_new, A),
                jnp.where(valid_t, new_scale, scale)), None

    (F, sF), _ = jax.lax.scan(
        mat_step,
        (jnp.eye(S, dtype=dtype), jnp.zeros((), dtype)),
        (w, m, valid, gfirst))

    # ---- 2. exchange block operators over ICI --------------------------
    F_all = jax.lax.all_gather(F, axis_name)       # [K, S, S]
    sF_all = jax.lax.all_gather(sF, axis_name)     # [K]

    # ---- 3. boundary messages (redundant per chip; K tiny) -------------
    u0 = pi + eps_c
    cu = jnp.sum(u0)
    u_hat = u0 / cu

    def fwd_blk(carry, blk):
        v, s = carry
        Fb_, sFb = blk
        v2 = v @ Fb_
        c = jnp.sum(v2)
        return (v2 / c, s + sFb + jnp.log(c)), (v, s)

    (v_fin, s_fin), (v_in_all, s_in_all) = jax.lax.scan(
        fwd_blk, (u_hat, jnp.log(cu)), (F_all, sF_all))
    log_px = s_fin                                  # sum_s v_fin == 1

    def bwd_blk(carry, blk):
        b, s = carry
        Fb_, sFb = blk
        b2 = Fb_ @ b
        c = jnp.sum(b2)
        return (b2 / c, s + sFb + jnp.log(c)), (b, s)

    ones_hat = jnp.ones((S,), dtype) / S
    _, (b_in_all, _) = jax.lax.scan(
        bwd_blk, (ones_hat, jnp.log(jnp.asarray(S, dtype))),
        (F_all, sF_all), reverse=True)

    v_in = jax.lax.dynamic_index_in_dim(v_in_all, k, keepdims=False)
    b_in = jax.lax.dynamic_index_in_dim(b_in_all, k, keepdims=False)

    # ---- 4. local vector passes ----------------------------------------
    def fwd_step(prev, inp):
        w_t, valid_t, first_t = inp
        a_tr = w_t * (loop_prob * prev + col)       # sum_s prev == 1
        a = jnp.where(first_t, w_t * prev, a_tr)
        c = jnp.sum(a)
        ahat = jnp.where(valid_t, a / c, prev)
        cfw = jnp.where(valid_t, c, jnp.ones_like(c))
        return ahat, (ahat, cfw)

    _, (ahat, cfw) = jax.lax.scan(fwd_step, v_in, (w, valid, gfirst))

    # backward: bhat at the local LAST frame is the incoming boundary; the
    # scan consumes (w, valid) of frames 1..Tb-1 in reverse, producing bhat
    # for frames 0..Tb-2
    def bwd_step(nxt, inp):
        w_next, valid_next = inp
        u = w_next * nxt
        b = loop_prob * u + jnp.sum(col * u)
        c = jnp.sum(b)
        bhat = jnp.where(valid_next, b / c, nxt)
        return bhat, bhat

    _, bhat_rest = jax.lax.scan(bwd_step, b_in, (w[1:], valid[1:]),
                                reverse=True)
    bhat = jnp.concatenate([bhat_rest, b_in[None]], axis=0)

    # ---- 5. outputs (within-frame-normalized; scales cancel) -----------
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    ab = ahat * bhat
    denom = jnp.maximum(jnp.sum(ab, axis=-1, keepdims=True), tiny)
    gamma = (ab / denom) * valid[:, None].astype(dtype)

    # pi_stat over every frame except the global first
    not_first = valid & ~gfirst
    terms = w * bhat / (denom * cfw[:, None])
    pi_stat = jax.lax.psum(
        jnp.sum(terms * not_first[:, None].astype(dtype), axis=0), axis_name)

    gamma0 = jax.lax.psum(
        jnp.sum(gamma * gfirst[:, None].astype(dtype), axis=0), axis_name)

    return BlockFBResult(gamma, log_px, pi_stat, gamma0)
