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
   [S]-vector scan — microseconds),
4. runs two local O(S)-per-frame vector passes to produce exact per-frame
   posteriors for its own block, plus the global log-likelihood from the
   passes' per-frame normalizers (tree-sum per block + psum).

The result is bit-comparable (up to f32 rounding) to the sequential scaled
smoother: gamma, pi_stat and gamma[0] are assembled from within-frame
normalized quantities only, so precision does not degrade with T or K.
log_px is summed from the LOCAL vector passes' per-frame normalizers
(m_t + log c_t) with an XLA tree reduction per block and one psum across
blocks — NOT from the operator-product scan's sequentially-accumulated
scalar scale, whose f32 error grows O(T*eps*|log_px|) (~3.6e2 absolute at
T=32768, |log_px|~2.3e6 — measured round 5; that noise reached the ELBO
and fired the delta<epsilon stop rule spuriously, which was the round-4
"sharded-structured parity regression": frozen-early lanes, gamma maxdiff
0.86 vs solo).

K=1 (a mesh with a single 'sp' chip) short-circuits to the sequential
smoother itself — same functions, same program, bit-identical to the
single-device engine by construction, and no dead operator-product work.

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

from vbx_tpu.ops.forward_backward import (_normalize_logp,
                                          forward_backward_structured)

_TINY32 = float(jnp.finfo(jnp.float32).tiny)


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

    if jax.lax.axis_size(axis_name) == 1:
        # single-'sp'-chip mesh: the block decomposition is pure overhead
        # and its distinct rounding would break bit-parity with the
        # single-device engine — run the sequential smoother itself
        # (identical program => identical bits; tests/test_parallel.py
        # pins this at T=16384)
        seq = forward_backward_structured(log_p, pi, loop_prob, eps=eps,
                                          frame_mask=valid)
        return BlockFBResult(seq.gamma, seq.log_px, seq.pi_stat,
                             seq.gamma[0])

    loop_prob = jnp.asarray(loop_prob, dtype)
    eps_c = jnp.asarray(eps, dtype)
    col = (1.0 - loop_prob) * pi + eps_c

    k = jax.lax.axis_index(axis_name)
    # global-first-frame flag for each local frame
    gfirst = (jnp.arange(Tb) == 0) & (k == 0)

    w, m = _normalize_logp(log_p, valid)

    # ---- 1. local block operator product F_k = prod_t N_t --------------
    # (frame 0 of block 0 is pure emission diag(w_0): no transition before
    # the first frame, matching lfw[0] = log_p[0] + log(pi + eps)).
    # Max-normalized per step; the accumulated log-scale is NOT tracked:
    # the boundary scans renormalize per block (scalar multiples cancel)
    # and log_px comes from the local vector passes below, so nothing
    # reads it — and its sequential f32 accumulation was the round-4 ELBO
    # noise source (module docstring).
    def mat_step(A, inp):
        w_t, valid_t, first_t = inp
        rowsum = jnp.sum(A, axis=1, keepdims=True)
        A_tr = loop_prob * A + rowsum * col[None, :]
        A_new = jnp.where(first_t, A, A_tr) * w_t[None, :]
        A_new = A_new / jnp.max(A_new)
        return jnp.where(valid_t, A_new, A), None

    F, _ = jax.lax.scan(mat_step, jnp.eye(S, dtype=dtype),
                        (w, valid, gfirst))

    # ---- 2. exchange block operators over ICI --------------------------
    F_all = jax.lax.all_gather(F, axis_name)       # [K, S, S]

    # ---- 3. boundary messages (redundant per chip; K tiny) -------------
    u0 = pi + eps_c
    u_hat = u0 / jnp.sum(u0)

    def fwd_blk(v, Fb_):
        v2 = jnp.dot(v, Fb_, precision=jax.lax.Precision.HIGHEST)
        return v2 / jnp.sum(v2), v

    _, v_in_all = jax.lax.scan(fwd_blk, u_hat, F_all)

    def bwd_blk(b, Fb_):
        b2 = jnp.dot(Fb_, b, precision=jax.lax.Precision.HIGHEST)
        return b2 / jnp.sum(b2), b

    ones_hat = jnp.ones((S,), dtype) / S
    _, b_in_all = jax.lax.scan(bwd_blk, ones_hat, F_all, reverse=True)

    v_in = jax.lax.dynamic_index_in_dim(v_in_all, k, keepdims=False)
    b_in = jax.lax.dynamic_index_in_dim(b_in_all, k, keepdims=False)

    # ---- 4. local vector passes ----------------------------------------
    # chip 0 starts from the UNNORMALIZED pi + eps exactly like the
    # sequential smoother (its first frame is pure emission, so the
    # structured identity's sum_s prev == 1 requirement doesn't apply)
    def fwd_step(prev, inp):
        w_t, valid_t, first_t = inp
        a_tr = w_t * (loop_prob * prev + col)       # sum_s prev == 1
        a = jnp.where(first_t, w_t * prev, a_tr)
        c = jnp.sum(a)
        ahat = jnp.where(valid_t, a / c, prev)
        cfw = jnp.where(valid_t, c, jnp.ones_like(c))
        return ahat, (ahat, cfw)

    fwd_init = jnp.where(k == 0, u0, v_in)
    _, (ahat, cfw) = jax.lax.scan(fwd_step, fwd_init, (w, valid, gfirst))

    # log_px from the local per-frame normalizers: each block's chain
    # continues from the previous block's (approximate) normalized carry,
    # so sum_t(m_t + log c_t) over all chips IS the global log-likelihood
    # — tree-reduced per block, one psum across blocks (solo-engine
    # accuracy, no T-proportional error)
    log_px = jax.lax.psum(
        jnp.sum(jnp.where(valid, m + jnp.log(cfw), jnp.zeros_like(m))),
        axis_name)

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

    # pi_stat over every frame except the global first; same
    # reciprocal-multiply grouping as ops.forward_backward._finish
    not_first = valid & ~gfirst
    r_over_c = 1.0 / (denom[:, 0] * cfw)
    terms = w * bhat * r_over_c[:, None]
    pi_stat = jax.lax.psum(
        jnp.sum(terms * not_first[:, None].astype(dtype), axis=0), axis_name)

    gamma0 = jax.lax.psum(
        jnp.sum(gamma * gfirst[:, None].astype(dtype), axis=0), axis_name)

    return BlockFBResult(gamma, log_px, pi_stat, gamma0)


def _auto_segments(Tb: int, S: int, B: int, lane_cap: int = 512,
                   min_seg: int = 128) -> int:
    """Largest power-of-two segment count R for the operator-product walk:
    R*B*S kernel lanes (<= lane_cap — four 128-lane tiles keep the
    per-step VPU cost flat while the step count drops R-fold), segments
    of >= min_seg frames (below that the fixed walk/compose overhead eats
    the win), and R | Tb so segments tile the block exactly."""
    R = 1
    while (Tb % (R * 2) == 0 and (R * 2) * B * S <= lane_cap
           and Tb // (R * 2) >= min_seg):
        R *= 2
    return R


class BlockFBBatchResult(NamedTuple):
    gamma: jax.Array      # [Tb, S, B] posteriors for the local block
    log_px: jax.Array     # [B] total log-likelihoods (replicated over 'sp')
    pi_stat: jax.Array    # [S, B] global transition-occupation stat (psum'd)
    gamma0: jax.Array     # [S, B] posterior of the global first frame


def forward_backward_blockwise_pallas(
    log_p: jax.Array,        # [Tb, S, B] (layout='tsb') or [B, Tb, S]
    pi: jax.Array,           # [B, S] speaker prior (replicated over 'sp')
    loop_prob,
    eps: float = 1e-8,
    frame_mask: Optional[jax.Array] = None,   # [Tb, B]
    speaker_mask: Optional[jax.Array] = None,  # [B, S]
    axis_name: str = "sp",
    interpret: bool = False,
    recip: bool = True,
    io_dtype=jnp.float32,
    n_segments: Optional[int] = None,
    layout: str = "tsb",
) -> BlockFBBatchResult:
    """Frame-sharded smoother with BOTH local passes on the fused Pallas
    kernels (ops.fb_pallas) — the throughput form of
    `forward_backward_blockwise` (which stays the bit-parity default on the
    XLA scan). Same block decomposition, three steps per EM iteration:

    1. block operator product F_k via `fb_fwd_product_pallas_sb`: B*S lanes
       run the forward recursion from the identity's rows (row i of F_k IS
       the forward chain started at e_i), per-lane normalized with per-row
       log-scales — no [S, S]-carry matrix scan anywhere. The walk is
       LATENCY-bound (each sequential step is a handful of VPU ops on
       mostly-padded lanes at SP-typical B*S << 128), so the local block
       is additionally split into `n_segments` R independent SEGMENTS
       occupying R*B*S lanes of the SAME walk — the kernel runs Tb/R
       steps instead of Tb, and the R per-segment operators compose into
       F_k with one tiny row-scaled [S, S] matmul scan outside
       (VERDICT r3 #6: this takes the measured K=1 two-phase overhead
       from 1.79x to ~1.2x at the A/B shape). n_segments=None picks the
       largest power-of-two divisor of Tb with R*B*S <= 512 lanes and
       segments >= 128 frames; 1 restores the unsegmented walk,
    2. all-gather of the K block summaries ([K, B, S, S+1] numbers, ICI)
       and two K-step boundary scans, generalized to per-row scales:
       v @ F = exp(max_i s_i) * ((v * exp(s - max)) @ F_hat) and
       (F @ b)_i = exp(s_i) (F_hat @ b)_i, renormalized per block,
    3. both local vector passes in ONE fused bidirectional kernel walk
       (`fb_scan_pallas_sb_logp` with the incoming boundary messages as
       pinit/binit — the same kernel the single-chip engine runs, so the
       per-chip cost is the single-chip kernel's at T/K frames).

    Batched over B lanes (the whole local recording batch in one kernel
    invocation — call OUTSIDE any vmap). Accuracy is the pallas path's
    tolerance contract (~5e-5 on gamma), not the XLA path's bit-comparable
    guarantee; reductions/carries stay f32, streams may be io_dtype.
    Matches the reference recursion incl. +eps regularization
    (VBx/VBx.py:98,163) at that tolerance.

    layout='bts' takes log_p as [B, Tb, S] — the E-step dot's NATIVE
    output layout — and builds both kernel streams from it directly (the
    'tsb' form forces XLA to re-lay the dot output out with a full f32
    copy per EM iteration; see ops.fb_pallas.fb_scan_pallas_sb_logp_bts).
    Outputs keep the [Tb, S, B] kernel layout either way.
    """
    dtype = jnp.float32
    if layout == "bts":
        B, Tb, S = log_p.shape
    elif layout == "tsb":
        Tb, S, B = log_p.shape
    else:
        raise ValueError(f"unknown layout {layout!r}")
    log_p = log_p.astype(dtype)
    pi = pi.astype(dtype)
    loop_prob = jnp.asarray(loop_prob, dtype)
    eps_c = jnp.asarray(eps, dtype)
    col = (1.0 - loop_prob) * pi + eps_c                    # [B, S]
    valid = (jnp.ones((Tb, B), bool) if frame_mask is None else frame_mask)
    vmask = valid.astype(dtype)                             # [Tb, B]
    smask_sb = (jnp.ones((S, B), dtype) if speaker_mask is None
                else speaker_mask.astype(dtype).T)          # [S, B]

    from vbx_tpu.ops.fb_pallas import (fb_fwd_product_pallas_sb,
                                       fb_scan_pallas_sb_logp,
                                       fb_scan_pallas_sb_logp_bts)

    k = jax.lax.axis_index(axis_name)
    chip0 = (k == 0)
    Sf = jnp.asarray(S, dtype)
    u0 = pi + eps_c                                          # [B, S]

    if jax.lax.axis_size(axis_name) == 1:
        # single-'sp'-chip mesh: no boundaries to exchange — skip the
        # operator walk and boundary scans entirely (they were the
        # measured 1.15-1.24x K=1 two-phase overhead) and run the fused
        # vector-pass kernel exactly as the single-device engine does:
        # pinit = pi + eps (solo's arithmetic) and a uniform backward
        # boundary. log_px comes from the kernel normalizers below.
        finit_eff = u0
        b_in = jnp.full((B, S), 1.0 / Sf, dtype)
    else:
        # ---- 1. local block operator product, S-rows-as-lanes -----------
        R = (n_segments if n_segments is not None
             else _auto_segments(Tb, S, B))
        if Tb % R:
            raise ValueError(f"n_segments={R} must divide the local frame "
                             f"extent Tb={Tb}")
        Ts = Tb // R
        if layout == "bts":
            m_bt = jnp.max(log_p, axis=2)                   # [B, Tb]
            m_op = m_bt.T                                   # [Tb, B]
            # the one structural [B,T,S]->[T,S,B] relayout happens HERE at
            # io_dtype width inside the w producer (the operator stream is
            # built from it below; the vector pass reads log_p natively)
            w_zero = (jnp.transpose(
                jnp.exp(log_p - m_bt[:, :, None])
                * smask_sb.T[:, None, :], (1, 2, 0))
                * vmask[:, None, :])                        # [Tb, S, B]
        else:
            m_op = jnp.max(log_p, axis=1)                   # [Tb, B]
            w_zero = (jnp.exp(log_p - m_op[:, None, :]) * smask_sb[None]
                      * vmask[:, None, :])                  # [Tb, S, B]
        # segment-folded lane layout: lane = r*B*S + b*S + i (segment r's
        # frames ride their own lane group, so the walk is Ts steps)
        w_seg = jnp.transpose(w_zero.reshape(R, Ts, S, B),
                              (1, 2, 0, 3)).reshape(Ts, S, R * B)
        w1 = jnp.repeat(w_seg, S, axis=2)                   # [Ts, S, R*B*S]
        col1 = jnp.repeat(jnp.tile(col.T, (1, R)), S, axis=1)  # [S, R*B*S]
        finit1 = jnp.tile(jnp.eye(S, dtype=dtype), (1, R * B))  # e_i / lane
        # fold the incoming transition into every segment's first frame
        # EXCEPT the global first (segment 0 of chip 0): the walk's first
        # frame emits w0 * finit (fb_fwd_product_pallas_sb boundary
        # contract)
        is_r0 = (jnp.arange(R * B * S) // (B * S) == 0)[None, :]
        finit1_eff = jnp.where(jnp.logical_and(chip0, is_r0), finit1,
                               loop_prob * finit1 + col1)
        fhat, ls = fb_fwd_product_pallas_sb(
            w1, col1, finit1_eff, loop_prob,
            interpret=interpret, io_dtype=io_dtype)
        Fseg = jnp.transpose(fhat.reshape(S, R, B, S),
                             (1, 2, 3, 0))                  # [R, B, i, j]
        msum_seg = jnp.sum((vmask * m_op).reshape(R, Ts, B), axis=1)
        s_seg = ls.reshape(R, B, S) + msum_seg[:, :, None]  # [R, B, i]
        # a segment whose frames are ENTIRELY padding must contribute the
        # identity operator: the kernel's skip_dead leaves the folded-in
        # incoming transition (loop_prob*I + col) as F, which would bias
        # the boundary-scan mass by ~S*eps per trailing dead segment
        # (padding is a suffix, so dead segments only trail). The
        # structured blockwise path returns identity per dead BLOCK; match
        # it exactly per segment.
        dead_seg = jnp.sum(vmask.reshape(R, Ts, B), axis=1) == 0.0  # [R, B]
        eye = jnp.eye(S, dtype=dtype)
        Fseg = jnp.where(dead_seg[:, :, None, None], eye[None, None], Fseg)
        s_seg = jnp.where(dead_seg[:, :, None], 0.0, s_seg)

        # compose the R per-segment operators into the block operator
        # F_k = F_seg0 @ ... @ F_seg{R-1} (row-scaled representation:
        # true F_r = diag(exp(s_r)) @ Fhat_r): a tiny [B, S, S] scan
        def compose(carry, seg):
            C, cs = carry                                   # [B,S,S],[B,S]
            Fr, sr = seg
            mx = jnp.max(sr, axis=-1)                       # [B]
            inner = jnp.einsum("bik,bkj->bij",
                               C * jnp.exp(sr - mx[:, None])[:, None, :],
                               Fr, precision=jax.lax.Precision.HIGHEST)
            rn = jnp.max(inner, axis=-1)                    # [B, i]
            rn = jnp.maximum(rn, jnp.asarray(_TINY32, dtype))
            return (inner / rn[:, :, None],
                    cs + mx[:, None] + jnp.log(rn)), None

        (F_hat, s_rows), _ = jax.lax.scan(compose, (Fseg[0], s_seg[0]),
                                          (Fseg[1:], s_seg[1:]))

        # ---- 2. exchange block summaries; K-step boundary scans ---------
        # (per-ROW scales s_all weight the rows of each operator, so they
        # stay in the application; the boundary messages renormalize per
        # block and log_px no longer reads the accumulated scale — see the
        # module docstring on the round-4 sequential-accumulation noise)
        F_all = jax.lax.all_gather(F_hat, axis_name)         # [K, B, S, S]
        s_all = jax.lax.all_gather(s_rows, axis_name)        # [K, B, S]

        u_hat = u0 / jnp.sum(u0, axis=-1)[:, None]

        def fwd_blk(v, blk):
            Fb_, sb = blk
            ms = jnp.max(sb, axis=-1)
            v2 = jnp.einsum("bi,bij->bj", v * jnp.exp(sb - ms[:, None]),
                            Fb_, precision=jax.lax.Precision.HIGHEST)
            return v2 / jnp.sum(v2, axis=-1)[:, None], v

        _, v_in_all = jax.lax.scan(fwd_blk, u_hat, (F_all, s_all))

        def bwd_blk(b, blk):
            Fb_, sb = blk
            ms = jnp.max(sb, axis=-1)
            b2 = jnp.exp(sb - ms[:, None]) * jnp.einsum(
                "bij,bj->bi", Fb_, b, precision=jax.lax.Precision.HIGHEST)
            return b2 / jnp.sum(b2, axis=-1)[:, None], b

        _, b_in_all = jax.lax.scan(
            bwd_blk, jnp.full((B, S), 1.0 / Sf), (F_all, s_all),
            reverse=True)

        v_in = jax.lax.dynamic_index_in_dim(v_in_all, k, keepdims=False)
        b_in = jax.lax.dynamic_index_in_dim(b_in_all, k, keepdims=False)

        # chip 0 starts from the UNNORMALIZED pi + eps exactly like the
        # single-device engine (the kernel's first frame emits
        # normalize(w0 * pinit), so only the rounding differs — align it)
        finit_eff = jnp.where(chip0, u0, loop_prob * v_in + col)  # [B, S]

    # ---- 3. both local vector passes in the fused kernel walk -----------
    if layout == "bts":
        ahat, bhat, cfw, m_k, w = fb_scan_pallas_sb_logp_bts(
            log_p, smask_sb.T, valid, col.T, finit_eff.T, loop_prob,
            interpret=interpret, recip=recip, io_dtype=io_dtype,
            binit=b_in.T, zero_invalid=True)
    else:
        ahat, bhat, cfw, m_k, w = fb_scan_pallas_sb_logp(
            log_p, smask_sb, valid, col.T, finit_eff.T, loop_prob,
            interpret=interpret, recip=recip, io_dtype=io_dtype,
            binit=b_in.T, zero_invalid=True)

    # log_px from the local per-frame normalizers (m_t + log c_t): each
    # block's chain continues from its incoming normalized boundary, so
    # the psum of per-block tree-sums is the global log-likelihood at the
    # single-device engine's accuracy (the old operator-scale form
    # accumulated f32 error O(T*eps*|log_px|) — module docstring)
    log_px = jax.lax.psum(
        jnp.sum(vmask * (m_k.astype(dtype) + jnp.log(cfw.astype(dtype))),
                axis=0), axis_name)

    tiny = jnp.asarray(_TINY32, dtype)
    ab = ahat.astype(dtype) * bhat.astype(dtype)
    denom = jnp.maximum(jnp.sum(ab, axis=1, keepdims=True), tiny)
    gamma = (ab / denom) * vmask[:, None, :]                 # [Tb, S, B]

    chip0f = chip0.astype(dtype)
    # every frame except the GLOBAL first contributes to pi_stat
    not_first = vmask.at[0].multiply(1.0 - chip0f)
    terms = (w.astype(dtype) * bhat.astype(dtype)
             / (denom * cfw[:, None, :]))
    pi_stat = jax.lax.psum(
        jnp.sum(terms * not_first[:, None, :], axis=0), axis_name)
    gamma0 = jax.lax.psum(gamma[0] * chip0f, axis_name)

    return BlockFBBatchResult(gamma, log_px, pi_stat, gamma0)
