"""Pallas fused forward-backward kernels vs the sequential scaled smoother
(interpret mode on the CPU backend; the compiled path runs on real TPU and
is exercised by bench.py and the golden run)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vbx_tpu.engine.vbhmm import vbx_batched
from vbx_tpu.ops.fb_pallas import fb_scan_pallas, fb_scan_pallas_sb
from vbx_tpu.ops.forward_backward import forward_backward_structured

from .oracle import random_hmm_problem, random_vb_problem


def _assemble(ahat, bhat, cfw, w, m, valid):
    """gamma / log_px / pi_stat from kernel outputs (mirrors the engine)."""
    ab = ahat * bhat
    denom = np.maximum(ab.sum(-1, keepdims=True), 1e-37)
    gamma = ab / denom * valid[:, :, None]
    log_px = (valid * (m + np.log(cfw))).sum(0)
    nf = valid.copy()
    nf[0] = 0.0
    terms = w * bhat / (denom * cfw[:, :, None])
    pi_stat = (terms * nf[:, :, None]).sum(0)
    return gamma, log_px, pi_stat


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize("T,S,B", [(40, 5, 3), (600, 31, 4)])
def test_fb_pallas_matches_sequential(T, S, B, fused):
    rng = np.random.default_rng(T + S)
    problems = [random_hmm_problem(rng, T, S) for _ in range(B)]
    loop_prob = 0.9
    w = np.zeros((T, B, S), np.float32)
    m = np.zeros((T, B), np.float32)
    col = np.zeros((B, S), np.float32)
    pinit = np.zeros((B, S), np.float32)
    valid = np.ones((T, B), np.float32)
    seqs = []
    for b, (log_p, pi, _) in enumerate(problems):
        lp32 = log_p.astype(np.float32)
        m[:, b] = lp32.max(1)
        w[:, b] = np.exp(lp32 - m[:, b, None])
        col[b] = (1 - loop_prob) * pi + 1e-8
        pinit[b] = pi + 1e-8
        seqs.append(forward_backward_structured(
            jnp.asarray(lp32), jnp.asarray(pi, jnp.float32), loop_prob))

    ahat, bhat, cfw = fb_scan_pallas(
        jnp.asarray(w), jnp.asarray(valid), jnp.asarray(col),
        jnp.asarray(pinit), loop_prob, interpret=True, fused=fused)
    gamma, log_px, pi_stat = _assemble(np.asarray(ahat), np.asarray(bhat),
                                       np.asarray(cfw), w, m, valid)
    for b, seq in enumerate(seqs):
        np.testing.assert_allclose(gamma[:, b], np.asarray(seq.gamma),
                                   atol=2e-5)
        np.testing.assert_allclose(log_px[b], float(seq.log_px), rtol=1e-5)
        np.testing.assert_allclose(
            pi_stat[b], np.asarray(seq.pi_stat),
            atol=2e-4 * float(np.max(np.asarray(seq.pi_stat))))


@pytest.mark.parametrize("fused", [True, False])
def test_fb_pallas_padding(fused):
    rng = np.random.default_rng(0)
    T, pad, S = 100, 30, 6
    log_p, pi, loop_prob = random_hmm_problem(rng, T + pad, S)
    lp32 = log_p.astype(np.float32)
    m = lp32.max(1)
    w = np.exp(lp32 - m[:, None])[:, None, :]
    valid = (np.arange(T + pad) < T).astype(np.float32)[:, None]
    col = ((1 - loop_prob) * pi + 1e-8)[None].astype(np.float32)
    pinit = (pi + 1e-8)[None].astype(np.float32)
    seq = forward_backward_structured(
        jnp.asarray(lp32[:T]), jnp.asarray(pi, jnp.float32), loop_prob)
    ahat, bhat, cfw = fb_scan_pallas(
        jnp.asarray(w, jnp.float32), jnp.asarray(valid), jnp.asarray(col),
        jnp.asarray(pinit), loop_prob, interpret=True, fused=fused)
    gamma, log_px, pi_stat = _assemble(
        np.asarray(ahat), np.asarray(bhat), np.asarray(cfw),
        w, m[:, None], valid)
    np.testing.assert_allclose(gamma[:T, 0], np.asarray(seq.gamma),
                               atol=2e-5)
    assert np.all(gamma[T:, 0] == 0)
    np.testing.assert_allclose(log_px[0], float(seq.log_px), rtol=1e-5)
    np.testing.assert_allclose(pi_stat[0], np.asarray(seq.pi_stat),
                               rtol=2e-3)


@pytest.mark.parametrize("io_dtype,gtol,ptol,ltol",
                         [(jnp.float32, 2e-5, 2e-4, 1e-5),
                          (jnp.bfloat16, 8e-3, 2e-2, 2e-3)])
@pytest.mark.parametrize("T,S,B", [(40, 5, 3), (130, 31, 4)])
def test_fb_pallas_sb_matches_sequential(T, S, B, io_dtype, gtol, ptol,
                                         ltol):
    """Speakers-on-sublanes layout kernel vs the sequential smoother,
    including a case spanning multiple time chunks and frame padding.
    bfloat16 stream mode is tolerance-parity at bf16 precision (the
    messages are normalized, so error is relative per element)."""
    rng = np.random.default_rng(T + S + 1)
    problems = [random_hmm_problem(rng, T, S) for _ in range(B)]
    loop_prob = 0.9
    w = np.zeros((T, B, S), np.float32)
    m = np.zeros((T, B), np.float32)
    col = np.zeros((B, S), np.float32)
    pinit = np.zeros((B, S), np.float32)
    valid = np.ones((T, B), np.float32)
    valid[T - 25:, 1] = 0.0                    # one short recording
    seqs = []
    for b, (log_p, pi, _) in enumerate(problems):
        lp32 = log_p.astype(np.float32)
        m[:, b] = lp32.max(1)
        w[:, b] = np.exp(lp32 - m[:, b, None])
        col[b] = (1 - loop_prob) * pi + 1e-8
        pinit[b] = pi + 1e-8
        Tb = T - 25 if b == 1 else T
        seqs.append((Tb, forward_backward_structured(
            jnp.asarray(lp32[:Tb]), jnp.asarray(pi, jnp.float32),
            loop_prob)))

    ahat, bhat, cfw = fb_scan_pallas_sb(
        jnp.asarray(np.transpose(w, (0, 2, 1))), jnp.asarray(valid),
        jnp.asarray(col.T), jnp.asarray(pinit.T), loop_prob, interpret=True,
        io_dtype=io_dtype)
    assert ahat.dtype == io_dtype and bhat.dtype == io_dtype
    assert cfw.dtype == jnp.float32
    ahat = np.transpose(np.asarray(ahat, np.float32), (0, 2, 1))
    bhat = np.transpose(np.asarray(bhat, np.float32), (0, 2, 1))
    gamma, log_px, pi_stat = _assemble(ahat, bhat, np.asarray(cfw),
                                       w, m, valid)
    for b, (Tb, seq) in enumerate(seqs):
        np.testing.assert_allclose(gamma[:Tb, b], np.asarray(seq.gamma),
                                   atol=gtol)
        assert np.all(gamma[Tb:, b] == 0)
        np.testing.assert_allclose(log_px[b], float(seq.log_px), rtol=ltol)
        np.testing.assert_allclose(
            pi_stat[b], np.asarray(seq.pi_stat),
            atol=ptol * float(np.max(np.asarray(seq.pi_stat))))


def test_batched_engine_pallas_sb_matches_structured():
    """B > 16 routes the pallas engine through the sublane-layout kernel;
    it must agree with the structured scan engine like the small-B path."""
    B, T, S, D = 18, 50, 5, 8
    rng = np.random.default_rng(7)
    problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
    phi = problems[0][1]
    X = np.stack([p[0] for p in problems]).astype(np.float32)
    G = np.stack([p[2] for p in problems]).astype(np.float32)
    PI = np.stack([p[3] for p in problems]).astype(np.float32)
    FM = np.ones((B, T), bool)
    SM = np.ones((B, S), bool)
    FM[1, 35:] = False
    X[1, 35:] = 0
    G[1, 35:] = 0
    SM[2, -1] = False
    G[2, :, -1] = 0
    G[2] /= G[2].sum(-1, keepdims=True)
    PI[2, -1] = 0
    PI[2] /= PI[2].sum()

    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=5, epsilon=1e-6)
    ref = vbx_batched(jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), fb_impl="structured", **kw)
    out = vbx_batched(jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), fb_impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    for b in range(B):
        n = int(ref.n_iters[b])
        np.testing.assert_allclose(np.asarray(out.elbo[b][:n]),
                                   np.asarray(ref.elbo[b][:n]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.gamma[b]),
                                   np.asarray(ref.gamma[b]), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.pi[b]),
                                   np.asarray(ref.pi[b]), atol=1e-4)


def test_batched_engine_pallas_bf16_tracks_structured():
    """The bf16-stream throughput mode is tolerance-parity at the FIXED
    POINT: run both engines to convergence and require the same hard
    labels, pi/gamma within bf16-scale tolerances, and the converged ELBO
    within ~1e-3 relative. Mid-trajectory iterates legitimately diverge at
    bf16 scale before reconverging, so the trace itself is not compared."""
    B, T, S, D = 18, 50, 5, 8
    rng = np.random.default_rng(7)
    problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
    phi = problems[0][1]
    X = np.stack([p[0] for p in problems]).astype(np.float32)
    G = np.stack([p[2] for p in problems]).astype(np.float32)
    PI = np.stack([p[3] for p in problems]).astype(np.float32)
    FM = np.ones((B, T), bool)
    SM = np.ones((B, S), bool)
    FM[1, 35:] = False
    X[1, 35:] = 0
    G[1, 35:] = 0

    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=40, epsilon=1e-6)
    ref = vbx_batched(jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), fb_impl="structured", **kw)
    out = vbx_batched(jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), fb_impl="pallas_bf16", **kw)
    assert out.gamma.dtype == jnp.float32          # API dtype is stable
    for b in range(B):
        n_ref, n_out = int(ref.n_iters[b]), int(out.n_iters[b])
        np.testing.assert_allclose(float(out.elbo[b][n_out - 1]),
                                   float(ref.elbo[b][n_ref - 1]), rtol=1e-3)
        tmask = np.asarray(FM[b])
        g_ref = np.asarray(ref.gamma[b])[tmask]
        g_out = np.asarray(out.gamma[b])[tmask]
        # EM is permutation-symmetric in the speaker labels: with
        # symmetric random inits a bf16-scale perturbation can make a
        # different speaker index capture the same cluster, so align
        # labels by maximal frame overlap before comparing (diarization
        # output is permutation-invariant)
        from scipy.optimize import linear_sum_assignment
        conf = (g_ref.argmax(-1)[:, None] ==
                np.arange(S)[None]).T.astype(int) @ \
               (g_out.argmax(-1)[:, None] == np.arange(S)[None]).astype(int)
        rr, cc = linear_sum_assignment(-conf)   # rr is 0..S-1 in order
        g_out = g_out[:, cc]                    # ref speaker r <-> out cc[r]
        pi_out = np.asarray(out.pi[b])[cc]
        # hard labels may flip only on frames the f32 engine itself rates
        # as soft (boundary frames with max posterior well below 1); on
        # confident frames the labels must match exactly
        flipped = g_out.argmax(-1) != g_ref.argmax(-1)
        assert np.mean(flipped) <= 0.02, np.mean(flipped)
        assert np.all(g_ref[flipped].max(-1) < 0.9), \
            g_ref[flipped].max(-1)
        # bound the bulk of the posteriors tightly and the tail loosely
        diff = np.abs(g_out - g_ref)
        assert np.mean(diff > 5e-2) < 0.05, np.mean(diff > 5e-2)
        np.testing.assert_allclose(pi_out, np.asarray(ref.pi[b]),
                                   atol=2e-2)


def test_pallas_engine_result_is_batchsize_independent():
    """A recording's pallas-engine result must not depend on the batch it
    rides in beyond float-rounding noise: same iteration count, and gamma/
    pi equal to well below the pallas-vs-structured parity tolerance.
    (Exact bit-equality does NOT hold: XLA blocks the einsums
    shape-dependently, so summation order varies with B; measured ~1e-5
    drift after 6 EM iterations.)"""
    T, S, D = 60, 6, 10
    rng = np.random.default_rng(3)
    X1, phi, G1, PI1 = random_vb_problem(rng, T, S, D)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=6, epsilon=1e-6,
              fb_impl="pallas")

    def run(B, pos):
        fillers = [random_vb_problem(rng, T, S, D) for _ in range(B)]
        X = np.stack([f[0] for f in fillers]).astype(np.float32)
        G = np.stack([f[2] for f in fillers]).astype(np.float32)
        X[pos], G[pos] = X1, G1
        PI = np.broadcast_to(PI1, (B, S)).astype(np.float32)
        r = vbx_batched(jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                        jnp.asarray(G), jnp.asarray(PI),
                        jnp.ones((B, T), bool), jnp.ones((B, S), bool),
                        **kw)
        return (np.asarray(r.gamma[pos]), np.asarray(r.pi[pos]),
                int(r.n_iters[pos]))

    g_solo, pi_solo, n_solo = run(1, 0)
    for B, pos in ((4, 2), (20, 0), (20, 19)):
        g, pi, n = run(B, pos)
        assert n == n_solo, (B, pos)
        np.testing.assert_allclose(g, g_solo, atol=5e-5,
                                   err_msg=f"B={B} pos={pos}")
        np.testing.assert_allclose(pi, pi_solo, atol=5e-5,
                                   err_msg=f"B={B} pos={pos}")


def test_batched_engine_pallas_matches_structured():
    B, T, S, D = 3, 70, 5, 12
    rng = np.random.default_rng(1)
    problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
    phi = problems[0][1]
    X = np.stack([p[0] for p in problems]).astype(np.float32)
    G = np.stack([p[2] for p in problems]).astype(np.float32)
    PI = np.stack([p[3] for p in problems]).astype(np.float32)
    FM = np.ones((B, T), bool)
    SM = np.ones((B, S), bool)
    FM[1, 50:] = False
    X[1, 50:] = 0
    G[1, 50:] = 0
    SM[2, -1] = False
    G[2, :, -1] = 0
    G[2] /= G[2].sum(-1, keepdims=True)
    PI[2, -1] = 0
    PI[2] /= PI[2].sum()

    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=8, epsilon=1e-6)
    ref = vbx_batched(jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), fb_impl="structured", **kw)
    out = vbx_batched(jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), fb_impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    for b in range(B):
        n = int(ref.n_iters[b])
        np.testing.assert_allclose(np.asarray(out.elbo[b][:n]),
                                   np.asarray(ref.elbo[b][:n]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.gamma[b]),
                                   np.asarray(ref.gamma[b]), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.pi[b]),
                                   np.asarray(ref.pi[b]), atol=1e-4)


def test_sb_kernel_rejects_vmem_overflow():
    """A batch too wide to double-buffer even one-frame chunks must be
    rejected with a clear error, not an opaque Mosaic lowering failure."""
    from vbx_tpu.ops.fb_pallas import fb_scan_pallas_sb

    T, S, B = 8, 60, 7700        # S_pad=64, B_pad=7808 -> ~2MiB/frame slot
    w = jnp.ones((T, S, B), jnp.float32)
    valid = jnp.ones((T, B), bool)
    col = jnp.full((S, B), 0.1, jnp.float32)
    pinit = jnp.full((S, B), 1.0 / S, jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        fb_scan_pallas_sb(w, valid, col, pinit, 0.9, interpret=True)


def test_fused_sb_recip_normalization_matches():
    """recip=True (narrow reciprocal-multiply normalization) must agree
    with the broadcast-divide form to float32 roundoff."""
    import jax.numpy as jnp

    from vbx_tpu.ops.fb_pallas import fb_scan_pallas_sb

    rng = np.random.default_rng(11)
    T, S, B = 96, 6, 4
    w = jnp.asarray(rng.uniform(0.05, 1.0, (T, S, B)).astype(np.float32))
    valid = jnp.ones((T, B), jnp.float32)
    pi = rng.dirichlet(np.ones(S), size=B).astype(np.float32).T
    col = jnp.asarray(0.1 * pi + 1e-8)
    pinit = jnp.asarray(pi + 1e-8)
    a0, b0, c0 = fb_scan_pallas_sb(w, valid, col, pinit, 0.9,
                                   interpret=True)
    a1, b1, c1 = fb_scan_pallas_sb(w, valid, col, pinit, 0.9,
                                   interpret=True, recip=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-6)
    # bhat's per-frame scale convention is identical between the two
    # normalization variants, so direct comparison is valid here (the
    # backward pass has its own recip branch to cover)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=1e-6)


def test_pallas_s_over_cap_falls_back_with_warning():
    """The sb kernel holds speakers on sublanes — S up to 256 runs the
    kernel since round 5 (the old 128 cap was the lanes-layout limit);
    past 256 the engine must fall back to the structured engine WITH a
    warning, and the result must equal the structured run exactly."""
    rng = np.random.default_rng(129)
    T, S, D = 48, 257, 6
    X, phi, gamma, pi = random_vb_problem(rng, T, S, D)
    args = (jnp.asarray(X, jnp.float32), jnp.asarray(phi, jnp.float32),
            jnp.asarray(gamma, jnp.float32)[None],
            jnp.asarray(pi, jnp.float32)[None],
            jnp.ones((1, T), bool), jnp.ones((1, S), bool))
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=4, epsilon=1e-6)
    with pytest.warns(UserWarning, match="256 speakers"):
        res = vbx_batched(args[0][None], *args[1:], fb_impl="pallas", **kw)
    ref = vbx_batched(args[0][None], *args[1:], fb_impl="structured", **kw)
    np.testing.assert_array_equal(np.asarray(res.gamma),
                                  np.asarray(ref.gamma))
    assert int(res.n_iters[0]) == int(ref.n_iters[0])


@pytest.mark.parametrize("fb_impl", ["pallas", "pallas_bf16"])
def test_pallas_s_in_extended_range_matches_structured(fb_impl):
    """Round-5 cap raise (VERDICT r4 #9): S in (128, 256] runs the sb
    kernel (speakers are SUBLANE tiles there, not lanes) at the pallas
    path's usual tolerance contract vs the structured engine."""
    rng = np.random.default_rng(160)
    T, S, D = 64, 160, 8
    X, phi, gamma, pi = random_vb_problem(rng, T, S, D)
    args = (jnp.asarray(X, jnp.float32)[None],
            jnp.asarray(phi, jnp.float32),
            jnp.asarray(gamma, jnp.float32)[None],
            jnp.asarray(pi, jnp.float32)[None],
            jnp.ones((1, T), bool), jnp.ones((1, S), bool))
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=4, epsilon=-1.0)
    res = vbx_batched(*args, fb_impl=fb_impl, **kw)
    ref = vbx_batched(*args, fb_impl="structured", **kw)
    tol = 5e-5 if fb_impl == "pallas" else 2e-2
    np.testing.assert_allclose(np.asarray(res.gamma),
                               np.asarray(ref.gamma), atol=tol)
    assert np.array_equal(np.asarray(res.gamma[0]).argmax(-1),
                          np.asarray(ref.gamma[0]).argmax(-1))


@pytest.mark.parametrize("io_dtype", [jnp.float32, jnp.bfloat16])
def test_fb_sb_logp_wrapper_matches_two_step(io_dtype):
    """fb_scan_pallas_sb_logp (fused w-producer) must reproduce the
    two-step form — w computed outside, then fb_scan_pallas_sb — exactly,
    including masked speakers, a short recording's padding suffix, and
    the returned m/w byproducts on valid positions."""
    from vbx_tpu.ops.fb_pallas import fb_scan_pallas_sb, fb_scan_pallas_sb_logp

    rng = np.random.default_rng(33)
    T, S, B = 70, 6, 3
    loop_prob = 0.92
    log_p = rng.normal(size=(T, S, B)).astype(np.float32) * 3.0
    smask = np.ones((S, B), np.float32)
    smask[-1, 2] = 0.0                          # one masked speaker
    log_p[:, -1, 2] = -1e30
    valid = np.ones((T, B), np.float32)
    valid[T - 20:, 1] = 0.0                     # one short recording
    pi = rng.dirichlet(np.ones(S), size=B).astype(np.float32)
    col = ((1 - loop_prob) * pi + 1e-8).T
    pinit = (pi + 1e-8).T

    m_ref = log_p.max(axis=1)
    w_ref = np.exp(log_p - m_ref[:, None, :]) * smask[None]
    a1, b1, c1 = fb_scan_pallas_sb(
        jnp.asarray(w_ref), jnp.asarray(valid), jnp.asarray(col),
        jnp.asarray(pinit), loop_prob, interpret=True, io_dtype=io_dtype)
    a2, b2, c2, m2, w2 = fb_scan_pallas_sb_logp(
        jnp.asarray(log_p), jnp.asarray(smask), jnp.asarray(valid),
        jnp.asarray(col), jnp.asarray(pinit), loop_prob, interpret=True,
        io_dtype=io_dtype)
    # numpy's exp and XLA's fused exp differ at the last ulp, so the two
    # paths agree to float tolerance, not bit-for-bit (the pallas engine
    # is tolerance-parity by contract)
    tol = dict(rtol=5e-6, atol=1e-7) if io_dtype == jnp.float32 \
        else dict(rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a1, np.float32),
                               np.asarray(a2, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(b1, np.float32),
                               np.asarray(b2, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=5e-6, atol=0)
    np.testing.assert_array_equal(np.asarray(m2), m_ref)
    # w byproduct equals the valid-masked stream on VALID frames (invalid
    # frames carry the kernel's uniform fill — consumers mask them)
    w2 = np.asarray(w2, np.float32)
    vmb = np.broadcast_to(valid.astype(bool)[:, None, :], w2.shape)
    np.testing.assert_allclose(
        w2[vmb],
        np.asarray(jnp.asarray(w_ref).astype(io_dtype), np.float32)[vmb],
        **tol)
