"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Validates that the ('dp', 'sp') sharded engine and the blockwise
forward-backward reproduce the single-device engine exactly (the standard
fake-backend multi-host test the reference lacks, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vbx_tpu.engine.vbhmm import vbx_batched
from vbx_tpu.ops.forward_backward import forward_backward_structured
from vbx_tpu.parallel import forward_backward_blockwise, make_mesh, vbx_sharded

from .oracle import random_hmm_problem, random_vb_problem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _blockwise_via_shard_map(log_p, pi, loop_prob, frame_mask, n_sp):
    mesh = make_mesh(n_dp=1, n_sp=n_sp)

    def fn(lp, fm):
        r = forward_backward_blockwise(lp, jnp.asarray(pi), loop_prob,
                                       frame_mask=fm, axis_name="sp")
        return r.gamma, r.log_px, r.pi_stat, r.gamma0

    sh = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("sp", None), P("sp")),
        out_specs=(P("sp", None), P(), P(), P()), check_vma=False)
    return jax.jit(sh)(jnp.asarray(log_p), jnp.asarray(frame_mask))


@pytest.mark.parametrize("n_sp", [2, 4, 8])
@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_blockwise_fb_matches_sequential(n_sp, dtype):
    rng = np.random.default_rng(n_sp)
    T, S = 192, 7
    log_p, pi, loop_prob = random_hmm_problem(rng, T, S)
    log_p = log_p.astype(dtype)
    pi = pi.astype(dtype)
    seq = forward_backward_structured(jnp.asarray(log_p), jnp.asarray(pi),
                                      loop_prob)
    g, log_px, pi_stat, gamma0 = _blockwise_via_shard_map(
        log_p, pi, loop_prob, np.ones(T, bool), n_sp)
    tol = 1e-9 if dtype == "float64" else 2e-5
    np.testing.assert_allclose(np.asarray(g), np.asarray(seq.gamma), atol=tol)
    np.testing.assert_allclose(float(log_px), float(seq.log_px),
                               rtol=10 * tol)
    np.testing.assert_allclose(np.asarray(pi_stat), np.asarray(seq.pi_stat),
                               rtol=1e-6 if dtype == "float64" else 1e-3,
                               atol=tol * float(np.max(seq.pi_stat)))
    np.testing.assert_allclose(np.asarray(gamma0), np.asarray(seq.gamma[0]),
                               atol=tol)


def test_blockwise_fb_with_padding_suffix():
    rng = np.random.default_rng(9)
    T, S, pad = 150, 5, 42
    log_p, pi, loop_prob = random_hmm_problem(rng, T + pad, S)
    mask = np.arange(T + pad) < T
    seq = forward_backward_structured(
        jnp.asarray(log_p[:T]), jnp.asarray(pi), loop_prob)
    g, log_px, pi_stat, gamma0 = _blockwise_via_shard_map(
        log_p, pi, loop_prob, mask, 4)
    np.testing.assert_allclose(np.asarray(g)[:T], np.asarray(seq.gamma),
                               atol=1e-9)
    assert np.all(np.asarray(g)[T:] == 0)
    np.testing.assert_allclose(float(log_px), float(seq.log_px), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(pi_stat), np.asarray(seq.pi_stat),
                               rtol=1e-8)


@pytest.mark.parametrize("n_dp,n_sp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_engine_matches_batched(n_dp, n_sp):
    """Full sharded EM over every mesh shape vs the single-device batched
    engine, including per-recording convergence masking."""
    B, T, S, D = 4, 96, 5, 12
    rng = np.random.default_rng(42)
    problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
    phi = problems[0][1]
    X = np.stack([p[0] for p in problems])
    G = np.stack([p[2] for p in problems])
    PI = np.stack([p[3] for p in problems])
    FM = np.ones((B, T), bool)
    SM = np.ones((B, S), bool)
    # give one recording a padded tail + padded speaker to stress masking
    FM[1, 80:] = False
    X[1, 80:] = 0
    G[1, 80:] = 0
    SM[2, -1] = False
    G[2, :, -1] = 0
    G[2] /= G[2].sum(1, keepdims=True)
    PI[2, -1] = 0
    PI[2] /= PI[2].sum()

    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=10, epsilon=1e-6)
    ref = vbx_batched(jnp.asarray(X), jnp.asarray(phi), jnp.asarray(G),
                      jnp.asarray(PI), jnp.asarray(FM), jnp.asarray(SM), **kw)

    mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
    Bp = B if B % n_dp == 0 else B + n_dp - B % n_dp
    assert Bp == B or n_dp == 8
    if Bp != B:
        # pad batch with inert copies of recording 0
        reps = Bp - B
        X = np.concatenate([X, np.repeat(X[:1], reps, 0)])
        G = np.concatenate([G, np.repeat(G[:1], reps, 0)])
        PI = np.concatenate([PI, np.repeat(PI[:1], reps, 0)])
        FM = np.concatenate([FM, np.repeat(FM[:1], reps, 0)])
        SM = np.concatenate([SM, np.repeat(SM[:1], reps, 0)])
    res = vbx_sharded(mesh, jnp.asarray(X), jnp.asarray(phi), jnp.asarray(G),
                      jnp.asarray(PI), jnp.asarray(FM), jnp.asarray(SM), **kw)

    for i in range(B):
        assert int(res.n_iters[i]) == int(ref.n_iters[i]), i
        np.testing.assert_allclose(np.asarray(res.gamma[i]),
                                   np.asarray(ref.gamma[i]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.pi[i]),
                                   np.asarray(ref.pi[i]), atol=1e-9)
        e_ref = np.asarray(ref.elbo[i])
        e_new = np.asarray(res.elbo[i])
        n = int(ref.n_iters[i])
        np.testing.assert_allclose(e_new[:n], e_ref[:n], rtol=1e-9)
