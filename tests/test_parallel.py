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
from vbx_tpu.parallel import (forward_backward_blockwise,
                              forward_backward_blockwise_pallas, make_mesh,
                              vbx_sharded)

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


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_blockwise_pallas_fb_matches_sequential(n_sp):
    """Both local passes of the frame-sharded smoother on the fused Pallas
    kernels (VERDICT r2 #1): batched lanes, per-recording padding suffixes,
    every quantity within the pallas path's tolerance contract of the
    sequential smoother."""
    rng = np.random.default_rng(100 + n_sp)
    T, S, B = 192, 7, 3
    logps, pis = [], []
    for _ in range(B):
        lp, pi, loop_prob = random_hmm_problem(rng, T, S)
        logps.append(lp.astype(np.float32))
        pis.append(pi.astype(np.float32))
    log_p = np.stack(logps, axis=-1)          # [T, S, B]
    pi = np.stack(pis)                        # [B, S]
    mask = np.ones((T, B), bool)
    mask[150:, 1] = False                     # per-lane padding suffix

    mesh = make_mesh(n_dp=1, n_sp=n_sp)

    def fn(lp, fm):
        r = forward_backward_blockwise_pallas(
            lp, jnp.asarray(pi), loop_prob, frame_mask=fm,
            axis_name="sp", interpret=True)
        return r.gamma, r.log_px, r.pi_stat, r.gamma0

    sh = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("sp", None, None), P("sp", None)),
        out_specs=(P("sp", None, None), P(), P(), P()), check_vma=False)
    g, log_px, pi_stat, gamma0 = jax.jit(sh)(jnp.asarray(log_p),
                                             jnp.asarray(mask))
    for b in range(B):
        Tv = int(mask[:, b].sum())
        seq = forward_backward_structured(
            jnp.asarray(log_p[:Tv, :, b]), jnp.asarray(pi[b]), loop_prob)
        np.testing.assert_allclose(np.asarray(g)[:Tv, :, b],
                                   np.asarray(seq.gamma), atol=1e-4)
        assert np.all(np.asarray(g)[Tv:, :, b] == 0)
        np.testing.assert_allclose(float(log_px[b]), float(seq.log_px),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pi_stat)[:, b], np.asarray(seq.pi_stat), rtol=1e-3,
            atol=1e-4 * float(np.max(seq.pi_stat)))
        np.testing.assert_allclose(np.asarray(gamma0)[:, b],
                                   np.asarray(seq.gamma[0]), atol=1e-4)


@pytest.mark.parametrize("n_segments", [2, 4])
def test_blockwise_pallas_segmented_operator_matches_sequential(n_segments):
    """The segmented operator-product walk (R segments as extra kernel
    lanes + the row-scaled compose scan, VERDICT r3 #6) must stay within
    the pallas tolerance contract of the sequential smoother — including
    a lane whose padding suffix leaves trailing segments entirely dead
    (they must compose as exact identities)."""
    rng = np.random.default_rng(17)
    T, S, B, n_sp = 128, 5, 2, 2
    logps, pis = [], []
    for _ in range(B):
        lp, pi, loop_prob = random_hmm_problem(rng, T, S)
        logps.append(lp.astype(np.float32))
        pis.append(pi.astype(np.float32))
    log_p = np.stack(logps, axis=-1)
    pi = np.stack(pis)
    mask = np.ones((T, B), bool)
    mask[40:, 1] = False      # lane 1: only 40 valid frames — with Tb=64
    # and 4 segments of 16, segments 3-4 of chip 0 and all of chip 1 dead

    mesh = make_mesh(n_dp=1, n_sp=n_sp)

    def fn(lp, fm):
        r = forward_backward_blockwise_pallas(
            lp, jnp.asarray(pi), loop_prob, frame_mask=fm,
            axis_name="sp", interpret=True, n_segments=n_segments)
        return r.gamma, r.log_px, r.pi_stat, r.gamma0

    sh = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("sp", None, None), P("sp", None)),
        out_specs=(P("sp", None, None), P(), P(), P()), check_vma=False)
    g, log_px, pi_stat, gamma0 = jax.jit(sh)(jnp.asarray(log_p),
                                             jnp.asarray(mask))
    for b in range(B):
        Tv = int(mask[:, b].sum())
        seq = forward_backward_structured(
            jnp.asarray(log_p[:Tv, :, b]), jnp.asarray(pi[b]), loop_prob)
        np.testing.assert_allclose(np.asarray(g)[:Tv, :, b],
                                   np.asarray(seq.gamma), atol=1e-4)
        assert np.all(np.asarray(g)[Tv:, :, b] == 0)
        np.testing.assert_allclose(float(log_px[b]), float(seq.log_px),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pi_stat)[:, b], np.asarray(seq.pi_stat), rtol=1e-3,
            atol=1e-4 * float(np.max(seq.pi_stat)))


@pytest.mark.parametrize("n_dp,n_sp", [(4, 2), (1, 8)])
@pytest.mark.parametrize("fb_impl", ["pallas", "pallas_bf16"])
def test_sharded_pallas_engine_matches_batched_pallas(n_dp, n_sp, fb_impl):
    """Full sharded EM with the Pallas blockwise smoother vs the
    single-device pallas batched engine: same convergence iteration per
    recording, gamma/pi/ELBO within the pallas tolerance contract."""
    B, T, S, D = 4, 96, 5, 12
    rng = np.random.default_rng(42)
    problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
    phi = problems[0][1]
    X = np.stack([p[0] for p in problems])
    G = np.stack([p[2] for p in problems])
    PI = np.stack([p[3] for p in problems])
    FM = np.ones((B, T), bool)
    SM = np.ones((B, S), bool)
    FM[1, 80:] = False
    X[1, 80:] = 0
    G[1, 80:] = 0
    SM[2, -1] = False
    G[2, :, -1] = 0
    G[2] /= G[2].sum(1, keepdims=True)
    PI[2, -1] = 0
    PI[2] /= PI[2].sum()

    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=10, epsilon=1e-6)
    ref = vbx_batched(
        jnp.asarray(X, jnp.float32), jnp.asarray(phi),
        jnp.asarray(G, jnp.float32), jnp.asarray(PI, jnp.float32),
        jnp.asarray(FM), jnp.asarray(SM), fb_impl=fb_impl, **kw)
    mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
    res = vbx_sharded(mesh, jnp.asarray(X), jnp.asarray(phi),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), fb_impl=fb_impl, **kw)
    tol = 5e-4 if fb_impl == "pallas" else 5e-2
    for i in range(B):
        if fb_impl == "pallas":
            assert int(res.n_iters[i]) == int(ref.n_iters[i]), i
        else:
            # bf16 streams put the converged Delta-ELBO within an ulp of
            # the epsilon crossing: solo and sharded legitimately stop one
            # iteration apart (the fixed points below still agree — and
            # the pipeline's corpus policy runs bf16 to max_iters anyway,
            # VBConfig.bf16_run_to_max)
            assert abs(int(res.n_iters[i]) - int(ref.n_iters[i])) <= 1, i
        np.testing.assert_allclose(np.asarray(res.gamma[i]),
                                   np.asarray(ref.gamma[i]), atol=tol)
        np.testing.assert_allclose(np.asarray(res.pi[i]),
                                   np.asarray(ref.pi[i]), atol=tol)
        n = min(int(ref.n_iters[i]), int(res.n_iters[i]))
        # the sharded log_px comes from the K-block boundary scans, the
        # single-device one from sum(m + log cfw): with bf16-quantized
        # streams the two formulas legitimately differ at ~1e-4 relative
        np.testing.assert_allclose(
            np.asarray(res.elbo[i])[:n], np.asarray(ref.elbo[i])[:n],
            rtol=1e-5 if fb_impl == "pallas" else 2e-3)


def test_sharded_pallas_s_gt_128_falls_back():
    """S > 128 exceeds the kernels' lane capacity: the sharded engine must
    warn and run the structured blockwise smoother instead (same policy as
    vbx_batched, VBx/VBx.py:97-98 has no S limit)."""
    B, T, S, D = 2, 32, 130, 8
    rng = np.random.default_rng(7)
    X = rng.normal(size=(B, T, D)).astype(np.float32)
    phi = np.abs(rng.normal(size=D)).astype(np.float32) + 0.5
    G = rng.dirichlet(np.ones(S), size=(B, T)).astype(np.float32)
    PI = np.full((B, S), 1.0 / S, np.float32)
    FM = np.ones((B, T), bool)
    SM = np.ones((B, S), bool)
    mesh = make_mesh(n_dp=2, n_sp=4)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=3, epsilon=1e-6)
    with pytest.warns(UserWarning, match="128 speakers"):
        res = vbx_sharded(mesh, jnp.asarray(X), jnp.asarray(phi),
                          jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                          jnp.asarray(SM), fb_impl="pallas", **kw)
    ref = vbx_sharded(mesh, jnp.asarray(X), jnp.asarray(phi),
                      jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                      jnp.asarray(SM), **kw)
    np.testing.assert_array_equal(np.asarray(res.gamma),
                                  np.asarray(ref.gamma))


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


def _write_synthetic_recording(exp_dir, rec, T, n_spk, d_raw=256, seed=7):
    """Synthetic x-vector corpus files (ark + segments) for one recording:
    n_spk well-separated speaker centroids visited in ~200-vector blocks."""
    import os

    from vbx_tpu.io.ark import write_vec_ark
    from vbx_tpu.io.segments import write_segments

    rng = np.random.default_rng(seed)
    centroids = rng.normal(size=(n_spk, d_raw))
    spk = np.repeat(np.arange(T // 200 + 1) % n_spk, 200)[:T]
    x = (centroids[spk] + 0.4 * rng.normal(size=(T, d_raw))).astype(
        np.float32)
    os.makedirs(exp_dir, exist_ok=True)
    ark = os.path.join(exp_dir, "xvectors.ark")
    seg = os.path.join(exp_dir, "xvectors.seg")
    write_vec_ark(ark, [(f"{rec}_{i:08d}", v) for i, v in enumerate(x)])
    write_segments(seg, [(f"{rec}_{i:08d}", rec, i * 0.24, i * 0.24 + 1.44)
                         for i in range(T)])
    return ark, seg


def test_run_corpus_mesh_long_recording(tmp_path):
    """VERDICT r1 #1: an AMI-length recording (T = 32768 x-vectors ~ 2.2 h
    at 0.24 s hop) flows through run_corpus.py's diarization stage on the
    8-virtual-device ('dp','sp') mesh — the frames of ONE recording spread
    over the 'sp' chips (the reference's acknowledged long-recording
    weakness, README.md:24, VBx.py:167-171 sequential loop) — and produces
    an RTTM identical to the single-device run."""
    import importlib.util
    import json
    import os

    _spec = importlib.util.spec_from_file_location(
        "run_corpus_sp", os.path.join(os.path.dirname(__file__), "..",
                                      "recipes", "run_corpus.py"))
    run_corpus = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(run_corpus)

    REF = "/root/reference"
    if not os.path.exists(f"{REF}/VBx/models/ResNet101_16kHz/plda"):
        pytest.skip("reference assets not mounted")

    # T and S exactly at bucket-quantum multiples so the streaming
    # (unpadded) single-device baseline runs at the same padded shape as
    # the sharded engine — the documented scope of bit-parity
    T, n_spk = 32768, 8
    cfg_path = tmp_path / "long.json"
    cfg_path.write_text(json.dumps({
        "preset": "example", "init": f"random_{n_spk}+VB",
        "lda_dim": 16, "vb": {"max_iters": 8}}))
    (tmp_path / "list.txt").write_text("meetA\n")

    rttms = {}
    for tag, extra in (("mesh", ["--mesh", "1x8"]), ("solo", [])):
        exp = str(tmp_path / f"exp_{tag}")
        _write_synthetic_recording(exp, "meetA", T, n_spk)
        assert run_corpus.main(
            ["diarization", "--preset", str(cfg_path),
             "--list-file", str(tmp_path / "list.txt"),
             "--exp-dir", exp,
             "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
             "--xvec-transform",
             f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"]
            + extra) == 0
        rttms[tag] = open(os.path.join(exp, "all.rttm")).read()
    assert rttms["mesh"] == rttms["solo"]
    assert rttms["mesh"].count("SPEAKER") > n_spk   # non-degenerate output


def test_sharded_checkpointed_slicing_is_exact(tmp_path):
    """Mid-EM engine-state checkpointing over the mesh: slicing the
    SHARDED EM into host-visible steps is bit-exact vs one long sharded
    run (converged0/last_elbo0 resume semantics match the unsharded
    engine), and a preemption resume from the checkpoint file continues
    the same trajectory."""
    import os

    from vbx_tpu.engine.vbhmm import vbx_batched_checkpointed

    B, T, S, D = 4, 96, 5, 12
    rng = np.random.default_rng(17)
    problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
    phi = problems[0][1]
    X = jnp.asarray(np.stack([p[0] for p in problems]), jnp.float32)
    G = jnp.asarray(np.stack([p[2] for p in problems]), jnp.float32)
    PI = jnp.asarray(np.stack([p[3] for p in problems]), jnp.float32)
    FM = jnp.ones((B, T), bool)
    SM = jnp.ones((B, S), bool)
    phi32 = jnp.asarray(phi, jnp.float32)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=20, epsilon=1e-6)
    mesh = make_mesh(n_dp=2, n_sp=4)

    ref = vbx_sharded(mesh, X, phi32, G, PI, FM, SM, **kw)
    out = vbx_batched_checkpointed(X, phi32, G, PI, FM, SM, **kw,
                                   iters_per_slice=3, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(out.gamma),
                                  np.asarray(ref.gamma))
    np.testing.assert_array_equal(np.asarray(out.pi), np.asarray(ref.pi))

    # preemption: run one slice with a checkpoint file, then resume
    ck = str(tmp_path / "state.npz")

    class _Stop(Exception):
        pass

    import vbx_tpu.parallel.engine as pe
    real = pe.vbx_sharded
    calls = {"n": 0}

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise _Stop()
        return real(*a, **k)

    pe.vbx_sharded = bomb
    try:
        import pytest as _pytest
        with _pytest.raises(_Stop):
            vbx_batched_checkpointed(X, phi32, G, PI, FM, SM, **kw,
                                     iters_per_slice=3, mesh=mesh,
                                     checkpoint_path=ck)
    finally:
        pe.vbx_sharded = real
    assert os.path.exists(ck)     # first slice was checkpointed
    resumed = vbx_batched_checkpointed(X, phi32, G, PI, FM, SM, **kw,
                                       iters_per_slice=3, mesh=mesh,
                                       checkpoint_path=ck)
    np.testing.assert_array_equal(np.asarray(resumed.gamma),
                                  np.asarray(ref.gamma))
    np.testing.assert_array_equal(np.asarray(resumed.n_iters),
                                  np.asarray(ref.n_iters))
    assert not os.path.exists(ck)  # removed on success


def test_mesh_overrides_warn_and_multiprocess_guard(tmp_path):
    """diarize_ark warns when a mesh overrides fb_impl/batch=False, and
    refuses mesh routing under multi-process (global-device mesh with
    per-host slices would run divergent sharded programs)."""
    import os
    from unittest import mock

    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.pipeline import diarize_ark

    REF = "/root/reference"
    if not os.path.exists(f"{REF}/exp/ES2005a.ark"):
        pytest.skip("reference assets not mounted")
    mesh = make_mesh(4, 2)
    common = dict(
        config=get_preset("example"),
        plda_file=f"{REF}/VBx/models/ResNet101_16kHz/plda",
        transform_file=f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
        verbose=False, mesh=mesh)
    with pytest.warns(UserWarning, match="mesh routing overrides"):
        diarize_ark(f"{REF}/exp/ES2005a.ark", f"{REF}/exp/ES2005a.seg",
                    str(tmp_path / "a"), fb_impl="assoc", **common)
    with mock.patch("jax.process_count", return_value=2):
        with pytest.raises(ValueError, match="single-process"):
            diarize_ark(f"{REF}/exp/ES2005a.ark", f"{REF}/exp/ES2005a.seg",
                        str(tmp_path / "b"), **common)


@pytest.mark.parametrize("fb_impl", [None, "pallas"])
def test_sharded_plateau_stop_freezes_cycling_lanes(fb_impl):
    """The opt-in plateau stop (engine.vbhmm._plateau_step) works on the
    sharded engine: with epsilon=0 (reference rule disabled) the guard
    ends the run early with unchanged labels. Compared sharded-vs-sharded
    — the firing ITERATION may differ by ~1 from the single-device
    engine, because at quantum scale the blockwise smoother's different
    reduction order legitimately moves the last ulps of the ELBO."""
    B, T, S, D = 4, 96, 5, 12
    rng = np.random.default_rng(42)
    problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
    phi = problems[0][1]
    X = np.stack([p[0] for p in problems]).astype(np.float32)
    G = np.stack([p[2] for p in problems]).astype(np.float32)
    PI = np.stack([p[3] for p in problems]).astype(np.float32)
    FM = np.ones((B, T), bool)
    SM = np.ones((B, S), bool)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=30, epsilon=0.0)
    mesh = make_mesh(n_dp=2, n_sp=4)
    args = (mesh, jnp.asarray(X), jnp.asarray(phi), jnp.asarray(G),
            jnp.asarray(PI), jnp.asarray(FM), jnp.asarray(SM))
    off = vbx_sharded(*args, fb_impl=fb_impl, **kw)
    on = vbx_sharded(*args, fb_impl=fb_impl, **kw,
                     plateau_ulps=4.0, plateau_iters=2)
    assert int(np.max(np.asarray(on.n_iters))) \
        < int(np.max(np.asarray(off.n_iters)))
    for i in range(B):
        assert np.array_equal(np.asarray(on.gamma[i]).argmax(-1),
                              np.asarray(off.gamma[i]).argmax(-1)), i


def test_blockwise_pallas_all_dead_block_is_identity_operator():
    """Round-3 review: a recording whose frames are ENTIRELY padding on a
    chip must contribute the IDENTITY block operator. The kernel's
    skip_dead left the folded-in incoming transition (loop_prob*I + col)
    as F, biasing the boundary-scan mass by ~log(1 + S*eps) per trailing
    dead block — invisible at eps=1e-8, so this test raises eps to 1e-3
    where the old bias (~0.06 in log_px over two dead chips) would fail
    the tight tolerance below."""
    rng = np.random.default_rng(7)
    T, S, B, n_sp = 256, 6, 2, 8
    logps, pis = [], []
    for _ in range(B):
        lp, pi, loop_prob = random_hmm_problem(rng, T, S)
        logps.append(lp.astype(np.float32))
        pis.append(pi.astype(np.float32))
    log_p = np.stack(logps, axis=-1)
    pi = np.stack(pis)
    mask = np.ones((T, B), bool)
    Tv = 150                       # chips 5..7 fully dead for lane 0
    mask[Tv:, 0] = False

    mesh = make_mesh(n_dp=1, n_sp=n_sp)
    eps = 1e-3

    def fn(lp, fm):
        r = forward_backward_blockwise_pallas(
            lp, jnp.asarray(pi), loop_prob, eps=eps, frame_mask=fm,
            axis_name="sp", interpret=True)
        return r.log_px

    sh = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("sp", None, None), P("sp", None)),
        out_specs=P(), check_vma=False)
    log_px = jax.jit(sh)(jnp.asarray(log_p), jnp.asarray(mask))

    ref = forward_backward_structured(
        jnp.asarray(log_p[:Tv, :, 0]), jnp.asarray(pi[0]), loop_prob,
        eps=eps)
    np.testing.assert_allclose(float(log_px[0]), float(ref.log_px),
                               rtol=2e-6)


def test_sharded_structured_long_t_parity():
    """Round-5 regression pin (VERDICT r4 #1): at long T the sharded
    STRUCTURED engine must match the solo engine. The round-4 divergence
    (gamma maxdiff 0.86 at T=32768, K=1) was log_px accumulated
    SEQUENTIALLY in f32 through the operator-product scan's scalar scale
    (error ~O(T*eps*|log_px|), ~3.6e2 absolute) reaching the ELBO and
    firing the delta<epsilon stop rule spuriously. Now: K=1 short-circuits
    to the sequential smoother (bit-exact by construction) and any-K sums
    log_px from the local vector passes' normalizers (measured K=8 bound
    at T=32768: elbo within 2 f32 ulps, labels identical, same n_iters)."""
    T, S, D = 16384, 8, 32
    rng = np.random.default_rng(5)
    X, phi, G, PI = random_vb_problem(rng, T, S, D)
    X, G = X.astype(np.float32), G.astype(np.float32)
    phi, PI = phi.astype(np.float32), PI.astype(np.float32)
    args = (jnp.asarray(X[None]), jnp.asarray(phi), jnp.asarray(G[None]),
            jnp.asarray(PI[None]), jnp.ones((1, T), bool),
            jnp.ones((1, S), bool))

    # K=1: bit-exact, forced past convergence (epsilon=-1 never fires)
    kw = dict(loop_prob=0.9, Fa=0.3, Fb=17.0, max_iters=4, epsilon=-1.0)
    solo = vbx_batched(*args, **kw)
    sh1 = vbx_sharded(make_mesh(n_dp=1, n_sp=1), *args, **kw)
    np.testing.assert_array_equal(np.asarray(sh1.gamma),
                                  np.asarray(solo.gamma))
    np.testing.assert_array_equal(np.asarray(sh1.pi), np.asarray(solo.pi))
    np.testing.assert_array_equal(np.asarray(sh1.elbo),
                                  np.asarray(solo.elbo))

    # K=8 under the real stop rule: same trajectory length, identical
    # labels, ELBO within reduction-order rounding of |ELBO| ~ 1e6
    kw = dict(loop_prob=0.9, Fa=0.3, Fb=17.0, max_iters=40, epsilon=1e-6)
    solo = vbx_batched(*args, **kw)
    sh8 = vbx_sharded(make_mesh(n_dp=1, n_sp=8), *args, **kw)
    assert int(sh8.n_iters[0]) == int(solo.n_iters[0])
    assert np.array_equal(np.asarray(sh8.gamma[0]).argmax(-1),
                          np.asarray(solo.gamma[0]).argmax(-1))
    n = int(solo.n_iters[0])
    np.testing.assert_allclose(np.asarray(sh8.elbo[0, :n]),
                               np.asarray(solo.elbo[0, :n]), rtol=1e-5)


def test_sharded_engine_shape_fuzz():
    """Round-5 confidence sweep over the blockwise changes: random
    (B, T, S, mesh, padding) configurations through the sharded
    STRUCTURED engine vs the solo batched engine. Contract at K>1 (the
    documented reduction-order scope, CLAUDE.md invariants): identical
    labels, ELBO within rounding over the common iteration prefix, and
    the stop rule firing within one iteration (a psum'd f32 ELBO can
    quantize across epsilon one iteration apart — same nuance as the
    cross-pad-shape case). K=1 meshes are exact (the long-T pin above).
    Complements the fixed-shape tests with off-path shapes (odd buckets,
    partial frame and speaker padding, every mesh factorization of 8)."""
    rng = np.random.default_rng(99)
    for mesh_shape in ((1, 8), (2, 4), (4, 2), (8, 1)):
        n_dp, n_sp = mesh_shape
        B = n_dp * int(rng.integers(1, 3))
        T = n_sp * int(rng.integers(20, 40))
        S = int(rng.integers(3, 9))
        D = int(rng.integers(6, 16))
        problems = [random_vb_problem(rng, T, S, D) for _ in range(B)]
        phi = problems[0][1]
        X = np.stack([p[0] for p in problems]).astype(np.float32)
        G = np.stack([p[2] for p in problems]).astype(np.float32)
        PI = np.stack([p[3] for p in problems]).astype(np.float32)
        FM = np.ones((B, T), bool)
        SM = np.ones((B, S), bool)
        # random pad suffixes (frames must pad in whole 'sp' blocks only
        # on the LAST blocks — any suffix works since padding is a
        # suffix of the global frame axis)
        cut = int(rng.integers(T // 2, T))
        FM[0, cut:] = False
        X[0, cut:] = 0
        G[0, cut:] = 0
        if S > 3:
            SM[-1, -1] = False
            G[-1, :, -1] = 0
            G[-1] /= G[-1].sum(1, keepdims=True)
            PI[-1, -1] = 0
            PI[-1] /= PI[-1].sum()
        kw = dict(loop_prob=0.85, Fa=0.35, Fb=9.0, max_iters=7,
                  epsilon=1e-6)
        ref = vbx_batched(jnp.asarray(X), jnp.asarray(phi), jnp.asarray(G),
                          jnp.asarray(PI), jnp.asarray(FM),
                          jnp.asarray(SM), **kw)
        res = vbx_sharded(make_mesh(n_dp=n_dp, n_sp=n_sp), jnp.asarray(X),
                          jnp.asarray(phi), jnp.asarray(G),
                          jnp.asarray(PI), jnp.asarray(FM),
                          jnp.asarray(SM), **kw)
        for i in range(B):
            di = abs(int(res.n_iters[i]) - int(ref.n_iters[i]))
            assert di <= (0 if n_sp == 1 else 1), (mesh_shape, i)
            assert np.array_equal(
                np.asarray(res.gamma[i]).argmax(-1),
                np.asarray(ref.gamma[i]).argmax(-1)), mesh_shape
            n_it = min(int(ref.n_iters[i]), int(res.n_iters[i]))
            np.testing.assert_allclose(
                np.asarray(res.elbo[i, :n_it]),
                np.asarray(ref.elbo[i, :n_it]), rtol=1e-5)
