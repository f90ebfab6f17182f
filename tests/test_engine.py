"""VB-HMM engine vs the float64 EM oracle, plus batching/masking parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from vbx_tpu.engine.vbhmm import vbx, vbx_batched

from .oracle import random_vb_problem, vbx_oracle


def _problem(seed, T=120, S=6, D=16):
    rng = np.random.default_rng(seed)
    return random_vb_problem(rng, T, S, D)


@pytest.mark.parametrize("fb_impl", ["structured", "assoc"])
def test_engine_matches_oracle_f64(fb_impl):
    X, phi, gamma, pi = _problem(0)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=15, epsilon=1e-6)
    g_ref, pi_ref, elbos_ref, _, _ = vbx_oracle(
        X, phi, 0.9, 0.4, 11.0, pi, gamma, max_iters=15, epsilon=1e-6)
    res = vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi),
              gamma=jnp.asarray(gamma), fb_impl=fb_impl, **kw)
    assert int(res.n_iters) == len(elbos_ref)
    np.testing.assert_allclose(np.asarray(res.elbo)[:len(elbos_ref)],
                               elbos_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.gamma), g_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.pi), pi_ref, atol=1e-8)


def test_engine_f32_reaches_same_fixed_point():
    X, phi, gamma, pi = _problem(1)
    g_ref, pi_ref, elbos_ref, _, _ = vbx_oracle(
        X, phi, 0.95, 0.3, 8.0, pi, gamma, max_iters=30, epsilon=1e-6)
    res = vbx(jnp.asarray(X, jnp.float32), jnp.asarray(phi, jnp.float32),
              pi=jnp.asarray(pi, jnp.float32),
              gamma=jnp.asarray(gamma, jnp.float32),
              loop_prob=0.95, Fa=0.3, Fb=8.0, max_iters=30, epsilon=1e-6)
    # f32 may stop a few iterations earlier (Delta-ELBO quantizes below eps)
    # but the decoded labels and speaker priors must agree
    assert np.array_equal(np.asarray(res.gamma).argmax(1), g_ref.argmax(1))
    np.testing.assert_allclose(np.asarray(res.pi), pi_ref, atol=5e-4)


def test_initial_model_skips_first_m_step():
    X, phi, gamma, pi = _problem(2)
    S, D = gamma.shape[1], X.shape[1]
    rng = np.random.default_rng(9)
    alpha0 = rng.standard_normal((S, D)) * 0.3
    invL0 = rng.uniform(0.2, 1.0, (S, D))
    g_ref, pi_ref, elbos_ref, _, _ = vbx_oracle(
        X, phi, 0.9, 0.4, 11.0, pi, gamma, max_iters=8, epsilon=1e-6,
        alpha=alpha0, invL=invL0)
    res = vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi),
              gamma=jnp.asarray(gamma), loop_prob=0.9, Fa=0.4, Fb=11.0,
              max_iters=8, epsilon=1e-6,
              alpha=jnp.asarray(alpha0), invL=jnp.asarray(invL0))
    np.testing.assert_allclose(np.asarray(res.elbo)[:len(elbos_ref)],
                               elbos_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.gamma), g_ref, atol=1e-7)


def test_dirichlet_init_requires_rng():
    X, phi, _, pi = _problem(3)
    with pytest.raises(ValueError):
        vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi))


def test_batched_matches_individual_runs_with_padding():
    """Padded+batched engine must reproduce each recording's individual run,
    including per-recording early stopping (convergence masking)."""
    problems = [_problem(10, T=60, S=4, D=12), _problem(11, T=90, S=6, D=12),
                _problem(12, T=33, S=3, D=12)]
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=12, epsilon=1e-6)
    # ONE shared phi (vbx_batched's model is shared across the batch): the
    # singles must run with the same phi or the comparison is vacuous —
    # phi-insensitive synthetic data would mask a batched path that
    # mishandled phi entirely
    phi = problems[0][1]
    singles = [
        vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi),
            gamma=jnp.asarray(g), **kw)
        for X, _, g, pi in problems]
    T_pad = max(p[0].shape[0] for p in problems)
    S_pad = max(p[2].shape[1] for p in problems)
    B, D = len(problems), problems[0][0].shape[1]
    Xb = np.zeros((B, T_pad, D))
    Gb = np.zeros((B, T_pad, S_pad))
    PIb = np.zeros((B, S_pad))
    FM = np.zeros((B, T_pad), bool)
    SM = np.zeros((B, S_pad), bool)
    for i, (X, _, g, pi) in enumerate(problems):
        T, S = g.shape
        Xb[i, :T] = X
        Gb[i, :T, :S] = g
        PIb[i, :S] = pi
        FM[i, :T] = True
        SM[i, :S] = True

    batched = vbx_batched(
        jnp.asarray(Xb), jnp.asarray(phi), jnp.asarray(Gb), jnp.asarray(PIb),
        jnp.asarray(FM), jnp.asarray(SM),
        loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=12, epsilon=1e-6)

    for i, (single, (X, _, g, pi)) in enumerate(zip(singles, problems)):
        T, S = g.shape
        assert int(batched.n_iters[i]) == int(single.n_iters)
        np.testing.assert_allclose(np.asarray(batched.gamma[i, :T, :S]),
                                   np.asarray(single.gamma), atol=1e-8)
        np.testing.assert_allclose(np.asarray(batched.pi[i, :S]),
                                   np.asarray(single.pi), atol=1e-9)
        assert np.all(np.asarray(batched.gamma[i, T:]) == 0)
        assert np.all(np.asarray(batched.gamma[i, :, S:]) == 0)


def test_elbo_monotone_nondecreasing():
    X, phi, gamma, pi = _problem(21, T=200, S=8, D=20)
    res = vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi),
              gamma=jnp.asarray(gamma), loop_prob=0.9, Fa=0.4, Fb=11.0,
              max_iters=25, epsilon=1e-9)
    e = np.asarray(res.elbo)[:int(res.n_iters)]
    assert np.all(np.diff(e) > -1e-6), e


def test_vbx_accepts_numpy_integer_pi():
    """labels.max()+1 without int() yields np.int64 — the uniform-prior
    scalar form must accept it."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
    phi = jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32)
    g = jnp.asarray(rng.dirichlet(np.ones(3), size=20), jnp.float32)
    res = vbx(X, phi, pi=np.int64(3), gamma=g, max_iters=2)
    assert res.gamma.shape == (20, 3)


def _checkpoint_problem(B=6, T=50, S=5, D=8, seed=7):
    rng = np.random.default_rng(seed)
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
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=25, epsilon=1e-5)
    args = (jnp.asarray(X), jnp.asarray(phi, jnp.float32), jnp.asarray(G),
            jnp.asarray(PI), jnp.asarray(FM), jnp.asarray(SM))
    return args, kw


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("iters_per_slice", [3, 7])
def test_checkpointed_slicing_is_exact(iters_per_slice, dtype):
    """vbx_batched_checkpointed externalizes the loop state, so slicing the
    EM into host-visible steps is BIT-EXACT vs one long run on the default
    engine (same padded shape, same per-iteration program) — in f64 too,
    where sub-f32 ELBO deltas must not be quantized by the host-side
    convergence recompute."""
    from vbx_tpu.engine.vbhmm import vbx_batched_checkpointed

    args, kw = _checkpoint_problem()
    args = tuple(jnp.asarray(a, dtype) if a.dtype == jnp.float32 else a
                 for a in args)
    if dtype == np.float64:
        kw["epsilon"] = 1e-9   # exercise deltas below f32 resolution
    ref = vbx_batched(*args, **kw)
    out = vbx_batched_checkpointed(*args, **kw,
                                   iters_per_slice=iters_per_slice)
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(out.gamma),
                                  np.asarray(ref.gamma))
    np.testing.assert_array_equal(np.asarray(out.pi), np.asarray(ref.pi))
    np.testing.assert_array_equal(np.asarray(out.elbo),
                                  np.asarray(ref.elbo))
    # the wrapper recomputes the model from the final gamma (the pallas
    # convention); the structured ref returns the crossing-iteration
    # model — both are converged models, equal to convergence tolerance
    np.testing.assert_allclose(np.asarray(out.alpha),
                               np.asarray(ref.alpha), atol=2e-3)


def test_checkpointed_resume_after_preemption(tmp_path, monkeypatch):
    """Kill the run after its first slice; a rerun loads the checkpoint,
    continues from the saved state, and reproduces the uninterrupted
    result exactly. The checkpoint file is removed on completion."""
    import os

    import vbx_tpu.engine.vbhmm as vbhmm_mod
    from vbx_tpu.engine.vbhmm import vbx_batched_checkpointed

    args, kw = _checkpoint_problem()
    ref = vbx_batched(*args, **kw)
    ck = str(tmp_path / "vb_state.npz")

    real = vbhmm_mod.vbx_batched
    calls = {"n": 0}

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption")
        return real(*a, **k)

    monkeypatch.setattr(vbhmm_mod, "vbx_batched", dying)
    with pytest.raises(KeyboardInterrupt):
        vbx_batched_checkpointed(*args, **kw, iters_per_slice=5,
                                 checkpoint_path=ck)
    monkeypatch.setattr(vbhmm_mod, "vbx_batched", real)
    assert os.path.exists(ck)           # slice 1 state survived

    out = vbx_batched_checkpointed(*args, **kw, iters_per_slice=5,
                                   checkpoint_path=ck)
    assert not os.path.exists(ck)       # removed on success
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(out.gamma),
                                  np.asarray(ref.gamma))
    np.testing.assert_array_equal(np.asarray(out.elbo),
                                  np.asarray(ref.elbo))

    # resuming an already-complete checkpoint must also work (preempted
    # between the final slice write and the cleanup)
    def fake_ck():
        B = out.pi.shape[0]
        np.savez(ck + ".tmp.npz", gamma=np.asarray(out.gamma),
                 pi=np.asarray(out.pi),
                 converged=np.ones(B, bool),
                 last_elbo=np.nanmax(np.asarray(out.elbo), axis=1),
                 plateau=np.zeros(B, np.int32),
                 elbo=np.asarray(out.elbo),
                 it_done=int(np.asarray(out.n_iters).max()),
                 shape=np.array(out.gamma.shape),
                 fb_impl=np.str_("structured"), dtype=np.str_("float32"),
                 hp=np.array([kw["loop_prob"], kw["Fa"], kw["Fb"],
                              kw["epsilon"], float(kw["max_iters"]),
                              0.0, 2.0]))
        os.replace(ck + ".tmp.npz", ck)

    fake_ck()
    out2 = vbx_batched_checkpointed(*args, **kw, iters_per_slice=5,
                                    checkpoint_path=ck)
    np.testing.assert_array_equal(np.asarray(out2.gamma),
                                  np.asarray(out.gamma))
    np.testing.assert_allclose(np.asarray(out2.alpha),
                               np.asarray(ref.alpha), atol=2e-3)

    # a checkpoint written by a differently-configured run must refuse to
    # resume rather than silently mix trajectories
    fake_ck()
    with pytest.raises(ValueError, match="differently-configured"):
        vbx_batched_checkpointed(*args, **{**kw, "epsilon": 3e-4},
                                 iters_per_slice=5, checkpoint_path=ck)
    os.remove(ck)

    with pytest.raises(ValueError, match="iters_per_slice"):
        vbx_batched_checkpointed(*args, **kw, iters_per_slice=0)


def test_checkpointed_resumes_pre_plateau_format(tmp_path):
    """A round-2 checkpoint (5-element hp, no 'plateau' array) must resume
    under the implied defaults (plateau off) instead of failing the header
    check — a preempted long run upgraded mid-flight would otherwise
    restart from iteration 0 (ADVICE round 3). A plateau-enabled run still
    refuses it (genuinely differently configured)."""
    import os

    from vbx_tpu.engine.vbhmm import vbx_batched_checkpointed

    args, kw = _checkpoint_problem()
    ref = vbx_batched(*args, **kw)
    ck = str(tmp_path / "vb_state.npz")

    B = ref.pi.shape[0]
    np.savez(ck + ".tmp.npz", gamma=np.asarray(ref.gamma),
             pi=np.asarray(ref.pi), converged=np.ones(B, bool),
             last_elbo=np.nanmax(np.asarray(ref.elbo), axis=1),
             elbo=np.asarray(ref.elbo),
             it_done=int(np.asarray(ref.n_iters).max()),
             shape=np.array(ref.gamma.shape),
             fb_impl=np.str_("structured"), dtype=np.str_("float32"),
             hp=np.array([kw["loop_prob"], kw["Fa"], kw["Fb"],
                          kw["epsilon"], float(kw["max_iters"])]))
    os.replace(ck + ".tmp.npz", ck)
    out = vbx_batched_checkpointed(*args, **kw, iters_per_slice=5,
                                   checkpoint_path=ck)
    np.testing.assert_array_equal(np.asarray(out.gamma),
                                  np.asarray(ref.gamma))

    np.savez(ck + ".tmp.npz", gamma=np.asarray(ref.gamma),
             pi=np.asarray(ref.pi), converged=np.ones(B, bool),
             last_elbo=np.nanmax(np.asarray(ref.elbo), axis=1),
             elbo=np.asarray(ref.elbo),
             it_done=int(np.asarray(ref.n_iters).max()),
             shape=np.array(ref.gamma.shape),
             fb_impl=np.str_("structured"), dtype=np.str_("float32"),
             hp=np.array([kw["loop_prob"], kw["Fa"], kw["Fb"],
                          kw["epsilon"], float(kw["max_iters"])]))
    os.replace(ck + ".tmp.npz", ck)
    with pytest.raises(ValueError, match="differently-configured"):
        vbx_batched_checkpointed(*args, **kw, iters_per_slice=5,
                                 checkpoint_path=ck, plateau_ulps=4.0)


def test_checkpointed_pallas_reaches_same_fixed_point():
    """The pallas path slices exactly too (same padded shape per slice)."""
    from vbx_tpu.engine.vbhmm import vbx_batched_checkpointed

    args, kw = _checkpoint_problem(B=18)
    ref = vbx_batched(*args, **kw, fb_impl="pallas")
    out = vbx_batched_checkpointed(*args, **kw, fb_impl="pallas",
                                   iters_per_slice=4)
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(out.gamma),
                                  np.asarray(ref.gamma))


# ---------------------------------------------------------------------------
# Opt-in ELBO plateau stop (PARITY.md deviation 3: f32 quantum cycling)

def test_plateau_stop_freezes_quantized_lane():
    """With epsilon=0 the reference's absolute rule can never fire, so the
    run goes to max_iters — exactly the observed f32 cycling failure mode
    (Delta-ELBO oscillating at +-a-few quanta forever). The plateau stop
    must end it once the deltas fall to quantum scale, without changing
    the decoded labels. (Seed chosen so the f32 deltas genuinely cycle
    above zero on the CPU test backend — some seeds instead round to a
    tiny NEGATIVE delta and stop via the reference rule.)"""
    X, phi, gamma, pi = _problem(1)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=40, epsilon=0.0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    off = vbx(f32(X), f32(phi), pi=f32(pi), gamma=f32(gamma), **kw)
    on = vbx(f32(X), f32(phi), pi=f32(pi), gamma=f32(gamma), **kw,
             plateau_ulps=4.0, plateau_iters=2)
    assert int(off.n_iters) == 40          # cycling: absolute rule dead
    assert int(on.n_iters) < 40            # plateau stop fired
    assert np.array_equal(np.asarray(on.gamma).argmax(1),
                          np.asarray(off.gamma).argmax(1))
    np.testing.assert_allclose(np.asarray(on.pi), np.asarray(off.pi),
                               atol=1e-4)


def test_plateau_default_off_changes_nothing():
    """plateau_ulps=0 (the default) is the reference's epsilon rule
    exactly: identical trajectory, iteration count, and fixed point."""
    X, phi, gamma, pi = _problem(5)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=25, epsilon=1e-6)
    base = vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi),
               gamma=jnp.asarray(gamma), **kw)
    explicit = vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi),
                   gamma=jnp.asarray(gamma), **kw,
                   plateau_ulps=0.0, plateau_iters=2)
    np.testing.assert_array_equal(np.asarray(base.elbo),
                                  np.asarray(explicit.elbo))
    np.testing.assert_array_equal(np.asarray(base.gamma),
                                  np.asarray(explicit.gamma))


@pytest.mark.parametrize("fb_impl", [None, "pallas"])
def test_plateau_batched_frees_batch_from_cycling_lane(fb_impl):
    """Under convergence freezing one cycling lane keeps the whole padded
    batch stepping to max_iters (the ~3x corpus tax, PARITY.md deviation
    3). The plateau stop must cap it on both the structured and pallas
    engines, with identical labels."""
    args, kw = _checkpoint_problem(B=4)
    kw = {**kw, "epsilon": 0.0, "max_iters": 40}
    off = vbx_batched(*args, **kw, fb_impl=fb_impl)
    on = vbx_batched(*args, **kw, fb_impl=fb_impl,
                     plateau_ulps=4.0, plateau_iters=2)
    assert int(np.max(np.asarray(off.n_iters))) == 40
    assert int(np.max(np.asarray(on.n_iters))) < 40
    g_off, g_on = np.asarray(off.gamma), np.asarray(on.gamma)
    assert np.array_equal(g_on.argmax(-1), g_off.argmax(-1))


def test_plateau_enabled_labels_match_plain_epsilon_run():
    """With a NORMAL epsilon the plateau stop may shave iterations but
    must not move the fixed point: labels and priors match the
    plateau-off run."""
    args, kw = _checkpoint_problem(B=6, seed=11)
    off = vbx_batched(*args, **kw)
    on = vbx_batched(*args, **kw, plateau_ulps=4.0, plateau_iters=2)
    assert (np.asarray(on.n_iters) <= np.asarray(off.n_iters)).all()
    assert np.array_equal(np.asarray(on.gamma).argmax(-1),
                          np.asarray(off.gamma).argmax(-1))
    np.testing.assert_allclose(np.asarray(on.pi), np.asarray(off.pi),
                               atol=1e-4)


@pytest.mark.parametrize("iters_per_slice", [2, 5])
def test_plateau_checkpointed_slicing_is_exact(iters_per_slice):
    """The plateau counter is part of the externalized loop state: slicing
    through a plateau crossing is bit-exact vs one long run (the host
    replays the device's counter over the recorded deltas)."""
    from vbx_tpu.engine.vbhmm import vbx_batched_checkpointed

    args, kw = _checkpoint_problem(B=5, seed=3)
    kw = {**kw, "epsilon": 0.0, "max_iters": 30,
          "plateau_ulps": 4.0, "plateau_iters": 2}
    ref = vbx_batched(*args, **kw)
    assert int(np.max(np.asarray(ref.n_iters))) < 30  # plateau fired
    out = vbx_batched_checkpointed(*args, **kw,
                                   iters_per_slice=iters_per_slice)
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(out.gamma),
                                  np.asarray(ref.gamma))
    np.testing.assert_array_equal(np.asarray(out.elbo),
                                  np.asarray(ref.elbo))


def test_checkpointed_pallas_s_gt_128_keeps_engine_dtype():
    """Round-3 review: requesting fb_impl='pallas' above the kernels'
    speaker capacity (256 on the sb path since round 5) must resolve the
    structured fallback BEFORE committing to the pallas f32 state dtype —
    an f64 structured trajectory checkpointed in f32 would quantize
    sub-f32 ELBO deltas to zero and converge early. One warning, then
    bit-equality with the structured checkpointed run."""
    from vbx_tpu.engine.vbhmm import vbx_batched_checkpointed

    rng = np.random.default_rng(2)
    B, T, S, D = 2, 24, 258, 6
    X = jnp.asarray(rng.standard_normal((B, T, D)))            # f64
    phi = jnp.asarray(rng.uniform(0.5, 2.0, D))
    G = jnp.asarray(rng.dirichlet(np.ones(S), size=(B, T)))
    PI = jnp.full((B, S), 1.0 / S)
    FM = jnp.ones((B, T), bool)
    SM = jnp.ones((B, S), bool)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=8, epsilon=1e-9)
    ref = vbx_batched_checkpointed(X, phi, G, PI, FM, SM, **kw,
                                   iters_per_slice=3)
    with pytest.warns(UserWarning, match="256 speakers"):
        out = vbx_batched_checkpointed(X, phi, G, PI, FM, SM, **kw,
                                       iters_per_slice=3,
                                       fb_impl="pallas")
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(out.gamma),
                                  np.asarray(ref.gamma))
    assert out.elbo.dtype == ref.elbo.dtype            # f64 state kept


def test_pallas_compile_failure_fallback_and_strict(monkeypatch):
    """Round-5 S-cap safety net: a pallas compile failure in the extended
    range (128, 256] degrades vbx_batched to the structured engine with a
    warning; _pallas_strict re-raises instead (so checkpointed callers
    never get a silent engine swap under a committed pallas header); and
    vbx_batched_checkpointed restarts itself on the structured engine
    with the correct state dtype when its first slice hits the failure."""
    import vbx_tpu.engine.vbhmm as vb

    def boom(*a, **k):
        raise RuntimeError("synthetic mosaic rejection")

    monkeypatch.setattr(vb, "_vbx_batched_pallas_sb_jit", boom)

    rng = np.random.default_rng(3)
    B, T, S, D = 2, 30, 160, 6
    X = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    phi = jnp.asarray(rng.uniform(0.5, 2.0, D), jnp.float32)
    G = jnp.asarray(rng.dirichlet(np.ones(S), size=(B, T)), jnp.float32)
    PI = jnp.full((B, S), 1.0 / S, jnp.float32)
    FM = jnp.ones((B, T), bool)
    SM = jnp.ones((B, S), bool)
    kw = dict(loop_prob=0.9, Fa=0.4, Fb=11.0, max_iters=4, epsilon=1e-6)

    ref = vb.vbx_batched(X, phi, G, PI, FM, SM, fb_impl="structured", **kw)
    with pytest.warns(UserWarning, match="failed to compile"):
        res = vb.vbx_batched(X, phi, G, PI, FM, SM, fb_impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(res.gamma),
                                  np.asarray(ref.gamma))

    with pytest.raises(RuntimeError, match="synthetic mosaic"):
        vb.vbx_batched(X, phi, G, PI, FM, SM, fb_impl="pallas",
                       _pallas_strict=True, **kw)

    # checkpointed: f64 inputs — the restart must keep the f64 state
    X64 = jnp.asarray(np.asarray(X), jnp.float64)
    ref_ck = vb.vbx_batched_checkpointed(
        X64, phi, G, PI, FM, SM, iters_per_slice=2, **kw)
    with pytest.warns(UserWarning, match="restarting the checkpointed"):
        out_ck = vb.vbx_batched_checkpointed(
            X64, phi, G, PI, FM, SM, iters_per_slice=2,
            fb_impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(out_ck.gamma),
                                  np.asarray(ref_ck.gamma))
    assert out_ck.elbo.dtype == ref_ck.elbo.dtype
