"""AHC: native linkage vs scipy, calibration, label smoothing."""

import numpy as np
import pytest
import scipy.cluster.hierarchy as sch

from vbx_tpu.clustering import (fcluster_by_distance, linkage,
                                squareform_condensed)
from vbx_tpu.engine.ahc import ahc_labels, random_labels, smooth_labels_to_gamma
from vbx_tpu.ops.calibration import (two_gmm_calib_lin,
                                     two_gmm_calib_lin_binned,
                                     two_gmm_calib_lin_np)

from .oracle import smooth_labels_oracle


def _random_condensed(rng, n):
    x = rng.standard_normal((n, 8))
    d = np.sqrt(((x[:, None] - x[None, :]) ** 2).sum(-1))
    return squareform_condensed(d), d


def _partition_equal(a, b):
    """Cluster labelings equal up to renaming."""
    amap, bmap = {}, {}
    for x, y in zip(a, b):
        if amap.setdefault(x, y) != y or bmap.setdefault(y, x) != x:
            return False
    return True


@pytest.mark.parametrize("n", [2, 3, 10, 64, 200])
def test_native_linkage_matches_scipy(n):
    rng = np.random.default_rng(n)
    condensed, _ = _random_condensed(rng, n)
    Z_native = linkage(condensed, method="average", backend="native")
    Z_scipy = sch.linkage(condensed, method="average")
    # merge heights and sizes must agree exactly; merge ids can permute
    # between equal-height merges, so compare sorted heights and the
    # resulting flat partitions at several thresholds
    np.testing.assert_allclose(np.sort(Z_native[:, 2]), np.sort(Z_scipy[:, 2]),
                               rtol=1e-12)
    for q in (0.15, 0.5, 0.85):
        thr = np.quantile(Z_scipy[:, 2], q)
        a = fcluster_by_distance(Z_native, thr, backend="native")
        b = sch.fcluster(Z_scipy, thr, criterion="distance") - 1
        assert _partition_equal(a, b), (n, q)


def test_native_fcluster_matches_scipy_on_scipy_tree():
    rng = np.random.default_rng(77)
    condensed, _ = _random_condensed(rng, 50)
    Z = sch.linkage(condensed, method="average")
    for thr in np.quantile(Z[:, 2], [0.1, 0.4, 0.9]):
        a = fcluster_by_distance(Z, thr, backend="native")
        b = sch.fcluster(Z, thr, criterion="distance") - 1
        assert _partition_equal(a, b)


def test_negative_similarity_flow_like_reference():
    """The reference clusters on -cosine shifted nonnegative
    (vbhmm.py:139-146); check the full transform pipeline yields the same
    partition via our native path and pure scipy."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((40, 16))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    scr = x @ x.T
    condensed = squareform_condensed(-scr)
    thr = 0.1

    Z = linkage(condensed, method="average", backend="native")
    adj = abs(Z[:, 2].min())
    Z2 = Z.copy()
    Z2[:, 2] += adj
    a = fcluster_by_distance(Z2, -thr + adj, backend="native")

    Zs = sch.linkage(condensed, method="average")
    adj_s = abs(Zs[:, 2].min())
    Zs[:, 2] += adj_s
    b = sch.fcluster(Zs, -thr + adj_s, criterion="distance") - 1
    assert _partition_equal(a, b)


def test_two_gmm_calibration_device_matches_host():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    scores = np.concatenate([rng.normal(-1.0, 0.5, 4000),
                             rng.normal(1.2, 0.5, 1000)])
    thr_np = two_gmm_calib_lin_np(scores)
    thr_dev = float(two_gmm_calib_lin(jnp.asarray(scores)))
    assert abs(thr_np - thr_dev) < 1e-8
    assert -1.0 < thr_np < 1.2   # threshold lies between the two means


def test_ahc_labels_basic_separation():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((30, 16)) * 0.05 + np.r_[np.ones(8), np.zeros(8)]
    b = rng.standard_normal((30, 16)) * 0.05 + np.r_[np.zeros(8), np.ones(8)]
    x = np.vstack([a, b])
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    labels = ahc_labels(x, threshold_bias=0.0)
    assert len(np.unique(labels)) == 2
    assert len(np.unique(labels[:30])) == 1
    assert len(np.unique(labels[30:])) == 1


def test_ahc_single_vector():
    assert ahc_labels(np.ones((1, 4)), 0.0).tolist() == [0]


def test_device_cosine_calibration_matches_host_blocked():
    """The streamed device calibration (only scalars cross the device
    boundary) must agree with the host f64 blocked-histogram threshold to
    well below the ~1e-4 AHC merge-decision scale. On the CPU backend the
    same code path runs under XLA:CPU — the numerics contract (f32 scores
    + host-f64 EM updates) is identical."""
    from vbx_tpu.engine.ahc import _blocked_cosine_condensed_and_thr
    from vbx_tpu.ops.calibration import two_gmm_calib_cosine_device

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 24)) * 0.5
    x = centers[rng.integers(0, 4, size=4500)] \
        + 0.7 * rng.standard_normal((4500, 24))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    _, thr_host = _blocked_cosine_condensed_and_thr(xn,
                                                    want_condensed=False)
    thr_dev = two_gmm_calib_cosine_device(xn)
    assert abs(thr_dev - thr_host) < 5e-5, (thr_dev, thr_host)


def test_batched_device_calibration_matches_single_and_host():
    """two_gmm_calib_cosine_device_batched (round-5 continuation: one
    dispatch per EM pass for a whole corpus group) must agree with the
    sequential per-recording device sweep essentially exactly — group
    padding only appends exact-zero masked blocks — and with the host f64
    path at the documented ~1e-7 scale. A degenerate lane (identical
    vectors) must freeze to its mean without touching its neighbors."""
    from vbx_tpu.ops.calibration import (
        two_gmm_calib_cosine_device, two_gmm_calib_cosine_device_batched,
        two_gmm_calib_lin_binned)

    rng = np.random.default_rng(7)
    xns = []
    for n in (900, 1400, 2100):     # spans three padding octaves
        c = rng.standard_normal((4, 32)) * 0.5
        x = c[rng.integers(0, 4, n)] + 0.7 * rng.standard_normal((n, 32))
        xns.append(x / np.linalg.norm(x, axis=1, keepdims=True))
    thr_b = two_gmm_calib_cosine_device_batched(xns)
    for m, x in enumerate(xns):
        thr_s = two_gmm_calib_cosine_device(x)
        thr_h = two_gmm_calib_lin_binned((x @ x.T).reshape(-1))
        assert abs(thr_b[m] - thr_s) < 1e-9, (m, thr_b[m], thr_s)
        assert abs(thr_b[m] - thr_h) < 5e-5, (m, thr_b[m], thr_h)
    # degenerate lane: every pairwise cosine is 1.0 -> threshold = mean
    degen = np.tile(xns[0][:1], (700, 1))
    thr_d = two_gmm_calib_cosine_device_batched([degen, xns[0]])
    np.testing.assert_allclose(thr_d[0], 1.0, atol=1e-5)
    assert abs(thr_d[1] - thr_b[0]) < 1e-9


def test_ahc_labels_precomputed_thr_short_circuits_host_passes():
    """With both precomputed_Z and precomputed_thr (the fully batched
    corpus pre-stage), ahc_labels must produce the cut directly — same
    labels as handing it only the Z with the same threshold routing —
    and never touch the O(N^2) host chain (monkeypatched to raise)."""
    import vbx_tpu.engine.ahc as ahc_mod
    from vbx_tpu.clustering import linkage_dot_avg
    from vbx_tpu.ops.calibration import two_gmm_calib_lin_binned

    rng = np.random.default_rng(9)
    c = rng.standard_normal((4, 16)) * 0.6
    x = c[rng.integers(0, 4, 600)] + 0.5 * rng.standard_normal((600, 16))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    Z = linkage_dot_avg(xn)
    thr = two_gmm_calib_lin_binned((xn @ xn.T).reshape(-1))
    want = ahc_labels(x, 0.0)

    import unittest.mock as mock
    with mock.patch.object(ahc_mod, "_blocked_cosine_condensed_and_thr",
                           side_effect=AssertionError("host pass ran")), \
         mock.patch.object(ahc_mod, "_BLOCKED_MIN_N", 512):
        got = ahc_labels(x, 0.0, precomputed_Z=Z, precomputed_thr=thr)
    np.testing.assert_array_equal(got, want)


def test_ahc_device_long_n_labels_match_host():
    """ahc_labels(compute_backend='device') at N >= the blocked cutoff
    (the streamed MXU calibration + host f64 on-demand linkage) must
    produce the same labels as the all-host path (VERDICT r3 #4 'identical
    final labels'); 'auto' on the CPU backend resolves to host exactly."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((5, 16)) * 0.6
    x = centers[rng.integers(0, 5, size=4200)] \
        + 0.5 * rng.standard_normal((4200, 16))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    host = ahc_labels(x, 0.0, compute_backend="host")
    dev = ahc_labels(x, 0.0, compute_backend="device")
    auto = ahc_labels(x, 0.0, compute_backend="auto")
    np.testing.assert_array_equal(dev, host)
    np.testing.assert_array_equal(auto, host)


def test_ahc_rejects_unknown_compute_backend():
    """A typo ('Host', 'devcie') must not silently fall into the f32
    device path and weaken the f64 init-chain invariant (ADVICE round 3)."""
    import pytest

    x = np.eye(4)
    for bad in ("Host", "devcie", ""):
        with pytest.raises(ValueError, match="compute_backend"):
            ahc_labels(x, 0.0, compute_backend=bad)


def test_smooth_labels_to_gamma():
    labels = np.array([0, 1, 2, 1, 0])
    g = smooth_labels_to_gamma(labels, 5.0)
    np.testing.assert_allclose(g, smooth_labels_oracle(labels, 5.0),
                               rtol=1e-12)
    np.testing.assert_allclose(g.sum(1), 1.0, rtol=1e-12)
    assert np.array_equal(g.argmax(1), labels)


def test_random_labels_deterministic():
    a = random_labels(100, 8, seed=4)
    b = random_labels(100, 8, seed=4)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < 8


def test_binned_calibration_matches_exact():
    """Histogram EM (long-recording path) agrees with the exact EM far
    below AHC-cut sensitivity."""
    from vbx_tpu.ops.calibration import two_gmm_calib_lin_binned
    rng = np.random.default_rng(9)
    s = np.concatenate([rng.normal(-0.8, 0.3, 300_000),
                        rng.normal(0.9, 0.35, 80_000)])
    big = np.tile(s, 15)          # 5.7M elements > 2^22 -> binned path
    binned = two_gmm_calib_lin_binned(big)
    exact_big = two_gmm_calib_lin_np(big)
    assert abs(binned - exact_big) < 1e-7, (binned, exact_big)


def test_binned_calibration_serving_size():
    """Serving-size score sets (N ~ 1000, N^2 just above the 2^18 exact-EM
    cutoff) take the adaptive-bin histogram path and agree with the exact
    EM ~1e-9 — five orders below AHC merge-decision sensitivity."""
    from vbx_tpu.ops.calibration import adaptive_bins, two_gmm_calib_lin_binned
    rng = np.random.default_rng(9)
    s = np.concatenate([rng.normal(-0.1, 0.2, 600_000),
                        rng.normal(0.6, 0.15, 450_625)])   # ~1025^2 scores
    assert abs(two_gmm_calib_lin_binned(s) - two_gmm_calib_lin_np(s)) < 1e-9
    # the shared bin rule: ~n/64 clamped to [2^12, 2^16] (L2-bounded cap;
    # measured threshold error vs exact is second-order in bin width,
    # see adaptive_bins docstring)
    assert adaptive_bins(1 << 10) == 1 << 12      # floor
    assert adaptive_bins(1 << 18) == 1 << 12      # 2^18/64 = 2^12
    assert adaptive_bins(3 << 21) == 1 << 16      # 3*2^21/64 -> cap
    assert adaptive_bins(1 << 40) == 1 << 16      # cap


def test_blocked_cosine_path_matches_full():
    """The long-recording blocked cosine sweep (streamed histogram moments
    + condensed build, engine.ahc._blocked_cosine_condensed_and_thr) must
    reproduce the full-materialization path: threshold to ~1e-10 and final
    AHC labels identical. (The condensed entries may differ by a few ulp —
    BLAS blocks the row-block matmul differently than the full matmul.)"""
    import vbx_tpu.engine.ahc as ahc

    rng = np.random.default_rng(11)
    N, D, K = 700, 64, 5
    centers = rng.standard_normal((K, D))
    x = centers[rng.integers(0, K, N)] + 0.9 * rng.standard_normal((N, D))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    cond_b, thr_b = ahc._blocked_cosine_condensed_and_thr(xn, blk=128)
    scr = xn @ xn.T
    thr_f = two_gmm_calib_lin_binned(scr)
    cond_f = squareform_condensed(scr, negate=True)
    # the blocked path bins over the fixed [-1, 1] cosine range at 2^16,
    # the materialized path over the data-tight range at adaptive_bins(n);
    # both are second-order-exact, so they agree to ~binning error (1e-9
    # scale), not bit-for-bit — 5 orders below AHC merge sensitivity
    assert abs(thr_b - thr_f) < 5e-8, (thr_b, thr_f)
    np.testing.assert_allclose(cond_b, cond_f, atol=1e-14)

    def cut(cond, thr):
        Z = linkage(cond, "average")
        adjust = abs(Z[:, 2].min())
        Z = Z.copy()
        Z[:, 2] += adjust
        return fcluster_by_distance(Z, -(thr - 0.015) + adjust)

    assert np.array_equal(cut(cond_b, thr_b), cut(cond_f, thr_f))


def test_native_linkage_matches_scipy_exactly():
    """The parallel/compact-active-list NN-chain must keep merge-order
    exactness: identical merge ids/sizes to scipy average linkage (the
    distances agree to ~1 ulp — scipy factors the Lance-Williams average
    update differently)."""
    rng = np.random.default_rng(12)
    for n in (40, 333, 900):
        x = rng.standard_normal((n, 16))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        cond = squareform_condensed(-(x @ x.T))
        Zn = linkage(cond, "average", backend="native")
        Zs = sch.linkage(cond, method="average")
        np.testing.assert_array_equal(Zn[:, :2], Zs[:, :2])
        np.testing.assert_allclose(Zn[:, 2], Zs[:, 2], rtol=1e-12)
        np.testing.assert_array_equal(Zn[:, 3], Zs[:, 3])


def test_degenerate_identical_scores_calibration_and_ahc():
    """A one-cluster recording yields identical pairwise scores: the 2-GMM
    variance is zero and the reference's EM would emit NaN
    (diarization_lib.py:13-31 divides by the shared variance unguarded);
    the calibration must instead return the common value and AHC a single
    cluster — no warnings, finite threshold."""
    import warnings

    scores = np.full((50, 50), 0.7)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        thr = two_gmm_calib_lin_np(scores)
    assert np.isfinite(thr) and abs(thr - 0.7) < 1e-12

    rng = np.random.default_rng(5)
    c = rng.standard_normal(64)
    x = np.tile(c, (40, 1)) + 1e-9 * rng.standard_normal((40, 64))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        labels = ahc_labels(x, -0.015)
    assert labels.max() == 0


def test_ahc_device_similarity_backend():
    """compute_backend='device' (TPU pairwise-similarity kernel feeding the
    host linkage, SURVEY §2.2) must produce the same clustering as the host
    f64 chain on well-separated data (the backends differ only in matmul
    precision, which cannot flip merges at this separation)."""
    rng = np.random.default_rng(5)
    cents = rng.standard_normal((4, 32)) * 5
    x = cents[np.repeat(np.arange(4), 50)] + 0.1 * rng.standard_normal((200, 32))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    host = ahc_labels(x, -0.015)
    dev = ahc_labels(x, -0.015, compute_backend="device")
    assert host.max() == dev.max() == 3
    # same partition up to label permutation
    import itertools
    for perm in itertools.permutations(range(4)):
        if np.all(np.array(perm)[host] == dev):
            break
    else:
        raise AssertionError("device backend changed the partition")


def test_adaptive_bins_explicit_override_honored():
    """An explicit n_bins overrides the 2^16 L2 cap instead of being
    silently clamped (review finding, round 2)."""
    from vbx_tpu.ops.calibration import adaptive_bins
    assert adaptive_bins(1 << 30, n_bins=1 << 18) == 1 << 18
    assert adaptive_bins(1 << 30, n_bins=1 << 14) == 1 << 14
    assert adaptive_bins(1 << 30) == 1 << 16


def test_linkage_dot_avg_matches_condensed_merge_order():
    """VERDICT r2 #3: the O(N.D)-memory distance-on-demand linkage
    (cluster-sums identity) must reproduce the condensed NN-chain's merge
    pairs and sizes exactly on randomized inputs, with distances equal to
    f64 rounding (~1e-15: sums identity vs iterated Lance-Williams)."""
    from vbx_tpu.clustering import linkage_dot_avg

    try:
        linkage_dot_avg(np.eye(3), backend="native")
    except RuntimeError:
        pytest.skip("native library unavailable")
    for seed, n, d in [(0, 400, 16), (1, 900, 128), (2, 1500, 64)]:
        rng = np.random.default_rng(seed)
        K = 8
        centers = rng.standard_normal((K, d))
        x = (centers[rng.integers(0, K, n)]
             + 0.7 * rng.standard_normal((n, d)))
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        Z_ref = linkage(squareform_condensed(xn @ xn.T, negate=True),
                        "average", backend="native")
        Z_new = linkage_dot_avg(xn, backend="native")
        assert np.array_equal(Z_ref[:, :2], Z_new[:, :2]), (seed, n, d)
        assert np.array_equal(Z_ref[:, 3], Z_new[:, 3]), (seed, n, d)
        np.testing.assert_allclose(Z_ref[:, 2], Z_new[:, 2], atol=1e-13)


def test_ahc_ondemand_route_matches_condensed_labels(monkeypatch):
    """ahc_labels' O(N.D) on-demand route (taken for cosine/host above
    _BLOCKED_MIN_N when the native library is present) must produce the
    same labels as the condensed route."""
    import vbx_tpu.engine.ahc as ahc
    from vbx_tpu.clustering import linkage_dot_avg

    try:
        linkage_dot_avg(np.eye(3), backend="native")
    except RuntimeError:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    N, D, K = 900, 64, 6
    centers = rng.standard_normal((K, D))
    x = centers[rng.integers(0, K, N)] + 0.8 * rng.standard_normal((N, D))

    monkeypatch.setattr(ahc, "_BLOCKED_MIN_N", 256)  # force the blocked zone
    lab_ondemand = ahc.ahc_labels(x, -0.015)

    def no_ondemand(xn, backend=None):
        raise RuntimeError("forced off")

    monkeypatch.setattr(ahc, "linkage_dot_avg", no_ondemand)
    lab_condensed = ahc.ahc_labels(x, -0.015)
    assert np.array_equal(lab_ondemand, lab_condensed)


def test_auto_routes_mid_n_linkage_to_device(monkeypatch):
    """Round-5 routing: under 'auto' with an accelerator attached, the
    mid-N band [6144, 16384) runs host calibration + DEVICE linkage
    (measured crossover, BENCHMARKS round-5); explicit 'host' never
    touches the device; below the band the host chain runs as before."""
    import jax

    import vbx_tpu.clustering.device as dev
    from vbx_tpu.clustering import linkage_dot_avg
    from vbx_tpu.engine.ahc import ahc_labels

    calls = []

    def spy(xn):
        calls.append(len(xn))
        # delegate to the host chain so the test stays fast and exact on
        # the CPU backend (the routing, not the kernel, is under test)
        return linkage_dot_avg(xn)

    monkeypatch.setattr(dev, "linkage_dot_avg_device", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((6, 32))
    x = centers[rng.integers(0, 6, 6500)] \
        + 0.5 * rng.standard_normal((6500, 32))
    lab_auto = ahc_labels(x, 0.0, compute_backend="auto")
    assert calls == [6500]
    lab_host = ahc_labels(x, 0.0, compute_backend="host")
    assert calls == [6500]              # explicit host: no device call
    np.testing.assert_array_equal(lab_auto, lab_host)
    ahc_labels(x[:5000], 0.0, compute_backend="auto")
    assert calls == [6500]              # below the band: host chain
