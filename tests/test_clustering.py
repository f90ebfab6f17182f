"""Native (C++/ctypes) clustering helpers vs their numpy reference
implementations. The linkage/fcluster parity battery lives in test_ahc.py;
this file pins the auxiliary native kernels."""

import os

import numpy as np
import pytest


def test_native_two_gmm_em_matches_numpy_reference():
    """The GIL-free native 2-GMM EM must agree with the numpy reference
    loop (ops/calibration._weighted_em_threshold) to float-reassociation
    precision on exact atoms, binned atoms, and degenerate scores."""
    import unittest.mock as mock

    from vbx_tpu.clustering import two_gmm_weighted_em_native
    from vbx_tpu.ops import calibration as C

    if two_gmm_weighted_em_native(np.ones(2), np.zeros(2), np.zeros(2),
                                  np.zeros(2), 0) is None:
        pytest.skip("native library unavailable")

    def numpy_ref(cnt, ssum, s2sum, sc, niters=20):
        # run the numpy body by disabling the native fast path inside it
        with mock.patch("vbx_tpu.clustering.two_gmm_weighted_em_native",
                        return_value=None):
            return C._weighted_em_threshold(cnt, ssum, s2sum, sc, niters)

    rng = np.random.default_rng(0)
    # exact atoms: bimodal scores
    s = np.concatenate([rng.normal(-0.2, 0.1, 4000),
                        rng.normal(0.5, 0.15, 2000)])
    args = (np.ones(s.size), s, s * s, s)
    thr_np = numpy_ref(*args)
    thr_nat = two_gmm_weighted_em_native(*args, 20)
    assert thr_nat == pytest.approx(thr_np, rel=1e-10)

    # binned atoms
    nb = 4096
    lo, hi = s.min(), s.max()
    idx = np.clip(((s - lo) * nb / (hi - lo)).astype(np.int64), 0, nb - 1)
    cnt = np.bincount(idx, minlength=nb).astype(np.float64)
    ssum = np.bincount(idx, weights=s, minlength=nb)
    s2sum = np.bincount(idx, weights=s * s, minlength=nb)
    nz = cnt > 0
    args_b = (cnt[nz], ssum[nz], s2sum[nz], ssum[nz] / cnt[nz])
    assert two_gmm_weighted_em_native(*args_b, 20) == pytest.approx(
        numpy_ref(*args_b), rel=1e-10)

    # degenerate: identical scores -> mean fallback in both
    d = np.full(100, 0.37)
    args_d = (np.ones(100), d, d * d, d)
    assert two_gmm_weighted_em_native(*args_d, 20) == pytest.approx(
        numpy_ref(*args_d), rel=1e-12)


def test_native_squareform_matches_numpy_fallback():
    import unittest.mock as mock

    from vbx_tpu import clustering as cl

    rng = np.random.default_rng(5)
    for n in (2, 3, 17, 64):
        sq = rng.standard_normal((n, n))
        sq = (sq + sq.T) / 2
        for negate in (False, True):
            native = cl.squareform_condensed(sq, negate=negate)
            with mock.patch.object(cl, "_load_native", return_value=None):
                ref = cl.squareform_condensed(sq, negate=negate)
            np.testing.assert_array_equal(native, ref)
    # non-contiguous / non-f64 inputs take the fallback transparently
    sqf = np.asfortranarray(rng.standard_normal((9, 9)).astype(np.float32))
    out = cl.squareform_condensed(sqf)
    assert out.shape == (36,)


def test_native_two_gmm_em_deterministic_across_thread_counts():
    """ADVICE r2: the EM E-step reduction uses fixed-size index-ordered
    chunk accumulation, so the calibration threshold — which feeds the
    linkage cut and the cluster count — is bit-identical for any OpenMP
    thread count (a bare omp reduction would drift ~1e-12 run-to-run)."""
    from vbx_tpu.clustering import (set_native_threads,
                                    two_gmm_weighted_em_native)

    if two_gmm_weighted_em_native(np.ones(2), np.zeros(2), np.zeros(2),
                                  np.zeros(2), 1) is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    s = np.concatenate([rng.normal(-0.2, 0.1, 60000),
                        rng.normal(0.5, 0.15, 30000)])
    args = (np.ones(s.size), s, s * s, s)
    try:
        vals = []
        for nt in (1, 2, 3, 8):
            set_native_threads(nt)
            vals.append(two_gmm_weighted_em_native(*args, 20))
    finally:
        set_native_threads(os.cpu_count() or 1)
    assert len(set(vals)) == 1, vals


def test_device_linkage_matches_host_nn_chain():
    """Round-5 device NN-chain (clustering.device, VERDICT r4 #3): the
    whole linkage walk as one lax.while_loop of [N, D]-matvec scans. The
    CONTRACT is label equality with the host f64 chain at every cut plus
    merge distances within ~2e-7 (f32 scans can reorder near-tied merges
    — observed at N=50k on the chip too; the dendrogram partition is what
    feeds the AHC cut). Cuts are placed at merge-gap midpoints — a cut
    within 1e-7 of a merge distance is knife-edge by construction and
    outside the contract; real AHC margins are ~1e-4."""
    from vbx_tpu.clustering import fcluster_by_distance, linkage_dot_avg
    from vbx_tpu.clustering.device import linkage_dot_avg_device

    for seed, n, d in ((0, 300, 32), (1, 517, 16), (2, 1024, 64)):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((8, d))
        x = centers[rng.integers(0, 8, n)] \
            + 0.5 * rng.standard_normal((n, d))
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        Zh = linkage_dot_avg(xn)
        Zd = linkage_dot_avg_device(xn)
        # sorted distances agree to f32 rounding; the final merge covers n
        assert np.abs(np.sort(Zh[:, 2]) - np.sort(Zd[:, 2])).max() < 1e-6
        assert Zd[-1, 3] == n
        adjust = abs(Zh[:, 2].min())
        ds = np.sort(Zh[:, 2])
        for q in (0.3, 0.7):
            i = int(q * (n - 1))
            cut = 0.5 * (ds[i] + ds[i + 1]) + adjust
            lh = fcluster_by_distance(
                np.c_[Zh[:, :2], Zh[:, 2] + adjust, Zh[:, 3]], cut)
            ld = fcluster_by_distance(
                np.c_[Zd[:, :2], Zd[:, 2] + adjust, Zd[:, 3]], cut)
            np.testing.assert_array_equal(lh, ld, err_msg=f"{seed}/{q}")


def test_device_linkage_trivial_sizes():
    from vbx_tpu.clustering.device import linkage_dot_avg_device

    assert linkage_dot_avg_device(np.ones((1, 4))).shape == (0, 4)
    Z = linkage_dot_avg_device(
        np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]))
    assert Z.shape == (2, 4)
    assert Z[-1, 3] == 3.0


def test_batched_device_linkage_matches_host():
    """linkage_dot_avg_device_batched: M recordings in lockstep lanes of
    one while_loop must keep the same label contract vs the host f64
    chain as the solo walk, per recording — including mixed sizes and a
    trivial single-vector lane."""
    from vbx_tpu.clustering import fcluster_by_distance, linkage_dot_avg
    from vbx_tpu.clustering.device import linkage_dot_avg_device_batched

    rng = np.random.default_rng(7)
    xns = []
    for n in (300, 517, 801):
        centers = rng.standard_normal((6, 32))
        x = centers[rng.integers(0, 6, n)] \
            + 0.5 * rng.standard_normal((n, 32))
        xns.append(x / np.linalg.norm(x, axis=1, keepdims=True))
    Zb = linkage_dot_avg_device_batched(xns)
    for m, xn in enumerate(xns):
        n = len(xn)
        Zh = linkage_dot_avg(xn)
        assert np.abs(np.sort(Zh[:, 2]) - np.sort(Zb[m][:, 2])).max() < 1e-6
        assert Zb[m][-1, 3] == n
        adjust = abs(Zh[:, 2].min())
        ds = np.sort(Zh[:, 2])
        i = n // 3
        cut = 0.5 * (ds[i] + ds[i + 1]) + adjust
        lh = fcluster_by_distance(
            np.c_[Zh[:, :2], Zh[:, 2] + adjust, Zh[:, 3]], cut)
        lb = fcluster_by_distance(
            np.c_[Zb[m][:, :2], Zb[m][:, 2] + adjust, Zb[m][:, 3]], cut)
        np.testing.assert_array_equal(lh, lb, err_msg=str(m))
    # edge lanes
    assert linkage_dot_avg_device_batched([np.ones((1, 8))])[0].shape \
        == (0, 4)
    assert linkage_dot_avg_device_batched([]) == []
