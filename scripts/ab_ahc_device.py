"""Long-recording AHC front-half A/B on the device (VERDICT r3 #4):
the streamed MXU 2-GMM calibration (ops.calibration.
two_gmm_calib_cosine_device — one dispatch per EM pass, scalars-only
transfers) vs the blocked host f64 histogram sweep, plus the full
`ahc_labels` front half under compute_backend='device' vs 'host'
(threshold agreement and label equality at scale).

    timeout 560 python scripts/ab_ahc_device.py [N] [D]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def main():
    import jax

    from vbx_tpu.engine.ahc import _blocked_cosine_condensed_and_thr
    from vbx_tpu.ops.calibration import two_gmm_calib_cosine_device

    print(f"device: {jax.devices()[0]}  N={N} D={D}", flush=True)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((8, D)) * 0.5
    x = centers[rng.integers(0, 8, size=N)] \
        + 0.7 * rng.standard_normal((N, D))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    t0 = time.perf_counter()
    thr_dev = two_gmm_calib_cosine_device(xn)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    two_gmm_calib_cosine_device(xn)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, thr_host = _blocked_cosine_condensed_and_thr(xn,
                                                    want_condensed=False)
    t_host = time.perf_counter() - t0
    print(f"calibration N={N}: device {t_cold:.1f}s cold / {t_warm:.1f}s "
          f"warm vs host {t_host:.1f}s "
          f"({t_host / t_warm:.1f}x); |thr_dev - thr_host| = "
          f"{abs(thr_dev - thr_host):.2e}", flush=True)

    # round 5 (VERDICT r4 #3): the NN-chain linkage walk itself on the
    # device — merge-sequence/label parity vs the host f64 chain and the
    # wall-clock ratio at full N
    from vbx_tpu.clustering import fcluster_by_distance, linkage_dot_avg
    from vbx_tpu.clustering.device import linkage_dot_avg_device

    t0 = time.perf_counter()
    Zd = linkage_dot_avg_device(xn)
    tl_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    Zd = linkage_dot_avg_device(xn)
    tl_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    Zh = linkage_dot_avg(xn)
    tl_host = time.perf_counter() - t0
    adjust = abs(Zh[:, 2].min())
    cut = -(thr_host + 0.0) + adjust
    lh = fcluster_by_distance(
        np.c_[Zh[:, :2], Zh[:, 2] + adjust, Zh[:, 3]], cut)
    adj_d = abs(Zd[:, 2].min())
    ld = fcluster_by_distance(
        np.c_[Zd[:, :2], Zd[:, 2] + adj_d, Zd[:, 3]], -(thr_host) + adj_d)
    print(f"linkage N={N}: device {tl_cold:.1f}s cold / {tl_warm:.1f}s "
          f"warm vs host {tl_host:.1f}s ({tl_host / tl_warm:.1f}x); "
          f"merge pairs equal: "
          f"{np.array_equal(Zh[:, :2], Zd[:, :2])}, dist maxdiff "
          f"{np.abs(Zh[:, 2] - Zd[:, 2]).max():.1e}, labels at the "
          f"calibrated cut identical: {np.array_equal(lh, ld)} "
          f"(clusters host={lh.max() + 1} device={ld.max() + 1})",
          flush=True)

    # full front half (calibration + linkage + cut): end-to-end
    # ahc_labels under compute_backend='device' (now calibration AND
    # linkage on the accelerator) vs 'host' — identical labels is the
    # contract (tests pin it on CPU; this re-checks on the real chip)
    from vbx_tpu.engine.ahc import ahc_labels

    for n_run in {min(N, 8000), N}:
        xs = xn[:n_run]
        t0 = time.perf_counter()
        lab_host = ahc_labels(xs, 0.0, compute_backend="host")
        th = time.perf_counter() - t0
        t0 = time.perf_counter()
        lab_dev = ahc_labels(xs, 0.0, compute_backend="device")
        td = time.perf_counter() - t0
        same = np.array_equal(lab_host, lab_dev)
        print(f"ahc_labels N={n_run}: host {th:.1f}s vs device-front "
              f"{td:.1f}s ({th / td:.1f}x); labels identical: {same} "
              f"(clusters {len(np.unique(lab_host))})", flush=True)
        if not same:
            print("WARNING: device front-half labels diverged from host",
                  flush=True)


if __name__ == "__main__":
    main()
