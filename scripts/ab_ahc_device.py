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

    # full front half (calibration + linkage + cut) at a labels-checkable
    # size: identical labels is the contract (tests/test_ahc.py pins it on
    # CPU; this re-checks on the real chip)
    from vbx_tpu.engine.ahc import ahc_labels

    n_small = min(N, 8000)
    xs = xn[:n_small]
    t0 = time.perf_counter()
    lab_host = ahc_labels(xs, 0.0, compute_backend="host")
    th = time.perf_counter() - t0
    t0 = time.perf_counter()
    lab_dev = ahc_labels(xs, 0.0, compute_backend="device")
    td = time.perf_counter() - t0
    same = np.array_equal(lab_host, lab_dev)
    print(f"ahc_labels N={n_small}: host {th:.1f}s vs device-front "
          f"{td:.1f}s; labels identical: {same} "
          f"(clusters {len(np.unique(lab_host))})", flush=True)
    if not same:
        print("WARNING: device front-half labels diverged from host",
              flush=True)


if __name__ == "__main__":
    main()
