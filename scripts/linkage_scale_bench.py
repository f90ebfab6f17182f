"""Long-recording AHC front-half scaling: blocked cosine + binned
calibration + native NN-chain linkage + flat cut at N = 10k/20k/50k
x-vectors (a 0.24 s hop puts an hour-long meeting at N ~ 15k; multi-hour
DIHARD-style files reach N ~ 50k).

The reference's own answer to this regime is to skip AHC entirely
(README.md:24 suggests the random_<number> init for >30-min files); this
harness measures where that crossover actually sits for OUR AHC stack so
the guidance in BENCHMARKS.md is grounded in numbers, not folklore.

    timeout 560 python scripts/linkage_scale_bench.py [N ...]
    timeout 560 python scripts/linkage_scale_bench.py --ondemand [N ...]

Memory note: the condensed distance matrix is N(N-1)/2 float64 — 10 GB at
N=50k. The blocked cosine path never materializes the square matrix, so
peak RSS is condensed + one row block. --ondemand instead runs the round-3
cluster-sums linkage (clustering.linkage_dot_avg, O(N*D) memory — no
condensed buffer at all) with the histogram-only calibration sweep.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from vbx_tpu.clustering import (fcluster_by_distance, linkage,
                                    linkage_dot_avg)
    from vbx_tpu.engine import ahc

    args = sys.argv[1:]
    ondemand = "--ondemand" in args
    args = [a for a in args if a != "--ondemand"]
    sizes = [int(a) for a in args] or [10_000, 20_000, 50_000]
    rng = np.random.default_rng(0)
    for N in sizes:
        K = 8
        centers = rng.standard_normal((K, 128))
        z = rng.integers(0, K, N)
        x = centers[z] + 0.8 * rng.standard_normal((N, 128))
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)

        t0 = time.perf_counter()
        cond, thr = ahc._blocked_cosine_condensed_and_thr(
            xn, want_condensed=not ondemand)
        t_front = time.perf_counter() - t0

        t0 = time.perf_counter()
        if ondemand:
            Z = linkage_dot_avg(xn, backend="native")
        else:
            Z = linkage(cond, method="average")
        t_link = time.perf_counter() - t0
        del cond

        adjust = abs(Z[:, 2].min())
        Z[:, 2] += adjust
        t0 = time.perf_counter()
        labels = fcluster_by_distance(Z, -(thr + (-0.015)) + adjust)
        t_cut = time.perf_counter() - t0
        total = t_front + t_link + t_cut
        gb = (N * 128 * 8 * 2 if ondemand else N * (N - 1) / 2 * 8) / 1e9
        mode = "ondemand(O(N*D))" if ondemand else "condensed"
        print(f"N={N} [{mode}]: cosine+calib {t_front:.1f}s, "
              f"linkage {t_link:.1f}s, cut {t_cut:.2f}s -> TOTAL {total:.1f}s "
              f"({len(np.unique(labels))} clusters, buffers {gb:.2f} GB)",
              flush=True)


if __name__ == "__main__":
    main()
