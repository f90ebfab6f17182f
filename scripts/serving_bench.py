"""Serving load test: requests/s and latency percentiles for the warm
daemon under concurrent load.

Drives DiarizationService in-process (the HTTP layer adds only JSON/socket
overhead) with the golden ES2005a x-vectors as the request body: N total
requests from K client threads against one device. Wall time is trusted
because every request's result is fetched to host bytes inside the
dispatcher (tunnel completion-ack caveat, BENCHMARKS.md).

    timeout 590 python scripts/serving_bench.py [N] [K] [fb_impl]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FB = sys.argv[3] if len(sys.argv) > 3 else "pallas"
REF = "/root/reference"


def main():
    from concurrent.futures import ThreadPoolExecutor

    from bench import _device_preflight   # subprocess tiny-matmul probe

    if not _device_preflight():
        if os.environ.get("JAX_PLATFORMS") != "cpu":
            # dead/claimed tunnel chip: backend init would hang for hours
            # (CLAUDE.md); fall back to an honest CPU run like bench.py
            print("WARNING: accelerator preflight failed; re-running on "
                  "CPU", file=sys.stderr, flush=True)
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)]
                      + sys.argv[1:],
                      {**os.environ, "PALLAS_AXON_POOL_IPS": "",
                       "JAX_PLATFORMS": "cpu", "VBX_TPU_BENCH_CPU": "1"})

    import jax

    from vbx_tpu.config import get_preset
    from vbx_tpu.io.ark import group_by_recording, iter_vec_ark
    from vbx_tpu.io.segments import read_xvector_timing_dict
    from vbx_tpu.serving import DiarizationService

    fb = FB
    if jax.default_backend() == "cpu" and FB.startswith("pallas"):
        # the pallas kernels only run interpreted on CPU — orders of
        # magnitude slower; the structured engine is the CPU path
        fb = "structured"
    print(f"device: {jax.devices()[0]}  N={N} clients={K} fb_impl={fb}",
          file=sys.stderr, flush=True)
    _, _, x_raw = next(group_by_recording(
        iter_vec_ark(f"{REF}/exp/ES2005a.ark")))
    _, times = read_xvector_timing_dict(f"{REF}/exp/ES2005a.seg")["ES2005a"]

    svc = DiarizationService.from_files(
        get_preset("example"), f"{REF}/VBx/models/ResNet101_16kHz/plda",
        f"{REF}/VBx/models/ResNet101_16kHz/transform.h5", fb_impl=fb)
    try:
        r = svc.diarize("warmup", x_raw, times, timeout=600)   # compile
        assert r.n_speakers == 5, r.n_speakers   # golden quality guard
        print(f"warmup: {r.wall_ms:.0f} ms (compile included), "
              f"{r.n_speakers} speakers", file=sys.stderr, flush=True)

        lat = []

        def one(i):
            res = svc.diarize(f"req{i}", x_raw, times, timeout=600)
            lat.append(res.wall_ms)
            return res.batch_size

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=K) as pool:
            sizes = list(pool.map(one, range(N)))
        wall = time.perf_counter() - t0
        stats = svc.stats()
    finally:
        svc.close()

    lat = np.sort(np.asarray(lat))
    print(f"served {N} requests in {wall:.2f}s -> {N / wall:.1f} req/s; "
          f"latency p50={lat[len(lat) // 2]:.0f}ms "
          f"p95={lat[int(len(lat) * 0.95)]:.0f}ms "
          f"p99={lat[int(len(lat) * 0.99)]:.0f}ms; "
          f"mean device batch={np.mean(sizes):.1f} "
          f"(batches={stats['batches']}, max_batch={stats['max_batch']})",
          flush=True)


if __name__ == "__main__":
    main()
