"""Serving load test: requests/s and latency percentiles for the warm
daemon under concurrent load.

Drives DiarizationService in-process (the HTTP layer adds only JSON/socket
overhead) with the golden ES2005a x-vectors as the request body: N total
requests from K client threads against one device. Wall time is trusted
because every request's result is fetched to host bytes inside the
dispatcher (tunnel completion-ack caveat, BENCHMARKS.md).

    timeout 590 python scripts/serving_bench.py [N] [K] [fb_impl] \
        [--partial-ms X] [--ahc-device] [--no-bucket-warmup] [--ab]

--ab: same-process ABBA (partial launches off/on/on/off, N requests per
phase) — the only tunnel-state-comparable way to A/B the head-of-line
bound; BENCHMARKS.md's partial-launch numbers come from this mode.

--partial-ms: head-of-line bound for partial chunk launches (service
default 50; inf = round-2 wait-for-cohort behavior, for A/B).
--ahc-device: run the N x N AHC similarity on the accelerator
(AHCConfig.compute_backend='device'; opt-in, labels may differ at tied
merges so the golden warmup guard reports rather than asserts).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

args = sys.argv[1:]
PARTIAL_MS = 50.0
AB = "--ab" in args
args = [a for a in args if a != "--ab"]
ENGINES = "--engines" in args
args = [a for a in args if a != "--engines"]
if "--partial-ms" in args:
    i = args.index("--partial-ms")
    PARTIAL_MS = float(args[i + 1])
    del args[i:i + 2]
AHC_DEVICE = "--ahc-device" in args
args = [a for a in args if a != "--ahc-device"]
BUCKET_WARMUP = "--no-bucket-warmup" not in args
args = [a for a in args if a != "--no-bucket-warmup"]
N = int(args[0]) if len(args) > 0 else 256
K = int(args[1]) if len(args) > 1 else 16
# default: exercise the SHIPPED serving default (fb_impl=None resolves
# inside DiarizationService — round-5 engine-of-record); pass an explicit
# engine name to pin one
FB = args[2] if len(args) > 2 else None
REF = "/root/reference"


def _stage_attribution(runlog_path, label=""):
    """Per-stage latency breakdown from the service runlog: init (submit ->
    host init done), queued (init done -> device launch), device+fetch
    (launch -> result). Printed at p50/p95 so a tail is root-caused in the
    artifact itself (round-3's 1.9 s residual took a manual re-run with
    the runlog enabled to attribute)."""
    import json

    try:
        with open(runlog_path) as f:
            recs = [json.loads(ln) for ln in f if ln.strip()]
    except OSError:
        return
    rows = [(r["wall_ms"], r.get("init_done_ms"), r.get("launched_ms"))
            for r in recs if r.get("event") == "request"
            and not str(r.get("recording", "")).startswith("__warmup")]
    rows = [(w, i, la) for w, i, la in rows
            if i is not None and la is not None]
    if not rows:
        return
    arr = np.asarray(rows, np.float64)
    init, queued, device = (arr[:, 1], arr[:, 2] - arr[:, 1],
                            arr[:, 0] - arr[:, 2])

    def pct(x, q):
        return float(np.sort(x)[int(len(x) * q)])

    print(f"{label}stage attribution (p50/p95 ms): "
          f"init {pct(init, .5):.0f}/{pct(init, .95):.0f}, "
          f"queued {pct(queued, .5):.0f}/{pct(queued, .95):.0f}, "
          f"device+fetch {pct(device, .5):.0f}/{pct(device, .95):.0f} "
          f"({len(rows)} requests)", flush=True)


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
    if (jax.default_backend() == "cpu" and FB is not None
            and FB.startswith("pallas")):
        # the pallas kernels only run interpreted on CPU — orders of
        # magnitude slower; the structured engine is the CPU path
        fb = "structured"
    print(f"device: {jax.devices()[0]}  N={N} clients={K} fb_impl={fb} "
          f"partial_ms={PARTIAL_MS} ahc_device={AHC_DEVICE}",
          file=sys.stderr, flush=True)
    _, _, x_raw = next(group_by_recording(
        iter_vec_ark(f"{REF}/exp/ES2005a.ark")))
    _, times = read_xvector_timing_dict(f"{REF}/exp/ES2005a.seg")["ES2005a"]

    cfg = get_preset("example")
    if AHC_DEVICE:
        import dataclasses
        cfg = cfg.replace(ahc=dataclasses.replace(
            cfg.ahc, compute_backend="device"))

    def run_phase(partial_ms, n, label="", cfg_run=None, fb_run="unset"):
        import tempfile

        runlog_path = os.environ.get("VBX_TPU_SERVE_RUNLOG")
        if not runlog_path:
            # always keep a runlog: the stage attribution below is how a
            # tail gets root-caused (init vs queue vs device) without a
            # re-run — VERDICT r3 #5 wants the battery itself to carry it
            runlog_path = os.path.join(tempfile.mkdtemp(), "serve.jsonl")
        svc = DiarizationService.from_files(
            cfg if cfg_run is None else cfg_run,
            f"{REF}/VBx/models/ResNet101_16kHz/plda",
            f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
            fb_impl=fb if fb_run == "unset" else fb_run,
            partial_after_ms=partial_ms,
            runlog_path=runlog_path)
        try:
            r = svc.diarize("warmup", x_raw, times, timeout=600)  # compile
            if AHC_DEVICE:
                # device-dtype scores can legitimately shift tied merges;
                # report instead of asserting the golden count
                print(f"warmup speakers={r.n_speakers} (golden host "
                      f"path: 5)", file=sys.stderr, flush=True)
            else:
                assert r.n_speakers == 5, r.n_speakers  # golden guard
            print(f"warmup: {r.wall_ms:.0f} ms (compile included), "
                  f"{r.n_speakers} speakers", file=sys.stderr, flush=True)
            if BUCKET_WARMUP:
                # warm every power-of-two batch bucket the load will ride
                # with the REAL request body; warmup() suspends partial
                # launches so each wave loads exactly its padded-B
                # executable (a split wave would skip it and the first
                # real cohort would pay seconds of device load)
                t0 = time.perf_counter()
                svc.warmup(batch_sizes=(2, 4, 8, 16),
                           payload=(x_raw, times))
                print(f"bucket warmup (B=2..16): "
                      f"{time.perf_counter() - t0:.1f}s",
                      file=sys.stderr, flush=True)

            lat = []

            def one(i):
                res = svc.diarize(f"req{i}", x_raw, times, timeout=600)
                lat.append(res.wall_ms)
                return res.batch_size

            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=K) as pool:
                sizes = list(pool.map(one, range(n)))
            wall = time.perf_counter() - t0
            stats = svc.stats()
        finally:
            svc.close()

        lat = np.sort(np.asarray(lat))
        print(f"{label}served {n} requests in {wall:.2f}s -> "
              f"{n / wall:.1f} req/s; "
              f"latency p50={lat[len(lat) // 2]:.0f}ms "
              f"p95={lat[int(len(lat) * 0.95)]:.0f}ms "
              f"p99={lat[int(len(lat) * 0.99)]:.0f}ms; "
              f"mean device batch={np.mean(sizes):.1f} "
              f"(batches={stats['batches']}, "
              f"max_batch={stats['max_batch']})", flush=True)
        _stage_attribution(runlog_path, label)
        return n / wall, lat[int(len(lat) * 0.95)]


    if AB:
        # same-process ABBA: partial launches off/on/on/off — the only
        # trustworthy comparison on the tunnel (state swings run-to-run)
        inf = float("inf")
        a1 = run_phase(inf, N, "[A: partial off] ")
        b1 = run_phase(PARTIAL_MS, N, f"[B: partial {PARTIAL_MS}ms] ")
        b2 = run_phase(PARTIAL_MS, N, f"[B: partial {PARTIAL_MS}ms] ")
        a2 = run_phase(inf, N, "[A: partial off] ")
        print(f"A/B p95: off {min(a1[1], a2[1]):.0f}ms vs "
              f"partial {min(b1[1], b2[1]):.0f}ms; req/s: off "
              f"{max(a1[0], a2[0]):.1f} vs partial "
              f"{max(b1[0], b2[0]):.1f} (best of 2 each)", flush=True)
    elif ENGINES:
        # engine-of-record A/B (VERDICT r4 #5): which engine should a
        # serving daemon DEFAULT to? The corpus default (bf16 run-to-max,
        # 40 iters) optimizes batch throughput; a single request converges
        # in 6-8 f32 iterations, so it is the wrong latency choice. Phases
        # run same-process (fresh service each) in a mirrored sequence so
        # tunnel drift cancels: f32 / bf16-max / bf16-cap12 / bf16-cap12 /
        # bf16-max / f32.
        import dataclasses

        cfg12 = cfg.replace(vb=dataclasses.replace(cfg.vb, max_iters=12))
        phases = [("pallas_f32", cfg, "pallas"),
                  ("bf16_run_to_max", cfg, "pallas_bf16"),
                  ("bf16_cap12", cfg12, "pallas_bf16")]
        res = {}
        for name, c, f in phases + phases[::-1]:
            r = run_phase(PARTIAL_MS, N, f"[{name}] ", cfg_run=c, fb_run=f)
            res.setdefault(name, []).append(r)
        for name, rs in res.items():
            print(f"engine {name}: best req/s "
                  f"{max(r[0] for r in rs):.1f}, best p95 "
                  f"{min(r[1] for r in rs):.0f}ms", flush=True)
    else:
        run_phase(PARTIAL_MS, N)


if __name__ == "__main__":
    main()
