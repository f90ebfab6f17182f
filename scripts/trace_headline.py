"""Capture a jax.profiler trace of the headline bench workload on the real
chip and report MEASURED per-op device times (VERDICT r1 #8: replace the
arithmetic roofline estimate with profiler numbers).

Runs the exact bench.py workload (ES2005a through the production init
chain, B-recording batch, fused pallas_bf16 engine), captures one traced
chain, then parses the TensorBoard trace-event JSON the profiler writes
(plugins/profile/<run>/*.trace.json.gz) and aggregates device-stream op
durations. From the fused forward-backward kernel's measured time and its
known HBM byte traffic it derives achieved bandwidth vs the v5e peak
(819 GB/s).

    VBX_TPU_TRACE_DIR=bench_artifacts/trace timeout 560 \
        python scripts/trace_headline.py [B] [fb_impl]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
FB = sys.argv[2] if len(sys.argv) > 2 else "pallas_bf16"


def main():
    from bench import _device_preflight, prepare_inputs

    log_dir = os.environ.get("VBX_TPU_TRACE_DIR", "bench_artifacts/trace")
    if not _device_preflight():
        print("chip preflight failed; a CPU trace would not measure HBM",
              file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp

    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.vbhmm import vbx_batched
    from vbx_tpu.utils.profiling import trace

    cfg = get_preset("example")
    hp = dict(loop_prob=cfg.vb.loop_prob, Fa=cfg.vb.Fa, Fb=cfg.vb.Fb,
              max_iters=cfg.vb.max_iters, epsilon=cfg.vb.epsilon)
    fea, phi, qinit = prepare_inputs(cfg)
    T, S = qinit.shape
    D = fea.shape[1]
    X = jnp.asarray(np.broadcast_to(fea, (B, T, D)), jnp.float32)
    G = jnp.asarray(np.broadcast_to(qinit, (B, T, S)), jnp.float32)
    PI = jnp.full((B, S), 1.0 / S, jnp.float32)
    FM = jnp.ones((B, T), bool)
    SM = jnp.ones((B, S), bool)
    phi32 = jnp.asarray(phi, jnp.float32)

    def run(g):
        return vbx_batched(X, phi32, g, PI, FM, SM, fb_impl=FB, **hp)

    r = run(G)                                   # compile
    iters = int(np.max(np.asarray(r.n_iters)))
    print(f"workload: B={B} T={T} S={S} D={D} fb_impl={FB} iters={iters}",
          file=sys.stderr)

    with trace(log_dir):
        g = G
        for _ in range(3):
            rr = run(g)
            g = G + rr.gamma[0, 0, 0] * jnp.float32(0.0)
        np.asarray(rr.n_iters[0])                # fetch forces completion

    files = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not files:
        print(f"no trace written under {log_dir}", file=sys.stderr)
        return 1
    path = files[-1]
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]

    # device-stream complete events (ph == 'X'); aggregate by op name
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    per_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        per_op[e.get("name", "?")] += e["dur"]   # microseconds
        total += e["dur"]
    if not dev_pids:
        print("WARNING: no device process identified in the trace; "
              "aggregating ALL events (host spans may double-count)",
              file=sys.stderr)
    # the trace nests spans (executable > while-loop > kernel): report
    # against the EXECUTABLE total, not the double-counting flat sum
    exe_us = sum(us for name, us in per_op.items() if name.startswith("jit"))
    if exe_us <= 0:
        # op naming varies across jax/libtpu versions; never lose the
        # measurement to a ZeroDivisionError after a full chip run
        print("WARNING: no 'jit*' executable span found; using the flat "
              "event total (nested spans double-count)", file=sys.stderr)
        exe_us = max(total, 1.0)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:14]
    n_runs = 3
    print(f"\ntrace: {path}")
    print(f"executable device time: {exe_us / 1e3:.2f} ms for {n_runs} "
          f"chained batches -> {exe_us / n_runs / 1e3:.2f} ms/batch "
          f"({B * n_runs / (exe_us * 1e-6):,.0f} recordings/s measured "
          f"on-device)")
    for name, us in top:
        print(f"  {us / 1e3:9.2f} ms {us / exe_us * 100:6.1f}%  {name[:80]}")

    # achieved HBM bandwidth of the fused FB kernel. Its streams per EM
    # iteration (ops/fb_pallas.fb_scan_pallas_sb, [T, S_pad, B_pad]
    # layout): w read by BOTH the forward and backward grid passes, ahat
    # and bhat written once each = 4 x T x Sp x Bp x itemsize.
    fb_us = sum(us for name, us in per_op.items() if "fb_scan" in name)
    if fb_us:
        itemsize = 2 if FB.endswith("bf16") else 4
        sp = -(-S // (16 if itemsize == 2 else 8)) * (16 if itemsize == 2
                                                      else 8)
        bp = -(-B // 128) * 128
        bytes_per_iter = 4 * T * sp * bp * itemsize
        gbs = bytes_per_iter * iters * n_runs / (fb_us * 1e-6) / 1e9
        print(f"\nfused FB kernel: {fb_us / 1e3:.2f} ms measured "
              f"({fb_us / exe_us * 100:.0f}% of executable) -> "
              f"{gbs:.0f} GB/s achieved ({gbs / 819 * 100:.0f}% of v5e "
              f"819 GB/s HBM peak; byte model: 2x w-read + ahat + bhat, "
              f"[T={T}, Sp={sp}, Bp={bp}] x {itemsize} B x {iters} iters)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
