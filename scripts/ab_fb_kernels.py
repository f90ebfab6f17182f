"""Interleaved same-process A/B of the forward-backward implementations on
the real chip (kernel-level and full-EM-level). Tunnel timings swing ~100x
BETWEEN processes, so only within-process interleaved medians are
meaningful (see BENCHMARKS.md).

    timeout 590 python scripts/ab_fb_kernels.py [B] [T] [S]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1025
S = int(sys.argv[3]) if len(sys.argv) > 3 else 31
D = 128
REPS = 7


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.ops.fb_pallas import fb_scan_pallas
    from vbx_tpu.engine.vbhmm import vbx_batched

    print(f"device: {jax.devices()[0]}  B={B} T={T} S={S}", flush=True)
    rng = np.random.default_rng(0)

    # Ack-reliability calibration (see chain_bench.py / BENCHMARKS.md): in
    # the tunnel's "fast" state block_until_ready returns before execution
    # finishes and every timing below would be dispatch latency. Time a
    # known-FLOPs matmul the same way; an impossible implied rate flags it.
    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32) * 1e-4)
    mm = jax.jit(lambda a: a @ a)
    jax.block_until_ready(mm(A))                 # compile+warm
    t0 = time.perf_counter()
    for _ in range(4):
        jax.block_until_ready(mm(A))
    tmm = (time.perf_counter() - t0) / 4
    tflops = 2 * 4096**3 / tmm / 1e12
    print(f"calib matmul 4096^3 f32: {tmm * 1e3:.2f} ms -> "
          f"{tflops:.1f} TFLOP/s", flush=True)
    if tflops > 400:                             # > any v5e peak: acks lie
        print("WARNING: implied calib rate exceeds hardware peak — "
              "completion acks are unreliable in this process state; "
              "ALL timings below may be dispatch latency, not kernel time. "
              "Re-run, or trust only chained measurements (chain_bench.py).",
              flush=True)

    # ---- kernel level ----
    logp = rng.normal(size=(T, B, S)).astype(np.float32)
    m = logp.max(-1)
    w = jnp.asarray(np.exp(logp - m[..., None]))
    valid = jnp.ones((T, B), jnp.float32)
    pi = rng.dirichlet(np.ones(S), size=B).astype(np.float32)
    col = jnp.asarray(0.1 * pi + 1e-8)
    pinit = jnp.asarray(pi + 1e-8)

    def run_kernel(fused):
        r = fb_scan_pallas(w, valid, col, pinit, 0.9, fused=fused)
        jax.block_until_ready(r)
        return r

    for fused in (True, False):
        t0 = time.perf_counter()
        run_kernel(fused)
        print(f"  compile fused={fused}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    times = {True: [], False: []}
    for _ in range(REPS):
        for fused in (True, False):
            t0 = time.perf_counter()
            run_kernel(fused)
            times[fused].append(time.perf_counter() - t0)
    for fused in (True, False):
        med = sorted(times[fused])[REPS // 2]
        print(f"kernel fused={fused}: median {med * 1e3:.2f}ms  "
              f"(all {[round(x * 1e3, 2) for x in sorted(times[fused])]})",
              flush=True)

    # numerical check fused vs two-pass
    a1, b1, c1 = run_kernel(True)
    a2, b2, c2 = run_kernel(False)
    g1 = np.asarray(a1 * b1 / jnp.sum(a1 * b1, -1, keepdims=True))
    g2 = np.asarray(a2 * b2 / jnp.sum(a2 * b2, -1, keepdims=True))
    print(f"gamma maxdiff fused vs two-pass: {np.abs(g1 - g2).max():.2e}  "
          f"log-normalizer maxdiff: "
          f"{np.abs(np.log(np.asarray(c1)) - np.log(np.asarray(c2))).max():.2e}",
          flush=True)

    # ---- full EM level ----
    X = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    phi = jnp.asarray(np.linspace(2.0, 0.1, D).astype(np.float32))
    g0 = rng.dirichlet(np.ones(S), size=(B, T)).astype(np.float32)
    G = jnp.asarray(g0)
    PI = jnp.full((B, S), 1.0 / S, jnp.float32)
    FM = jnp.ones((B, T), bool)
    SM = jnp.ones((B, S), bool)
    kw = dict(loop_prob=0.9, Fa=0.3, Fb=17.0, max_iters=10, epsilon=-1.0)

    def run_em(impl):
        r = vbx_batched(X, phi, G, PI, FM, SM, fb_impl=impl, **kw)
        jax.block_until_ready(r.gamma)
        return r

    for impl in ("pallas", "structured"):
        t0 = time.perf_counter()
        run_em(impl)
        print(f"  compile EM {impl}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    em_times = {"pallas": [], "structured": []}
    for _ in range(REPS):
        for impl in ("pallas", "structured"):
            t0 = time.perf_counter()
            run_em(impl)
            em_times[impl].append(time.perf_counter() - t0)
    for impl in ("pallas", "structured"):
        med = sorted(em_times[impl])[REPS // 2]
        print(f"EM(10 iters) {impl}: median {med * 1e3:.1f}ms  "
              f"(all {[round(x * 1e3, 1) for x in sorted(em_times[impl])]})",
              flush=True)


if __name__ == "__main__":
    main()
