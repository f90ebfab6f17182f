"""Fetch-forced chained throughput measurement.

The tunnel's completion acks are unreliable in its 'fast' state
(block_until_ready can return before device execution finishes; measured
impossible numbers like 12 PFLOP/s). This harness defeats that by
(1) CHAINING K executions through a device-side data dependency (run k+1
consumes run k's output), and (2) ending with a host FETCH of result
bytes, which cannot complete early. Per-run device time is then the slope
(wall(K2) - wall(K1)) / (K2 - K1), with all dispatch overheads cancelled.

    timeout 590 python scripts/chain_bench.py [B] [iters] [impl,impl,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
T, S, D = 1025, 31, 128
K1, K2 = 2, 12


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.engine.vbhmm import vbx_batched

    print(f"device: {jax.devices()[0]}  B={B} T={T} S={S} D={D} "
          f"max_iters={ITERS}", flush=True)
    rng = np.random.default_rng(0)
    fea = rng.normal(size=(T, D)).astype(np.float32)
    phi = jnp.asarray(np.linspace(2.0, 0.1, D).astype(np.float32))
    q = rng.dirichlet(np.ones(S), size=T).astype(np.float32)
    X = jnp.asarray(np.broadcast_to(fea, (B, T, D)))
    G0 = jnp.asarray(np.broadcast_to(q, (B, T, S)))
    PI = jnp.full((B, S), 1.0 / S, jnp.float32)
    FM = jnp.ones((B, T), bool)
    SM = jnp.ones((B, S), bool)

    # calibration: chained 8k x 8k matmuls, known FLOPs
    A = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32) * 1e-4)
    mm = jax.jit(lambda a, c: a @ c)

    def chain_mm(k):
        c = A
        t0 = time.perf_counter()
        for _ in range(k):
            c = mm(A, c)
        _ = np.asarray(c[0, 0])
        return time.perf_counter() - t0

    chain_mm(2)  # compile+warm
    tmm = (chain_mm(22) - chain_mm(2)) / 20
    print(f"calib matmul 8192^3 f32: {tmm * 1e3:.2f} ms/op -> "
          f"{2 * 8192**3 / tmm / 1e12:.1f} TFLOP/s", flush=True)

    impls = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ("structured", "pallas", "pallas_bf16"))
    for impl in impls:
        def em(g):
            r = vbx_batched(X, phi, g, PI, FM, SM, loop_prob=0.99,
                            Fa=0.3, Fb=17.0, max_iters=ITERS,
                            epsilon=-1.0, fb_impl=impl)
            # renormalize so the chained input stays a valid q
            g2 = r.gamma + 1e-6
            return g2 / jnp.sum(g2, axis=-1, keepdims=True)

        def chain(k):
            g = G0
            t0 = time.perf_counter()
            for _ in range(k):
                g = em(g)
            _ = np.asarray(g[0, 0, 0])
            return time.perf_counter() - t0

        chain(1)  # compile+warm
        t1 = min(chain(K1) for _ in range(3))
        t2 = min(chain(K2) for _ in range(3))
        per_run = (t2 - t1) / (K2 - K1)
        per_iter = per_run / ITERS
        print(f"EM {impl:11s}: {per_run * 1e3:7.2f} ms/run "
              f"({per_iter * 1e3:6.3f} ms/iter) -> "
              f"{B / per_run:9.0f} rec/s at {ITERS} iters "
              f"[chain{K1}={t1 * 1e3:.1f}ms chain{K2}={t2 * 1e3:.1f}ms]",
              flush=True)


if __name__ == "__main__":
    main()
