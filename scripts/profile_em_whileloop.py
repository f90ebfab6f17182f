"""Calibrate chip timing with known-cost ops, then isolate where the full
EM's per-iteration time goes: body-only vs while_loop(N) slope.

    timeout 590 python scripts/profile_em_whileloop.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B, T, S, D = 256, 1025, 31, 128
REPS = 5


def med_time(fn, *args):
    import jax
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[REPS // 2]


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.engine.vbhmm import vbx_batched

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # --- calibration: known-cost ops ---
    a = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32))
    t = med_time(jax.jit(lambda x: x @ x), a)
    print(f"calib matmul 8192^3 (1.1 TFLOP): {t * 1e3:.2f} ms "
          f"-> {1.1 / t / 1e3:.1f} TFLOP/s", flush=True)
    big = jnp.asarray(rng.normal(size=(256 * 1024 * 1024 // 4,))
                      .astype(np.float32))          # 256 MB
    t = med_time(jax.jit(lambda x: x * 1.000001), big)
    print(f"calib 256MB elementwise (512MB traffic): {t * 1e3:.2f} ms "
          f"-> {0.5 / t:.0f} GB/s", flush=True)

    # --- EM scaling in max_iters (epsilon<0 disables convergence) ---
    X = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    phi = jnp.asarray(np.linspace(2.0, 0.1, D).astype(np.float32))
    G = jnp.asarray(rng.dirichlet(np.ones(S), size=(B, T)).astype(np.float32))
    PI = jnp.full((B, S), 1.0 / S, jnp.float32)
    FM = jnp.ones((B, T), bool)
    SM = jnp.ones((B, S), bool)

    for impl in ("pallas", "structured"):
        for n in (1, 2, 5, 10):
            fn = jax.jit(lambda X, G, PI, n=n, impl=impl: vbx_batched(
                X, phi, G, PI, FM, SM, loop_prob=0.9, Fa=0.3, Fb=17.0,
                max_iters=n, epsilon=-1.0, fb_impl=impl).gamma)
            t = med_time(fn, X, G, PI)
            print(f"EM {impl:11s} max_iters={n:2d}: {t * 1e3:7.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
