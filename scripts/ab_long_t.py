"""Same-process chained A/B of the single-recording smoother variants at
long T (the long-recording story: sequential structured scan vs the
work-parallel associative scan), full VB EM at fixed iterations.

    timeout 590 python scripts/ab_long_t.py [T] [S] [ITERS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
D = 128
K1, K2 = 1, 6
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.engine.vbhmm import vbx

    print(f"device: {jax.devices()[0]}  T={T} S={S} iters={ITERS}",
          flush=True)
    rng = np.random.default_rng(0)

    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32) * 1e-4)
    mm = jax.jit(lambda a, c: a @ c)

    def chain_mm(k):
        c = A
        t0 = time.perf_counter()
        for _ in range(k):
            c = mm(A, c)
        _ = np.asarray(c[0, 0])
        return time.perf_counter() - t0

    chain_mm(2)
    tmm = (chain_mm(22) - chain_mm(2)) / 20
    print(f"calib matmul 4096^3: {2 * 4096**3 / tmm / 1e12:.1f} TFLOP/s",
          flush=True)

    X = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    phi = jnp.asarray(np.linspace(2.0, 0.1, D).astype(np.float32))
    G = jnp.asarray(rng.dirichlet(np.ones(S), size=T).astype(np.float32))
    PI = jnp.full((S,), 1.0 / S, jnp.float32)

    def run(impl, g_in):
        return vbx(X, phi, pi=PI, gamma=g_in, loop_prob=0.9, Fa=0.3,
                   Fb=17.0, max_iters=ITERS, epsilon=-1.0, fb_impl=impl)

    def chain(impl, k):
        g = G
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = run(impl, g)
            g = G + r.gamma[0, 0] * jnp.float32(0.0)
        _ = np.asarray(r.elbo)
        return time.perf_counter() - t0

    impls = ("structured", "assoc")
    for impl in impls:
        t0 = time.perf_counter()
        chain(impl, 1)
        print(f"  compile {impl}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    g_a = np.asarray(run("structured", G).gamma)
    g_b = np.asarray(run("assoc", G).gamma)
    print(f"gamma maxdiff structured vs assoc: {np.abs(g_a - g_b).max():.2e}",
          flush=True)

    slopes = {i: [] for i in impls}
    for _ in range(REPS):
        for impl in impls:
            t1 = chain(impl, K1)
            t2 = chain(impl, K2)
            slopes[impl].append((t2 - t1) / (K2 - K1))
    for impl in impls:
        ms = sorted(slopes[impl])
        print(f"{impl}: median {ms[REPS // 2] * 1e3:.1f} ms/EM-run "
              f"({ms[REPS // 2] / ITERS * 1e3:.2f} ms/iter; "
              f"all {[round(x * 1e3, 1) for x in ms]})", flush=True)


if __name__ == "__main__":
    main()
