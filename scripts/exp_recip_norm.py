"""Same-process chained A/B: fused sb kernel normalization by broadcast
divide (current) vs narrow reciprocal-multiply (recip=True). Decides
whether the per-step dependent divide is worth replacing.

    timeout 590 python scripts/exp_recip_norm.py [B] [T] [S]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1025
S = int(sys.argv[3]) if len(sys.argv) > 3 else 31
K1, K2 = 2, 12
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.ops.fb_pallas import fb_scan_pallas_sb

    print(f"device: {jax.devices()[0]}  B={B} T={T} S={S}", flush=True)
    rng = np.random.default_rng(0)

    logp = rng.normal(size=(T, S, B)).astype(np.float32)
    w = jnp.asarray(np.exp(logp - logp.max(1, keepdims=True)))
    valid = jnp.ones((T, B), jnp.float32)
    pi = rng.dirichlet(np.ones(S), size=B).astype(np.float32).T  # [S, B]
    col = jnp.asarray(0.1 * pi + 1e-8)
    pinit = jnp.asarray(pi + 1e-8)

    # calibration matmul (ack reliability; see chain_bench.py)
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

    def run(recip, w_in):
        a, b, c = fb_scan_pallas_sb(w_in, valid, col, pinit, 0.9,
                                    recip=recip)
        return a

    def chain(recip, k):
        w_in = w
        t0 = time.perf_counter()
        a = None
        for _ in range(k):
            a = run(recip, w_in)
            w_in = w + a[0, 0, 0] * jnp.float32(0.0)   # serialize
        _ = np.asarray(a[0, 0, 0])                     # fetch forces done
        return time.perf_counter() - t0

    for recip in (False, True):
        t0 = time.perf_counter()
        chain(recip, 1)
        print(f"  compile recip={recip}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    # numerical agreement
    g0 = np.asarray(run(False, w))
    g1 = np.asarray(run(True, w))
    print(f"ahat maxdiff: {np.abs(g0 - g1).max():.2e}", flush=True)

    slopes = {False: [], True: []}
    for rep in range(REPS):
        for recip in (False, True):
            t1 = chain(recip, K1)
            t2 = chain(recip, K2)
            slope = (t2 - t1) / (K2 - K1)
            slopes[recip].append(slope)
    for recip in (False, True):
        ms = sorted(slopes[recip])
        print(f"recip={recip}: median {ms[REPS // 2] * 1e3:.3f} ms/call "
              f"(all {[round(x * 1e3, 3) for x in ms]})", flush=True)


if __name__ == "__main__":
    main()
