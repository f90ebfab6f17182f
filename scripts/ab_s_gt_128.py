"""S > 128 engine pricing, measured (VERDICT r2 #8 / r4 #9). Since
round 5 the solo sb kernel accepts S up to 256 (speakers are SUBLANE
tiles, not lanes); past 256 the engine falls back to the structured XLA
engine with a UserWarning. No reference corpus exceeds ~40 speakers
(AMI meetings are 4-5; DIHARD2 peaks in the 20s; the golden ES2005a AHC
init is 31), so this regime is outside diarization's envelope — this
harness prices it anyway so the decision is a number, not a warning.

Same-process A/B on one chip (chained fetch-forced slopes, forced-iteration
EM so convergence can't truncate a configuration early):
  S=128 pallas vs S=128 structured   -> what the kernel is worth in-range
  S=160/256 pallas vs S=256 structured -> the round-5 extended range
  + an S=160 label-agreement spot-check vs the structured engine

    timeout 560 python scripts/ab_s_gt_128.py [T] [B] [iters]
"""

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.engine.vbhmm import vbx_batched

    print(f"device: {jax.devices()[0]}  T={T} B={B} iters={ITERS} (forced)",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    D = 128

    def make(S):
        K = min(S, 32)
        C = rng.standard_normal((K, D))
        z = rng.integers(0, K, T)
        X = (C[z] + 0.6 * rng.standard_normal((T, D))).astype(np.float32)
        G = rng.dirichlet(np.ones(S), size=T).astype(np.float32)
        Xb = jnp.asarray(np.broadcast_to(X, (B, T, D)))
        Gb = jnp.asarray(np.broadcast_to(G, (B, T, S)))
        PI = jnp.full((B, S), 1.0 / S, jnp.float32)
        FM = jnp.ones((B, T), bool)
        SM = jnp.ones((B, S), bool)
        phi = jnp.asarray(np.abs(rng.standard_normal(D)) + 0.5, jnp.float32)
        return Xb, phi, Gb, PI, FM, SM

    def bench(S, fb_impl):
        Xb, phi, Gb, PI, FM, SM = make(S)

        def run(g):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")   # the S>128 fallback warn
                return vbx_batched(Xb, phi, g, PI, FM, SM, loop_prob=0.9,
                                   Fa=0.3, Fb=17.0, max_iters=ITERS,
                                   epsilon=0.0, fb_impl=fb_impl)

        def chain(k):
            g = Gb
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = run(g)
                g = Gb + r.gamma[0, 0, 0] * jnp.float32(0.0)
            np.asarray(r.n_iters[0])
            return time.perf_counter() - t0

        chain(1)                        # compile
        chain(2)                        # shed slow-start
        t1 = min(chain(1) for _ in range(3))
        t2 = min(chain(5) for _ in range(3))
        t = (t2 - t1) / 4 if t2 > t1 else t2 / 5
        print(f"S={S:4d} fb_impl={fb_impl or 'structured':12s}: "
              f"{t * 1e3:8.1f} ms/EM-run ({t / ITERS * 1e3:6.2f} ms/iter, "
              f"B={B}, T={T})", flush=True)
        return t

    t128_p = bench(128, "pallas_bf16")
    t128_s = bench(128, "structured")
    t256_s = bench(256, "structured")
    # round 5: the sb kernel's cap is 256 (speakers are SUBLANE tiles);
    # price the extended range directly + a correctness spot-check
    t256_p = bench(256, "pallas_bf16")
    t160_p = bench(160, "pallas_bf16")
    print(f"\nkernel speedup in-range (S=128): {t128_s / t128_p:.1f}x\n"
          f"extended range (round 5): S=256 pallas {t256_p * 1e3:.0f} ms "
          f"vs S=256 structured {t256_s * 1e3:.0f} ms "
          f"({t256_s / t256_p:.1f}x); S=160 pallas {t160_p * 1e3:.0f} ms "
          f"— for speaker counts no diarization corpus reaches",
          flush=True)

    # label agreement at S=160 vs structured (tolerance contract)
    Xb, phi, Gb, PI, FM, SM = make(160)
    kw = dict(loop_prob=0.9, Fa=0.3, Fb=17.0, max_iters=5, epsilon=0.0)
    rp = vbx_batched(Xb, phi, Gb, PI, FM, SM, fb_impl="pallas_bf16", **kw)
    rs = vbx_batched(Xb, phi, Gb, PI, FM, SM, fb_impl="structured", **kw)
    agree = float(np.mean(np.asarray(rp.gamma[0]).argmax(-1)
                          == np.asarray(rs.gamma[0]).argmax(-1)))
    print(f"S=160 pallas vs structured label agreement: {agree:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
