"""Same-process chained A/B of the frame-sharded (SP) engine forms at long
T against the single-device fused kernel — the round-3 check that the
blockwise path is competitive per chip (VERDICT r2 #1: the old XLA-scan
blockwise local passes were ~48x slower per frame than the fused kernel,
so 8-way SP would LOSE to one chip).

Runs everything on however many devices are attached (mesh 1 x n_dev), so
on the single real chip it measures the K=1 two-phase overhead: the
blockwise-pallas engine adds an operator-product pass on top of the fused
vector pass. Since round 4 the operator walk is SEGMENTED (R segments as
extra kernel lanes, Tb/R steps — parallel/fb_blockwise._auto_segments),
so the measured overhead is ~1.15x, not the ~2x of the round-2 design
bound; the XLA 'structured' sharded engine is the old path.

    timeout 590 python scripts/ab_sp_blockwise.py [T] [S] [ITERS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
D = 128
K1, K2 = 1, 4
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.engine.vbhmm import vbx_batched
    from vbx_tpu.parallel import make_mesh, vbx_sharded

    n_dev = len(jax.devices())
    print(f"device: {jax.devices()[0]} x{n_dev}  T={T} S={S} iters={ITERS}",
          flush=True)
    rng = np.random.default_rng(0)
    mesh = make_mesh(n_dp=1, n_sp=n_dev)

    X = jnp.asarray(rng.normal(size=(1, T, D)).astype(np.float32))
    phi = jnp.asarray(np.linspace(2.0, 0.1, D).astype(np.float32))
    G = jnp.asarray(rng.dirichlet(np.ones(S), size=(1, T)).astype(np.float32))
    PI = jnp.full((1, S), 1.0 / S, jnp.float32)
    FM = jnp.ones((1, T), bool)
    SM = jnp.ones((1, S), bool)
    kw = dict(loop_prob=0.9, Fa=0.3, Fb=17.0, max_iters=ITERS, epsilon=-1.0)

    def run(form, g_in):
        if form.startswith("solo_"):
            return vbx_batched(X, phi, g_in, PI, FM, SM,
                               fb_impl=form[5:], **kw)
        return vbx_sharded(mesh, X, phi, g_in, PI, FM, SM,
                           fb_impl=form[3:] or None, **kw)

    def chain(form, k):
        g = G
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = run(form, g)
            g = G + r.gamma[0, 0, 0] * jnp.float32(0.0)
        _ = np.asarray(r.elbo)
        return time.perf_counter() - t0

    forms = ("solo_pallas_bf16", "solo_pallas", "sp_pallas_bf16",
             "sp_pallas", "sp_structured")
    for form in forms:
        t0 = time.perf_counter()
        chain(form, 1)
        print(f"  compile {form}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    # parity vs the MATCHING solo engine: comparing sp_structured to
    # solo_pallas would conflate engine-family divergence (structured vs
    # pallas legitimately drift apart on near-tied frames once forced
    # past convergence) with sharding error
    r_pallas = run("solo_pallas", G)
    g_pallas = np.asarray(r_pallas.gamma)
    e_pallas = np.asarray(r_pallas.elbo)
    r_struct = vbx_batched(X, phi, G, PI, FM, SM, fb_impl="structured", **kw)
    g_struct, e_struct = np.asarray(r_struct.gamma), np.asarray(r_struct.elbo)
    for form, ref, e_ref, name in (
            ("sp_pallas_bf16", g_pallas, e_pallas, "solo_pallas"),
            ("sp_pallas", g_pallas, e_pallas, "solo_pallas"),
            ("sp_structured", g_struct, e_struct, "solo_structured")):
        r_b = run(form, G)
        g_b = np.asarray(r_b.gamma)
        agree = float(np.mean(ref.argmax(-1) == g_b.argmax(-1)))
        # ELBO diff is the round-5 regression's actual signal: the old
        # blockwise log_px accumulated sequentially in f32 (error ~3.6e2
        # at this shape) and silently fired the stop rules; the fixed
        # path must sit within a few f32 ulps of |ELBO| (~0.25 at 2e6)
        ed = np.abs(np.asarray(r_b.elbo) - e_ref).max()
        # expected since round 5: BOTH matching-engine K=1 pairs read
        # 0.00e+00 / agreement 1.0 (the K=1 mesh short-circuits the
        # blockwise smoothers to the solo programs; the round-4 0.86 was
        # the sequentially-accumulated log_px noise — BENCHMARKS.md
        # round-5 correction)
        print(f"gamma maxdiff {name} vs {form}: "
              f"{np.abs(ref - g_b).max():.2e} "
              f"(label agreement {agree:.6f}, elbo maxdiff {ed:.2e})",
              flush=True)

    slopes = {f: [] for f in forms}
    for _ in range(REPS):
        for form in forms:
            t1 = chain(form, K1)
            t2 = chain(form, K2)
            slopes[form].append((t2 - t1) / (K2 - K1))
    base = None
    for form in forms:
        ms = sorted(slopes[form])
        med = ms[REPS // 2]
        if base is None:
            base = med
        print(f"{form}: median {med * 1e3:.1f} ms/EM-run "
              f"({med / ITERS * 1e3:.2f} ms/iter; x{med / base:.2f} of "
              f"solo_pallas_bf16; all {[round(x * 1e3, 1) for x in ms]})",
              flush=True)


if __name__ == "__main__":
    main()
