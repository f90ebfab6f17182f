"""Time the pallas-EM iteration's component ops separately on the real chip
to locate where per-iteration time goes (fusion boundaries differ from the
full program, so this is a map, not an exact account).

    timeout 590 python scripts/profile_em_pieces.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B, T, S, D = 256, 1025, 31, 128
REPS = 7


def med_time(fn, *args):
    import jax
    jax.block_until_ready(fn(*args))          # compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[REPS // 2]


def main():
    import jax
    import jax.numpy as jnp

    from vbx_tpu.ops.fb_pallas import fb_scan_pallas
    from vbx_tpu.ops.vb_steps import vb_m_step

    print(f"device: {jax.devices()[0]}  B={B} T={T} S={S} D={D}", flush=True)
    rng = np.random.default_rng(0)

    # Ack-reliability calibration (chain_bench.py / BENCHMARKS.md): if the
    # implied rate on a known-FLOPs matmul exceeds hardware peak, the
    # completion acks lie and every med_time below is dispatch latency.
    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32) * 1e-4)
    tmm = med_time(jax.jit(lambda a: a @ a), A)
    tflops = 2 * 4096**3 / tmm / 1e12
    print(f"calib matmul 4096^3 f32: {tmm * 1e3:.2f} ms -> "
          f"{tflops:.1f} TFLOP/s", flush=True)
    if tflops > 400:
        print("WARNING: implied calib rate exceeds hardware peak — acks "
              "unreliable in this process state; the piece timings below "
              "may be dispatch latency. Re-run, or use chain_bench.py.",
              flush=True)
    rho = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    g_bts = jnp.asarray(
        rng.dirichlet(np.ones(S), size=(B, T)).astype(np.float32))
    g_tbs = jnp.transpose(g_bts, (1, 0, 2))
    phi = jnp.asarray(np.linspace(2.0, 0.1, D).astype(np.float32))
    alpha = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    invL = jnp.abs(alpha) * 0.1
    G = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    pi = jnp.full((B, S), 1.0 / S, jnp.float32)
    logp_tbs = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32))
    w = jnp.exp(logp_tbs - jnp.max(logp_tbs, -1, keepdims=True))
    valid = jnp.ones((T, B), jnp.float32)
    col = 0.1 * pi + 1e-8
    ahat = w / jnp.sum(w, -1, keepdims=True)
    bhat = ahat

    pieces = {}

    pieces["transpose tbs->bts"] = med_time(
        jax.jit(lambda g: jnp.transpose(g, (1, 0, 2))), g_tbs)
    pieces["m_step (vmapped)"] = med_time(
        jax.jit(jax.vmap(vb_m_step, in_axes=(0, 0, None, None))),
        g_bts, rho, phi, 0.3 / 17.0)
    pieces["cross einsum btd,bsd->tbs"] = med_time(
        jax.jit(lambda r, a: jnp.einsum(
            "btd,bsd->tbs", r, a, preferred_element_type=jnp.float32)),
        rho, alpha)
    pieces["logp+w assembly"] = med_time(
        jax.jit(lambda cross, q, Gm: (
            lambda lp: jnp.exp(lp - jnp.max(lp, -1, keepdims=True)))(
                0.3 * (cross - 0.5 * q[None] + Gm.T[:, :, None]))),
        logp_tbs, jnp.sum(invL, -1), G)
    pieces["fb kernel (fused)"] = med_time(
        jax.jit(lambda *a: fb_scan_pallas(*a, 0.9, fused=True)),
        w, valid, col, pi + 1e-8)
    pieces["gamma+pi_stat assembly"] = med_time(
        jax.jit(lambda a, b, wv, v: (
            (a * b / jnp.maximum(jnp.sum(a * b, -1, keepdims=True), 1e-37))
            * v[:, :, None],
            jnp.sum(wv * b / jnp.maximum(
                jnp.sum(a * b, -1, keepdims=True), 1e-37), 0))),
        ahat, bhat, w, valid)

    total = 0.0
    for k, v in pieces.items():
        print(f"  {k:32s} {v * 1e3:7.3f} ms", flush=True)
        total += v
    print(f"  {'SUM of pieces':32s} {total * 1e3:7.3f} ms  (x10 iters = "
          f"{total * 1e4:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
