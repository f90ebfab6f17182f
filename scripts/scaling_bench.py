"""Multi-device scaling-efficiency measurement for the sharded VB engine.

SURVEY.md §6 requires measured scaling (1 chip -> 1 host -> N hosts,
target >=80% efficiency). Only one physical TPU chip is attached in this
environment, so by default this runs on N virtual CPU devices — that
validates the harness and the collectives, NOT ICI bandwidth; virtual
devices share the host's cores, so CPU "efficiency" saturates at the
physical core count. On a real slice, run it unmodified under the default
backend (it shards over however many devices jax reports).

Two measurements, both at fixed per-run EM iteration count (epsilon=-1
disables early convergence — the engine freezes a recording when
delta-ELBO < epsilon, and f32 deltas can quantize negative, so epsilon=0
would NOT guarantee identical work in every configuration):

- dp weak scaling: B grows with the device count (recordings are
  embarrassingly parallel; the reference's per-recording fan-out axis,
  AMI_run.sh:53-58). Efficiency = t(1 dev, B0) / t(N dev, N*B0).
- sp strong scaling: one batch of long recordings, frame axis split over
  devices (blockwise forward-backward boundary exchange + psum'd M-step
  stats). Efficiency = t(1 dev) / (N * t(N dev)).

Usage:
    python scripts/scaling_bench.py            # 8 virtual CPU devices
    SCALING_DEVICES=4 python scripts/scaling_bench.py
"""

import json
import os
import sys
import time

N_DEV = int(os.environ.get("SCALING_DEVICES", "8"))
if (os.environ.get("JAX_PLATFORMS") in (None, "", "axon", "cpu")
        and not os.environ.get("SCALING_ON_DEVICE")
        and not os.environ.get("_SCALING_EXEC")):
    # default to the virtual-CPU harness (see module docstring) — the
    # tunnel-attached axon chip is a single device, which cannot scale;
    # set SCALING_ON_DEVICE=1 on a real multi-chip slice.
    # The container's sitecustomize force-registers the TPU plugin at
    # interpreter start, before this file runs, so setting the env here is
    # too late — re-exec with it in place instead.
    env = dict(os.environ,
               _SCALING_EXEC="1",
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                          f" --xla_force_host_platform_device_count={N_DEV}"))
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B0, T, S, D = 4, 4096, 8, 128
ITERS = 5
REPS = 5


def make_inputs(rng, B):
    import jax.numpy as jnp
    from scipy.special import softmax
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    q = softmax(rng.standard_normal((B, T, S)).astype(np.float32) * 3, axis=-1)
    phi = np.abs(rng.standard_normal(D)).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(phi), jnp.asarray(q),
            jnp.full((B, S), 1.0 / S, np.float32),
            jnp.ones((B, T), bool), jnp.ones((B, S), bool))


def timed_run(mesh, args):
    import jax
    from vbx_tpu.parallel.engine import vbx_sharded

    def run():
        res = vbx_sharded(mesh, *args, loop_prob=0.9, Fa=0.3, Fb=17.0,
                          max_iters=ITERS, epsilon=-1.0)
        jax.block_until_ready(res.gamma)
        return res

    run()                                   # compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[REPS // 2]


def main():
    import jax
    from vbx_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", file=sys.stderr)
    ncpu = os.cpu_count() or 1
    rng = np.random.default_rng(0)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    rows = []

    # dp weak scaling: B = B0 * n
    base_t = None
    for n in sizes:
        mesh = make_mesh(n_dp=n, n_sp=1, devices=devs[:n])
        t = timed_run(mesh, make_inputs(rng, B0 * n))
        if base_t is None:
            base_t = t
        eff = base_t / t
        rows.append({"axis": "dp", "devices": n, "B": B0 * n, "T": T,
                     "seconds": round(t, 4), "efficiency": round(eff, 3)})
        print(f"dp  n={n:2d} B={B0 * n:3d} t={t:.3f}s eff={eff:.2f}",
              file=sys.stderr)

    # sp strong scaling: fixed work, frames split n ways
    base_t = None
    for n in sizes:
        mesh = make_mesh(n_dp=1, n_sp=n, devices=devs[:n])
        t = timed_run(mesh, make_inputs(rng, B0))
        if base_t is None:
            base_t = t
        eff = base_t / (n * t)
        rows.append({"axis": "sp", "devices": n, "B": B0, "T": T,
                     "seconds": round(t, 4), "efficiency": round(eff, 3)})
        print(f"sp  n={n:2d} B={B0:3d} t={t:.3f}s eff={eff:.2f}",
              file=sys.stderr)

    print(json.dumps({
        "platform": devs[0].platform, "n_devices": len(devs),
        "physical_cores": ncpu, "iters": ITERS,
        "note": ("virtual-CPU harness validates collectives, not ICI; "
                 "efficiency saturates at the physical core count"
                 if devs[0].platform == "cpu" else "hardware measurement"),
        "rows": rows}))


if __name__ == "__main__":
    main()
