"""One-command TPU validation: golden accuracy + engine-path parity +
throughput, on the real chip (the pytest suite pins the CPU backend; this
is the hardware counterpart). Run with the default environment:

    timeout 590 python scripts/tpu_smoke.py

Exits nonzero on any check failure. Expect wall times to vary with the
tunnel state (see BENCHMARKS.md caveat)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = "/root/reference"


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.devices()}", flush=True)
    failures = []

    # 1. golden end-to-end
    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.pipeline import diarize_ark
    from vbx_tpu.metrics.der import der_from_rttm_files
    t0 = time.time()
    with tempfile.TemporaryDirectory() as d:
        diarize_ark(f"{REF}/exp/ES2005a.ark", f"{REF}/exp/ES2005a.seg", d,
                    get_preset("example"),
                    f"{REF}/VBx/models/ResNet101_16kHz/plda",
                    f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
                    verbose=False)
        _, tot = der_from_rttm_files(
            f"{REF}/example/rttm/ES2005a.rttm",
            os.path.join(d, "ES2005a.rttm"), collar=0.25,
            ignore_overlaps=True)
    ok = abs(tot.der - 7.06) < 0.02
    print(f"[{'ok' if ok else 'FAIL'}] golden DER {tot.der:.2f} "
          f"(expect 7.06) in {time.time() - t0:.1f}s", flush=True)
    if not ok:
        failures.append("golden")

    # 2. pallas vs structured engine parity on-chip
    from vbx_tpu.engine.vbhmm import vbx_batched
    from vbx_tpu.engine.pipeline import Diarizer
    from vbx_tpu.io.ark import group_by_recording, iter_vec_ark
    diar = Diarizer.from_files(
        get_preset("example"), f"{REF}/VBx/models/ResNet101_16kHz/plda",
        f"{REF}/VBx/models/ResNet101_16kHz/transform.h5")
    _, _, x_raw = next(group_by_recording(
        iter_vec_ark(f"{REF}/exp/ES2005a.ark")))
    x = diar.transform_xvectors(x_raw)
    fea, phi, qinit = diar.vb_inputs(x, diar.initial_labels(x))
    T, S = qinit.shape
    kw = dict(loop_prob=0.99, Fa=0.3, Fb=17.0, max_iters=40, epsilon=1e-6)

    def vb_args(B):
        return (jnp.asarray(np.broadcast_to(fea, (B, T, fea.shape[1])),
                            jnp.float32),
                jnp.asarray(phi, jnp.float32),
                jnp.asarray(np.broadcast_to(qinit, (B, T, S)), jnp.float32),
                jnp.full((B, S), 1.0 / S, jnp.float32),
                jnp.ones((B, T), bool), jnp.ones((B, S), bool))

    # small and lane-filling batches (B-independence of the sb kernel)
    for B in (8, 32):
        args = vb_args(B)
        ga = np.asarray(
            vbx_batched(*args, fb_impl="structured", **kw).gamma[0])
        gb = np.asarray(vbx_batched(*args, fb_impl="pallas", **kw).gamma[0])
        agree = float(np.mean(ga.argmax(1) == gb.argmax(1)))
        maxdiff = float(np.abs(ga - gb).max())
        ok = agree == 1.0 and maxdiff < 1e-4
        print(f"[{'ok' if ok else 'FAIL'}] pallas/structured parity B={B}: "
              f"agreement {agree:.4f}, gamma maxdiff {maxdiff:.2e}",
              flush=True)
        if not ok:
            failures.append(f"pallas-parity-B{B}")

    # 3. throughput info (NOT a pass/fail check: tunnel-attached timings
    # swing ~100x between process states — see BENCHMARKS.md; bench.py's
    # chained fetch-forced slope is the real measurement)
    B = 32
    args = vb_args(B)
    t0 = time.perf_counter()
    r = vbx_batched(*args, fb_impl="pallas", **kw)
    jax.block_until_ready(r.gamma)
    t = time.perf_counter() - t0
    print(f"[info] one batch of {B}: {t * 1e3:.1f}ms as observed through "
          f"the tunnel", flush=True)

    print("FAILURES:" if failures else "ALL OK", failures, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
