"""Plateau-stop A/B at AMI scale on the device (VERDICT r2 #2 "Done"):
build the 18-meeting synthetic corpus's VB inputs once (host init chain),
then run the batched engine with the reference epsilon rule alone
(plateau_ulps=0) vs the corpus presets' plateau stop (4 ulps / 2 iters),
same process, and report per-meeting EM iterations, label agreement, and
device wall time. Quantifies the f32 quantum-cycling tax (PARITY.md
deviation 3): under convergence freezing one cycling lane runs the whole
padded batch to max_iters=40.

    timeout 560 python scripts/ab_plateau.py [fb_impl] [n_meetings]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = "/root/reference"
FB = sys.argv[1] if len(sys.argv) > 1 else "pallas_bf16"
N_MTG = int(sys.argv[2]) if len(sys.argv) > 2 else 18


def main():
    import importlib.util

    import jax
    import jax.numpy as jnp

    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.pipeline import Diarizer
    from vbx_tpu.engine.vbhmm import vbx_batched
    from vbx_tpu.io.ark import group_by_recording, iter_vec_ark

    spec = importlib.util.spec_from_file_location(
        "ami_scale_bench",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ami_scale_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = get_preset("ami_mixheadset")
    diar = Diarizer.from_files(
        cfg, f"{REF}/VBx/models/ResNet101_16kHz/plda",
        f"{REF}/VBx/models/ResNet101_16kHz/transform.h5")

    print(f"device: {jax.devices()[0]}  fb_impl={FB}  "
          f"meetings={N_MTG}", file=sys.stderr, flush=True)
    metas = []
    with tempfile.TemporaryDirectory() as d:
        mod.make_corpus(d, n_meetings=N_MTG)
        t0 = time.perf_counter()
        for rec, _, x_raw in group_by_recording(iter_vec_ark(f"{d}/c.ark")):
            x = diar.transform_xvectors(x_raw)
            labels = diar.initial_labels(x)
            fea, phi, qinit = diar.vb_inputs(x, labels)
            metas.append((rec, fea, phi, qinit))
        print(f"host init: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

    T_pad = max(1 << (m[1].shape[0] - 1).bit_length() for m in metas)
    S_pad = max(1 << (m[3].shape[1] - 1).bit_length() for m in metas)
    B, D = len(metas), metas[0][1].shape[1]
    X = np.zeros((B, T_pad, D), np.float32)
    G = np.zeros((B, T_pad, S_pad), np.float32)
    PI = np.zeros((B, S_pad), np.float32)
    FM = np.zeros((B, T_pad), bool)
    SM = np.zeros((B, S_pad), bool)
    for b, (rec, fea, phi, qinit) in enumerate(metas):
        T, S = qinit.shape
        X[b, :T] = fea
        G[b, :T, :S] = qinit
        PI[b, :S] = 1.0 / S
        FM[b, :T] = True
        SM[b, :S] = True
    phi = metas[0][2]
    print(f"one padded batch: B={B} T_pad={T_pad} S_pad={S_pad}",
          file=sys.stderr, flush=True)

    def run(plateau_ulps):
        kw = dict(loop_prob=cfg.vb.loop_prob, Fa=cfg.vb.Fa, Fb=cfg.vb.Fb,
                  max_iters=cfg.vb.max_iters, epsilon=cfg.vb.epsilon,
                  fb_impl=FB, plateau_ulps=plateau_ulps,
                  plateau_iters=cfg.vb.plateau_iters)
        args = (jnp.asarray(X), jnp.asarray(phi, jnp.float32),
                jnp.asarray(G), jnp.asarray(PI), jnp.asarray(FM),
                jnp.asarray(SM))
        r = vbx_batched(*args, **kw)          # compile + converge
        np.asarray(r.n_iters)
        t0 = time.perf_counter()
        r = vbx_batched(*args, **kw)
        iters = np.asarray(r.n_iters)
        dt = time.perf_counter() - t0
        labels = np.asarray(r.gamma).argmax(-1)
        return dt, iters, labels

    t_off, it_off, lab_off = run(0.0)
    t_on, it_on, lab_on = run(cfg.vb.plateau_ulps)
    frame_agree = np.array([np.mean(lab_on[b][FM[b]] == lab_off[b][FM[b]])
                            for b in range(B)])
    print(f"plateau OFF (reference rule): iters={sorted(it_off.tolist())} "
          f"batch-device-wall {t_off * 1e3:.0f} ms", flush=True)
    print(f"plateau ON  ({cfg.vb.plateau_ulps} ulps/"
          f"{cfg.vb.plateau_iters}): iters={sorted(it_on.tolist())} "
          f"batch-device-wall {t_on * 1e3:.0f} ms", flush=True)
    print(f"batch steps: {int(it_off.max())} -> {int(it_on.max())}; "
          f"identical-label meetings: "
          f"{np.mean(frame_agree == 1.0) * 100:.0f}%; per-meeting frame "
          f"agreement mean {frame_agree.mean() * 100:.3f}% / min "
          f"{frame_agree.min() * 100:.3f}%; device-time saved "
          f"{100 * (1 - t_on / max(t_off, 1e-9)):.0f}%",
          flush=True)


if __name__ == "__main__":
    main()
