"""AMI-scale end-to-end pipeline benchmark on synthetic data: 18 meetings
of 8-11k x-vectors each (~11 h audio equivalent), full batched pipeline
(host AHC init pool + bucketed batched VB on the device) with the per-stage
breakdown from the runlog 'stages' event.

    timeout 590 python scripts/ami_scale_bench.py [--fb-impl pallas]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = "/root/reference"


def make_corpus(d, n_meetings=18, seed=0):
    from vbx_tpu.io.ark import write_vec_ark
    from vbx_tpu.io.segments import write_segments

    rng = np.random.default_rng(seed)
    vecs, rows = [], []
    for r in range(n_meetings):
        T = int(rng.uniform(8000, 11000))
        K = int(rng.integers(3, 6))
        centers = rng.standard_normal((K, 256)) * 0.35
        z = np.zeros(T, int)
        cur = 0
        for t in range(T):              # markov speaker turns
            if rng.random() < 0.01:
                cur = int(rng.integers(0, K))
            z[t] = cur
        x = centers[z] + 0.8 * rng.standard_normal((T, 256))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        name = f"mtg{r:02d}"
        for i in range(T):
            vecs.append((f"{name}_{i:06d}", x[i].astype(np.float32)))
            rows.append((f"{name}_{i:06d}", name,
                         round(i * 0.24, 3), round(i * 0.24 + 1.44, 3)))
    write_vec_ark(f"{d}/c.ark", vecs)
    write_segments(f"{d}/c.seg", rows)
    return len(vecs)


def main():
    import dataclasses

    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.pipeline import diarize_ark

    fb_impl = None
    if "--fb-impl" in sys.argv:
        fb_impl = sys.argv[sys.argv.index("--fb-impl") + 1]
    cfg = get_preset("ami_mixheadset")
    if "--plateau-ulps" in sys.argv:
        # A/B the f32 plateau stop (PARITY.md deviation 3): 0 disables
        pu = float(sys.argv[sys.argv.index("--plateau-ulps") + 1])
        cfg = cfg.replace(vb=dataclasses.replace(cfg.vb, plateau_ulps=pu))
    print(f"plateau_ulps={cfg.vb.plateau_ulps}", flush=True)

    with tempfile.TemporaryDirectory() as d:
        n = make_corpus(d)
        print(f"corpus: {n} x-vectors", flush=True)
        t0 = time.time()
        outs = diarize_ark(
            f"{d}/c.ark", f"{d}/c.seg", f"{d}/rttm", cfg,
            f"{REF}/VBx/models/ResNet101_16kHz/plda",
            f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
            verbose=False, runlog_path=f"{d}/log.jsonl", fb_impl=fb_impl)
        el = time.time() - t0
        tot_frames = sum(len(o.labels1st) for o in outs.values())
        audio_h = tot_frames * 0.24 / 3600
        print(f"{len(outs)} meetings, {tot_frames} x-vectors "
              f"(~{audio_h:.1f} h audio): {el:.1f}s wall -> "
              f"{audio_h / (el / 3600):.0f}x realtime", flush=True)
        for line in open(f"{d}/log.jsonl"):
            rec = json.loads(line)
            if rec.get("event") == "stages":
                print(f"stages: init={rec['init_s']}s vb={rec['vb_s']}s "
                      f"buckets={rec['buckets']}", flush=True)
        spk = sorted(o.n_speakers for o in outs.values())
        iters = sorted(o.n_iters for o in outs.values())
        print(f"speakers: {spk}\niters: {iters}", flush=True)


if __name__ == "__main__":
    main()
