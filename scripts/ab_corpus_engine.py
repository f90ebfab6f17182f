"""Corpus-preset engine A/B at AMI scale on the device (VERDICT r3 #3):
run the full batched corpus pipeline (host AHC init pool + bucketed
batched VB) under the ami_mixheadset preset of record for each
forward-backward engine, and verify each against the FROZEN reference
oracle (tests/data/ami_scale_ref_labels.npz — the fingerprinted labels
the AMI-scale parity test uses) with the corpus-tolerance bounds:

  - per-meeting label agreement vs the reference >= 99% (up to renaming),
  - corpus-level DER vs the reference output < 0.5 (exact and 10 ms
    rasterized),

plus wall time and per-meeting iteration counts. This is the measurement
that justifies the corpus presets' fb_impl='pallas_bf16' default
(config.VBConfig.fb_impl): the presets already accept tolerance-level
deviation (the plateau stop's >=99.66% agreement bound); the engine
choice is held to the same bar on the same 18-meeting (~11 h) workload.

    timeout 560 python scripts/ab_corpus_engine.py [n_meetings]
"""

import dataclasses
import importlib.util
import os
import sys
import tempfile
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "tests", "data", "ami_scale_ref_labels.npz")
N_MTG = int(sys.argv[1]) if len(sys.argv) > 1 else 18


def _load(script):
    spec = importlib.util.spec_from_file_location(
        script, os.path.join(REPO, "scripts", f"{script}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax

    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.pipeline import diarize_ark
    from vbx_tpu.io.rttm import merge_adjacent_labels
    from vbx_tpu.io.segments import read_segments
    from vbx_tpu.metrics.der import Turn, score_corpus

    cfg = get_preset("ami_mixheadset")
    hp = dict(Fa=cfg.vb.Fa, Fb=cfg.vb.Fb, loopP=cfg.vb.loop_prob,
              threshold=cfg.ahc.threshold,
              smoothing=cfg.ahc.init_smoothing)
    oracle = np.load(ORACLE)
    print(f"device: {jax.devices()[0]}  meetings={N_MTG}",
          file=sys.stderr, flush=True)

    with tempfile.TemporaryDirectory() as d:
        n = _load("ami_scale_bench").make_corpus(d, n_meetings=N_MTG)
        print(f"corpus: {n} x-vectors", file=sys.stderr, flush=True)
        if N_MTG == 18:
            fp = _load("gen_ami_ref_labels").corpus_fingerprint(
                f"{d}/c.ark", hp)
            assert str(oracle["fingerprint"]) == fp, (
                "corpus/hyperparameters drifted vs the frozen oracle")

        segs = read_segments(f"{d}/c.seg")
        times = {}
        for name, rec, s, e in segs:
            times.setdefault(rec, []).append((s, e))

        # None = the preset's own engine of record (resolve_fb_impl);
        # explicit rows pin each engine for the A/B
        for fb in (None, "structured", "pallas", "pallas_bf16"):
            t0 = time.perf_counter()
            outputs = diarize_ark(
                f"{d}/c.ark", f"{d}/c.seg", f"{d}/rttm_{fb}",
                dataclasses.replace(cfg, name=f"{cfg.name}-{fb}"),
                f"{REF}/VBx/models/ResNet101_16kHz/plda",
                f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
                verbose=False, fb_impl=fb)
            wall = time.perf_counter() - t0
            agrees, iters = [], []
            ours_sys, ref_sys = {}, {}
            for rec in oracle["recs"][:N_MTG]:
                rec = str(rec)
                ref_labels = oracle[f"labels_{rec}"]
                labels = outputs[rec].labels1st
                pairs = Counter(zip(ref_labels.tolist(), labels.tolist()))
                mapping = {}
                for (a, b), _ in pairs.most_common():
                    if a not in mapping and b not in mapping.values():
                        mapping[a] = b
                agrees.append(np.mean([mapping.get(a) == b for a, b
                                       in zip(ref_labels, labels)]))
                iters.append(outputs[rec].n_iters)
                ts = np.asarray(times[rec])
                for sysd, lab in ((ours_sys, labels), (ref_sys, ref_labels)):
                    s, e, lv = merge_adjacent_labels(ts[:, 0], ts[:, 1], lab)
                    sysd[rec] = [Turn(a, b, str(v))
                                 for a, b, v in zip(s, e, lv)]
            ders = []
            for ras in (None, 0.01):
                _, tot = score_corpus(ref_sys, ours_sys, collar=0.25,
                                      ignore_overlaps=True, rasterize=ras)
                ders.append(tot.der)
            ok = (min(agrees) >= 0.99 and max(ders) < 0.5)
            print(f"{str(fb):12s} wall={wall:6.1f}s  iters={sorted(iters)}  "
                  f"agree(min/mean)={min(agrees):.4f}/{np.mean(agrees):.4f}"
                  f"  DER(exact/10ms)={ders[0]:.3f}/{ders[1]:.3f}  "
                  f"bounds={'OK' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
