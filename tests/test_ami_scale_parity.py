"""AMI-scale (18-meeting, ~11 h) corpus parity against the reference
implementation (VERDICT r2 #4): the exact synthetic corpus the bench
builds (scripts/ami_scale_bench.make_corpus), run end-to-end through the
real batched pipeline under the ami_mixheadset preset of record, scored
corpus-level (exact AND 10 ms-rasterized) against the reference flow's
output on the same x-vectors.

The reference side costs MINUTES PER MEETING at N~10k (twoGMMcalib_lin
alone runs 20 EM sweeps over all N^2 ~ 1e8 raveled scores — the
quadratic wall this framework replaces), so its labels are generated
ONCE by scripts/gen_ami_ref_labels.py (parallel OS processes, ~1 h) and
committed as a fingerprinted artifact; this test verifies the
fingerprint (corpus bytes + hyperparameters) so a drifted corpus or
preset FAILS loudly instead of silently passing against stale labels.

Still slow-gated (our pipeline itself is minutes of host/CPU work):
VBX_TPU_RUN_SLOW=1; wired into scripts/tpu_measurement_battery.sh. The
fast CI proxy is tests/test_reference_e2e_parity.py.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "tests", "data", "ami_scale_ref_labels.npz")

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(f"{REF}/VBx"),
                       reason="reference not mounted"),
    pytest.mark.skipif(not os.environ.get("VBX_TPU_RUN_SLOW"),
                       reason="slow (set VBX_TPU_RUN_SLOW=1; run via "
                              "scripts/tpu_measurement_battery.sh)"),
    pytest.mark.skipif(not os.path.exists(ORACLE),
                       reason="frozen reference oracle missing — run "
                              "scripts/gen_ami_ref_labels.py"),
]


def _load(script):
    spec = importlib.util.spec_from_file_location(
        script, os.path.join(REPO, "scripts", f"{script}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ami_scale_corpus_matches_reference(tmp_path):
    from collections import Counter

    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.pipeline import diarize_ark
    from vbx_tpu.io.rttm import merge_adjacent_labels
    from vbx_tpu.io.segments import read_segments
    from vbx_tpu.metrics.der import Turn, score_corpus

    plda_file = f"{REF}/VBx/models/ResNet101_16kHz/plda"
    h5_file = f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"
    cfg = get_preset("ami_mixheadset")
    hp = dict(Fa=cfg.vb.Fa, Fb=cfg.vb.Fb, loopP=cfg.vb.loop_prob,
              threshold=cfg.ahc.threshold,
              smoothing=cfg.ahc.init_smoothing)

    d = str(tmp_path)
    n = _load("ami_scale_bench").make_corpus(d)
    print(f"corpus: {n} x-vectors", file=sys.stderr, flush=True)

    oracle = np.load(ORACLE)
    fp = _load("gen_ami_ref_labels").corpus_fingerprint(f"{d}/c.ark", hp)
    assert str(oracle["fingerprint"]) == fp, (
        "corpus or hyperparameters drifted since the frozen reference "
        "labels were generated — re-run scripts/gen_ami_ref_labels.py")

    # ours: the real batched corpus pipeline (bucketing, pipelined
    # dispatch, padded batched engine, preset plateau stop)
    outputs = diarize_ark(f"{d}/c.ark", f"{d}/c.seg", f"{d}/rttm", cfg,
                          plda_file, h5_file, verbose=False)
    assert len(outputs) == 18
    print("our EM iterations per meeting: "
          f"{sorted(o.n_iters for o in outputs.values())} "
          f"(reference: {sorted(oracle['iters'].tolist())})",
          file=sys.stderr, flush=True)

    segs = read_segments(f"{d}/c.seg")
    times = {}
    for name, rec, s, e in segs:
        times.setdefault(rec, []).append((s, e))
    ours_sys, ref_sys = {}, {}
    for rec in oracle["recs"]:
        rec = str(rec)
        ref_labels = oracle[f"labels_{rec}"]
        labels = outputs[rec].labels1st
        # per-recording label agreement >= 99% up to renaming
        pairs = Counter(zip(ref_labels.tolist(), labels.tolist()))
        mapping = {}
        for (a, b), _ in pairs.most_common():
            if a not in mapping and b not in mapping.values():
                mapping[a] = b
        agree = np.mean([mapping.get(a) == b
                         for a, b in zip(ref_labels, labels)])
        print(f"{rec}: agree={agree:.4f} our_iters={outputs[rec].n_iters}",
              file=sys.stderr, flush=True)
        assert agree >= 0.99, (rec, agree)
        ts = np.asarray(times[rec])
        for sysd, lab in ((ours_sys, labels), (ref_sys, ref_labels)):
            s, e, lv = merge_adjacent_labels(ts[:, 0], ts[:, 1], lab)
            sysd[rec] = [Turn(a, b, str(v)) for a, b, v in zip(s, e, lv)]

    # corpus-level DER of ours scored against the reference output,
    # exact and 10 ms-rasterized, must be < 0.5
    for ras in (None, 0.01):
        _, tot = score_corpus(ref_sys, ours_sys, collar=0.25,
                              ignore_overlaps=True, rasterize=ras)
        print(f"corpus DER vs reference (rasterize={ras}): {tot.der:.3f}",
              file=sys.stderr, flush=True)
        assert tot.der < 0.5, (ras, tot.der)
