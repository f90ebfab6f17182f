"""Generate the frozen reference-oracle labels for the 18-meeting
AMI-scale synthetic corpus (tests/test_ami_scale_parity.py).

The reference implementation costs MINUTES PER MEETING at N~10k (its
twoGMMcalib_lin runs 20 EM sweeps over all N^2 ~ 1e8 raveled scores,
diarization_lib.py:13-31 — the quadratic wall this framework exists to
beat), so the oracle runs once HERE, parallelized over OS processes, and
the test scores against the committed artifact. The artifact carries a
fingerprint of the corpus ark + the hyperparameters, so a drifted corpus
or preset invalidates it loudly instead of silently passing.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        timeout 7200 python scripts/gen_ami_ref_labels.py [n_workers]

Output: tests/data/ami_scale_ref_labels.npz
"""

import hashlib
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

REF = "/root/reference"
PLDA = f"{REF}/VBx/models/ResNet101_16kHz/plda"
H5 = f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"
OUT = os.path.join(REPO, "tests", "data", "ami_scale_ref_labels.npz")


def _one_meeting(args):
    """Worker (own OS process): reference flow on one meeting."""
    rec, x_raw, hp = args
    import sys as _sys
    _sys.path.insert(0, REPO)
    from tests.test_reference_e2e_parity import _reference_diarize

    t0 = time.perf_counter()
    labels, iters = _reference_diarize(
        x_raw.astype(np.float64), PLDA, H5, **hp)
    return rec, labels.astype(np.int32), iters, time.perf_counter() - t0


def corpus_fingerprint(ark_path: str, hp: dict) -> str:
    h = hashlib.sha256()
    with open(ark_path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    h.update(repr(sorted(hp.items())).encode())
    return h.hexdigest()[:32]


def main():
    from concurrent.futures import ProcessPoolExecutor, as_completed

    from vbx_tpu.config import get_preset
    from vbx_tpu.io.ark import group_by_recording, iter_vec_ark

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ami_scale_bench", os.path.join(REPO, "scripts",
                                        "ami_scale_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = get_preset("ami_mixheadset")
    hp = dict(Fa=cfg.vb.Fa, Fb=cfg.vb.Fb, loopP=cfg.vb.loop_prob,
              threshold=cfg.ahc.threshold,
              smoothing=cfg.ahc.init_smoothing)

    with tempfile.TemporaryDirectory() as d:
        mod.make_corpus(d)
        fp = corpus_fingerprint(f"{d}/c.ark", hp)
        meetings = [(rec, x_raw, hp) for rec, _, x_raw in
                    group_by_recording(iter_vec_ark(f"{d}/c.ark"))]
    print(f"{len(meetings)} meetings, fingerprint {fp}", flush=True)

    out = {}
    iters = {}
    # spawn: forking a process with an initialized JAX runtime can hang
    import multiprocessing as mp
    with ProcessPoolExecutor(
            max_workers=n_workers,
            mp_context=mp.get_context("spawn")) as pool:
        futs = [pool.submit(_one_meeting, m) for m in meetings]
        for fut in as_completed(futs):
            rec, labels, it, dt = fut.result()
            out[rec] = labels
            iters[rec] = it
            print(f"{rec}: {dt:.0f}s, {it} ref iters, "
                  f"{len(np.unique(labels))} speakers "
                  f"({len(out)}/{len(meetings)})", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT, fingerprint=np.str_(fp),
        recs=np.array(sorted(out)),
        iters=np.array([iters[r] for r in sorted(out)], np.int32),
        **{f"labels_{r}": out[r] for r in sorted(out)})
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)", flush=True)


if __name__ == "__main__":
    main()
