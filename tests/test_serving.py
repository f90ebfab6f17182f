"""Serving subsystem: the warm micro-batching service and its HTTP
front-end must produce the same diarization as the offline pipeline
(no reference counterpart — the reference forks one process per recording,
AMI_run.sh:53-58)."""

import json
import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from vbx_tpu.config import get_preset
from vbx_tpu.engine.pipeline import diarize_ark
from vbx_tpu.io.ark import group_by_recording, iter_vec_ark
from vbx_tpu.io.segments import read_xvector_timing_dict
from vbx_tpu.serving import DiarizationService

from .util import REF, split_ark_corpus

PLDA = f"{REF}/VBx/models/ResNet101_16kHz/plda"
H5 = f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"

needs_assets = pytest.mark.skipif(
    not os.path.exists(f"{REF}/exp/ES2005a.ark"),
    reason="reference assets not mounted")


def _corpus_requests(tmp_path, n_rec=4):
    ark, seg, names = split_ark_corpus(tmp_path, n_rec)
    segs = read_xvector_timing_dict(seg)
    recs = {rec: (x_raw, segs[rec][1])
            for rec, _, x_raw in group_by_recording(iter_vec_ark(ark))}
    return ark, seg, names, recs


@needs_assets
def test_service_matches_offline_pipeline(tmp_path):
    """Concurrently submitted requests ride one micro-batch and produce
    exactly the offline pipeline's RTTMs (the batched engine is
    batch-composition-independent)."""
    ark, seg, names, recs = _corpus_requests(tmp_path)
    off_dir = str(tmp_path / "offline")
    offline = diarize_ark(ark, seg, off_dir, get_preset("example"),
                          PLDA, H5, verbose=False)

    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            batch_window_ms=300.0) as svc:
        futs = {rec: svc.submit(rec, x, ts)
                for rec, (x, ts) in recs.items()}
        results = {rec: f.result(timeout=120) for rec, f in futs.items()}
        stats = svc.stats()

    assert set(results) == set(names)
    for rec, res in results.items():
        assert res.n_speakers == offline[rec].n_speakers
        np.testing.assert_array_equal(res.labels1st,
                                      offline[rec].labels1st)
        with open(os.path.join(off_dir, f"{rec}.rttm")) as fp:
            assert res.rttm == fp.read()
        assert res.wall_ms > 0
    # all four requests were answered, and at least two rode one batch
    assert stats["requests"] == len(names)
    assert stats["failed"] == 0
    assert stats["max_batch"] >= 2
    assert stats["batches"] < len(names) + 1


@needs_assets
def test_service_failure_isolation(tmp_path):
    """A request whose init chain raises fails only its own future; the
    batch mates still succeed and the service keeps serving."""
    _, _, _, recs = _corpus_requests(tmp_path, n_rec=2)
    (good_name, (x_good, ts_good)), _ = sorted(recs.items())
    x_bad = np.full_like(x_good, np.nan)

    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            batch_window_ms=200.0) as svc:
        f_bad = svc.submit("bad", x_bad, ts_good)
        f_good = svc.submit(good_name, x_good, ts_good)
        res = f_good.result(timeout=120)
        with pytest.raises(Exception):
            f_bad.result(timeout=120)
        # service still alive afterwards
        res2 = svc.diarize(good_name, x_good, ts_good, timeout=120)
        stats = svc.stats()

    np.testing.assert_array_equal(res.labels1st, res2.labels1st)
    assert stats["failed"] == 1
    assert stats["requests"] == 3


@needs_assets
def test_cancelled_future_does_not_poison_batch(tmp_path):
    """cancel() on a pending request must not raise InvalidStateError in
    the dispatcher or fail its batch mates."""
    _, _, _, recs = _corpus_requests(tmp_path, n_rec=2)
    items = sorted(recs.items())
    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            batch_window_ms=300.0) as svc:
        f_cancel = svc.submit(items[0][0], *items[0][1])
        f_keep = svc.submit(items[1][0], *items[1][1])
        cancelled = f_cancel.cancel()   # races the dispatcher; either way
        res = f_keep.result(timeout=120)   # the mate must succeed
        assert res.n_speakers >= 1
        if cancelled:
            with pytest.raises(Exception):
                f_cancel.result(timeout=1)
        stats = svc.stats()
    assert stats["requests"] == 2      # cancelled requests stay counted


@needs_assets
def test_service_rejects_malformed_submissions(tmp_path):
    with DiarizationService.from_files(get_preset("example"), PLDA, H5) \
            as svc:
        with pytest.raises(ValueError):
            svc.submit("x", np.zeros((4,)), np.zeros((4, 2)))
        with pytest.raises(ValueError):
            svc.submit("x", np.zeros((4, 8)), np.zeros((3, 2)))
    with pytest.raises(RuntimeError):
        svc.submit("x", np.zeros((4, 8)), np.zeros((4, 2)))


@needs_assets
def test_http_server_end_to_end(tmp_path):
    """Drive the HTTP surface: healthz, stats, inline diarize, server-local
    ark diarize, and malformed-request handling."""
    from vbx_tpu.cli.serve import make_handler

    ark, seg, names, recs = _corpus_requests(tmp_path)
    off_dir = str(tmp_path / "offline")
    offline = diarize_ark(ark, seg, off_dir, get_preset("example"),
                          PLDA, H5, verbose=False)

    svc = DiarizationService.from_files(get_preset("example"), PLDA, H5,
                                        batch_window_ms=50.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(f"{base}{path}", timeout=120) as r:
            return r.status, json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            f"{base}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        code, health = get("/healthz")
        assert code == 200 and health["status"] == "ok"
        assert "backend" in health and "device" in health

        rec = names[0]
        x, ts = recs[rec]
        code, out = post("/diarize", {
            "recording": rec, "xvectors": x.tolist(),
            "timestamps": ts.tolist()})
        assert code == 200
        with open(os.path.join(off_dir, f"{rec}.rttm")) as fp:
            assert out["rttm"] == fp.read()
        assert out["n_speakers"] == offline[rec].n_speakers

        code, out = post("/diarize", {"xvec_ark_file": ark,
                                      "segments_file": seg})
        assert code == 200 and set(out["results"]) == set(names)
        for r in names:
            with open(os.path.join(off_dir, f"{r}.rttm")) as fp:
                assert out["results"][r]["rttm"] == fp.read()
        assert "failed" not in out

        code, err = post("/diarize", {"nonsense": 1})
        assert code == 400 and "error" in err
        for bad in (5, None, "xvectors"):   # valid JSON, not an object
            code, err = post("/diarize", bad)
            assert code == 400 and "error" in err, bad
        code, err = post("/diarize", {"xvec_ark_file": "/nope",
                                      "segments_file": "/nope"})
        assert code == 400 and "error" in err
        code, _ = get("/stats")
        assert code == 200
    finally:
        httpd.shutdown()
        httpd.server_close()
        svc.close()
