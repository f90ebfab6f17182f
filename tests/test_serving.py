"""Serving subsystem: the warm micro-batching service and its HTTP
front-end must produce the same diarization as the offline pipeline
(no reference counterpart — the reference forks one process per recording,
AMI_run.sh:53-58)."""

import http.client
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

    runlog = str(tmp_path / "serve.jsonl")
    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            batch_window_ms=300.0, runlog_path=runlog) as svc:
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
    # one runlog record per request (production observability)
    events = [json.loads(line) for line in open(runlog)]
    assert sorted(e["recording"] for e in events
                  if e["event"] == "request") == sorted(names)


@needs_assets
def test_mixed_length_requests_split_into_buckets(tmp_path):
    """One micro-batch of requests with very different lengths must split
    into the corpus pipeline's (T, S) buckets and still match offline
    results (covers the multi-group dispatch path)."""
    ark, seg, names, _ = _corpus_requests(tmp_path, n_rec=2)   # ~512 each
    # rebuild with unequal lengths: 700 + 325 frames from the same ark
    from vbx_tpu.io.ark import iter_vec_ark
    from vbx_tpu.io.segments import read_xvector_timing_dict
    vecs = [v for _, v in iter_vec_ark(ark)]
    segs = read_xvector_timing_dict(seg)
    times = np.concatenate([segs[n][1] for n in sorted(segs)])
    x_all = np.stack(vecs)
    reqs = {"long": (x_all[:700], times[:700]),
            "short": (x_all[700:], times[700:])}

    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            batch_window_ms=300.0) as svc:
        futs = {r: svc.submit(r, x, ts) for r, (x, ts) in reqs.items()}
        results = {r: f.result(timeout=120) for r, f in futs.items()}
        stats = svc.stats()
    assert stats["max_batch"] == 2         # one micro-batch...
    # ...but two device bucket shapes (700 -> 1024-pad, 325 -> 512-pad)
    for r, (x, ts) in reqs.items():
        assert results[r].n_speakers >= 1
        assert len(results[r].labels1st) == len(x)

    # apples-to-apples offline comparison: the batched pipeline over an
    # ark with the same two pseudo-recordings uses the same bucket shapes,
    # so labels must match exactly. (A solo UNPADDED run can legitimately
    # stop one EM iteration apart across pad shapes — the documented f32
    # epsilon-quantization nuance — so it is not the oracle here.)
    from vbx_tpu.io.ark import write_vec_ark
    from vbx_tpu.io.segments import write_segments
    ark2 = str(tmp_path / "mixed.ark")
    seg2 = str(tmp_path / "mixed.seg")
    out_vecs, out_rows = [], []
    for r, (x, ts) in reqs.items():
        for i, (v, (s, e)) in enumerate(zip(x, ts)):
            out_vecs.append((f"{r}_{i:08d}", v))
            out_rows.append((f"{r}_{i:08d}", r, float(s), float(e)))
    write_vec_ark(ark2, out_vecs)
    write_segments(seg2, out_rows)
    offline = diarize_ark(ark2, seg2, str(tmp_path / "off2"),
                          get_preset("example"), PLDA, H5, verbose=False)
    for r in reqs:
        np.testing.assert_array_equal(results[r].labels1st,
                                      offline[r].labels1st)


@needs_assets
def test_service_on_device_mesh_matches_offline(tmp_path):
    """Pod-slice serving: a ('dp','sp') mesh routes buckets through the
    sharded engine; results must equal the offline pipeline (the sharded
    engine is bit-exact vs the sequential one), including when the batch
    pads up to the 'dp' extent (3 requests on dp=4)."""
    import jax

    from vbx_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU backend")
    ark, seg, names, recs = _corpus_requests(tmp_path, n_rec=3)
    off_dir = str(tmp_path / "offline")
    offline = diarize_ark(ark, seg, off_dir, get_preset("example"),
                          PLDA, H5, verbose=False)

    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5, mesh=make_mesh(4, 2),
            batch_window_ms=300.0) as svc:
        futs = {rec: svc.submit(rec, x, ts)
                for rec, (x, ts) in recs.items()}
        results = {rec: f.result(timeout=240) for rec, f in futs.items()}

    for rec in names:
        np.testing.assert_array_equal(results[rec].labels1st,
                                      offline[rec].labels1st)
        with open(os.path.join(off_dir, f"{rec}.rttm")) as fp:
            assert results[rec].rttm == fp.read()


@needs_assets
def test_service_output_2nd(tmp_path):
    """A service configured with output_2nd returns the second-best
    labeling (reference vbhmm.py:98 --output-2nd), matching the offline
    pipeline's <dir>2nd RTTMs."""
    ark, seg, names, recs = _corpus_requests(tmp_path, n_rec=2)
    cfg = get_preset("example").replace(output_2nd=True)
    off_dir = str(tmp_path / "off")
    diarize_ark(ark, seg, off_dir, cfg, PLDA, H5, verbose=False)

    with DiarizationService.from_files(cfg, PLDA, H5,
                                       batch_window_ms=200.0) as svc:
        futs = {r: svc.submit(r, x, ts) for r, (x, ts) in recs.items()}
        results = {r: f.result(timeout=120) for r, f in futs.items()}

    for rec in names:
        assert results[rec].rttm_2nd is not None
        with open(os.path.join(off_dir + "2nd", f"{rec}.rttm")) as fp:
            assert results[rec].rttm_2nd == fp.read()
        with open(os.path.join(off_dir, f"{rec}.rttm")) as fp:
            assert results[rec].rttm == fp.read()


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
        with pytest.raises(ValueError, match="empty"):
            svc.submit("x", np.zeros((0, 8)), np.zeros((0, 2)))
    with pytest.raises(RuntimeError):
        svc.submit("x", np.zeros((4, 8)), np.zeros((4, 2)))


def test_warmup_rejects_bad_batch_sizes(tmp_path):
    """Empty or non-positive warmup batch lists must fail loudly at
    validation, not crash the daemon mid-warmup (ADVICE round 1)."""
    with DiarizationService.from_files(get_preset("example"), PLDA, H5) \
            as svc:
        with pytest.raises(ValueError, match="batch_sizes"):
            svc.warmup(batch_sizes=())
        with pytest.raises(ValueError, match="batch_sizes"):
            svc.warmup(batch_sizes=(4, 0))


def test_batch_padding_policy():
    """_padded_batch must honor the sharded engine's 'B divides by dp'
    contract for ANY dp extent (not just powers of two), and _chunk_cap
    must never admit a chunk whose PADDED batch exceeds the frames budget
    (ADVICE round 1: dp=3, B=5 used to pad to 8 and fail the chunk)."""
    from types import SimpleNamespace

    pb = DiarizationService._padded_batch
    cc = DiarizationService._chunk_cap

    def fake_service(mesh, frames):
        ns = SimpleNamespace(mesh=mesh, _max_batch_frames=frames)
        ns._padded_batch = pb.__get__(ns)
        return ns

    for n_dp in (1, 2, 3, 4, 5, 7):
        fake = fake_service(
            SimpleNamespace(shape={"dp": n_dp, "sp": 2}), 2_000_000)
        for B in range(1, 33):
            Bp = pb(fake, B)
            assert Bp >= B and Bp % n_dp == 0, (n_dp, B, Bp)
    solo = fake_service(None, 4096)
    assert pb(solo, 1) == 1 and pb(solo, 5) == 8 and pb(solo, 8) == 8
    # frames budget 4096, t_pad 512 -> raw cap 8; padded cap must be <= 8
    # and a full chunk of cap requests must pad within the budget
    for t_pad in (256, 512, 1024, 4096, 8192):
        cap = cc(solo, t_pad)
        assert cap >= 1
        raw = max(1, solo._max_batch_frames // t_pad)
        assert pb(solo, cap) <= max(raw, 1)
    meshy = fake_service(SimpleNamespace(shape={"dp": 3, "sp": 2}), 4096)
    cap = cc(meshy, 512)
    assert cap >= 1 and pb(meshy, cap) <= (4096 * 6) // 512


def _tiny_extractor_and_models(seed=5):
    """Random tiny flax x-vector model + matching synthetic 32-d transform
    and 16-d PLDA so the full audio path runs without reference weights."""
    import jax
    import jax.numpy as jnp

    from vbx_tpu.engine.extractor import XVectorExtractor
    from vbx_tpu.models.resnet import BasicBlock, ResNetXVector

    fs = 16000
    fm = ResNetXVector(block=BasicBlock, num_blocks=(1, 1, 1, 1),
                       feat_dim=64, embed_dim=32)
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 144), jnp.float32),
                        lengths=jnp.array([144]))
    ex = XVectorExtractor(fm, variables, fs, batch_size=8)
    rng = np.random.default_rng(seed)
    mean1 = rng.normal(size=32) * 0.01
    lda = rng.normal(size=(32, 16))
    mean2 = rng.normal(size=16) * 0.01
    mu = rng.normal(size=16) * 0.01
    tr = rng.normal(size=(16, 16)) + 4 * np.eye(16)
    psi = np.linspace(2.0, 0.2, 16)
    cfg = get_preset("example").replace(lda_dim=16)
    return ex, cfg, (mu, tr, psi), (mean1, lda, mean2), fs


def test_audio_request_matches_extract_then_diarize():
    """An audio request (wav + VAD through the in-daemon extractor) must
    equal extracting x-vectors first and submitting those."""
    ex, cfg, plda, transform, fs = _tiny_extractor_and_models()
    rng = np.random.default_rng(11)
    signal = rng.uniform(-0.5, 0.5, 8 * fs)
    vad = np.array([[0.2, 4.0], [4.5, 7.8]])

    with DiarizationService(cfg, plda, transform, extractor=ex) as svc:
        res_audio = svc.diarize_audio("recA", signal, vad, timeout=300)
        segs = ex.extract_file(signal, vad, "recA")
        x = np.stack([s.xvector for s in segs])
        ts = np.array([[s.start, s.end] for s in segs])
        res_xv = svc.diarize("recA", x, ts, timeout=300)
        # no extractor -> audio requests are a configuration error
        with pytest.raises(RuntimeError):
            DiarizationService(cfg, plda, transform).submit_audio(
                "x", signal, vad)

    assert len(res_audio.labels1st) == len(segs) > 5
    np.testing.assert_array_equal(res_audio.labels1st, res_xv.labels1st)
    assert res_audio.rttm == res_xv.rttm
    # timestamps came from the extractor's window semantics
    assert res_audio.rttm.startswith("SPEAKER recA 1 ")


def test_http_wav_request(tmp_path):
    """POST /diarize with a server-local wav + lab file; a server without
    an extractor answers 400."""
    from vbx_tpu.cli.serve import make_handler
    from vbx_tpu.io.wav import write_wav

    ex, cfg, plda, transform, fs = _tiny_extractor_and_models()
    rng = np.random.default_rng(12)
    signal = rng.uniform(-0.5, 0.5, 6 * fs)
    wav = str(tmp_path / "recW.wav")
    write_wav(wav, signal, fs)
    (tmp_path / "recW.lab").write_text("0.20 3.50 sp\n4.00 5.70 sp\n")

    def start(svc):
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(base, payload):
        req = urllib.request.Request(
            f"{base}/diarize", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    svc = DiarizationService(cfg, plda, transform, extractor=ex)
    httpd, base = start(svc)
    try:
        code, out = post(base, {"wav_file": wav,
                                "lab_file": str(tmp_path / "recW.lab")})
        assert code == 200, out
        assert out["recording"] == "recW"       # name from the wav path
        assert out["rttm"].startswith("SPEAKER recW 1 ")
        assert out["n_speakers"] >= 1
        # inline VAD form agrees with the .lab form
        code, out2 = post(base, {
            "wav_file": wav, "vad": [[0.20, 3.50], [4.00, 5.70]]})
        assert code == 200 and out2["rttm"] == out["rttm"]
        # wrong sample rate is a 400
        wav8 = str(tmp_path / "recW8.wav")
        write_wav(wav8, signal[:8000], 8000)
        code, err = post(base, {"wav_file": wav8, "vad": [[0.0, 0.5]]})
        assert code == 400 and "sample rate" in err["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()
        svc.close()

    svc2 = DiarizationService(cfg, plda, transform)   # no extractor
    httpd2, base2 = start(svc2)
    try:
        code, err = post(base2, {"wav_file": wav,
                                 "lab_file": str(tmp_path / "recW.lab")})
        assert code == 400 and "x-vector model" in err["error"]
    finally:
        httpd2.shutdown()
        httpd2.server_close()
        svc2.close()


@needs_assets
def test_serve_main_subprocess_sigterm(tmp_path):
    """Boot the real daemon process (cli.serve.main), serve one request,
    then SIGTERM it and require a graceful drain."""
    import signal
    import socket
    import subprocess
    import sys as _sys
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [_sys.executable, "-m", "vbx_tpu.cli.serve",
         "--plda-file", PLDA, "--xvec-transform", H5,
         "--port", str(port), "--no-warmup"],
        env=env, stderr=subprocess.PIPE, cwd="/root/repo")
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):
            try:
                with urllib.request.urlopen(f"{base}/healthz",
                                            timeout=5) as r:
                    assert json.loads(r.read())["status"] == "ok"
                break
            except OSError:
                time.sleep(0.5)
                assert proc.poll() is None, proc.stderr.read().decode()
        else:
            raise AssertionError("daemon never came up")
        req = urllib.request.Request(
            f"{base}/diarize",
            data=json.dumps({
                "xvec_ark_file": f"{REF}/exp/ES2005a.ark",
                "segments_file": f"{REF}/exp/ES2005a.seg"}).encode())
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json.loads(r.read())
        assert out["results"]["ES2005a"]["n_speakers"] == 5
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
        assert b"drained and stopped" in proc.stderr.read()
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


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

    def post(path, payload, _retried=False):
        req = urllib.request.Request(
            f"{base}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())
        except (ConnectionError, http.client.RemoteDisconnected,
                urllib.error.URLError) as exc:
            # ThreadingHTTPServer can drop a connection under heavy host
            # load (observed when a second test suite runs concurrently);
            # urllib wraps send-phase socket errors in URLError. One retry
            # distinguishes load flakes from a real server fault.
            if isinstance(exc, urllib.error.URLError) and not isinstance(
                    getattr(exc, "reason", None), (ConnectionError,
                                                   http.client.
                                                   RemoteDisconnected)):
                raise
            if _retried:
                raise
            return post(path, payload, _retried=True)

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


@needs_assets
def test_cohort_spanning_many_chunks(tmp_path):
    """A cohort larger than the frames-budget chunk cap must split into
    several device chunks (streamed launches + the bounded in-flight
    fetch discipline) and still match the offline pipeline exactly."""
    ark, seg, names, recs = _corpus_requests(tmp_path, n_rec=6)
    off_dir = str(tmp_path / "offline")
    offline = diarize_ark(ark, seg, off_dir, get_preset("example"),
                          PLDA, H5, verbose=False)

    # ~170-frame recordings pad to the 256 bucket; a 512-frame budget
    # caps each chunk at 2 requests -> 6 requests = 3+ chunks
    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            batch_window_ms=500.0, max_batch_frames=512) as svc:
        futs = {rec: svc.submit(rec, x, ts)
                for rec, (x, ts) in recs.items()}
        results = {rec: f.result(timeout=240) for rec, f in futs.items()}
        stats = svc.stats()
    assert stats["failed"] == 0
    assert max(r.batch_size for r in results.values()) <= 2
    for rec in names:
        np.testing.assert_array_equal(results[rec].labels1st,
                                      offline[rec].labels1st)


def test_request_size_limit(tmp_path):
    """One oversized request is rejected at submit instead of exhausting
    the daemon's memory (O(N^2) init + padded device buffers)."""
    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            max_request_xvectors=100) as svc:
        with pytest.raises(ValueError, match="max_request_xvectors"):
            svc.submit("big", np.zeros((101, 256), np.float32),
                       np.zeros((101, 2)))
        # at the limit is fine (init runs; content is junk but finite)
        fut = svc.submit("ok", np.random.default_rng(0).normal(
            size=(100, 256)).astype(np.float32),
            np.stack([np.arange(100) * 0.24,
                      np.arange(100) * 0.24 + 1.44], 1))
        assert fut.result(timeout=120).n_speakers >= 1


@needs_assets
def test_partial_launch_frees_cohort_from_straggler_init(tmp_path):
    """VERDICT r2 #5 (head-of-line): with partial launches, requests whose
    init completes promptly ride an early PARTIAL device chunk instead of
    waiting for a cohort-mate whose init stalls; with
    partial_after_ms=inf they all wait and ride one chunk. Results match
    either way (batch-size independence). The straggler is deterministic:
    its init is wrapped with a sleep."""
    import time as _time

    from vbx_tpu.engine.pipeline import Diarizer

    ark, seg, names, recs = _corpus_requests(tmp_path, n_rec=4)
    slow = names[0]
    # give the straggler a UNIQUE length: the split recordings are equal-
    # sized, and the sleep gate below identifies it by len(x)
    sx, sts = recs[slow]
    recs[slow] = (sx[:len(sx) - 17], sts[:len(sx) - 17])
    real_init = Diarizer.initial_labels

    def slow_init(self, x, seed=0):
        if len(x) == len(recs[slow][0]) and _slow_gate["armed"]:
            _slow_gate["armed"] = False
            _time.sleep(2.0)
        return real_init(self, x, seed=seed)

    results = {}
    for partial_ms in (float("inf"), 60.0):
        _slow_gate = {"armed": True}
        Diarizer.initial_labels = slow_init
        try:
            # wide batch window: all four submissions must land in ONE
            # cohort or the wait-mode phase trivially splits
            svc = DiarizationService.from_files(
                get_preset("example"), PLDA, H5,
                partial_after_ms=partial_ms, batch_window_ms=400.0)
            try:
                # straggler first so it anchors the cohort
                futs = {rec: svc.submit(rec, *recs[rec])
                        for rec in [slow] + [n for n in names
                                             if n != slow]}
                results[partial_ms] = {rec: f.result(timeout=300)
                                       for rec, f in futs.items()}
            finally:
                svc.close()
        finally:
            Diarizer.initial_labels = real_init

    fast = [n for n in names if n != slow]
    r_wait, r_part = results[float("inf")], results[60.0]
    # identical RTTMs in both modes (partial batches invisible to callers)
    for rec in names:
        assert r_wait[rec].rttm == r_part[rec].rttm, rec
    # with partials, the prompt requests ride a chunk SMALLER than the
    # cohort (they did not wait out the straggler's 1 s init)...
    assert all(r_part[rec].batch_size < len(names) for rec in fast), \
        {rec: r_part[rec].batch_size for rec in fast}
    # ...and complete well before the straggler's init even finishes
    # (margin absorbs a first-use compile of the partial chunk's B shape)
    assert max(r_part[rec].wall_ms for rec in fast) < 1800.0
    # without them, nothing launches until every init (including the 2 s
    # straggler) has finished, so every fast request pays the whole stall
    # (bucket shapes vary with each split's AHC cluster count, so the
    # timing is the robust assertion, not batch sizes)
    assert min(r_wait[rec].wall_ms for rec in fast) > 2000.0


@needs_assets
def test_warmup_rides_exact_batch_shapes(tmp_path):
    """warmup() must load exactly the padded batch executables traffic
    will ride: partial launches are suspended for its waves, so a wave of
    k requests forms ONE device chunk of size k even when the inits
    stagger (the round-3 serving battery showed a multi-second first-
    cohort tail when a split warmup wave skipped the B=16 executable)."""
    _, _, names, recs = _corpus_requests(tmp_path, n_rec=1)
    x, ts = recs[names[0]]
    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            partial_after_ms=1.0,      # aggressive: would split any wave
            batch_window_ms=200.0) as svc:
        res = svc.warmup(batch_sizes=(4,), payload=(x, ts))
        stats = svc.stats()
    assert res.batch_size == 4
    assert stats["max_batch"] == 4
    # and the payload really warmed the request's own (T, S) bucket:
    # the warmup result has the same label count as a direct request
    assert res.n_speakers >= 1


@needs_assets
def test_dispatcher_failure_fails_all_futures(tmp_path):
    """An unexpected dispatcher failure must fail EVERY pending request's
    future — including requests absorbed into the working set mid-cohort
    (round-4 continuous admission) — rather than leaving them hanging."""
    svc = DiarizationService.from_files(get_preset("example"), PLDA, H5,
                                        batch_window_ms=100.0)
    try:
        svc._chunk_cap = lambda t_pad: (_ for _ in ()).throw(
            RuntimeError("boom"))
        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 256)).astype(np.float32)
        ts = np.stack([np.arange(64) * 0.24,
                       np.arange(64) * 0.24 + 1.44], axis=1)
        futs = [svc.submit(f"r{i}", x, ts) for i in range(4)]
        for f in futs:
            with pytest.raises(RuntimeError, match="boom"):
                f.result(timeout=120)
    finally:
        svc.close()


@needs_assets
def test_dispatcher_soak_mixed_sizes_and_jitter(tmp_path):
    """Soak the continuous-admission dispatcher: staggered submissions of
    mixed-length requests from many threads (arrivals land mid-cohort by
    construction), all with tight partial-launch deadlines. Every future
    must complete and match the single-request result for its payload —
    no hangs, no cross-request mixups, no starvation."""
    import threading
    import time as _time

    from vbx_tpu.io.ark import group_by_recording, iter_vec_ark

    _, _, x_full = next(group_by_recording(
        iter_vec_ark(f"{REF}/exp/ES2005a.ark")))
    rng = np.random.default_rng(0)
    lengths = [40, 64, 170, 170, 256, 40, 300, 64, 170, 256,
               40, 300, 170, 64, 256, 40, 170, 300, 64, 170]
    payloads = {}
    for i, L in enumerate(lengths):
        off = int(rng.integers(0, len(x_full) - L))
        x = np.asarray(x_full[off:off + L], np.float32)
        ts = np.stack([np.arange(L) * 0.24,
                       np.arange(L) * 0.24 + 1.44], axis=1)
        payloads[f"req{i:02d}"] = (x, ts)

    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            batch_window_ms=5.0, partial_after_ms=10.0) as svc:
        # per-payload expected results, one at a time (batch-composition
        # independence makes these the oracle for the concurrent run)
        expected = {rec: svc.diarize(rec, x, ts, timeout=300).labels1st
                    for rec, (x, ts) in payloads.items()}

        futs = {}
        lock = threading.Lock()

        def client(recs):
            for rec in recs:
                x, ts = payloads[rec]
                _time.sleep(float(rng.integers(0, 30)) / 1000.0)
                f = svc.submit(rec + "_c", x, ts)
                with lock:
                    futs[rec] = f

        names = list(payloads)
        threads = [threading.Thread(target=client, args=(names[k::4],))
                   for k in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for rec, f in futs.items():
            res = f.result(timeout=300)
            np.testing.assert_array_equal(res.labels1st, expected[rec],
                                          err_msg=rec)
        assert svc.stats()["failed"] == 0


@needs_assets
def test_admission_bound_sheds_load(tmp_path):
    """max_pending_requests back-pressure (ADVICE round 4): every admitted
    VB request pins padded device planes from init time until launch, so
    the admitted-but-unfinished working set is bounded — submit() raises
    ServiceOverloaded at the cap instead of growing HBM without bound,
    and completions release their slot."""
    from vbx_tpu.serving import ServiceOverloaded, _Request

    _, _, names, recs = _corpus_requests(tmp_path, n_rec=2)
    x_raw, ts = recs[names[0]]
    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            max_pending_requests=2) as svc:
        # deterministically saturate the accounting (submission timing
        # would race real completions): claim both slots...
        _probe_a = _Request("probe_a", x_raw, ts)
        _probe_b = _Request("probe_b", x_raw, ts)
        with svc._lock:
            svc._admit(_probe_a)
            svc._admit(_probe_b)
        # ...then the next real submit must shed load loudly
        with pytest.raises(ServiceOverloaded, match="max_pending_requests"):
            svc.submit(names[0], x_raw, ts)
        assert svc.stats()["pending"] == 2
        # releasing a slot re-opens admission; a real request then runs
        # to completion and releases itself
        svc._release(_probe_a)
        svc._release(_probe_b)
        fut = svc.submit(names[0], x_raw, ts)
        assert fut.result(timeout=300).n_speakers >= 1
        assert svc.stats()["pending"] == 0


@needs_assets
def test_serving_default_engine_overrides_corpus_bf16(monkeypatch):
    """Round-5 engine-of-record: a daemon built on a corpus preset must
    NOT default to the preset's bf16 run-to-max engine (a batch-throughput
    choice that runs every request max_iters with stops disabled);
    fb_impl=None resolves to the f32 adaptive pallas engine on an
    accelerator. An explicit fb_impl always wins."""
    import vbx_tpu.engine.pipeline as pl
    from vbx_tpu.config import get_preset

    monkeypatch.setattr(pl.jax, "default_backend", lambda: "tpu")
    cfg = get_preset("ami_mixheadset")
    assert cfg.vb.fb_impl == "pallas_bf16"
    with DiarizationService.from_files(cfg, PLDA, H5) as svc:
        assert svc._fb_impl == "pallas"
    with DiarizationService.from_files(cfg, PLDA, H5,
                                       fb_impl="pallas_bf16") as svc:
        assert svc._fb_impl == "pallas_bf16"


@needs_assets
def test_http_overload_returns_503(tmp_path):
    """Back-pressure surfaces as HTTP 503 + Retry-After (an operational
    state for load balancers to act on), not a 500 server fault."""
    import urllib.error

    from vbx_tpu.cli.serve import make_handler

    _, _, names, recs = _corpus_requests(tmp_path, n_rec=2)
    x_raw, ts = recs[names[0]]
    svc = DiarizationService.from_files(get_preset("example"), PLDA, H5,
                                        max_pending_requests=1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with svc._lock:          # deterministically saturate the bound
            svc._pending = svc._max_pending
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/diarize",
            data=json.dumps({"recording": "r",
                             "xvectors": x_raw[:4].tolist(),
                             "timestamps": ts[:4].tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=60):
                raise AssertionError("expected HTTP 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers.get("Retry-After") == "1"
            assert "max_pending_requests" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        with svc._lock:
            svc._pending = 0
        svc.close()


@needs_assets
def test_admission_backpressure_soak(tmp_path):
    """Sustained overload against a small max_pending_requests: clients
    that retry on ServiceOverloaded must all eventually complete, with
    the pending gauge back at zero — guards the admission/release
    interplay (no slot leak, no deadlock with the dispatcher's absorb
    loop)."""
    import time as _t
    from concurrent.futures import ThreadPoolExecutor

    from vbx_tpu.serving import ServiceOverloaded

    _, _, names, recs = _corpus_requests(tmp_path, n_rec=2)
    x_raw, ts = recs[names[0]]
    with DiarizationService.from_files(
            get_preset("example"), PLDA, H5,
            max_pending_requests=3, batch_window_ms=10.0) as svc:
        def one(i):
            for _ in range(300):
                try:
                    fut = svc.submit(f"soak{i}", x_raw, ts)
                    break
                except ServiceOverloaded:
                    _t.sleep(0.02)
            else:
                raise AssertionError("never admitted")
            return fut.result(timeout=300).n_speakers

        with ThreadPoolExecutor(max_workers=8) as pool:
            spk = list(pool.map(one, range(24)))
        assert all(s >= 1 for s in spk)
        assert svc.stats()["pending"] == 0
        assert svc.stats()["failed"] == 0
