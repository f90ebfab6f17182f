"""Batched multi-recording pipeline: bucketed-padded engine vs streaming."""

import os

import numpy as np
import pytest

from vbx_tpu.config import get_preset
from vbx_tpu.engine.pipeline import diarize_ark
from vbx_tpu.io.ark import iter_vec_ark, write_vec_ark
from vbx_tpu.io.segments import read_segments, write_segments

from .util import split_ark_corpus

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.exists(f"{REF}/exp/ES2005a.ark"),
    reason="reference assets not mounted")


def _split_ark(tmp_path):
    """Make a 2-recording corpus by splitting ES2005a in half."""
    ark, seg, _ = split_ark_corpus(tmp_path, n_rec=2, ark_name="two.ark",
                                   seg_name="two.seg")
    return ark, seg


@needs_ref
def test_streamed_chunking_multi_bucket(tmp_path):
    """The eager doubling-chunk dispatcher (launches at B=1,1,2,4,... as
    init completes, leftovers after the pool) must reproduce the streaming
    path across many recordings spanning several (T, S) buckets."""
    vecs = list(iter_vec_ark(f"{REF}/exp/ES2005a.ark"))
    segs = read_segments(f"{REF}/exp/ES2005a.seg")
    # 7 recordings with lengths in two T-octaves (<=256 and <=512), forcing
    # multiple doubling launches in the big bucket plus a leftover chunk
    sizes = [120, 130, 140, 150, 300, 310, 160]
    out_vecs, out_rows, pos = [], [], 0
    for r, sz in enumerate(sizes):
        rec = f"rec{r}"
        for j in range(sz):
            key, v = vecs[pos % len(vecs)]
            sname, _, s, e = segs[pos % len(segs)]
            out_vecs.append((f"{rec}_{j:04d}", v))
            out_rows.append((f"{rec}_{j:04d}", rec, s, e))
            pos += 1
    write_vec_ark(str(tmp_path / "many.ark"), out_vecs)
    write_segments(str(tmp_path / "many.seg"), out_rows)
    cfg = get_preset("example")
    kw = dict(config=cfg,
              plda_file=f"{REF}/VBx/models/ResNet101_16kHz/plda",
              transform_file=f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
              verbose=False)
    out_b = diarize_ark(str(tmp_path / "many.ark"), str(tmp_path / "many.seg"),
                        str(tmp_path / "b"), batch=True, **kw)
    out_s = diarize_ark(str(tmp_path / "many.ark"), str(tmp_path / "many.seg"),
                        str(tmp_path / "s"), batch=False, **kw)
    assert set(out_b) == {f"rec{r}" for r in range(len(sizes))}
    for rec in out_b:
        # padding T/S to the bucket shape changes XLA reduction order, so
        # the f32 ELBO can quantize across the epsilon stop one iteration
        # apart (same effect as PARITY deviation 3); the fixed point and
        # labels must agree, which is what guards the chunk routing
        assert abs(out_b[rec].n_iters - out_s[rec].n_iters) <= 1, rec
        rb = open(tmp_path / "b" / f"{rec}.rttm").read()
        rs = open(tmp_path / "s" / f"{rec}.rttm").read()
        assert rb == rs, rec


@needs_ref
def test_degenerate_recordings_batched(tmp_path):
    """Production corpora contain degenerate recordings: a single-speaker
    file (identical pairwise scores -> zero-variance calibration), a
    one-x-vector file, a two-frame file. All must flow through the batched
    path alongside a normal recording, matching the streaming path."""
    rng = np.random.default_rng(0)
    vecs, rows = [], []
    c = rng.standard_normal(256)
    for j in range(60):
        v = (c + 0.01 * rng.standard_normal(256)).astype(np.float32)
        vecs.append((f"rec0_{j:04d}", v))
        rows.append((f"rec0_{j:04d}", "rec0", j * 0.24, j * 0.24 + 1.44))
    vecs.append(("rec1_0000", rng.standard_normal(256).astype(np.float32)))
    rows.append(("rec1_0000", "rec1", 0.0, 1.44))
    for j in range(2):
        vecs.append((f"rec2_{j:04d}",
                     rng.standard_normal(256).astype(np.float32)))
        rows.append((f"rec2_{j:04d}", "rec2", j * 0.24, j * 0.24 + 1.44))
    c2 = rng.standard_normal((2, 256))
    for j in range(80):
        v = (c2[j // 40] + 0.3 * rng.standard_normal(256)).astype(np.float32)
        vecs.append((f"rec3_{j:04d}", v))
        rows.append((f"rec3_{j:04d}", "rec3", j * 0.24, j * 0.24 + 1.44))
    write_vec_ark(str(tmp_path / "d.ark"), vecs)
    write_segments(str(tmp_path / "d.seg"), rows)
    kw = dict(config=get_preset("example"),
              plda_file=f"{REF}/VBx/models/ResNet101_16kHz/plda",
              transform_file=f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
              verbose=False)
    out_b = diarize_ark(str(tmp_path / "d.ark"), str(tmp_path / "d.seg"),
                        str(tmp_path / "b"), batch=True, **kw)
    out_s = diarize_ark(str(tmp_path / "d.ark"), str(tmp_path / "d.seg"),
                        str(tmp_path / "s"), batch=False, **kw)
    assert {r: o.n_speakers for r, o in out_b.items()} == \
        {"rec0": 1, "rec1": 1, "rec2": 1, "rec3": 2}
    for rec in out_b:
        rb = open(tmp_path / "b" / f"{rec}.rttm").read()
        rs = open(tmp_path / "s" / f"{rec}.rttm").read()
        assert rb == rs, rec


@needs_ref
def test_failed_recording_is_isolated(tmp_path, monkeypatch, capsys):
    """One bad recording must not kill the corpus (reference parity: the
    process-per-recording fan-out isolates failures, AMI_run.sh:53-58):
    it is skipped with a warning, the rest produce RTTMs. A
    single-recording run still fails visibly."""
    import vbx_tpu.engine.pipeline as P

    ark, seg = _split_ark(tmp_path)       # recA (512 frames), recB (513)
    kw = dict(config=get_preset("example"),
              plda_file=f"{REF}/VBx/models/ResNet101_16kHz/plda",
              transform_file=f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
              verbose=False)

    real = P.ahc_labels

    def failing(x, *a, **k):
        if x.shape[0] == 512:             # recA only
            raise RuntimeError("synthetic init failure")
        return real(x, *a, **k)

    monkeypatch.setattr(P, "ahc_labels", failing)
    for batch in (True, False):
        out = diarize_ark(ark, seg, str(tmp_path / f"o{batch}"),
                          batch=batch, **kw)
        assert set(out) == {"recB"}, batch
        assert (tmp_path / f"o{batch}" / "recB.rttm").exists()
        assert not (tmp_path / f"o{batch}" / "recA.rttm").exists()
        assert "synthetic init failure" in capsys.readouterr().err

    # failures out-param + CLI signal
    failures = {}
    diarize_ark(ark, seg, str(tmp_path / "of"), batch=True,
                failures=failures, **kw)
    assert set(failures) == {"recA"} and "synthetic" in failures["recA"]

    # resume re-run with ONLY the bad recording left must still skip it
    # (strictness follows the original request, and the previously-finished
    # recording keeps the all-failed guard from firing)
    out = diarize_ark(ark, seg, str(tmp_path / "of"), batch=True,
                      resume=True, **kw)
    assert out == {}
    capsys.readouterr()

    # a corpus where EVERYTHING fails must raise, not return empty
    monkeypatch.setattr(P, "ahc_labels",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("all broken")))
    with pytest.raises(RuntimeError, match="recording\\(s\\) failed"):
        diarize_ark(ark, seg, str(tmp_path / "oall"), batch=True, **kw)
    capsys.readouterr()
    monkeypatch.setattr(P, "ahc_labels", failing)

    # single recording: the error must surface, not be swallowed
    vecs = [(k, v) for k, v in iter_vec_ark(ark) if k.startswith("recA")]
    segs = [r for r in read_segments(seg) if r[1] == "recA"]
    write_vec_ark(str(tmp_path / "one.ark"), vecs)
    write_segments(str(tmp_path / "one.seg"), segs)
    with pytest.raises(RuntimeError, match="synthetic init failure"):
        diarize_ark(str(tmp_path / "one.ark"), str(tmp_path / "one.seg"),
                    str(tmp_path / "o1"), batch=True, **kw)


@needs_ref
def test_batched_equals_streaming(tmp_path):
    ark, seg = _split_ark(tmp_path)
    cfg = get_preset("example")
    common = (ark, seg)
    kw = dict(config=cfg,
              plda_file=f"{REF}/VBx/models/ResNet101_16kHz/plda",
              transform_file=f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
              verbose=False)
    out_b = diarize_ark(*common, str(tmp_path / "b"), batch=True, **kw)
    out_s = diarize_ark(*common, str(tmp_path / "s"), batch=False, **kw)
    assert set(out_b) == {"recA", "recB"}
    for rec in ("recA", "recB"):
        assert out_b[rec].n_iters == out_s[rec].n_iters, rec
        agree = np.mean(out_b[rec].labels1st == out_s[rec].labels1st)
        assert agree > 0.999, (rec, agree)
        rb = open(tmp_path / "b" / f"{rec}.rttm").read()
        rs = open(tmp_path / "s" / f"{rec}.rttm").read()
        assert rb == rs, rec


@needs_ref
def test_plateau_preset_rttm_identical_to_reference_rule(tmp_path):
    """VERDICT r2 #2: corpus presets enable the f32 plateau stop. Pin both
    modes through the full batched pipeline on an AMI-preset corpus: the
    plateau run may shave EM iterations but the RTTMs must be byte-
    identical, and it must never run LONGER."""
    vecs = list(iter_vec_ark(f"{REF}/exp/ES2005a.ark"))
    segs = read_segments(f"{REF}/exp/ES2005a.seg")
    sizes = [200, 210, 400]
    out_vecs, out_rows, pos = [], [], 0
    for r, sz in enumerate(sizes):
        rec = f"rec{r}"
        for j in range(sz):
            _, v = vecs[pos % len(vecs)]
            _, _, s, e = segs[pos % len(segs)]
            out_vecs.append((f"{rec}_{j:04d}", v))
            out_rows.append((f"{rec}_{j:04d}", rec, s, e))
            pos += 1
    write_vec_ark(str(tmp_path / "c.ark"), out_vecs)
    write_segments(str(tmp_path / "c.seg"), out_rows)
    cfg_on = get_preset("ami_mixheadset")
    assert cfg_on.vb.plateau_ulps > 0      # preset really enables it
    import dataclasses
    cfg_off = cfg_on.replace(
        vb=dataclasses.replace(cfg_on.vb, plateau_ulps=0.0))
    kw = dict(plda_file=f"{REF}/VBx/models/ResNet101_16kHz/plda",
              transform_file=f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
              verbose=False)
    out_on = diarize_ark(str(tmp_path / "c.ark"), str(tmp_path / "c.seg"),
                         str(tmp_path / "on"), config=cfg_on, **kw)
    out_off = diarize_ark(str(tmp_path / "c.ark"), str(tmp_path / "c.seg"),
                          str(tmp_path / "off"), config=cfg_off, **kw)
    for rec in out_off:
        assert out_on[rec].n_iters <= out_off[rec].n_iters, rec
        r_on = open(tmp_path / "on" / f"{rec}.rttm").read()
        r_off = open(tmp_path / "off" / f"{rec}.rttm").read()
        assert r_on == r_off, rec


def test_top2_device_never_selects_padded_lane():
    """_top2_device guards padded speaker lanes with a -1 fill: a frame
    whose valid responsibilities underflow to exactly 0 must still pick
    indices < S_true (an unmasked top_k would tie 0-valued valid lanes
    with 0-valued padding and could emit an out-of-range label)."""
    import jax.numpy as jnp

    from vbx_tpu.engine.pipeline import _top2_device

    B, T, S_true, S_pad = 2, 4, 2, 5
    g = np.zeros((B, T, S_pad), np.float32)
    g[:, :, 0] = 1.0
    g[0, 1] = 0.0                       # all-zero frame (underflow case)
    sm = np.zeros((B, S_pad), bool)
    sm[:, :S_true] = True
    l1, l2 = _top2_device(jnp.asarray(g), jnp.asarray(sm))
    assert np.asarray(l1).max() < S_true
    assert np.asarray(l2).max() < S_true
    # deterministic lowest-index tie-break on the all-zero frame
    assert int(l1[0, 1]) == 0 and int(l2[0, 1]) == 1


def test_batched_pre_stage_linkage_matches_unbatched(tmp_path, monkeypatch):
    """Round-5 corpus pre-stage: eligible mid-N recordings' NN-chain
    walks run as ONE batched device call before the init pool; the
    resulting labels/RTTMs must equal the all-host pipeline's. Activated
    here on CPU by shrinking the eligibility band and faking a non-CPU
    backend for the pipeline's gate (the batched walk itself runs fine on
    the CPU backend at test sizes)."""
    import vbx_tpu.engine.ahc as ahc_mod
    import vbx_tpu.engine.pipeline as pl

    rng = np.random.default_rng(0)
    out_vecs, out_rows = [], []
    for r in range(3):
        T = 700 + 30 * r
        centers = rng.standard_normal((3, 256)) * 0.5
        x = centers[rng.integers(0, 3, T)] \
            + 0.7 * rng.standard_normal((T, 256))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        for i in range(T):
            out_vecs.append((f"rec{r}_{i:06d}", x[i].astype(np.float32)))
            out_rows.append((f"rec{r}_{i:06d}", f"rec{r}",
                             round(i * 0.24, 3), round(i * 0.24 + 1.44, 3)))
    ark = str(tmp_path / "p.ark")
    seg = str(tmp_path / "p.seg")
    write_vec_ark(ark, out_vecs)
    write_segments(seg, out_rows)
    cfg = get_preset("example")
    plda = f"{REF}/VBx/models/ResNet101_16kHz/plda"
    h5 = f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"

    ref = diarize_ark(ark, seg, str(tmp_path / "host"), cfg, plda, h5,
                      verbose=False)

    # activate the pre-stage: recordings of ~700 frames become "mid-N"
    monkeypatch.setattr(ahc_mod, "_BLOCKED_MIN_N", 512)
    monkeypatch.setattr(ahc_mod, "_DEVICE_LINKAGE_MIN_N", 512)
    monkeypatch.setattr(pl.jax, "default_backend", lambda: "tpu")
    calls = []
    from vbx_tpu.clustering import device as dev
    real = dev.linkage_dot_avg_device_batched

    def spy(xns):
        calls.append(len(xns))
        return real(xns)

    monkeypatch.setattr(dev, "linkage_dot_avg_device_batched", spy)
    # the calibration batches too (round-5 continuation): one device
    # threshold sweep per group, amortizing the per-pass dispatch
    import vbx_tpu.ops.calibration as calib_mod
    calib_calls = []
    real_calib = calib_mod.two_gmm_calib_cosine_device_batched

    def calib_spy(xns, **kw):
        calib_calls.append(len(xns))
        return real_calib(xns, **kw)

    monkeypatch.setattr(calib_mod, "two_gmm_calib_cosine_device_batched",
                        calib_spy)
    got = diarize_ark(ark, seg, str(tmp_path / "pre"), cfg, plda, h5,
                      verbose=False)
    assert calls == [3]          # one batched call covering all three
    assert calib_calls == [3]    # and one batched calibration sweep
    for rec in ref:
        np.testing.assert_array_equal(got[rec].labels1st,
                                      ref[rec].labels1st)
        a = open(str(tmp_path / "host" / f"{rec}.rttm")).read()
        b = open(str(tmp_path / "pre" / f"{rec}.rttm")).read()
        assert a == b


def test_batched_pre_stage_groups_by_size(tmp_path, monkeypatch):
    """A batched linkage call pads every lane to the group's max N, so
    recordings whose padded extents differ by >2x split into separate
    batched calls (one hour-long file must not inflate a dozen short
    meetings' lanes)."""
    import vbx_tpu.engine.ahc as ahc_mod
    import vbx_tpu.engine.pipeline as pl

    rng = np.random.default_rng(1)
    out_vecs, out_rows = [], []
    for r, T in enumerate((600, 640, 1500)):
        centers = rng.standard_normal((3, 256)) * 0.5
        x = centers[rng.integers(0, 3, T)] \
            + 0.7 * rng.standard_normal((T, 256))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        for i in range(T):
            out_vecs.append((f"rec{r}_{i:06d}", x[i].astype(np.float32)))
            out_rows.append((f"rec{r}_{i:06d}", f"rec{r}",
                             round(i * 0.24, 3), round(i * 0.24 + 1.44, 3)))
    ark = str(tmp_path / "g.ark")
    seg = str(tmp_path / "g.seg")
    write_vec_ark(ark, out_vecs)
    write_segments(seg, out_rows)
    cfg = get_preset("example")
    plda = f"{REF}/VBx/models/ResNet101_16kHz/plda"
    h5 = f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"

    monkeypatch.setattr(ahc_mod, "_BLOCKED_MIN_N", 512)
    monkeypatch.setattr(ahc_mod, "_DEVICE_LINKAGE_MIN_N", 512)
    monkeypatch.setattr(pl.jax, "default_backend", lambda: "tpu")
    calls = []
    from vbx_tpu.clustering import device as dev
    real = dev.linkage_dot_avg_device_batched

    def spy(xns):
        calls.append(sorted(len(x) for x in xns))
        return real(xns)

    monkeypatch.setattr(dev, "linkage_dot_avg_device_batched", spy)
    out = diarize_ark(ark, seg, str(tmp_path / "o"), cfg, plda, h5,
                      verbose=False)
    assert calls == [[600, 640], [1500]]
    assert len(out) == 3
