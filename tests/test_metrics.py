"""Scorer: DER/JER event-based scoring vs hand-computed cases."""

import numpy as np
import pytest

from vbx_tpu.metrics.der import Turn, score_corpus, score_recording


def T(s, e, spk):
    return Turn(s, e, spk)


def test_perfect_match():
    ref = [T(0, 10, "a"), T(12, 20, "b")]
    r = score_recording(ref, [T(0, 10, "x"), T(12, 20, "y")], collar=0.0)
    assert r.der == pytest.approx(0.0, abs=1e-9)
    assert r.jer == pytest.approx(0.0, abs=1e-9)


def test_pure_miss():
    ref = [T(0, 10, "a")]
    r = score_recording(ref, [T(0, 5, "x")], collar=0.0)
    assert r.missed == pytest.approx(5.0)
    assert r.falarm == pytest.approx(0.0)
    assert r.confusion == pytest.approx(0.0)
    assert r.der == pytest.approx(50.0)


def test_false_alarm_inside_uem():
    # sys speech beyond ref extends the UEM; FA time counted
    ref = [T(0, 10, "a")]
    r = score_recording(ref, [T(0, 10, "x"), T(10, 12, "x")], collar=0.0)
    assert r.falarm == pytest.approx(2.0)
    assert r.der == pytest.approx(20.0)


def test_confusion_with_optimal_mapping():
    # two ref speakers; sys swaps one half -> mapping picks the better match
    ref = [T(0, 10, "a"), T(10, 20, "b")]
    sys = [T(0, 10, "x"), T(10, 15, "x"), T(15, 20, "y")]
    r = score_recording(ref, sys, collar=0.0)
    # x->a (10s), y->b (5s); 10..15 b spoken but attributed to x => confusion
    assert r.confusion == pytest.approx(5.0)
    assert r.der == pytest.approx(25.0)


def test_collar_removes_boundary_regions():
    ref = [T(0, 10, "a")]
    # sys misses 0.2s at each end; collar 0.25 forgives both
    sys = [T(0.2, 9.8, "x")]
    assert score_recording(ref, sys, collar=0.25).der == pytest.approx(0.0)
    assert score_recording(ref, sys, collar=0.0).der > 0


def test_ignore_overlaps():
    ref = [T(0, 10, "a"), T(4, 6, "b")]   # overlap region 4..6
    sys = [T(0, 10, "x")]                 # misses b entirely
    fair = score_recording(ref, sys, collar=0.0)
    forgiving = score_recording(ref, sys, collar=0.0, ignore_overlaps=True)
    assert fair.missed == pytest.approx(2.0)     # b's 2s in overlap missed
    assert forgiving.missed == pytest.approx(0.0)
    assert forgiving.der == pytest.approx(0.0)


def test_overlap_counts_double_in_scored_time():
    ref = [T(0, 10, "a"), T(0, 10, "b")]
    sys = [T(0, 10, "x")]
    r = score_recording(ref, sys, collar=0.0)
    assert r.scored_time == pytest.approx(20.0)
    assert r.missed == pytest.approx(10.0)
    assert r.der == pytest.approx(50.0)


def test_empty_sys():
    ref = [T(0, 4, "a")]
    r = score_recording(ref, [], collar=0.0)
    assert r.der == pytest.approx(100.0)
    assert r.jer == pytest.approx(100.0)


def test_jer_definition():
    # one ref speaker, sys covers half the time plus an extra half elsewhere:
    # intersection 5, union 15 -> JER = 100*(1 - 5/15)
    ref = [T(0, 10, "a")]
    sys = [T(0, 5, "x"), T(10, 15, "x")]
    r = score_recording(ref, sys, collar=0.0)
    assert r.jer == pytest.approx(100.0 * (1 - 5.0 / 15.0))


def test_score_corpus_time_weighted():
    ref = {"r1": [T(0, 10, "a")], "r2": [T(0, 30, "a")]}
    sys = {"r1": [T(0, 5, "x")], "r2": [T(0, 30, "x")]}
    per, total = score_corpus(ref, sys, collar=0.0)
    assert per["r1"].der == pytest.approx(50.0)
    assert per["r2"].der == pytest.approx(0.0)
    # corpus DER is time-weighted: 5 error / 40 scored
    assert total.der == pytest.approx(12.5)


def test_uem_restriction():
    ref = [T(0, 10, "a"), T(20, 30, "a")]
    sys = [T(0, 10, "x")]          # misses the 20..30 turn entirely
    full = score_recording(ref, sys, collar=0.0)
    assert full.der == pytest.approx(50.0)
    # UEM excluding 15..35 forgives the miss
    r = score_recording(ref, sys, collar=0.0, uem=[(0.0, 15.0)])
    assert r.der == pytest.approx(0.0)
    # multiple intervals
    r2 = score_recording(ref, sys, collar=0.0,
                         uem=[(0.0, 5.0), (25.0, 30.0)])
    assert r2.scored_time == pytest.approx(10.0)
    assert r2.missed == pytest.approx(5.0)


def test_uem_file_roundtrip(tmp_path):
    from vbx_tpu.io.uem import read_uem, write_uem
    uem = {"recA": [(0.0, 10.5)], "recB": [(1.0, 2.0), (3.0, 4.5)]}
    p = tmp_path / "x.uem"
    write_uem(str(p), uem)
    back = read_uem(str(p))
    assert back == uem


def test_same_speaker_turn_merge_semantics():
    """dscore merges strictly OVERLAPPING same-speaker turns (so a
    self-overlap is not 'overlapped speech' and contributes no double
    scored time), but exactly-adjacent turns keep their boundary and its
    collar — the combination that reproduces the published golden score
    exactly (README.md:55)."""
    sys = [T(0, 10, "x")]
    ref2 = [T(0, 6, "a"), T(4, 10, "a")]          # self-overlap 4..6
    r2 = score_recording(ref2, sys, collar=0.0, ignore_overlaps=True)
    assert r2.scored_time == pytest.approx(10.0)  # nothing excluded
    assert r2.der == pytest.approx(0.0)
    r3 = score_recording(ref2, sys, collar=0.0)
    assert r3.scored_time == pytest.approx(10.0)  # no double-counted time
    # adjacent same-speaker boundary still carries a collar cut
    ref = [T(0, 5, "a"), T(5, 10, "a")]
    r = score_recording(ref, sys, collar=0.25)
    assert r.scored_time == pytest.approx(9.0)
    assert r.der == pytest.approx(0.0)


def test_corpus_jer_ignores_zero_ref_recordings():
    ref = {"r1": [T(0, 10, "a")], "r2": []}
    sys = {"r1": [T(0, 10, "x")], "r2": [T(0, 5, "y")]}
    _, total = score_corpus(ref, sys, collar=0.0)
    assert total.jer == pytest.approx(0.0)        # r2 contributes nothing


def test_clip_turns_overlapping_regions():
    """UEM rows may overlap (read verbatim from the file); clipping must
    treat them as a union — the bisect sweep merges first. A turn inside
    the union is kept exactly once."""
    from vbx_tpu.metrics.der import Turn, _clip_turns

    out = _clip_turns([Turn(70.0, 80.0, "a")], [(0.0, 100.0), (50.0, 60.0)])
    assert [(t.start, t.end) for t in out] == [(70.0, 80.0)]
    # disjoint regions split a spanning turn
    out = _clip_turns([Turn(5.0, 25.0, "a")], [(0.0, 10.0), (20.0, 30.0)])
    assert [(t.start, t.end) for t in out] == [(5.0, 10.0), (20.0, 25.0)]


def test_frame_metrics_pool_silent_uem_recordings():
    """A recording whose explicit UEM region contains no speech on either
    side contributes agreeing empty-set frames to the pooled table (its
    omission would shift every corpus-level clustering metric)."""
    from vbx_tpu.metrics.frame_metrics import frame_clustering_metrics

    ref = {"a": [Turn(0.0, 10.0, "x")], "b": []}
    sys = {"a": [Turn(0.0, 10.0, "1")], "b": []}
    uems = {"a": (0.0, 10.0), "b": (0.0, 10.0)}
    with_b = frame_clustering_metrics(ref, sys, uems=uems)
    without_b = frame_clustering_metrics(
        {"a": ref["a"]}, {"a": sys["a"]}, uems={"a": uems["a"]})
    # recording a alone is a perfect single-class match; adding b's 1000
    # silence frames keeps precision/recall perfect but changes entropies
    assert with_b["b3_f1"] == pytest.approx(1.0)
    assert with_b["mi"] != pytest.approx(without_b["mi"])
    # silence frames agree: confusion-free, so NMI stays defined and finite
    assert np.isfinite(with_b["nmi"])
