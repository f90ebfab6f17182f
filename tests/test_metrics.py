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


# ---------------------------------------------------------------------------
# VERDICT r1 #3: md-eval edge-case battery — event-exact vs 10 ms-rasterized
# DER cross-checked on the boundary configurations md-eval is quirky about.
# Divergences are enumerated in PARITY.md ("Rasterized scoring mode").
# ---------------------------------------------------------------------------

def _der(ref, sys_, **kw):
    return score_recording(ref, sys_, **kw).der


def _both(ref, sys_, **kw):
    return (_der(ref, sys_, **kw),
            _der(ref, sys_, rasterize=0.01, **kw))


def test_rasterized_equals_exact_on_grid_aligned_inputs():
    """Inputs already on the 10 ms grid must score IDENTICALLY in both
    modes (snapping is then the identity)."""
    ref = [Turn(0.00, 1.50, "a"), Turn(1.50, 3.20, "b"),
           Turn(2.70, 4.00, "a")]
    sys_ = [Turn(0.00, 1.60, "1"), Turn(1.60, 4.00, "2")]
    for kw in (dict(), dict(collar=0.25), dict(collar=0.25,
                                               ignore_overlaps=True)):
        e, r = _both(ref, sys_, **kw)
        assert e == pytest.approx(r, abs=1e-9), kw


def test_rasterized_collar_at_adjacent_same_speaker_boundary():
    """Adjacent same-speaker ref turns keep their (collared) boundary in
    both modes — the knife-edge behind the golden 7.06 (see
    _merge_same_speaker). Off-grid boundaries snap before collars cut."""
    # boundary at 1.495 snaps to 1.50 (half-up); collar .25 cuts
    # [1.245,1.745] exact vs [1.25,1.75] rasterized
    ref = [Turn(0.0, 1.495, "a"), Turn(1.495, 3.0, "a")]
    sys_ = [Turn(0.0, 1.495, "1"), Turn(1.495, 3.0, "2")]
    e, r = _both(ref, sys_, collar=0.25)
    # boundaries at 0.0/1.495/3.0 -> cuts [-.25,.25],[1.245,1.745],[2.75,3.25]
    # scored regions [0.25,1.245] (0.995 s) + [1.745,2.75] (1.005 s); the
    # Hungarian maps the LARGER sys overlap ("2", 1.005 s) to "a", so the
    # 0.995 s of sys "1" is the confusion: DER = 100*0.995/2.0
    assert e == pytest.approx(100 * 0.995 / 2.0)
    assert r == pytest.approx(e, abs=1.0)           # 1 quantum per boundary
    # same-speaker ADJACENCY itself must not be merged away by snapping:
    # a system boundary inside the collar is forgiven in both modes
    sys_ok = [Turn(0.0, 1.3, "1"), Turn(1.3, 3.0, "1")]
    e2, r2 = _both(ref, sys_ok, collar=0.25)
    assert e2 == 0.0 and r2 == 0.0


def test_rasterized_overlap_crossing_uem_edge():
    """Overlapping ref turns crossing a UEM edge: overlap exclusion and
    UEM clipping must compose identically in both modes."""
    ref = [Turn(0.0, 2.004, "a"), Turn(1.496, 4.0, "b")]
    sys_ = [Turn(0.0, 2.0, "1"), Turn(2.0, 4.0, "2")]
    for uem in [(1.0, 3.0), (0.5, 2.002), [(0.0, 1.5), (2.5, 4.0)]]:
        e, r = _both(ref, sys_, ignore_overlaps=True, uem=uem)
        assert r == pytest.approx(e, abs=1.5), uem
        e2, r2 = _both(ref, sys_, uem=uem)
        assert r2 == pytest.approx(e2, abs=1.5), uem


def test_rasterized_zero_and_subquantum_turns():
    """Zero-duration turns never score; sub-half-quantum turns VANISH in
    the rasterized mode (md-eval cannot see events shorter than its time
    resolution) — an enumerated divergence."""
    ref = [Turn(0.0, 2.0, "a"), Turn(1.0, 1.0, "b"),      # zero-duration
           Turn(2.0, 2.004, "c")]                          # 4 ms turn
    sys_ = [Turn(0.0, 2.0, "1")]
    e = score_recording(ref, sys_)
    r = score_recording(ref, sys_, rasterize=0.01)
    # zero-duration b never scores in EITHER mode (clipping drops empty
    # intervals); exact: speaker c misses its 0.004 s; rasterized: c's
    # sub-half-quantum turn vanishes entirely
    assert e.missed == pytest.approx(0.004)
    assert r.missed == 0.0
    assert e.n_ref_speakers == 2 and r.n_ref_speakers == 1
    assert e.scored_time == pytest.approx(2.004)
    assert r.scored_time == pytest.approx(2.0)


def test_rasterized_multiple_uem_regions():
    ref = [Turn(0.0, 5.0, "a"), Turn(5.0, 10.0, "b")]
    sys_ = [Turn(0.0, 5.003, "1"), Turn(5.003, 10.0, "2")]
    uem = [(0.0, 2.0), (3.0, 6.997), (8.0, 10.0)]
    e, r = _both(ref, sys_, uem=uem)
    assert r == pytest.approx(e, abs=0.5)
    # and with collars on top
    e2, r2 = _both(ref, sys_, uem=uem, collar=0.25)
    assert r2 == pytest.approx(e2, abs=0.5)


def test_rasterized_randomized_battery():
    """Fuzz: random off-grid turn sets; |exact − rasterized| error TIME is
    bounded by one quantum per boundary event, and rasterize=1e-4 (finer
    than the jitter) converges to the exact score."""
    rng = np.random.default_rng(3)
    for trial in range(25):
        def turns(n, labels):
            ts = []
            for _ in range(n):
                s = rng.uniform(0, 20)
                ts.append(Turn(round(s, 4), round(s + rng.uniform(0.05, 4), 4),
                               str(rng.integers(labels))))
            return ts
        ref = turns(8, 3)
        sys_ = turns(8, 4)
        kw = dict(collar=float(rng.choice([0.0, 0.25])),
                  ignore_overlaps=bool(rng.integers(2)))
        ex = score_recording(ref, sys_, **kw)
        ra = score_recording(ref, sys_, rasterize=0.01, **kw)
        fine = score_recording(ref, sys_, rasterize=1e-4, **kw)
        # ~2 boundaries/turn + 2 collar cuts/ref boundary, 1 quantum each
        budget = 0.01 * (2 * len(ref) * 3 + 2 * len(sys_))
        assert abs(ex.error_time - ra.error_time) <= budget, trial
        assert abs(ex.scored_time - ra.scored_time) <= budget, trial
        assert fine.der == pytest.approx(ex.der, abs=0.2), trial
