"""Corpus recipe runner (recipes/run_corpus.py): diarization + score stages
end-to-end on a tiny precomputed-x-vector corpus, including the idempotent
re-entry semantics mirrored from the reference recipes (AMI_run.sh:51)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from vbx_tpu.io.ark import iter_vec_ark, write_vec_ark
from vbx_tpu.io.segments import read_segments, write_segments

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.exists(f"{REF}/exp/ES2005a.ark"),
    reason="reference assets not mounted")

_spec = importlib.util.spec_from_file_location(
    "run_corpus", os.path.join(os.path.dirname(__file__), "..",
                               "recipes", "run_corpus.py"))
run_corpus = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(run_corpus)


@needs_ref
def test_diarization_and_score_stages(tmp_path, capsys):
    # corpus of two recordings: ES2005a split in half
    vecs = list(iter_vec_ark(f"{REF}/exp/ES2005a.ark"))
    segs = read_segments(f"{REF}/exp/ES2005a.seg")
    half = len(vecs) // 2
    out_vecs, out_rows = [], []
    for i, ((key, v), (sname, _, s, e)) in enumerate(zip(vecs, segs)):
        rec = "recA" if i < half else "recB"
        out_vecs.append((f"{rec}_{key.split('_', 1)[1]}", v))
        out_rows.append((f"{rec}_{key.split('_', 1)[1]}", rec, s, e))
    exp = tmp_path / "exp"
    exp.mkdir()
    write_vec_ark(str(exp / "xvectors.ark"), out_vecs)
    write_segments(str(exp / "xvectors.seg"), out_rows)
    (tmp_path / "list.txt").write_text("recA\nrecB\n")
    refdir = tmp_path / "refs"
    refdir.mkdir()
    # reference RTTMs: relabel the golden annotation per half (timing is
    # shared; we only check the stage plumbing, not absolute DER)
    golden = open(f"{REF}/example/rttm/ES2005a.rttm").read()
    for rec in ("recA", "recB"):
        (refdir / f"{rec}.rttm").write_text(
            golden.replace("ES2005a", rec))

    argv_common = ["--preset", "example",
                   "--list-file", str(tmp_path / "list.txt"),
                   "--exp-dir", str(exp),
                   "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
                   "--xvec-transform",
                   f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"]
    assert run_corpus.main(["diarization"] + argv_common) == 0
    all_rttm = exp / "all.rttm"
    assert all_rttm.exists()
    body = all_rttm.read_text()
    assert "recA" in body and "recB" in body
    assert (exp / "diarization.jsonl").exists()

    # idempotent re-entry: a second run skips (all.rttm exists)
    mtime = all_rttm.stat().st_mtime_ns
    assert run_corpus.main(["diarization"] + argv_common) == 0
    assert all_rttm.stat().st_mtime_ns == mtime
    assert "skip" in capsys.readouterr().err

    assert run_corpus.main(
        ["score"] + argv_common + ["--ref-rttm-dir", str(refdir)]) == 0
    out = capsys.readouterr().out
    assert "forgiving" in out and "DER" in out


@needs_ref
def test_score_stage_protocols_and_stale_filtering(tmp_path, capsys):
    # pure score-stage fixture: golden system output vs golden reference
    exp = tmp_path / "exp"
    refdir = tmp_path / "refs"
    exp.mkdir()
    refdir.mkdir()
    golden_sys = open(f"{REF}/exp/ES2005a.rttm").read()
    (refdir / "ES2005a.rttm").write_text(
        open(f"{REF}/example/rttm/ES2005a.rttm").read())
    (tmp_path / "list.txt").write_text("ES2005a\n")
    # stale extra recording in all.rttm (from a hypothetical larger run):
    # must be filtered out, not scored as pure false alarm
    (exp / "all.rttm").write_text(
        golden_sys + "SPEAKER GHOST 1 0.00 100.00 <NA> <NA> 1 <NA> <NA>\n")

    argv = ["score", "--list-file", str(tmp_path / "list.txt"),
            "--exp-dir", str(exp), "--ref-rttm-dir", str(refdir)]

    assert run_corpus.main(argv + ["--preset", "example"]) == 0
    out = capsys.readouterr().out
    assert "forgiving: DER 7.06" in out          # ghost filtered out
    assert "fair:" in out and "full:" in out

    # DIHARD2's protocols of record are fair+full only (DIHARD2_run.sh:61-62)
    assert run_corpus.main(argv + ["--preset", "dihard2"]) == 0
    out = capsys.readouterr().out
    assert "forgiving" not in out
    assert "fair:" in out and "full:" in out


def test_stage_specific_required_flags(tmp_path, capsys):
    lst = tmp_path / "list.txt"
    lst.write_text("rec\n")
    with pytest.raises(SystemExit) as exc:
        run_corpus.main(["xvectors", "--preset", "example",
                         "--list-file", str(lst),
                         "--exp-dir", str(tmp_path)])
    assert exc.value.code == 2                   # argparse usage error
    err = capsys.readouterr().err
    assert "--wav-dir" in err and "--weights" in err
