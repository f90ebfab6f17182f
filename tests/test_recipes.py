"""Corpus recipe runner (recipes/run_corpus.py): diarization + score stages
end-to-end on a tiny precomputed-x-vector corpus, including the idempotent
re-entry semantics mirrored from the reference recipes (AMI_run.sh:51)."""

import importlib.util
import os

import numpy as np
import pytest

from vbx_tpu.io.ark import iter_vec_ark
from vbx_tpu.io.segments import read_segments

from .util import split_ark_corpus

from .util import import_reference

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
    exp = tmp_path / "exp"
    _, _, names = split_ark_corpus(exp, n_rec=2)
    (tmp_path / "list.txt").write_text("".join(f"{n}\n" for n in names))
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
    assert run_corpus.main(["diarization", "--fb-impl", "structured"]
                           + argv_common) == 0
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


@needs_ref
def test_xvectors_stage_plumbing(tmp_path, monkeypatch, capsys):
    """stage_xvectors end-to-end with a tiny model monkeypatched over the
    ResNet101 checkpoint loader (full-fidelity extraction fidelity is
    test_extractor's job): wav+lab in, ark+seg out, extractor config from
    the preset, and the both-outputs re-entry rule."""
    torch = pytest.importorskip("torch")
    ref_resnet = import_reference("models.resnet")

    from vbx_tpu.io.wav import write_wav
    from vbx_tpu.models.resnet import (BasicBlock, ResNetXVector,
                                       convert_torch_state_dict)

    torch.manual_seed(0)
    tm = ref_resnet.ResNet(ref_resnet.BasicBlock, [1, 1, 1, 1],
                           feat_dim=64, embed_dim=32)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_torch_state_dict(sd, num_blocks=(1, 1, 1, 1))
    fm = ResNetXVector(block=BasicBlock, num_blocks=(1, 1, 1, 1),
                       feat_dim=64, embed_dim=32)

    import vbx_tpu.models.resnet as resnet_mod
    monkeypatch.setattr(resnet_mod, "load_torch_checkpoint",
                        lambda path, **kw: (fm, {**params, **stats}))

    wav_dir = tmp_path / "wav"
    lab_dir = tmp_path / "lab"
    exp = tmp_path / "exp"
    wav_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    for rec in ("recA", "recB"):
        write_wav(str(wav_dir / f"{rec}.wav"),
                  0.1 * rng.standard_normal(2 * 16000), 16000)
        (lab_dir / f"{rec}.lab").write_text("0.10 1.90 sp\n")
    (tmp_path / "list.txt").write_text("recA\nrecB\n")

    argv = ["xvectors", "--preset", "example",
            "--list-file", str(tmp_path / "list.txt"),
            "--exp-dir", str(exp), "--wav-dir", str(wav_dir),
            "--lab-dir", str(lab_dir), "--weights", "unused.pth"]
    assert run_corpus.main(argv) == 0
    ark = exp / "xvectors.ark"
    seg = exp / "xvectors.seg"
    vecs = dict(iter_vec_ark(str(ark)))
    rows = read_segments(str(seg))
    assert len(vecs) == len(rows) > 0
    assert {r[1] for r in rows} == {"recA", "recB"}
    for v in vecs.values():
        assert v.shape == (32,) and np.all(np.isfinite(v))

    # re-entry: complete outputs -> skip; missing seg -> re-extract
    mtime = ark.stat().st_mtime_ns
    assert run_corpus.main(argv) == 0
    assert "skip" in capsys.readouterr().err
    assert ark.stat().st_mtime_ns == mtime
    seg.unlink()
    assert run_corpus.main(argv) == 0
    assert seg.exists()          # a half-written stage is not "complete"
