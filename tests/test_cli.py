"""CLI surfaces: diarize + score driven end-to-end in-process."""

import os

import pytest

from vbx_tpu.cli.diarize import main as diarize_main
from vbx_tpu.cli.score import main as score_main

REF = "/root/reference"
needs_assets = pytest.mark.skipif(
    not os.path.exists(f"{REF}/exp/ES2005a.ark"),
    reason="reference assets not mounted")


@needs_assets
def test_diarize_then_score_cli(tmp_path, capsys):
    rc = diarize_main([
        "--init", "AHC+VB",
        "--out-rttm-dir", str(tmp_path),
        "--xvec-ark-file", f"{REF}/exp/ES2005a.ark",
        "--segments-file", f"{REF}/exp/ES2005a.seg",
        "--xvec-transform", f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
        "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
        "--threshold", "-0.015", "--lda-dim", "128",
        "--Fa", "0.3", "--Fb", "17", "--loopP", "0.99"])
    assert rc == 0
    assert (tmp_path / "ES2005a.rttm").exists()

    rc = score_main([
        "-r", f"{REF}/example/rttm/ES2005a.rttm",
        "-s", str(tmp_path / "ES2005a.rttm"),
        "--collar", "0.25", "--ignore_overlaps"])
    assert rc == 0
    out = capsys.readouterr().out
    overall = [line for line in out.splitlines()
               if line.startswith("*** OVERALL ***")][0]
    der = float(overall.split("\t")[1])
    assert der == pytest.approx(7.06, abs=0.02)


@needs_assets
def test_diarize_cli_mesh_matches_default(tmp_path):
    """--mesh DPxSP routes VB through the sharded engine; the golden
    recording's RTTM must match the default engine's byte-for-byte."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU backend")
    argv_common = [
        "--init", "AHC+VB",
        "--xvec-ark-file", f"{REF}/exp/ES2005a.ark",
        "--segments-file", f"{REF}/exp/ES2005a.seg",
        "--xvec-transform", f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
        "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
        "--threshold", "-0.015", "--lda-dim", "128",
        "--Fa", "0.3", "--Fb", "17", "--loopP", "0.99"]
    for tag, extra in (("mesh", ["--mesh", "4x2"]), ("solo", [])):
        rc = diarize_main(
            ["--out-rttm-dir", str(tmp_path / tag)] + argv_common + extra)
        assert rc == 0
    assert ((tmp_path / "mesh" / "ES2005a.rttm").read_text()
            == (tmp_path / "solo" / "ES2005a.rttm").read_text())


def test_diarize_rejects_bad_mesh_spec(tmp_path):
    with pytest.raises(SystemExit, match="mesh"):
        diarize_main([
            "--init", "AHC+VB", "--out-rttm-dir", str(tmp_path),
            "--xvec-ark-file", "x", "--segments-file", "x",
            "--xvec-transform", "x", "--plda-file", "x",
            "--mesh", "4by2"])


def test_diarize_rejects_bad_loopP(tmp_path):
    with pytest.raises(SystemExit):
        diarize_main([
            "--init", "AHC+VB", "--out-rttm-dir", str(tmp_path),
            "--xvec-ark-file", "x", "--segments-file", "x",
            "--xvec-transform", "x", "--plda-file", "x",
            "--threshold", "-0.015", "--lda-dim", "128",
            "--Fa", "0.3", "--Fb", "17", "--loopP", "1.5"])


@needs_assets
def test_score_cli_missing_sys_recording(tmp_path, capsys):
    (tmp_path / "empty.rttm").write_text("")
    rc = score_main([
        "-r", f"{REF}/example/rttm/ES2005a.rttm",
        "-s", str(tmp_path / "empty.rttm"), "--collar", "0.25"])
    assert rc == 0
    out = capsys.readouterr()
    overall = [line for line in out.out.splitlines()
               if line.startswith("*** OVERALL ***")][0]
    assert float(overall.split("\t")[1]) == pytest.approx(100.0)
    assert "missing" in out.err


@needs_assets
def test_reference_entry_point_aliases(tmp_path):
    """`python -m vbx_tpu.cli.vbhmm` / `.predict` are drop-in aliases for
    the reference entry points: the exact flag shapes the reference
    recipes generate (AMI_run.sh:56, extract.sh:32-34 incl. `--gpus=`)
    must parse and run."""
    from vbx_tpu.cli.predict import build_parser as predict_parser
    from vbx_tpu.cli.vbhmm import main as vbhmm_main

    rc = vbhmm_main([
        "--init", "AHC+VB",
        "--out-rttm-dir", str(tmp_path),
        "--xvec-ark-file", f"{REF}/exp/ES2005a.ark",
        "--segments-file", f"{REF}/exp/ES2005a.seg",
        "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
        "--xvec-transform", f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
        "--threshold", "-0.015", "--init-smoothing", "5.0",
        "--lda-dim", "128", "--Fa", "0.3", "--Fb", "17", "--loopP", "0.99"])
    assert rc == 0 and (tmp_path / "ES2005a.rttm").exists()

    args = predict_parser().parse_args([
        "--seg-len", "144", "--seg-jump", "24", "--model", "ResNet101",
        "--weights", "w.pth", "--gpus=", "--ndim", "64",
        "--embed-dim", "256", "--in-file-list", "l.txt",
        "--in-lab-dir", "lab", "--in-wav-dir", "wav",
        "--out-ark-fn", "x.ark", "--out-seg-fn", "x.seg"])
    assert args.seg_len == 144 and args.gpus == ""


def test_diarize_preset_target_energy_not_clobbered(tmp_path):
    """--target-energy left unset must preserve the preset/YAML value."""
    from vbx_tpu.cli.diarize import build_parser, config_from_args

    y = tmp_path / "cfg.yaml"
    y.write_text("preset: example\nahc:\n  target_energy: 0.3\n")
    argv = ["--init", "AHC+VB", "--out-rttm-dir", "o", "--xvec-ark-file",
            "a", "--segments-file", "s", "--xvec-transform", "t",
            "--plda-file", "p", "--preset", str(y)]
    cfg = config_from_args(build_parser().parse_args(argv))
    assert cfg.ahc.target_energy == 0.3
    cfg2 = config_from_args(build_parser().parse_args(
        argv + ["--target-energy", "0.7"]))
    assert cfg2.ahc.target_energy == 0.7


def test_score_rejects_recordings_missing_from_uem(tmp_path, capsys):
    from vbx_tpu.cli.score import main as score_main

    r = tmp_path / "ref.rttm"
    s = tmp_path / "sys.rttm"
    r.write_text("SPEAKER recA 1 0.0 5.0 <NA> <NA> x <NA> <NA>\n")
    s.write_text("SPEAKER recA 1 0.0 5.0 <NA> <NA> 1 <NA> <NA>\n")
    u = tmp_path / "cover.uem"
    u.write_text("recB 1 0.0 10.0\n")           # recA absent
    rc = score_main(["-r", str(r), "-s", str(s), "-u", str(u)])
    assert rc == 1
    assert "missing from" in capsys.readouterr().err


def test_extract_model_file_takes_precedence(tmp_path, monkeypatch):
    """--model-file (whole pickled torch model) wins over --weights
    (reference: predict.py:117-119)."""
    pytest.importorskip("torch")
    from vbx_tpu.cli import extract as extract_cli

    seen = {}

    def fake_load(path, **kw):
        seen["path"] = path
        raise SystemExit(0)          # stop before any real extraction

    import vbx_tpu.models.resnet as resnet_mod
    monkeypatch.setattr(resnet_mod, "load_torch_checkpoint", fake_load)
    argv = ["--weights", "w.pth", "--model-file", "whole.pt",
            "--in-file-list", "l", "--in-lab-dir", "d", "--in-wav-dir", "d",
            "--out-ark-fn", "o.ark", "--out-seg-fn", "o.seg"]
    with pytest.raises(SystemExit):
        extract_cli.main(argv)
    assert seen["path"] == "whole.pt"


@needs_assets
def test_diarize_cli_ahc_fallback_flags(tmp_path, capsys):
    """--ahc-fallback-n / --ahc-fallback-speakers reach the engine: the
    1025-vector golden recording exceeds a tiny threshold and initializes
    with random_<K> instead of AHC."""
    rc = diarize_main([
        "--init", "AHC+VB", "--out-rttm-dir", str(tmp_path),
        "--xvec-ark-file", f"{REF}/exp/ES2005a.ark",
        "--segments-file", f"{REF}/exp/ES2005a.seg",
        "--xvec-transform", f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
        "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
        "--ahc-fallback-n", "500", "--ahc-fallback-speakers", "8"])
    assert rc == 0
    assert "AHC fallback" in capsys.readouterr().err
    assert (tmp_path / "ES2005a.rttm").exists()
