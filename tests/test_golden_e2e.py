"""Golden end-to-end acceptance test: the reference's shipped ES2005a
x-vectors through the full pipeline must reproduce the published scoring
table (reference README.md:51-57: DER 7.06 forgiving) — the de-facto
acceptance test of the reference (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from vbx_tpu.config import get_preset
from vbx_tpu.engine.pipeline import diarize_ark
from vbx_tpu.metrics.der import der_from_rttm_files

REF = "/root/reference"
ARK = f"{REF}/exp/ES2005a.ark"
SEG = f"{REF}/exp/ES2005a.seg"
PLDA = f"{REF}/VBx/models/ResNet101_16kHz/plda"
H5 = f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"
GOLD_RTTM = f"{REF}/example/rttm/ES2005a.rttm"

needs_assets = pytest.mark.skipif(
    not os.path.exists(ARK), reason="reference assets not mounted")


@needs_assets
def test_es2005a_golden_der(tmp_path):
    outs = diarize_ark(ARK, SEG, str(tmp_path), get_preset("example"),
                       PLDA, H5, verbose=False)
    o = outs["ES2005a"]
    assert o.n_speakers == 5            # survey-verified surviving speakers
    per, tot = der_from_rttm_files(
        GOLD_RTTM, str(tmp_path / "ES2005a.rttm"),
        collar=0.25, ignore_overlaps=True)
    assert tot.der == pytest.approx(7.06, abs=0.006)  # README.md:55 (exact 7.0634)
    assert tot.jer == pytest.approx(29.99, abs=0.5)
    # fair protocol sanity: overlaps scored -> strictly worse
    _, fair = der_from_rttm_files(GOLD_RTTM, str(tmp_path / "ES2005a.rttm"),
                                  collar=0.25, ignore_overlaps=False)
    assert fair.der > tot.der


@needs_assets
def test_es2005a_f32_engine_matches_f64_labels(tmp_path):
    """The f32 (TPU-dtype) engine must reach the same diarization as the
    f64 oracle-parity configuration."""
    import dataclasses

    cfg64 = get_preset("example")
    cfg64 = cfg64.replace(vb=dataclasses.replace(cfg64.vb, dtype="float64"))
    out64 = diarize_ark(ARK, SEG, str(tmp_path / "a"), cfg64, PLDA, H5,
                        verbose=False)["ES2005a"]
    out32 = diarize_ark(ARK, SEG, str(tmp_path / "b"), get_preset("example"),
                        PLDA, H5, verbose=False)["ES2005a"]
    agree = np.mean(out64.labels1st == out32.labels1st)
    assert agree > 0.999, agree


@needs_assets
def test_es2005a_golden_der_pallas_bf16(tmp_path):
    """The bf16-stream throughput mode (fb_impl='pallas_bf16') must keep
    the golden acceptance result: 5 speakers, DER 7.06, and the same
    labels as the default engine."""
    out_bf = diarize_ark(ARK, SEG, str(tmp_path / "bf"),
                         get_preset("example"), PLDA, H5, verbose=False,
                         fb_impl="pallas_bf16")["ES2005a"]
    assert out_bf.n_speakers == 5
    per, tot = der_from_rttm_files(
        GOLD_RTTM, str(tmp_path / "bf" / "ES2005a.rttm"),
        collar=0.25, ignore_overlaps=True)
    assert tot.der == pytest.approx(7.06, abs=0.006)
    out_def = diarize_ark(ARK, SEG, str(tmp_path / "def"),
                          get_preset("example"), PLDA, H5,
                          verbose=False)["ES2005a"]
    agree = np.mean(out_def.labels1st == out_bf.labels1st)
    assert agree > 0.999, agree


@needs_assets
def test_es2005a_golden_without_native_library(tmp_path, monkeypatch):
    """The full pipeline must reproduce the golden result with the native
    C++ library UNAVAILABLE: linkage/fcluster fall back to scipy,
    histogram moments to numpy bincounts, and the 2-GMM EM to the numpy
    reference loop — the documented degradation story for hosts where
    the .so cannot build."""
    import vbx_tpu.clustering as cl

    monkeypatch.setattr(cl, "_lib", None)
    monkeypatch.setattr(cl, "_lib_failed", True)
    outs = diarize_ark(ARK, SEG, str(tmp_path), get_preset("example"),
                       PLDA, H5, verbose=False)
    assert outs["ES2005a"].n_speakers == 5
    _, tot = der_from_rttm_files(
        GOLD_RTTM, str(tmp_path / "ES2005a.rttm"),
        collar=0.25, ignore_overlaps=True)
    assert tot.der == pytest.approx(7.06, abs=0.006)
