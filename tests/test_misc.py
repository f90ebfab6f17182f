"""Smaller parity/robustness items: --output-2nd, profiling no-op, config."""

import os

import numpy as np
import pytest

from vbx_tpu.config import DATASET_PRESETS, get_preset
from vbx_tpu.utils.profiling import annotate, trace

REF = "/root/reference"
needs_assets = pytest.mark.skipif(
    not os.path.exists(f"{REF}/exp/ES2005a.ark"),
    reason="reference assets not mounted")


def test_presets_match_recipes_of_record():
    """The hyperparameters hard-coded in the reference recipes
    (BASELINE.md table)."""
    ch = get_preset("callhome")
    assert (ch.vb.Fa, ch.vb.Fb, ch.vb.loop_prob) == (0.4, 17.0, 0.40)
    assert ch.ahc.init_smoothing == 7.0 and ch.sample_rate == 8000
    ami = get_preset("ami_mixheadset")
    assert (ami.vb.Fa, ami.vb.Fb, ami.vb.loop_prob) == (0.4, 68.0, 0.65)
    amib = get_preset("ami_beamformed")
    assert amib.vb.Fb == 64.0
    dh = get_preset("dihard2")
    assert (dh.vb.Fa, dh.vb.Fb, dh.vb.loop_prob) == (0.2, 6.0, 0.35)
    ex = get_preset("example")
    assert (ex.vb.Fa, ex.vb.Fb, ex.vb.loop_prob) == (0.3, 17.0, 0.99)
    assert ex.ahc.init_smoothing == 5.0
    assert all(p.ahc.threshold == -0.015 for p in DATASET_PRESETS.values())
    with pytest.raises(KeyError):
        get_preset("nope")


@needs_assets
def test_output_2nd(tmp_path):
    from vbx_tpu.engine.pipeline import diarize_ark
    cfg = get_preset("example").replace(output_2nd=True)
    outs = diarize_ark(
        f"{REF}/exp/ES2005a.ark", f"{REF}/exp/ES2005a.seg", str(tmp_path),
        cfg, f"{REF}/VBx/models/ResNet101_16kHz/plda",
        f"{REF}/VBx/models/ResNet101_16kHz/transform.h5", verbose=False)
    o = outs["ES2005a"]
    assert o.labels2nd is not None
    assert np.all(o.labels2nd != o.labels1st)     # 2nd best differs
    assert (tmp_path / "ES2005a.rttm").exists()
    # pipeline writes the 2nd-best rttms next to the primary dir
    second = tmp_path.parent / (tmp_path.name + "2nd")
    assert (second / "ES2005a.rttm").exists()


def test_profiling_noop():
    with trace() as d:
        assert d is None
    with annotate("x"):
        pass
