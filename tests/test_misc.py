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


def test_config_dict_roundtrip_and_yaml(tmp_path):
    from vbx_tpu.config import (config_from_dict, config_to_dict,
                                get_preset)

    cfg = get_preset("dihard2")
    assert config_from_dict(config_to_dict(cfg)) == cfg

    # preset base + nested partial overrides
    cfg2 = config_from_dict(
        {"preset": "ami_mixheadset", "init": "random_8+VB",
         "vb": {"loop_prob": 0.5}, "protocols": ["fair"]})
    assert cfg2.vb.loop_prob == 0.5
    assert cfg2.vb.Fb == 68.0                  # preset value preserved
    assert cfg2.init == "random_8+VB"
    assert cfg2.protocols == ("fair",)

    # typo safety
    with pytest.raises(KeyError, match="unknown config key"):
        config_from_dict({"looprob": 0.5})
    with pytest.raises(KeyError, match="unknown vb config key"):
        config_from_dict({"vb": {"fa": 1.0}})
    with pytest.raises(TypeError, match="must be a mapping"):
        config_from_dict({"vb": 3})

    # get_preset dispatches on file extension
    y = tmp_path / "my.yaml"
    y.write_text("preset: callhome\nvb:\n  Fa: 0.9\nlda_dim: 64\n")
    cfg3 = get_preset(str(y))
    assert cfg3.vb.Fa == 0.9 and cfg3.vb.Fb == 17.0 and cfg3.lda_dim == 64
    assert cfg3.sample_rate == 8000            # callhome base

    bad = tmp_path / "bad.yaml"
    bad.write_text("- a\n- b\n")
    with pytest.raises(TypeError, match="mapping at top level"):
        get_preset(str(bad))


def test_timer_records_elapsed(caplog):
    import logging
    import time as _time

    from vbx_tpu.utils.timing import Timer

    with caplog.at_level(logging.INFO, logger="vbx_tpu"):
        with Timer("stage-x") as t:
            _time.sleep(0.01)
    assert t.elapsed >= 0.01
    msgs = [r.message for r in caplog.records]
    assert any("Start: stage-x" in m for m in msgs)
    assert any("End: stage-x" in m for m in msgs)
    # log=False stays silent
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="vbx_tpu"):
        with Timer("quiet", log=False):
            pass
    assert not caplog.records


def test_compile_cache_enable(tmp_path, monkeypatch):
    import jax

    from vbx_tpu.utils.compile_cache import enable

    prev = jax.config.jax_compilation_cache_dir
    try:
        # respects an already-configured dir
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "pre"))
        assert enable(str(tmp_path / "other")) == str(tmp_path / "pre")
        # sets + creates when unset
        jax.config.update("jax_compilation_cache_dir", None)
        got = enable(str(tmp_path / "cache"))
        assert got == str(tmp_path / "cache") and os.path.isdir(got)
        # off switch
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("VBX_TPU_COMPILE_CACHE", "off")
        assert enable() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_corpus_presets_enable_plateau_stop():
    """The f32 plateau stop (VBConfig.plateau_ulps) is ON in the corpus
    presets — their |ELBO| scales are where quantum cycling taxes batched
    runs — and OFF in 'example' (golden acceptance stays reference-exact)
    and in the bare VBConfig default."""
    from vbx_tpu.config import DATASET_PRESETS, VBConfig

    assert VBConfig().plateau_ulps == 0.0
    assert DATASET_PRESETS["example"].vb.plateau_ulps == 0.0
    for name in ("callhome", "ami_beamformed", "ami_mixheadset", "dihard2"):
        assert DATASET_PRESETS[name].vb.plateau_ulps > 0, name
        assert DATASET_PRESETS[name].vb.plateau_iters >= 1, name


def test_corpus_presets_engine_of_record_and_resolution():
    """Corpus presets carry the measured engine of record (VBConfig.fb_impl
    = 'pallas_bf16', A/B bounds in scripts/ab_corpus_engine.py); 'example'
    stays on the reference-exact default. resolve_fb_impl: an explicit
    argument wins, and a preset's pallas pick resolves to the engine
    default on the CPU backend (interpret-mode pallas is not a speedup)."""
    import jax

    from vbx_tpu.config import DATASET_PRESETS
    from vbx_tpu.engine.pipeline import resolve_fb_impl

    assert DATASET_PRESETS["example"].vb.fb_impl is None
    for name in ("callhome", "ami_beamformed", "ami_mixheadset", "dihard2"):
        assert DATASET_PRESETS[name].vb.fb_impl == "pallas_bf16", name

    ami = DATASET_PRESETS["ami_mixheadset"]
    assert resolve_fb_impl("structured", ami) == "structured"  # explicit
    assert resolve_fb_impl("pallas", ami) == "pallas"
    # tests run on the CPU backend (conftest): the preset's pallas pick
    # must resolve back to the default engine there
    assert jax.default_backend() == "cpu"
    assert resolve_fb_impl(None, ami) is None
    assert resolve_fb_impl(None, DATASET_PRESETS["example"]) is None


def test_bf16_stop_policy_resolution():
    """effective_vb_stop: a resolved 'pallas_bf16' with bf16_run_to_max
    (the default) disables both stop rules — its bf16-stream ELBO noise
    fires them 3-5x early at corpus scale (VBConfig.bf16_run_to_max has
    the chip measurements); every other engine keeps the configured
    rules, as does bf16 with the flag off."""
    import dataclasses
    import math

    from vbx_tpu.config import DATASET_PRESETS
    from vbx_tpu.engine.pipeline import effective_vb_stop

    ami = DATASET_PRESETS["ami_mixheadset"]
    eps, pu, pit = effective_vb_stop(ami, "pallas_bf16")
    assert eps == -math.inf and pu == 0.0

    for fb in (None, "structured", "pallas", "assoc"):
        eps, pu, pit = effective_vb_stop(ami, fb)
        assert eps == ami.vb.epsilon and pu == ami.vb.plateau_ulps, fb

    off = ami.replace(vb=dataclasses.replace(ami.vb, bf16_run_to_max=False))
    eps, pu, pit = effective_vb_stop(off, "pallas_bf16")
    assert eps == ami.vb.epsilon and pu == ami.vb.plateau_ulps
