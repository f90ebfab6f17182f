"""Feature frontend vs the reference NumPy implementation (used as oracle,
imported read-only from /root/reference — SURVEY.md §4)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from vbx_tpu.models.features import (add_dither, cmvn_floating, fbank_config,
                                     fbank_htk, frame_signal, htk_nfft,
                                     mel_filterbank, povey_window)

from .util import import_reference

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(f"{REF}/VBx"),
                               reason="reference not mounted")


def _ref_features():
    # import the module directly off /root/reference/VBx: other test
    # modules put that directory on sys.path too, which shadows the `VBx`
    # package name with the VBx.py module, so `from VBx import features`
    # is order-dependent
    return import_reference("features")


@needs_ref
@pytest.mark.parametrize("fs,winlen,hifreq", [(16000, 400, 7600),
                                              (8000, 200, 3700)])
def test_mel_filterbank_matches_reference(fs, winlen, hifreq):
    ref = _ref_features()
    ours = mel_filterbank(winlen, fs, numchans=64, lofreq=20.0,
                          hifreq=hifreq, htk_bug=False)
    theirs = ref.mel_fbank_mx(winlen, fs, NUMCHANS=64, LOFREQ=20.0,
                              HIFREQ=hifreq, htk_bug=False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


@needs_ref
def test_povey_window_matches_reference():
    ref = _ref_features()
    np.testing.assert_allclose(povey_window(400), ref.povey_window(400),
                               rtol=1e-12)


def test_htk_nfft():
    assert htk_nfft(400) == 512
    assert htk_nfft(200) == 256
    assert htk_nfft(512) == 512


def test_frame_signal():
    x = np.arange(20.0)
    f = np.asarray(frame_signal(jnp.asarray(x), 8, 4))
    assert f.shape == (4, 8)
    np.testing.assert_array_equal(f[0], x[:8])
    np.testing.assert_array_equal(f[1], x[4:12])


@needs_ref
@pytest.mark.parametrize("fs", [16000, 8000])
def test_fbank_matches_reference(fs):
    ref = _ref_features()
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(fs) * 1000.0    # 1 s of noise, int16-ish scale
    window, fbank_mx, winlen, noverlap = fbank_config(fs)

    theirs = ref.fbank_htk(sig, window, noverlap, fbank_mx,
                           USEPOWER=True, ZMEANSOURCE=True)
    ours = np.asarray(fbank_htk(
        jnp.asarray(sig), jnp.asarray(window), jnp.asarray(fbank_mx),
        noverlap=noverlap, use_power=True, zmean_source=True))
    assert ours.shape == theirs.shape == (98, 64)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-9)


@needs_ref
@pytest.mark.parametrize("e_pos", ["first", "last"])
@pytest.mark.parametrize("raw,enorm", [(True, True), (False, True),
                                       (True, False)])
def test_fbank_energy_options_match_reference(e_pos, raw, enorm):
    """The HTK energy coefficient surface (_E / RAWENERGY / ENORMALISE /
    ESCALE / SILFLOOR, reference features.py:59-117) — unused by any
    recipe but part of the frontend's option parity (VERDICT r3 #8)."""
    ref = _ref_features()
    rng = np.random.default_rng(7)
    sig = rng.standard_normal(8000) * 800.0
    window, fbank_mx, winlen, noverlap = fbank_config(16000)
    theirs = ref.fbank_htk(sig, window, noverlap, fbank_mx,
                           USEPOWER=True, ZMEANSOURCE=True, _E=e_pos,
                           RAWENERGY=raw, ENORMALISE=enorm,
                           ESCALE=0.1, SILFLOOR=50.0)
    ours = np.asarray(fbank_htk(
        jnp.asarray(sig), jnp.asarray(window), jnp.asarray(fbank_mx),
        noverlap=noverlap, use_power=True, zmean_source=True,
        energy=e_pos, raw_energy=raw, enormalise=enorm,
        escale=0.1, silfloor=50.0))
    assert ours.shape == theirs.shape == (theirs.shape[0], 65)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-9)


def test_fbank_energy_rejects_bad_position():
    window, fbank_mx, winlen, noverlap = fbank_config(8000)
    with pytest.raises(ValueError, match="energy"):
        fbank_htk(jnp.zeros(4000), jnp.asarray(window),
                  jnp.asarray(fbank_mx), noverlap=noverlap,
                  energy="middle")


@needs_ref
def test_fbank_magnitude_mode():
    ref = _ref_features()
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(8000) * 500.0
    window, fbank_mx, winlen, noverlap = fbank_config(8000)
    theirs = ref.fbank_htk(sig, window, noverlap, fbank_mx,
                           USEPOWER=False, ZMEANSOURCE=False)
    ours = np.asarray(fbank_htk(
        jnp.asarray(sig), jnp.asarray(window), jnp.asarray(fbank_mx),
        noverlap=noverlap, use_power=False, zmean_source=False))
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-9)


@needs_ref
@pytest.mark.parametrize("N", [10, 299, 300, 1000])
def test_cmvn_matches_reference(N):
    ref = _ref_features()
    rng = np.random.default_rng(N)
    x = rng.standard_normal((N, 64))
    theirs = ref.cmvn_floating_kaldi(x, 150, 149, norm_vars=False)
    ours = np.asarray(cmvn_floating(jnp.asarray(x), 150, 149))
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-10)
    theirs_v = ref.cmvn_floating_kaldi(x, 150, 149, norm_vars=True)
    ours_v = np.asarray(cmvn_floating(jnp.asarray(x), 150, 149,
                                      norm_vars=True))
    np.testing.assert_allclose(ours_v, theirs_v, rtol=1e-8, atol=1e-9)


@needs_ref
def test_dither_matches_reference_rng_stream():
    ref = _ref_features()
    sig = np.zeros(1000)
    np.random.seed(3)
    theirs = ref.add_dither(sig.copy())
    np.random.seed(3)
    ours = add_dither(sig.copy())
    np.testing.assert_array_equal(ours, theirs)
