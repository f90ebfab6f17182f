"""Engine debug oracle, run logging, resume, distributed helpers."""

import json
import os
import sys

import numpy as np
import pytest

from vbx_tpu.engine.debug import frame_der, vbx_debug
from vbx_tpu.utils.runlog import RunLog

from .oracle import random_vb_problem

from .util import import_reference

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(f"{REF}/VBx"),
                               reason="reference not mounted")


@needs_ref
def test_frame_der_matches_reference():
    ref_der = import_reference("VBx").DER
    rng = np.random.default_rng(0)
    T, S = 200, 4
    q = rng.dirichlet(np.ones(S), size=T)
    ref = rng.integers(0, 3, T)
    for expected in (True, False):
        for xent in (True, False):
            ours = frame_der(q, ref, expected=expected, xentropy=xent)
            theirs = ref_der(q.copy(), ref, expected=expected, xentropy=xent)
            assert ours == pytest.approx(theirs, rel=1e-10), (expected, xent)


def test_frame_der_perfect():
    T, S = 50, 3
    ref = np.arange(T) % S
    q = np.zeros((T, S))
    q[np.arange(T), ref] = 1.0
    assert frame_der(q, ref, expected=False) == pytest.approx(0.0)


def test_vbx_debug_trace_matches_engine():
    import jax.numpy as jnp
    from vbx_tpu.engine.vbhmm import vbx
    rng = np.random.default_rng(1)
    X, phi, gamma, pi = random_vb_problem(rng, 80, 4, 10)
    res = vbx(jnp.asarray(X), jnp.asarray(phi), pi=jnp.asarray(pi),
              gamma=jnp.asarray(gamma), loop_prob=0.9, Fa=0.4, Fb=9.0,
              max_iters=10, epsilon=1e-6)
    ref_labels = np.asarray(res.gamma).argmax(1)
    q, pi_out, trace = vbx_debug(X, phi, gamma, pi, ref_labels=ref_labels,
                                 loop_prob=0.9, Fa=0.4, Fb=9.0,
                                 max_iters=10, epsilon=1e-6)
    assert len(trace) == int(res.n_iters)
    np.testing.assert_allclose(
        [t.elbo for t in trace],
        np.asarray(res.elbo)[:len(trace)], rtol=1e-9)
    # DER against the engine's own labels converges toward 0
    assert trace[-1].der < trace[0].der + 1e-9
    assert np.isfinite(trace[-1].xent)


def test_runlog(tmp_path):
    p = tmp_path / "log" / "run.jsonl"
    log = RunLog(str(p))
    log.recording("recA", n_speakers=3, n_iters=7,
                  elbo=np.array([1.0, 2.0, np.nan]))
    log.write({"event": "summary", "n_recordings": 1})
    log.close()
    lines = [json.loads(line) for line in open(p)]
    assert lines[0]["event"] == "recording"
    assert lines[0]["elbo_last"] == 2.0
    assert lines[1]["event"] == "summary"
    # None path is a no-op
    RunLog(None).recording("x", n_speakers=1, n_iters=1)


@needs_ref
def test_diarize_ark_resume_and_runlog(tmp_path):
    from vbx_tpu.config import get_preset
    from vbx_tpu.engine.pipeline import diarize_ark

    args = (f"{REF}/exp/ES2005a.ark", f"{REF}/exp/ES2005a.seg",
            str(tmp_path), get_preset("example"),
            f"{REF}/VBx/models/ResNet101_16kHz/plda",
            f"{REF}/VBx/models/ResNet101_16kHz/transform.h5")
    log_path = str(tmp_path / "run.jsonl")
    outs = diarize_ark(*args, verbose=False, runlog_path=log_path)
    assert "ES2005a" in outs
    events = [json.loads(line) for line in open(log_path)]
    assert any(e["event"] == "recording" and e["name"] == "ES2005a"
               for e in events)
    assert events[-1]["event"] == "summary"
    # resume skips everything (RTTM exists) and returns empty
    outs2 = diarize_ark(*args, verbose=False, resume=True)
    assert outs2 == {}


def test_distributed_single_process_noop():
    from vbx_tpu.parallel.distributed import initialize, local_recording_slice
    initialize()          # no env, no args: must not raise
    sl = local_recording_slice(10)
    assert sl == slice(0, 10)


def test_vbx_debug_gamma_plot(tmp_path):
    """plot_path writes the reference's per-iteration debug figure
    (VBx.py:111-120) — the last reference feature without a counterpart."""
    pytest.importorskip("matplotlib")
    import numpy as np

    from vbx_tpu.engine.debug import vbx_debug

    from .oracle import random_vb_problem

    rng = np.random.default_rng(1)
    X, phi, gamma, pi = random_vb_problem(rng, 60, 3, 8)
    ref = rng.integers(0, 3, 60)
    path = str(tmp_path / "gamma.png")
    _, _, trace = vbx_debug(X, phi, gamma, pi, ref_labels=ref,
                            max_iters=4, plot_path=path)
    import os
    assert os.path.getsize(path) > 1000
    assert len(trace) >= 1
