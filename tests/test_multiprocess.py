"""TRUE multi-process validation of the multi-host corpus path: two OS
processes form a jax.distributed CPU cluster (Gloo collectives — the DCN
stand-in), shard a 3-recording corpus over the process axis
(parallel/distributed.local_recording_slice), hit the cross-process barrier
(multihost_utils.sync_global_devices in recipes/run_corpus.stage_diarization),
and host 0 concatenates all.rttm. Output must match a single-process run of
the same corpus bit-for-bit.

The reference has no distributed runtime at all (SURVEY §2.3: its cluster
interface is text task files for a grid engine, AMI_run.sh:53-58); this is
the introduced capability's integration test. The single-process no-op path
of initialize() is covered in test_debug_and_aux.
"""

import importlib.util
import os
import socket
import subprocess
import sys
import textwrap

import pytest

from tests.util import split_ark_corpus

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
needs_ref = pytest.mark.skipif(
    not os.path.exists(f"{REF}/exp/ES2005a.ark"),
    reason="reference assets not mounted")

CHILD = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")   # before any backend use
    # match the parent's conftest config exactly so the bit-for-bit RTTM
    # comparison isolates the multi-process variable, not dtype promotion
    jax.config.update("jax_enable_x64", True)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_corpus", os.path.join({repo!r}, "recipes", "run_corpus.py"))
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    raise SystemExit(rc.main(sys.argv[1:]))
""")


def _build_corpus(tmp_path, n_rec=3, frames_per_rec=120):
    """Tiny corpus: the first n_rec*frames_per_rec ES2005a x-vectors split
    into n_rec pseudo-recordings (real embeddings keep AHC/VB well-posed)."""
    exp = tmp_path / "exp"
    _, _, names = split_ark_corpus(exp, n_rec=n_rec,
                                   frames_per_rec=frames_per_rec)
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"{n}\n" for n in names))
    return exp, lst, names


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@needs_ref
def test_two_process_corpus_matches_single_process(tmp_path):
    exp, lst, names = _build_corpus(tmp_path)
    argv = ["diarization", "--preset", "example",
            "--list-file", str(lst), "--exp-dir", str(exp),
            "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
            "--xvec-transform", f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"]

    child = tmp_path / "child.py"
    child.write_text(CHILD.format(repo=REPO))
    port = _free_port()
    env_base = {**os.environ,
                "PALLAS_AXON_POOL_IPS": "",
                "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "NUM_PROCESSES": "2"}
    env_base.pop("JAX_PLATFORMS", None)   # the child pins cpu in-process
    procs = [subprocess.Popen(
        [sys.executable, str(child)] + argv,
        env={**env_base, "PROCESS_ID": str(pid)},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=480)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # host sharding: ceil(3/2) -> process 0 owns the first two recordings,
    # process 1 the third (the per-process runlog would show it; the durable
    # check is that every per-recording RTTM exists and host 0's all.rttm
    # has all three)
    multi = {}
    for rec in names:
        path = exp / "rttms" / f"{rec}.rttm"
        assert path.exists(), f"{rec}.rttm missing after 2-process run"
        multi[rec] = path.read_text()
    all_body = (exp / "all.rttm").read_text()
    assert all(rec in all_body for rec in names)

    # single-process rerun of the same corpus must agree bit-for-bit
    spec = importlib.util.spec_from_file_location(
        "run_corpus_sp", os.path.join(REPO, "recipes", "run_corpus.py"))
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    exp2, lst2, _ = _build_corpus(tmp_path / "single")
    argv2 = ["diarization", "--preset", "example",
             "--list-file", str(lst2), "--exp-dir", str(exp2),
             "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
             "--xvec-transform",
             f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"]
    assert rc.main(argv2) == 0
    for rec in names:
        single = (exp2 / "rttms" / f"{rec}.rttm").read_text()
        assert single == multi[rec], (
            f"{rec}: 2-process RTTM differs from single-process")


CHILD_XV = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # deterministic tiny extractor in place of the ResNet101 checkpoint
    # loader: both processes (and the single-process oracle) build the
    # SAME flax model from PRNGKey(0), so ark bytes must agree exactly
    import vbx_tpu.models.resnet as resnet_mod
    from vbx_tpu.models.resnet import BasicBlock, ResNetXVector
    def _tiny_loader(path, **kw):
        # built lazily: model init touches the XLA backend, which must
        # not happen before jax.distributed.initialize in the stage
        import jax.numpy as jnp
        fm = ResNetXVector(block=BasicBlock, num_blocks=(1, 1, 1, 1),
                           feat_dim=64, embed_dim=32)
        variables = fm.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 144), jnp.float32),
                            lengths=jnp.array([144]))
        return fm, variables
    resnet_mod.load_torch_checkpoint = _tiny_loader
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_corpus", os.path.join({repo!r}, "recipes", "run_corpus.py"))
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    raise SystemExit(rc.main(sys.argv[1:]))
""")


def test_two_process_xvector_extraction_matches_single(tmp_path):
    """The xvectors stage shards recordings over hosts like diarization:
    two gloo processes each extract their slice into ark/seg shards, host
    0 concatenates after the barrier, and the result is bit-identical to
    a single-process run."""
    import numpy as np

    from vbx_tpu.io.wav import write_wav

    wav_dir = tmp_path / "wav"
    lab_dir = tmp_path / "lab"
    wav_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    names = ["recA", "recB", "recC"]
    for rec in names:
        write_wav(str(wav_dir / f"{rec}.wav"),
                  0.1 * rng.standard_normal(2 * 16000), 16000)
        (lab_dir / f"{rec}.lab").write_text("0.10 1.90 sp\n")
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"{n}\n" for n in names))

    def argv(exp):
        return ["xvectors", "--preset", "example",
                "--list-file", str(lst), "--exp-dir", str(exp),
                "--wav-dir", str(wav_dir), "--lab-dir", str(lab_dir),
                "--weights", "unused.pth"]

    child = tmp_path / "child_xv.py"
    child.write_text(CHILD_XV.format(repo=REPO))
    port = _free_port()
    env_base = {**os.environ,
                "PALLAS_AXON_POOL_IPS": "",
                "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "NUM_PROCESSES": "2"}
    env_base.pop("JAX_PLATFORMS", None)
    exp2p = tmp_path / "exp2p"
    procs = [subprocess.Popen(
        [sys.executable, str(child)] + argv(exp2p),
        env={**env_base, "PROCESS_ID": str(pid)},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=480)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # single-process oracle through the same child (no coordinator envs)
    exp1p = tmp_path / "exp1p"
    env1 = {**os.environ, "PALLAS_AXON_POOL_IPS": ""}
    env1.pop("JAX_PLATFORMS", None)
    p = subprocess.run([sys.executable, str(child)] + argv(exp1p),
                       env=env1, capture_output=True, text=True,
                       timeout=480)
    assert p.returncode == 0, p.stdout + p.stderr

    for fname in ("xvectors.ark", "xvectors.seg"):
        two = (exp2p / fname).read_bytes()
        one = (exp1p / fname).read_bytes()
        assert two == one, f"{fname}: 2-process differs from single"
    from vbx_tpu.io.ark import iter_vec_ark
    recs = {key.rsplit("_", 1)[0] for key, _ in
            iter_vec_ark(str(exp2p / "xvectors.ark"))}
    assert recs == set(names)


CHILD_KILL = textwrap.dedent("""
    import os, signal, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    kill_after = int(os.environ.get("VBX_TPU_TEST_KILL_AFTER_RTTMS", "0"))
    if kill_after:
        # SIGKILL this process the moment its Nth per-recording RTTM hits
        # disk: a deterministic stand-in for pod preemption mid-corpus
        import vbx_tpu.engine.pipeline as pl
        real_write = pl.write_rttm
        state = {{"n": 0}}
        def dying_write(*a, **kw):
            real_write(*a, **kw)
            state["n"] += 1
            if state["n"] >= kill_after:
                os.kill(os.getpid(), signal.SIGKILL)
        pl.write_rttm = dying_write
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_corpus", os.path.join({repo!r}, "recipes", "run_corpus.py"))
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    raise SystemExit(rc.main(sys.argv[1:]))
""")


@needs_ref
def test_two_process_sigkill_midflight_resume_is_exact(tmp_path):
    """VERDICT r2 #7 — the composed full-process-kill recovery story:
    SIGKILL BOTH gloo processes of a 2-process corpus run right after each
    writes its first per-recording RTTM (deterministic preemption
    mid-corpus), restart the same 2-process run, and the final
    concatenated all.rttm must be byte-identical to an uninterrupted run.
    Exercises: per-recording RTTM durability, diarize_ark(resume=True)
    skipping completed recordings, the idempotent stage re-entry, and the
    cross-process barrier after a mixed resumed/fresh run."""
    exp, lst, names = _build_corpus(tmp_path, n_rec=4)
    child = tmp_path / "child_kill.py"
    child.write_text(CHILD_KILL.format(repo=REPO))

    def argv(expdir):
        return ["diarization", "--preset", "example",
                "--list-file", str(lst), "--exp-dir", str(expdir),
                "--plda-file", f"{REF}/VBx/models/ResNet101_16kHz/plda",
                "--xvec-transform",
                f"{REF}/VBx/models/ResNet101_16kHz/transform.h5"]

    def run_pair(expdir, extra_env):
        port = _free_port()
        env_base = {**os.environ,
                    "PALLAS_AXON_POOL_IPS": "",
                    "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                    "NUM_PROCESSES": "2", **extra_env}
        env_base.pop("JAX_PLATFORMS", None)
        procs = [subprocess.Popen(
            [sys.executable, str(child)] + argv(expdir),
            env={**env_base, "PROCESS_ID": str(pid)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for pid in (0, 1)]
        outs = [p.communicate(timeout=480)[0] for p in procs]
        return [p.returncode for p in procs], outs

    # uninterrupted baseline (both stage outputs live in exp's sibling so
    # the x-vector ark is shared; only the rttm/all.rttm dirs differ)
    exp_ref = tmp_path / "ref"
    exp_ref.mkdir()
    for f in ("xvectors.ark", "xvectors.seg"):
        (exp_ref / f).write_bytes((exp / f).read_bytes())
    rcs, outs = run_pair(exp_ref, {})
    assert rcs == [0, 0], outs
    golden_all = (exp_ref / "all.rttm").read_bytes()

    # preempted run: every process SIGKILLs itself after its first write
    rcs, outs = run_pair(exp, {"VBX_TPU_TEST_KILL_AFTER_RTTMS": "1"})
    assert all(rc != 0 for rc in rcs), (rcs, outs)   # really died
    assert not (exp / "all.rttm").exists()
    written = sorted(p.name for p in (exp / "rttms").glob("*.rttm"))
    assert 0 < len(written) < len(names), written    # genuinely mid-flight

    # restart WITHOUT the kill: resumes the survivors, recomputes the rest
    rcs, outs = run_pair(exp, {})
    assert rcs == [0, 0], outs
    assert (exp / "all.rttm").read_bytes() == golden_all
