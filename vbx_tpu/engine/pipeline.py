"""End-to-end diarization pipeline: transformed x-vectors -> initialization
-> VB-HMM -> merged RTTM segments.

Orchestration parity with the reference diarization CLI (vbhmm.py:54-179),
re-architected for TPU: per-recording math happens in jitted JAX programs;
recordings can run one-by-one (streaming) or padded+batched (throughput,
`diarize_ark(..., batch=True)`), where the batched path buckets recordings
and runs the vmapped engine with per-recording convergence masking.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vbx_tpu.config import DiarizationConfig
from vbx_tpu.engine.ahc import ahc_labels, random_labels, smooth_labels_to_gamma
from vbx_tpu.engine.vbhmm import vbx, vbx_batched
from vbx_tpu.io.ark import iter_vec_ark, group_by_recording
from vbx_tpu.io.plda import read_plda, rediagonalize_plda
from vbx_tpu.io.rttm import merge_adjacent_labels, write_rttm
from vbx_tpu.io.segments import read_xvector_timing_dict
from vbx_tpu.io.transform import read_xvec_transform


@dataclasses.dataclass
class DiarizationOutput:
    recording: str
    labels1st: np.ndarray             # [N] 0-based speaker labels
    labels2nd: Optional[np.ndarray]   # [N] second-best labels (if VB ran, S>1)
    n_speakers: int                   # surviving speakers (distinct labels1st)
    n_iters: int                      # VB iterations run (0 if init-only)
    elbo: Optional[np.ndarray]        # ELBO trace (nan-padded) or None
    gamma: Optional[np.ndarray]       # [N, S] final responsibilities or None


@functools.partial(jax.jit, static_argnames=())
def _top2_device(gamma: jax.Array, speaker_mask: jax.Array):
    """[B, T, S] responsibilities -> (labels1, labels2) [B, T] int32,
    computed ON DEVICE so result fetches move 2 small int32 planes
    instead of the full padded gamma (x16 less device->host traffic —
    2.2 MB -> 0.14 MB per serving chunk, ~36 MB -> ~2 MB per corpus
    bucket; the fetch was a measured ~190 ms per chunk over the tunnel).
    Padded speaker lanes are masked to -1 (gamma >= 0), so a frame whose
    valid responsibilities underflow to 0 can never select a padded
    index. Ties break to the LOWEST index (lax.top_k), deterministically
    — the previous host np.argsort(-q) used an unstable quicksort, so
    exactly-tied frames were platform-dependent there (and in the
    reference, vbhmm.py:160-162)."""
    S = gamma.shape[-1]
    masked = jnp.where(speaker_mask[:, None, :], gamma,
                       jnp.asarray(-1.0, gamma.dtype))
    _, idx = jax.lax.top_k(masked, min(2, S))
    l1 = idx[..., 0].astype(jnp.int32)
    l2 = idx[..., 1].astype(jnp.int32) if S > 1 else l1
    return l1, l2


def resolve_fb_impl(fb_impl: Optional[str],
                    config: DiarizationConfig) -> Optional[str]:
    """Effective forward-backward engine: an explicit argument (CLI
    --fb-impl) always wins; otherwise the preset's engine of record
    (VBConfig.fb_impl — corpus presets select 'pallas_bf16', measured
    bounds in its docstring). A preset's pallas selection resolves back to
    the engine default on the CPU backend: interpret-mode pallas is a
    correctness/debugging path, orders of magnitude slower than the
    structured engine XLA compiles natively on CPU."""
    if fb_impl is not None:
        return fb_impl
    pick = config.vb.fb_impl
    if pick and pick.startswith("pallas") \
            and jax.default_backend() == "cpu":
        return None
    return pick


def effective_vb_stop(config: DiarizationConfig,
                      fb_impl: Optional[str]
                      ) -> Tuple[float, float, int]:
    """(epsilon, plateau_ulps, plateau_iters) for the RESOLVED engine.

    The bf16-stream engine's stop rules fire on its own stream noise at
    corpus scale, truncating the EM far from the fixed point
    (VBConfig.bf16_run_to_max has the chip measurements); with the flag
    set, a resolved 'pallas_bf16' runs max_iters with both rules
    disabled. Every other engine keeps the configured rules."""
    vb = config.vb
    if fb_impl == "pallas_bf16" and vb.bf16_run_to_max:
        return float("-inf"), 0.0, vb.plateau_iters
    return vb.epsilon, vb.plateau_ulps, vb.plateau_iters


def _parse_init(init: str) -> Tuple[str, Optional[int], bool]:
    """-> (kind, n_random_speakers, run_vb). Accepts 'AHC', 'AHC+VB',
    'random_<N>', 'random_<N>+VB'."""
    run_vb = init.endswith("VB")
    base = init[:-3] if run_vb else init
    if base == "AHC":
        return "AHC", None, run_vb
    if base.startswith("random_"):
        return "random", int(base.split("_", 1)[1]), run_vb
    raise ValueError(f"unsupported init {init!r} (use AHC, AHC+VB, "
                     "random_<N>, random_<N>+VB)")


class Diarizer:
    """Holds the (tiny, host-prepped) models and the device-side transform;
    reusable across recordings/corpora."""

    def __init__(self, config: DiarizationConfig,
                 plda: Tuple[np.ndarray, np.ndarray, np.ndarray],
                 transform: Tuple[np.ndarray, np.ndarray, np.ndarray],
                 dtype=None):
        self.config = config

        def own(a):
            # fresh, C-ordered, allocator-aligned f64 copies: h5py (and
            # eigh-output) buffers can be 32-byte-aligned / non-contiguous,
            # which drops NumPy's dgemm onto a strided fallback — measured
            # 23x slower on the per-request transform matmuls (y @ lda
            # 12 ms -> 0.5 ms for N=1025). The init chain runs per
            # REQUEST in serving, so this one-time copy is throughput.
            return np.array(a, dtype=np.float64, order="C", copy=True)

        # one-time 128x128 host-side re-diagonalization (vbhmm.py:109-113)
        self.plda_mu, self.plda_tr, self.plda_psi = map(
            own, rediagonalize_plda(*plda))
        self.raw_plda = plda
        self.mean1, self.lda, self.mean2 = map(own, transform)
        self.dtype = dtype or jnp.dtype(config.vb.dtype)
        # vb_inputs projection, precomputed owned-contiguous: plda_tr.T's
        # column slice is otherwise a strided view every request
        self._vb_tr = own(self.plda_tr.T[:, :config.lda_dim])

    @classmethod
    def from_files(cls, config: DiarizationConfig, plda_file: str,
                   transform_file: str, dtype=None) -> "Diarizer":
        return cls(config, read_plda(plda_file),
                   read_xvec_transform(transform_file), dtype=dtype)

    # -- per-recording stages ------------------------------------------------

    def transform_xvectors(self, x_raw: np.ndarray) -> np.ndarray:
        """Raw embeddings (N, 256) -> PLDA-space unit vectors (N, 128)
        (vbhmm.py:125-129). Runs in float64 on the host: the transformed
        vectors feed the AHC init chain, whose calibration threshold and
        linkage cut are sensitive below f32 resolution (see ahc_labels);
        O(N*256*128) is negligible next to the VB loop. The VB engine then
        receives them cast to the engine dtype (f32 on TPU)."""
        x = np.asarray(x_raw, dtype=np.float64)
        y = x - self.mean1
        y /= np.sqrt((y * y).sum(axis=1, keepdims=True))
        y = y @ self.lda - self.mean2
        y /= np.sqrt((y * y).sum(axis=1, keepdims=True))
        return y

    def initial_labels(self, x: np.ndarray, seed: int = 0,
                       precomputed_Z: Optional[np.ndarray] = None,
                       precomputed_thr: Optional[float] = None
                       ) -> np.ndarray:
        kind, n_rand, _ = _parse_init(self.config.init)
        ahc_cfg = self.config.ahc
        if kind == "AHC":
            if 0 < ahc_cfg.fallback_n < len(x):
                # preset-level long-recording fallback (AHCConfig
                # docstring has the measured crossover): the O(N^2) AHC
                # front half is skipped for random_<K>+VB, the reference
                # README's own advice for such files (README.md:24)
                import sys
                print(f"AHC fallback: N={len(x)} > {ahc_cfg.fallback_n}, "
                      f"using random_{ahc_cfg.fallback_speakers} init",
                      file=sys.stderr)
                return random_labels(len(x), ahc_cfg.fallback_speakers,
                                     seed=seed)
            return ahc_labels(
                x, ahc_cfg.threshold,
                similarity=ahc_cfg.similarity,
                plda=self.raw_plda,
                target_energy=ahc_cfg.target_energy,
                compute_backend=ahc_cfg.compute_backend,
                precomputed_Z=precomputed_Z,
                precomputed_thr=precomputed_thr)
        return random_labels(len(x), n_rand, seed=seed)

    def vb_inputs(self, x: np.ndarray, labels: np.ndarray):
        """(features, phi, qinit) for the VB stage (vbhmm.py:150-153)."""
        cfg = self.config
        qinit = smooth_labels_to_gamma(labels, cfg.ahc.init_smoothing)
        fea = (x - self.plda_mu) @ self._vb_tr
        phi = self.plda_psi[:cfg.lda_dim]
        return fea, phi, qinit

    def diarize_xvectors(self, x_raw: np.ndarray, seed: int = 0,
                         keep_gamma: bool = False,
                         fb_impl: Optional[str] = None) -> DiarizationOutput:
        """Full single-recording path (streaming mode). fb_impl follows
        vbx_batched's choices; the batched-only 'pallas'/'pallas_bf16'
        kernels run as a B=1 batch so a one-recording run still exercises
        the requested engine."""
        cfg = self.config
        fb_impl = resolve_fb_impl(fb_impl, cfg)
        _, _, run_vb = _parse_init(cfg.init)
        x = self.transform_xvectors(x_raw)
        labels1st = self.initial_labels(x, seed=seed)
        labels2nd = None
        n_iters = 0
        elbo = None
        gamma_out = None

        if run_vb:
            fea, phi, qinit = self.vb_inputs(x, labels1st)
            T, S = qinit.shape
            eps_eff, pu_eff, pi_eff = effective_vb_stop(cfg, fb_impl)
            if fb_impl is not None and fb_impl.startswith("pallas"):
                res = vbx_batched(
                    jnp.asarray(fea, self.dtype)[None],
                    jnp.asarray(phi, self.dtype),
                    jnp.asarray(qinit, self.dtype)[None],
                    jnp.full((1, S), 1.0 / S, dtype=self.dtype),
                    jnp.ones((1, T), bool), jnp.ones((1, S), bool),
                    loop_prob=cfg.vb.loop_prob, Fa=cfg.vb.Fa, Fb=cfg.vb.Fb,
                    max_iters=cfg.vb.max_iters, epsilon=eps_eff,
                    fb_impl=fb_impl,
                    plateau_ulps=pu_eff,
                    plateau_iters=pi_eff)
                res = res._replace(gamma=res.gamma[0], elbo=res.elbo[0],
                                   n_iters=res.n_iters[0])
            else:
                res = vbx(
                    jnp.asarray(fea, self.dtype),
                    jnp.asarray(phi, self.dtype),
                    loop_prob=cfg.vb.loop_prob, Fa=cfg.vb.Fa, Fb=cfg.vb.Fb,
                    pi=jnp.full((S,), 1.0 / S, dtype=self.dtype),
                    gamma=jnp.asarray(qinit, self.dtype),
                    max_iters=cfg.vb.max_iters, epsilon=cfg.vb.epsilon,
                    fb_impl=fb_impl or "structured",
                    plateau_ulps=cfg.vb.plateau_ulps,
                    plateau_iters=cfg.vb.plateau_iters)
            # same device-side top-2 as the batched/serving paths, so a
            # recording's labels are method-identical across every route
            # (_top2_device; full gamma is fetched only on keep_gamma)
            l1, l2 = _top2_device(res.gamma[None],
                                  jnp.ones((1, res.gamma.shape[-1]), bool))
            labels1st = np.asarray(l1[0])
            if res.gamma.shape[-1] > 1:
                labels2nd = np.asarray(l2[0])
            n_iters = int(res.n_iters)
            elbo = np.asarray(res.elbo)
            if keep_gamma:
                gamma_out = np.asarray(res.gamma)

        return DiarizationOutput(
            recording="", labels1st=labels1st, labels2nd=labels2nd,
            n_speakers=len(np.unique(labels1st)), n_iters=n_iters,
            elbo=elbo, gamma=gamma_out)


def diarize_xvectors(x_raw: np.ndarray, config: DiarizationConfig,
                     plda, transform, **kw) -> DiarizationOutput:
    return Diarizer(config, plda, transform).diarize_xvectors(x_raw, **kw)


def diarize_ark(
    ark_file: str,
    segments_file: str,
    out_rttm_dir: str,
    config: DiarizationConfig,
    plda_file: str,
    transform_file: str,
    batch: bool = True,
    max_batch_frames: int = 2_000_000,
    verbose: bool = True,
    resume: bool = False,
    runlog_path: Optional[str] = None,
    shard_over_hosts: bool = False,
    fb_impl: Optional[str] = None,
    failures: Optional[Dict[str, str]] = None,
    mesh=None,
) -> Dict[str, DiarizationOutput]:
    """Diarize every recording in an ark file and write per-recording RTTMs
    (CLI parity: vbhmm.py:115-179). `batch=True` pads recordings into
    (T, S)-buckets and runs the vmapped engine — the TPU throughput path.

    `resume=True` skips recordings whose RTTM already exists (per-recording
    checkpointing: a preempted corpus run restarts where it stopped, the
    durable state being the RTTM files themselves — the TPU-era analogue of
    the reference recipes' skip-if-output-exists re-entry, AMI_run.sh:51).
    `runlog_path` appends one JSON record per recording (iterations, ELBO,
    speakers, wall time) plus a summary.

    Failure isolation: a recording whose init or VB raises is skipped with
    a warning (recorded in `failures` if a dict is passed, and in the
    runlog) unless the CALLER asked for exactly one recording — that run
    fails visibly. If EVERY recording fails, a RuntimeError is raised so
    an all-broken corpus can't masquerade as an empty-but-successful one.

    `mesh`: a ('dp', 'sp') jax.sharding.Mesh routes every VB bucket through
    the sharded engine (parallel.vbx_sharded) — recordings data-parallel
    over 'dp', frames sequence-parallel over 'sp' (ICI). This is the
    long-recording path the reference lacks (its forward-backward is a
    strict T-step host loop, VBx/VBx.py:167-171, and README.md:24 calls
    >30-min files out as its weakness): an hour-long meeting's frames
    spread over the 'sp' chips. Under a mesh, single recordings run as a
    dp-padded batch of one. fb_impl=None/'structured' uses the XLA
    blockwise smoother (bit-comparable to the unsharded engine at the same
    padded shape, tests/test_parallel.py); 'pallas'/'pallas_bf16' run both
    local passes of every chip's frame block through the fused Pallas
    kernels (the long-recording throughput path, tolerance-parity like the
    single-chip pallas engine); anything else is overridden with a warning.
    """
    import time as _time

    from vbx_tpu.utils.compile_cache import enable as _enable_compile_cache
    from vbx_tpu.utils.runlog import RunLog

    _enable_compile_cache()
    fb_impl = resolve_fb_impl(fb_impl, config)
    diar = Diarizer.from_files(config, plda_file, transform_file)
    segs_dict = read_xvector_timing_dict(segments_file)
    os.makedirs(out_rttm_dir, exist_ok=True)
    runlog = RunLog(runlog_path)
    t_start = _time.perf_counter()

    recs: List[Tuple[str, List[str], np.ndarray]] = list(
        group_by_recording(iter_vec_ark(ark_file)))
    if shard_over_hosts:
        # corpus data-parallelism over hosts (DCN): each process owns a
        # contiguous slice; per-recording RTTMs are the durable outputs so
        # no gather is needed beyond concatenation by host 0
        from vbx_tpu.parallel.distributed import local_recording_slice
        recs = recs[local_recording_slice(len(recs))]
    # strictness follows the caller's REQUEST, not what remains after the
    # resume filter: a corrupt recording must stay skippable on re-runs
    # (resume could otherwise never converge past it)
    strict = len(recs) == 1
    n_resumed = 0
    if resume:
        skipped = {r for r, _, _ in recs if os.path.exists(
            os.path.join(out_rttm_dir, f"{r}.rttm"))}
        recs = [it for it in recs if it[0] not in skipped]
        n_resumed = len(skipped)
        if skipped and verbose:
            print(f"resume: skipping {len(skipped)} finished recording(s)")
    if not recs:
        runlog.close()
        return {}
    if failures is None:
        failures = {}

    outputs: Dict[str, DiarizationOutput] = {}
    try:
        _, _, run_vb = _parse_init(config.init)
        if mesh is not None and run_vb:
            from vbx_tpu.utils.bucketing import T_QUANTUM
            if jax.process_count() > 1:
                # a mesh built from the GLOBAL device list combined with
                # per-host recording slices would hand every process
                # different data against non-addressable devices —
                # divergent sharded programs that error or deadlock in
                # collectives. Host-local meshes + host sharding need a
                # per-host device mesh; reject clearly until that exists.
                raise ValueError(
                    "mesh routing is single-process: with "
                    "jax.process_count() > 1 use shard_over_hosts for "
                    "the recording axis (a per-host ('dp','sp') mesh "
                    "over jax.local_devices() is not yet wired)")
            n_sp = mesh.shape.get("sp", 1)
            if T_QUANTUM % n_sp:
                raise ValueError(
                    f"mesh 'sp' extent {n_sp} must divide the smallest "
                    f"frame bucket ({T_QUANTUM})")
            mesh_fb = (fb_impl if fb_impl in ("structured", "pallas",
                                              "pallas_bf16") else None)
            if not batch or (fb_impl is not None and mesh_fb is None):
                # a mesh implies the sharded batched engine; say so
                # loudly rather than silently ignoring the arguments
                # (same policy as the S>128 pallas fallback)
                import warnings
                warnings.warn(
                    "mesh routing overrides "
                    + ("batch=False" if not batch else f"fb_impl="
                       f"{fb_impl!r}")
                    + ": the sharded engine is batched and supports "
                      "fb_impl in ('structured', 'pallas', "
                      "'pallas_bf16')", stacklevel=2)

        if not run_vb or (mesh is None and (not batch or len(recs) == 1)):
            for rec, seg_names, x_raw in recs:
                if verbose:
                    print(rec)
                try:
                    out = diar.diarize_xvectors(x_raw, fb_impl=fb_impl)
                except Exception as exc:   # noqa: BLE001 — isolate per rec
                    _warn_failed(rec, exc, runlog, failures, strict=strict)
                    continue
                out.recording = rec
                outputs[rec] = out
        else:
            stage_log: Dict[str, Any] = {}
            outputs = _diarize_batched(diar, recs, max_batch_frames, verbose,
                                       fb_impl=fb_impl, stage_log=stage_log,
                                       runlog=runlog, failures=failures,
                                       mesh=mesh)
            runlog.write({"event": "stages", **stage_log})

        if not outputs and not n_resumed:
            # nothing succeeded now or in a previous (resumed) run: an
            # all-broken corpus must not masquerade as empty-but-successful
            raise RuntimeError(
                f"all {len(recs)} recording(s) failed: "
                f"{dict(list(failures.items())[:3])}")

        for rec, seg_names, x_raw in recs:
            if rec not in outputs:
                continue                   # failed recording, already warned
            names, times = segs_dict[rec]
            if not np.all(names == np.array(seg_names)):
                raise ValueError(f"segments/ark name mismatch for {rec}")
            out = outputs[rec]
            start, end = times.T
            starts, ends, out_labels = merge_adjacent_labels(
                start, end, out.labels1st)
            write_rttm(os.path.join(out_rttm_dir, f"{rec}.rttm"),
                       rec, starts, ends, out_labels)
            if (config.output_2nd and out.labels2nd is not None):
                starts2, ends2, labels2 = merge_adjacent_labels(
                    start, end, out.labels2nd)
                dir2 = f"{out_rttm_dir}2nd"
                os.makedirs(dir2, exist_ok=True)
                write_rttm(os.path.join(dir2, f"{rec}.rttm"),
                           rec, starts2, ends2, labels2)
            runlog.recording(rec, n_speakers=out.n_speakers,
                             n_iters=out.n_iters, elbo=out.elbo)
        runlog.write({"event": "summary", "n_recordings": len(recs),
                      "n_failed": len(failures),
                      "failed": sorted(failures) or None,
                      "seconds": round(_time.perf_counter() - t_start, 3),
                      "config": config.name, "init": config.init})
    finally:
        runlog.close()
    return outputs


def _warn_failed(rec: str, exc: Exception, runlog=None,
                 failures: Optional[Dict[str, str]] = None,
                 strict: bool = False) -> None:
    """Per-recording failure isolation (reference parity: one bad file
    kills only its own task line, AMI_run.sh:53-58 process-per-recording).
    strict=True re-raises — a single-recording run should fail visibly."""
    if strict:
        raise exc
    import sys as _sys
    print(f"ERROR: recording {rec!r} failed and is skipped: "
          f"{type(exc).__name__}: {exc}", file=_sys.stderr)
    if failures is not None:
        failures[rec] = f"{type(exc).__name__}: {exc}"
    if runlog is not None:
        runlog.write({"event": "recording_failed", "recording": rec,
                      "error": f"{type(exc).__name__}: {exc}"})


def _diarize_batched(diar: Diarizer, recs, max_batch_frames: int,
                     verbose: bool, init_workers: int = 8,
                     fb_impl: Optional[str] = None,
                     stage_log: Optional[Dict[str, Any]] = None,
                     runlog=None,
                     failures: Optional[Dict[str, str]] = None,
                     mesh=None,
                     ) -> Dict[str, DiarizationOutput]:
    """Bucketed-padded batched VB over all recordings, pipelined against the
    host init chain. The init chain (f64 transform + cosine + calibration +
    native linkage) runs across a thread pool — BLAS and the ctypes linkage
    release the GIL, so corpus initialization parallelizes across cores. As
    recordings finish initializing, (T, S)-bucket chunks are dispatched to
    the device eagerly in doubling sizes (B = 1, 2, 4, 8, ... up to the
    frame-budget cap) — XLA dispatch is asynchronous, so the batched VB EM
    executes *under* the remaining host init instead of after it, while the
    doubling schedule keeps the set of compiled (B, T_pad, S_pad) shapes
    logarithmic (and the persistent compile cache amortizes them across
    runs). Results are fetched to host lazily — oldest chunk first once
    more than a bounded number are in flight, the rest at the end — so
    neither queued inputs nor finished gammas accumulate in HBM.

    Chunk composition depends on init completion order, which is fine: the
    batched engine is batch-composition-independent (bit-comparable for the
    default engine, tolerance-bounded for the pallas path — see
    tests/test_engine.py and tests/test_pallas.py).

    `stage_log`, if given, is filled with wall-clock stage timings: init_s
    (pool wall), vb_s (device work still exposed after init finished),
    vb_chunks_overlapped (chunks dispatched while init was running), and
    per-bucket shapes — surfaced via the runlog 'stages' event."""
    import time as _time
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor, as_completed

    from vbx_tpu.utils.bucketing import bucket_shape, chunk_cap

    cfg = diar.config
    n = len(recs)

    # round-5 pre-stage: eligible mid-N recordings' NN-chain walks run as
    # ONE batched device call (clustering.device) instead of serializing
    # per-meeting device while_loops through the init pool — measured
    # ~0.76 s x 18 serial -> one ~4 s batched walk at AMI scale. Only the
    # band the mid-N 'auto' route already sends to the device is
    # eligible, so labels are identical to the unbatched pipeline (the
    # per-recording calibration + cut stay exactly where they were).
    pre_xz: Dict[int, tuple] = {}
    _t_pre = _time.perf_counter()
    _kind0, _, _ = _parse_init(cfg.init)
    if (_kind0 == "AHC" and cfg.ahc.similarity == "cosine"
            and cfg.ahc.compute_backend == "auto"
            and jax.default_backend() != "cpu"):
        from vbx_tpu.engine.ahc import _DEVICE_LINKAGE_MIN_N
        elig = [i for i in range(n)
                if len(recs[i][2]) >= _DEVICE_LINKAGE_MIN_N
                and not (0 < cfg.ahc.fallback_n < len(recs[i][2]))]
        if len(elig) >= 2:
            from concurrent.futures import ThreadPoolExecutor as _TPE

            def _pre_transform(i):
                return i, diar.transform_xvectors(recs[i][2])

            xs = {}
            with _TPE(max_workers=min(8, len(elig))) as _pool:
                for fut in [_pool.submit(_pre_transform, i) for i in elig]:
                    try:
                        i, x = fut.result()
                        xs[i] = x
                    except Exception:   # noqa: BLE001 — prep() will
                        pass            # re-run and isolate the failure
            try:
                from vbx_tpu.clustering.device import (
                    linkage_dot_avg_device_batched)
                # size-aware grouping: a batched call pads every lane to
                # the group's max N, so one hour-long recording must not
                # inflate a dozen 8k-meeting lanes — greedily pack
                # recordings whose padded extents stay within 2x
                order = sorted(xs, key=lambda i: len(xs[i]))
                groups, cur = [], []
                for i in order:
                    if cur and len(xs[i]) > 2 * len(xs[cur[0]]):
                        groups.append(cur)
                        cur = []
                    cur.append(i)
                if cur:
                    groups.append(cur)
                from vbx_tpu.ops.calibration import (
                    two_gmm_calib_cosine_device_batched)
                for grp in groups:
                    xns = [np.ascontiguousarray(
                        xs[i] / (np.sqrt((xs[i] * xs[i]).sum(
                            axis=1, keepdims=True)) + 1e-32))
                        for i in grp]
                    Zs = linkage_dot_avg_device_batched(xns)
                    # round-5 continuation: the CALIBRATION batches too —
                    # one device dispatch per EM pass for the whole
                    # group, amortizing the ~21 tunnel round-trips that
                    # price per-meeting device calibration out of the
                    # mid-N band (ops/calibration.py has the numbers).
                    # On failure thresholds stay None and prep() routes
                    # each meeting's calibration as before (host f64
                    # mid-N) on the already-computed Z.
                    try:
                        thrs = two_gmm_calib_cosine_device_batched(xns)
                    except Exception as exc:    # noqa: BLE001
                        import warnings
                        warnings.warn(
                            f"batched device calibration failed "
                            f"({exc!r}); per-recording calibration "
                            f"routing keeps the precomputed linkage",
                            stacklevel=2)
                        thrs = [None] * len(grp)
                    pre_xz.update(
                        {i: (xs[i], Z, t)
                         for i, Z, t in zip(grp, Zs, thrs)})
            except Exception as exc:    # noqa: BLE001 — fall back to the
                import warnings         # per-recording route
                warnings.warn(
                    f"batched device linkage failed ({exc!r}); recordings "
                    f"fall back to the per-recording init path",
                    stacklevel=2)
                # keep the already-computed f64 transforms: prep() then
                # runs the normal per-recording AHC on them instead of
                # paying the O(N*256*128) transform twice on the failure
                # path (recordings already pre-linkaged keep their Z)
                for i, x in xs.items():
                    pre_xz.setdefault(i, (x, None, None))
    if stage_log is not None and pre_xz:
        stage_log["pre_linkage_s"] = round(_time.perf_counter() - _t_pre, 3)
        stage_log["pre_linkage_recordings"] = sum(
            1 for v in pre_xz.values() if v[1] is not None)

    def prep(i):
        rec, _, x_raw = recs[i]
        pre = pre_xz.pop(i, None)
        if pre is not None:
            x, Z_pre, thr_pre = pre
            labels = diar.initial_labels(x, precomputed_Z=Z_pre,
                                         precomputed_thr=thr_pre)
        else:
            x = diar.transform_xvectors(x_raw)
            labels = diar.initial_labels(x)
        fea, phi, qinit = diar.vb_inputs(x, labels)
        T, S = qinit.shape
        key = bucket_shape(T, S)
        # pad to the bucket shape here; the main thread uploads it as soon
        # as this prep completes, so the host->device transfer (the
        # dominant corpus byte volume) overlaps the remaining init work
        # instead of serializing behind it at dispatch time
        Xi = np.zeros((key[0], fea.shape[1]), dtype=diar.dtype)
        Gi = np.zeros(key, dtype=diar.dtype)
        Xi[:T] = fea
        Gi[:T, :S] = qinit
        if verbose:
            print(rec)
        # mutable payload: the main thread clears it after unpacking so
        # the Future doesn't pin a padded copy of the corpus in host RAM
        return [i, rec, T, S, key, Xi, Gi, phi]

    from vbx_tpu.clustering import set_native_threads

    # per index: [rec, T, S, fea_dev, g_dev]; device refs nulled at launch
    # so HBM holds only pending + in-flight chunks, not the whole corpus
    prepped: List[Optional[list]] = [None] * n
    phi: Optional[np.ndarray] = None
    pending: Dict[Tuple[int, int], List[int]] = {}
    next_chunk: Dict[Tuple[int, int], int] = {}  # doubling launch size/key
    launched: List[Dict[str, Any]] = []   # chunk entries in dispatch order
    unawaited = deque()    # chunk entries whose results are still on device
    max_unawaited = 2      # bounds device memory: a queued chunk's inputs
    #                        and gamma stay alive until it is fetched

    def fetch(entry: Dict[str, Any]) -> None:
        """Pull a chunk's results to host and drop the device buffers, so
        HBM never holds more than max_unawaited chunks of gamma/inputs.
        Only the device-computed top-2 label planes + iters + ELBO move
        (_top2_device — the full padded gamma stays on device)."""
        res = entry.pop("res", None)
        if res is not None:
            entry["l1"] = np.asarray(entry.pop("l1_dev"))
            entry["l2"] = np.asarray(entry.pop("l2_dev"))
            entry["iters"] = np.asarray(res.n_iters)
            entry["elbos"] = np.asarray(res.elbo)

    def launch(idxs: List[int], T_pad: int, S_pad: int) -> None:
        B = len(idxs)
        # under a mesh the sharded engine needs B divisible by the 'dp'
        # extent: pad with REPLICAS of lane 0 (results discarded; an
        # all-masked lane would put zero counts through the M-step
        # divisions, and a replica converges in lockstep with lane 0 so
        # padding adds no EM iterations)
        stack_idxs = idxs
        if mesh is not None:
            n_dp = mesh.shape.get("dp", 1)
            Bp = -(-B // n_dp) * n_dp
            stack_idxs = idxs + [idxs[0]] * (Bp - B)
        X = jnp.stack([prepped[i][3] for i in stack_idxs])
        G = jnp.stack([prepped[i][4] for i in stack_idxs])
        PI = np.zeros((len(stack_idxs), S_pad), dtype=diar.dtype)
        FM = np.zeros((len(stack_idxs), T_pad), dtype=bool)
        SM = np.zeros((len(stack_idxs), S_pad), dtype=bool)
        for bi, i in enumerate(stack_idxs):
            _, T, S, _, _ = prepped[i]
            PI[bi, :S] = 1.0 / S
            FM[bi, :T] = True
            SM[bi, :S] = True
        for i in idxs:
            prepped[i][3] = prepped[i][4] = None
        mesh_fb = (fb_impl if fb_impl in ("pallas", "pallas_bf16")
                   else None)
        eps_eff, pu_eff, pi_eff = effective_vb_stop(
            diar.config, mesh_fb if mesh is not None else fb_impl)
        if mesh is not None:
            from vbx_tpu.parallel.engine import vbx_sharded
            res = vbx_sharded(
                mesh, X, jnp.asarray(phi[:cfg.lda_dim], diar.dtype),
                G, jnp.asarray(PI), jnp.asarray(FM), jnp.asarray(SM),
                loop_prob=cfg.vb.loop_prob, Fa=cfg.vb.Fa, Fb=cfg.vb.Fb,
                max_iters=cfg.vb.max_iters, epsilon=eps_eff,
                fb_impl=mesh_fb,
                plateau_ulps=pu_eff,
                plateau_iters=pi_eff)
        else:
            res = vbx_batched(
                X, jnp.asarray(phi[:cfg.lda_dim], diar.dtype),
                G, jnp.asarray(PI), jnp.asarray(FM), jnp.asarray(SM),
                loop_prob=cfg.vb.loop_prob, Fa=cfg.vb.Fa, Fb=cfg.vb.Fb,
                max_iters=cfg.vb.max_iters, epsilon=eps_eff,
                fb_impl=fb_impl,
                plateau_ulps=pu_eff,
                plateau_iters=pi_eff)
        l1_dev, l2_dev = _top2_device(res.gamma, jnp.asarray(SM))
        entry = {"idxs": idxs, "T_pad": T_pad, "S_pad": S_pad, "res": res,
                 "l1_dev": l1_dev, "l2_dev": l2_dev}
        launched.append(entry)
        unawaited.append(entry)
        while len(unawaited) > max_unawaited:
            fetch(unawaited.popleft())

    # parallelism across recordings, not within: pool workers x per-call
    # OpenMP teams oversubscribe the host, so the native linkage runs
    # single-threaded inside the pool (restored after for single-recording
    # latency elsewhere in the process)
    n_workers = min(init_workers, n, os.cpu_count() or init_workers)
    t0 = _time.perf_counter()
    n_overlapped = 0
    if n_workers > 1:
        set_native_threads(1)
    try:
        import contextlib
        try:
            from threadpoolctl import threadpool_limits
            blas_ctx = threadpool_limits(limits=1, user_api="blas")
        except ImportError:
            blas_ctx = contextlib.nullcontext()
        with blas_ctx, ThreadPoolExecutor(max_workers=n_workers) as pool:
            futures = {pool.submit(prep, i): i for i in range(n)}
            for fut in as_completed(futures):
                try:
                    payload = fut.result()
                except Exception as exc:   # noqa: BLE001 — isolate per rec
                    _warn_failed(recs[futures[fut]][0], exc, runlog,
                                 failures)
                    continue
                i, rec, T, S, key, Xi, Gi, p = payload
                payload.clear()   # release the Future's pin on Xi/Gi
                # upload from the (otherwise idle) main thread so the
                # transfer overlaps pool init compute without blocking a
                # pool worker on device I/O
                prepped[i] = [rec, T, S,
                              jax.device_put(Xi), jax.device_put(Gi)]
                del Xi, Gi
                if phi is None:
                    phi = p
                pending.setdefault(key, []).append(i)
                per_batch = chunk_cap(key[0], max_batch_frames)
                if mesh is not None:
                    # max_batch_frames is a PER-DEVICE budget; the mesh
                    # splits each chunk's frames across all its devices.
                    # The cap must also be PADDING-aware: launch() rounds
                    # B up to a dp-multiple with replica lanes, so floor
                    # the cap to a dp-multiple (min one dp group — a
                    # single over-budget chunk must still run) or the
                    # padded batch could exceed the budget by up to ~2x
                    n_dp = mesh.shape.get("dp", 1)
                    per_batch *= int(np.prod(list(mesh.shape.values())))
                    per_batch = max(n_dp, (per_batch // n_dp) * n_dp)
                want = min(next_chunk.get(key, 1), per_batch)
                if len(pending[key]) >= want:
                    # dispatch now, under the remaining init; double the
                    # next chunk so compiled B values stay logarithmic
                    launch(pending.pop(key), *key)
                    next_chunk[key] = min(max(2 * want, 2), per_batch)
                    n_overlapped += 1
    finally:
        if n_workers > 1:
            set_native_threads(os.cpu_count() or 1)
    if stage_log is not None:
        stage_log["init_s"] = round(_time.perf_counter() - t0, 3)
        stage_log["vb_chunks_overlapped"] = n_overlapped
        stage_log["buckets"] = []

    t_vb = _time.perf_counter()
    for (T_pad, S_pad), idxs in sorted(pending.items()):
        launch(idxs, T_pad, S_pad)

    outputs: Dict[str, DiarizationOutput] = {}
    for entry in launched:
        fetch(entry)
        idxs, T_pad, S_pad = entry["idxs"], entry["T_pad"], entry["S_pad"]
        l1_all, l2_all = entry["l1"], entry["l2"]
        iters, elbos = entry["iters"], entry["elbos"]
        if stage_log is not None:
            stage_log["buckets"].append(
                {"B": len(idxs), "T_pad": T_pad, "S_pad": S_pad,
                 "max_iters_run": int(iters.max())})
        for bi, i in enumerate(idxs):
            rec, T, S, _, _ = prepped[i]
            l1 = l1_all[bi, :T]
            outputs[rec] = DiarizationOutput(
                recording=rec,
                labels1st=l1,
                labels2nd=(l2_all[bi, :T] if S > 1 else None),
                n_speakers=len(np.unique(l1)),
                n_iters=int(iters[bi]), elbo=elbos[bi], gamma=None)
        entry.clear()   # drop this chunk's fetched arrays as we go
    if stage_log is not None:
        stage_log["vb_s"] = round(_time.perf_counter() - t_vb, 3)
    return outputs
