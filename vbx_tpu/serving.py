"""Persistent diarization service with micro-batched device dispatch.

The reference has no serving story — each recording is a fresh OS process
(AMI_run.sh:53-58 task lines), so every request pays interpreter + model
load + (on an accelerator) compilation. This module keeps one warm process
per chip: models stay loaded, XLA executables stay cached, and concurrent
requests are MICRO-BATCHED — a worker thread drains the request queue for a
short window, groups requests into the same (T, S) padded buckets the
corpus pipeline uses (utils.bucketing), and runs the batched VB engine once
per bucket. Under load the service therefore approaches the corpus
pipeline's batched throughput; the cost is that every request waits up to
batch_window_ms for potential batch mates before dispatch (set it to 0 for
a pure-latency deployment — batching then only groups requests that were
already queued together).

Results are independent of batch composition (the default engine is
bit-comparable batched vs solo at a fixed padded shape —
tests/test_engine.py), so batching is invisible to callers.

The HTTP front-end lives in cli/serve.py; this module is the in-process
API and owns no sockets.
"""

from __future__ import annotations

import dataclasses
import io
import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vbx_tpu.config import DiarizationConfig
from vbx_tpu.engine.pipeline import Diarizer, _parse_init
from vbx_tpu.engine.vbhmm import vbx_batched
from vbx_tpu.io.rttm import merge_adjacent_labels, write_rttm
from vbx_tpu.utils.bucketing import T_QUANTUM, bucket_shape, chunk_cap


@dataclasses.dataclass
class ServeResult:
    """One diarized request."""
    recording: str
    rttm: str                       # RTTM text (merged segments)
    labels1st: np.ndarray           # [N] 0-based per-x-vector labels
    n_speakers: int
    n_iters: int                    # VB iterations (0 if init-only config)
    wall_ms: float                  # submit -> result wall time
    batch_size: int                 # device batch this request rode in
    labels2nd: Optional[np.ndarray] = None   # config.output_2nd (vbhmm.py:98)
    rttm_2nd: Optional[str] = None


class ServiceOverloaded(RuntimeError):
    """submit() under backlog: the admitted-but-unfinished working set is
    at max_pending_requests. Every admitted VB request pins its padded
    feature/qinit planes in device HBM from init time until launch, so an
    unbounded backlog would grow device memory without bound (ADVICE
    round 4). Callers should shed load or retry after results drain."""


class _Request:
    __slots__ = ("recording", "x_raw", "timestamps", "signal", "vad",
                 "future", "init_future", "t_submit", "fea", "phi", "qinit",
                 "fea_dev", "qinit_dev", "ts",
                 "labels", "t_init_done", "t_launch", "no_partial",
                 "admitted", "released")

    def __init__(self, recording: str, x_raw: Optional[np.ndarray],
                 timestamps: Optional[np.ndarray],
                 signal: Optional[np.ndarray] = None,
                 vad: Optional[np.ndarray] = None,
                 no_partial: bool = False):
        self.recording = recording
        self.x_raw = x_raw
        self.timestamps = timestamps
        self.signal = signal
        self.vad = vad
        # warmup-originated requests opt out of the partial-launch bound
        # (their whole point is riding ONE chunk of the exact padded batch
        # size); real traffic is never affected (ADVICE round 3 — this
        # replaces the old process-global _partial_after_s suspension)
        self.no_partial = no_partial
        self.future: Future = Future()
        self.init_future: Optional[Future] = None
        self.t_submit = time.perf_counter()
        self.fea = self.phi = self.qinit = self.labels = None
        self.fea_dev = self.qinit_dev = self.ts = None
        self.t_init_done = self.t_launch = None
        # admission accounting (max_pending_requests back-pressure):
        # only submit()-admitted requests count; warmup's synthetic
        # requests bypass submit and must not decrement on completion
        self.admitted = False
        self.released = False


_SHUTDOWN = object()


class DiarizationService:
    """Warm, thread-safe diarization service around one device.

    submit() is safe from any thread and returns a Future[ServeResult];
    diarize() is the blocking convenience wrapper. One worker thread owns
    all device dispatch (one process per chip is already the deployment
    rule; one dispatch thread per process keeps device work serialized
    and batchable).
    """

    def __init__(self, config: DiarizationConfig, plda, transform, *,
                 extractor=None,
                 fb_impl: Optional[str] = None,
                 mesh=None,
                 batch_window_ms: float = 20.0,
                 max_batch_frames: int = 2_000_000,
                 init_workers: int = 4,
                 runlog_path: Optional[str] = None,
                 max_request_xvectors: int = 200_000,
                 partial_after_ms: float = 50.0,
                 max_pending_requests: int = 256):
        import os

        from vbx_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache()   # daemon restarts re-use compiled executables
        self._diar = Diarizer(config, plda, transform)
        self.extractor = extractor    # engine.extractor.XVectorExtractor
        # extract_file seeds the GLOBAL numpy RNG for reference-parity
        # dither (predict.py:163-164); concurrent extractions would race
        # it, so audio requests extract one at a time (device-bound anyway)
        self._extract_lock = threading.Lock()
        from vbx_tpu.engine.pipeline import resolve_fb_impl
        self._fb_impl = resolve_fb_impl(fb_impl, config)
        if fb_impl is None and self._fb_impl == "pallas_bf16":
            # serving engine-of-record (round-5 A/B, BENCHMARKS "Serving
            # engine-of-record"): the corpus presets' bf16 run-to-max
            # engine is a BATCH-throughput choice — it runs every request
            # max_iters (40) with the stop rules disabled, while a single
            # request converges in ~6-9 adaptive f32 iterations. At
            # golden-request scale the two measured tied (p95 832 vs
            # 814 ms, K=16 — the tunnel dominates), so the default takes
            # the engine with reference-exact per-request stop semantics
            # and iteration-count scaling at long T. Overridden LOUDLY
            # (the constructor cannot tell a preset default from a
            # deliberate config choice); an EXPLICIT fb_impl=
            # 'pallas_bf16' argument still wins.
            import warnings
            warnings.warn(
                "DiarizationService: overriding the config's "
                "fb_impl='pallas_bf16' (a corpus batch-throughput "
                "engine: max_iters per request, stops disabled) with "
                "the serving engine-of-record 'pallas'; pass "
                "fb_impl='pallas_bf16' explicitly to keep it",
                stacklevel=2)
            self._fb_impl = "pallas"
        # pod-slice serving: a ('dp', 'sp') jax.sharding.Mesh routes every
        # bucket through the sharded engine (parallel.vbx_sharded) —
        # recordings data-parallel, frames sequence-parallel over ICI.
        # fb_impl is ignored under a mesh (the sharded engine is the
        # structured smoother). T buckets are powers of two >= T_QUANTUM,
        # so the 'sp' extent must divide the smallest bucket.
        self.mesh = mesh
        if mesh is not None:
            n_sp = mesh.shape.get("sp", 1)
            if T_QUANTUM % n_sp:
                raise ValueError(
                    f"mesh 'sp' extent {n_sp} must divide the smallest "
                    f"frame bucket ({T_QUANTUM})")
        self._window_s = batch_window_ms / 1e3
        # head-of-line bound (VERDICT r2 #5): a bucket group whose oldest
        # member has waited this long launches as a PARTIAL device chunk
        # instead of waiting for the cohort's slowest host init (results
        # are batch-size independent, so partial batches are invisible to
        # callers). float('inf') restores wait-for-the-whole-cohort.
        self._partial_after_s = partial_after_ms / 1e3
        self._max_batch_frames = max_batch_frames
        # one oversized request must not OOM the daemon for everyone:
        # the O(N^2) host init and the padded device buffers both scale
        # with request length (200k x-vectors ~ 13 h of audio — far past
        # any single-recording use; raise the cap deliberately if needed)
        self._max_request_xvectors = max(1, max_request_xvectors)
        # bound the admitted working set: every admitted VB request pins
        # its padded device planes (_init_one uploads at init time) until
        # its chunk launches, so backlog depth IS device-memory depth —
        # under open-loop overload submit() sheds load loudly
        # (ServiceOverloaded) instead of OOMing the chip (ADVICE round 4)
        self._max_pending = max(1, max_pending_requests)
        self._pending = 0
        self._queue: "queue.Queue" = queue.Queue()
        self._warmup_lock = threading.Lock()
        init_workers = max(1, init_workers)
        if init_workers > 1:
            # the native linkage/EM spawns an OpenMP team per call and
            # NumPy's dgemm a BLAS team; the same discipline as the corpus
            # pipeline's init pool (pipeline.py: pool workers x per-call
            # teams oversubscribe the host), but set once for the service
            # lifetime: share the cores
            from vbx_tpu.clustering import set_native_threads
            set_native_threads(
                max(1, (os.cpu_count() or init_workers) // init_workers))
            try:
                from threadpoolctl import threadpool_limits
                # process-global; close() restores the original limits so
                # later same-process work (corpus pipeline, tests) gets
                # its BLAS threads back
                self._blas_limit = threadpool_limits(
                    limits=max(1, (os.cpu_count() or init_workers)
                               // init_workers),
                    user_api="blas")
            except ImportError:
                self._blas_limit = None
        else:
            self._blas_limit = None
        self._init_pool = ThreadPoolExecutor(
            max_workers=init_workers,
            thread_name_prefix="vbx-serve-init")
        from vbx_tpu.utils.runlog import RunLog
        self._runlog = RunLog(runlog_path)   # written by the worker only
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "failed": 0, "batches": 0,
                       "batched_requests": 0, "max_batch": 0}
        self._t_start = time.time()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="vbx-serve-dispatch")
        self._worker.start()

    @classmethod
    def from_files(cls, config: DiarizationConfig, plda_file: str,
                   transform_file: str, **kw) -> "DiarizationService":
        from vbx_tpu.io.plda import read_plda
        from vbx_tpu.io.transform import read_xvec_transform
        return cls(config, read_plda(plda_file),
                   read_xvec_transform(transform_file), **kw)

    # -- public API ----------------------------------------------------------

    def submit(self, recording: str, x_raw: np.ndarray,
               timestamps: np.ndarray, *, _no_partial: bool = False
               ) -> Future:
        """Enqueue one recording: raw x-vectors [N, D_raw] + per-vector
        (start, end) seconds [N, 2]. Returns a Future[ServeResult]."""
        x_raw = np.asarray(x_raw)
        timestamps = np.asarray(timestamps, np.float64)
        if x_raw.ndim != 2 or timestamps.shape != (len(x_raw), 2):
            raise ValueError(
                f"need x_raw [N, D] and timestamps [N, 2]; got "
                f"{x_raw.shape} and {timestamps.shape}")
        if len(x_raw) == 0:
            raise ValueError("empty request: no x-vectors")
        if len(x_raw) > self._max_request_xvectors:
            raise ValueError(
                f"request {recording!r} has {len(x_raw)} x-vectors > "
                f"max_request_xvectors={self._max_request_xvectors}; "
                f"split the recording or raise the service limit")
        req = _Request(recording, x_raw, timestamps,
                       no_partial=_no_partial)
        # the closed check and the enqueue are one atomic step so a request
        # can never land behind the shutdown sentinel (where it would never
        # be processed and its future never complete)
        with self._lock:
            if self._closed:
                raise RuntimeError("service is closed")
            self._admit(req)
            # host init (f64 transform + AHC) starts NOW, not when the
            # dispatcher picks the batch up: it overlaps the batching
            # window and any in-flight device batch, so under sustained
            # load the init pool never idles behind device dispatch
            req.init_future = self._init_pool.submit(self._init_one, req)
            self._queue.put(req)
        return req.future

    def diarize(self, recording: str, x_raw: np.ndarray,
                timestamps: np.ndarray,
                timeout: Optional[float] = None) -> ServeResult:
        return self.submit(recording, x_raw, timestamps).result(timeout)

    def submit_audio(self, recording: str, signal: np.ndarray,
                     vad_s: np.ndarray) -> Future:
        """Enqueue raw audio: signal [N] float in [-1, 1) at the
        extractor's sample rate + VAD speech regions [V, 2] (seconds).
        X-vector extraction runs in the service (requires an `extractor`
        at construction); the result diarizes like an x-vector request."""
        if self.extractor is None:
            raise RuntimeError(
                "no extractor configured: pass extractor= (or --weights "
                "to vbx-tpu-serve) to enable audio requests")
        signal = np.asarray(signal)
        vad_s = np.atleast_2d(np.asarray(vad_s, np.float64))
        if signal.ndim != 1 or vad_s.ndim != 2 or vad_s.shape[1] != 2:
            raise ValueError(
                f"need signal [N] and vad [V, 2] seconds; got "
                f"{signal.shape} and {vad_s.shape}")
        req = _Request(recording, None, None, signal=signal, vad=vad_s)
        with self._lock:
            if self._closed:
                raise RuntimeError("service is closed")
            self._admit(req)
            req.init_future = self._init_pool.submit(self._init_one, req)
            self._queue.put(req)
        return req.future

    def diarize_audio(self, recording: str, signal: np.ndarray,
                      vad_s: np.ndarray,
                      timeout: Optional[float] = None) -> ServeResult:
        return self.submit_audio(recording, signal, vad_s).result(timeout)

    def warmup(self, n_xvectors: int = 256, n_raw_dim: Optional[int] = None,
               batch_sizes: Tuple[int, ...] = (1,),
               payload: Optional[Tuple[np.ndarray, np.ndarray]] = None
               ) -> ServeResult:
        """Compile/load the common path before taking traffic: run
        recordings end-to-end (host init chain + a device batch).
        `batch_sizes` pre-warms the power-of-two batch buckets concurrent
        traffic will ride in (e.g. (1, 8, 16)) — each novel device shape
        otherwise pays compile (or persistent-cache deserialize + device
        load, seconds over a tunnel) on the first real cohort that hits
        it. `payload` supplies a REAL (x_raw, timestamps) request body so
        the warmed (T, S) bucket matches production traffic (synthetic
        vectors cluster to a different speaker count — round-3 serving
        battery showed a 3.5-5 s first-cohort tail from exactly that).

        Warmup requests opt out of partial launches individually (a
        per-request flag): each wave must ride ONE chunk of exactly the
        padded batch size being warmed, or staggered warmup inits would
        split the wave and skip the very executable it exists to load.
        Real traffic arriving during a warmup wave keeps its head-of-line
        bound — a mixed group partial-launches normally (ADVICE round 3
        replaced the old process-global suspension)."""
        batch_sizes = tuple(batch_sizes)
        if not batch_sizes or any(k < 1 for k in batch_sizes):
            raise ValueError(
                f"warmup batch_sizes must be a non-empty sequence of "
                f"positive ints, got {batch_sizes!r}")
        if payload is not None:
            x, ts = payload
            x = np.asarray(x)
            ts = np.asarray(ts, np.float64)
        else:
            d = n_raw_dim or self._diar.mean1.shape[0]
            rng = np.random.default_rng(0)
            x = rng.normal(size=(n_xvectors, d)).astype(np.float32)
            ts = np.stack([np.arange(n_xvectors) * 0.24,
                           np.arange(n_xvectors) * 0.24 + 1.44], axis=1)
        res = None
        # serialized: concurrent warmups would interleave their waves into
        # each other's buckets and warm different shapes than requested
        with self._warmup_lock:
            # Phase 1 — compile every wave's executable CONCURRENTLY
            # (VERDICT r3 #5 follow-up): the padded-B programs otherwise
            # compile (or cache-deserialize) serially inside the waves,
            # one shape after another. XLA compilation is C++ work that
            # releases the GIL, so launching each shape once from its own
            # thread overlaps all compiles; device execution of the tiny
            # dummy chunks serializes harmlessly. The launches go through
            # the REAL _launch_chunk so the warmed signature can never
            # drift from production (the round-3 warmup bug class).
            dummy = _Request("__warmup_compile__", x, ts, no_partial=True)
            self._init_one(dummy)
            if dummy.ts is not None:      # init-only configs skip phase 1
                t_pad, s_pad = bucket_shape(*dummy.ts)

                def compile_one(k):
                    entry = self._launch_chunk([dummy] * k, t_pad, s_pad)
                    if entry is not None:
                        np.asarray(entry["l1"])   # force load + execute

                with ThreadPoolExecutor(
                        max_workers=len(batch_sizes)) as pool:
                    list(pool.map(compile_one, batch_sizes))
            # Phase 2 — the end-to-end waves (now hitting warm
            # executables): each wave still rides ONE chunk of exactly
            # its padded batch size, verifying the path traffic will take
            for k in batch_sizes:
                futs = [self.submit(f"__warmup_{k}_{i}__", x, ts,
                                    _no_partial=True)
                        for i in range(k)]
                res = [f.result() for f in futs][-1]
        return res

    def stats(self) -> Dict[str, object]:
        with self._lock:
            s = dict(self._stats)
        s["uptime_s"] = round(time.time() - self._t_start, 3)
        s["queue_depth"] = self._queue.qsize()
        with self._lock:
            s["pending"] = self._pending
        s["max_pending_requests"] = self._max_pending
        return s

    def close(self) -> None:
        """Drain-free shutdown: requests already queued are completed,
        then the worker exits."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_SHUTDOWN)
        self._worker.join()
        self._init_pool.shutdown(wait=False)
        if self._blas_limit is not None:
            self._blas_limit.restore_original_limits()
            self._blas_limit = None
        self._runlog.close()

    def __enter__(self) -> "DiarizationService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- worker --------------------------------------------------------------

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is _SHUTDOWN:
                return
            batch = [item]
            deadline = time.perf_counter() + self._window_s
            stop = False
            while True:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is _SHUTDOWN:
                    stop = True
                    break
                batch.append(nxt)
            try:
                if self._process(batch):
                    return             # shutdown sentinel absorbed mid-run
            except Exception as exc:   # noqa: BLE001 — never kill the worker
                for req in batch:
                    if not req.future.done():
                        self._fail(req, exc)
            if stop:
                return

    def _init_one(self, req: _Request) -> None:
        """Host init chain (f64 transform + AHC) for one request; runs on
        the init pool, launched at submit time. Per-request failure
        isolation mirrors the corpus pipeline's (exceptions surface when
        the dispatcher collects the init future)."""
        _, _, run_vb = _parse_init(self._diar.config.init)
        if req.x_raw is None:   # audio request: extract x-vectors first
            with self._extract_lock:
                segs = self.extractor.extract_file(
                    req.signal, req.vad, req.recording)
            if not segs:
                raise ValueError(
                    f"{req.recording}: no x-vectors (VAD empty or "
                    f"all segments shorter than one window)")
            req.x_raw = np.stack([s.xvector for s in segs])
            req.timestamps = np.array(
                [[s.start, s.end] for s in segs], np.float64)
            req.signal = req.vad = None
            if len(req.x_raw) > self._max_request_xvectors:
                # audio requests learn their length only after extraction;
                # enforce the same cap submit() applies to x-vector bodies
                raise ValueError(
                    f"{req.recording}: audio extracted to "
                    f"{len(req.x_raw)} x-vectors > max_request_xvectors="
                    f"{self._max_request_xvectors}")
        # reference-parity NaN guard (predict.py:185-186 skips NaN
        # embeddings at extraction; a serving request made of them is
        # an input error, not a diarization)
        if not np.all(np.isfinite(req.x_raw)):
            raise ValueError(
                f"{req.recording}: non-finite values in x_raw")
        x = self._diar.transform_xvectors(req.x_raw)
        req.labels = self._diar.initial_labels(x)
        if run_vb:
            fea, phi, qinit = self._diar.vb_inputs(x, req.labels)
            req.phi = phi
            T, S = qinit.shape
            req.ts = (T, S)
            # pad to the bucket shape and upload HERE, on the init pool,
            # so the host->device transfer (the dominant per-chunk byte
            # volume — ~8.9 MB per 16-request chunk over the tunnel)
            # overlaps the cohort's remaining host inits instead of
            # serializing inside the dispatcher's launch (the same
            # discipline as the corpus pipeline's prep stage)
            t_pad, s_pad = bucket_shape(T, S)
            Xi = np.zeros((t_pad, fea.shape[1]), dtype=self._diar.dtype)
            Gi = np.zeros((t_pad, s_pad), dtype=self._diar.dtype)
            Xi[:T] = fea
            Gi[:T, :S] = qinit
            import jax
            req.fea_dev = jax.device_put(Xi)
            req.qinit_dev = jax.device_put(Gi)
        req.t_init_done = time.perf_counter()

    def _process(self, batch: List[_Request]) -> bool:
        """Dispatch one cohort — and, under sustained load, every request
        that ARRIVES while the cohort is in flight: each loop tick drains
        the service queue into the working set, so a request landing
        mid-cohort joins grouping immediately instead of waiting a full
        cohort cycle in the queue. (Round-4 A/B: the closed-loop bench —
        clients that submit only after their previous result — is
        neutral on this change within tunnel noise, because its arrivals
        cluster at cohort boundaries anyway; the structural win is for
        OPEN-LOOP arrivals, which previously paid up to a whole cohort
        cycle of queue wait before even entering grouping.) Returns True
        if the shutdown sentinel was absorbed (the worker must exit)."""
        _, _, run_vb = _parse_init(self._diar.config.init)
        with self._lock:
            self._stats["batches"] += 1
            self._stats["batched_requests"] += len(batch)
            self._stats["max_batch"] = max(self._stats["max_batch"],
                                           len(batch))

        # stream dispatch: as init futures complete, fill (T, S)-bucket
        # groups and LAUNCH full chunks immediately — XLA dispatch is
        # asynchronous, so a chunk's device EM runs under the remaining
        # requests' host init instead of after it (the corpus pipeline's
        # pipelined-dispatcher discipline; before this, a 64-request
        # cohort serialized all 64 inits, then one device batch). Results
        # are fetched after everything is launched.
        #
        # Head-of-line bound (VERDICT r2 #5 — the p95 fix): a group whose
        # OLDEST member has waited `partial_after_ms` launches partially
        # instead of waiting for the cohort's slowest init. Before this,
        # every request in a cohort paid max(init) — one GC pause or GIL
        # storm in any of K inits set the whole cohort's latency, which is
        # exactly a tail (p95) amplifier under concurrent load.
        import concurrent.futures as cf

        from collections import deque

        groups: Dict[Tuple[int, int], List[_Request]] = {}
        group_born: Dict[Tuple[int, int], float] = {}
        in_flight: deque = deque()
        # bounds HBM: a launched chunk's inputs and results stay resident
        # until fetched (same discipline as the corpus pipeline's
        # max_unawaited — without it a cohort of long recordings could
        # hold every chunk's gamma on the device at once)
        max_in_flight = 2

        def launch(reqs, t_pad, s_pad):
            entry = self._launch_chunk(reqs, t_pad, s_pad)
            if entry is not None:
                entry["t"] = time.perf_counter()
                in_flight.append(entry)
            while len(in_flight) > max_in_flight:
                self._finish_chunk(in_flight.popleft())

        fut_to_req = {req.init_future: req for req in batch}
        pending = set(fut_to_req)
        stop = False

        # absorbed mid-cohort requests are only reachable through
        # fut_to_req — a failure here must fail THEM too, not just
        # the requests _run handed in (their futures would
        # otherwise hang forever)
        try:

            def absorb() -> int:
                """Non-blocking queue drain into the working set (new
                requests' inits are already running — submit() launched
                them; this only admits them to grouping). Returns the
                number of requests admitted."""
                nonlocal stop
                n = 0
                while not stop:
                    try:
                        nxt = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if nxt is _SHUTDOWN:
                        stop = True
                        break
                    fut_to_req[nxt.init_future] = nxt
                    pending.add(nxt.init_future)
                    n += 1
                    with self._lock:
                        self._stats["batched_requests"] += 1
                return n

            # admission tick with idle backoff (ADVICE round 4): new
            # arrivals don't wake cf.wait (their futures join the set only
            # at the next absorb), so waits are bounded by a short tick —
            # but a quiet queue under a multi-minute host init (e.g. audio
            # extraction) would wake this thread 50x/s for nothing, so
            # consecutive empty drains stretch the tick up to 250 ms (an
            # admitted request's init is running from submit() regardless;
            # the tick only delays grouping eligibility)
            tick = 0.02
            while pending:
                tick = 0.02 if absorb() else min(tick * 2.0, 0.25)
                deadline = float("inf")
                if not stop:
                    deadline = time.perf_counter() + tick
                if groups:
                    deadline = min(deadline, min(
                        (born + self._partial_after_s
                         for key, born in group_born.items()
                         if not all(r.no_partial for r in groups[key])),
                        default=float("inf")))
                if in_flight:
                    # a launched chunk's RESULTS must not wait on unrelated
                    # stragglers either: age-bound the deferred fetch the same
                    # way (fetching blocks this thread only for the device
                    # remainder; inits keep running on the pool)
                    fetch_deadline = in_flight[0]["t"] + self._partial_after_s
                    if (fetch_deadline <= time.perf_counter()
                            and not in_flight[0]["l1"].is_ready()):
                        # an aged-but-unfinished chunk would otherwise pin the
                        # deadline permanently in the past — cf.wait(timeout=0)
                        # returns immediately and the loop busy-spins against
                        # the init pool for the chunk's whole device remainder
                        # (ADVICE round 3). Poll it at a floored interval.
                        fetch_deadline = time.perf_counter() + 0.005
                    deadline = min(deadline, fetch_deadline)
                timeout = (None if deadline == float("inf")
                           else max(0.0, deadline - time.perf_counter()))
                done, pending = cf.wait(pending, timeout=timeout,
                                        return_when=cf.FIRST_COMPLETED)
                now = time.perf_counter()
                for fut in done:
                    req = fut_to_req[fut]
                    try:
                        fut.result()
                    except Exception as exc:   # noqa: BLE001
                        self._fail(req, exc)
                        continue
                    if not run_vb:
                        # init-only configs ride no device batch: finish the
                        # moment the init lands (batch_size 1 — under the
                        # continuous dispatcher a deferred cohort flush would
                        # starve these on sustained traffic)
                        self._finish(req, req.labels, n_iters=0, batch_size=1)
                        continue
                    key = bucket_shape(*req.ts)
                    if key not in groups:
                        groups[key] = []
                        group_born[key] = now
                    groups[key].append(req)
                    if len(groups[key]) >= self._chunk_cap(key[0]):
                        launch(groups.pop(key), *key)
                        group_born.pop(key, None)
                for key in [k for k, born in group_born.items()
                            if now - born >= self._partial_after_s
                            and not all(r.no_partial for r in groups[k])]:
                    launch(groups.pop(key), *key)
                    group_born.pop(key, None)
                # drain aged chunks only when the device has actually finished
                # them (is_ready is non-blocking): a blocking fetch of a
                # still-running chunk would stall THIS loop and with it every
                # other group's partial-launch deadline — the head-of-line
                # this bound exists to prevent. A finished chunk is picked up
                # within one deadline tick (in_flight caps the wait timeout).
                while in_flight and (
                        time.perf_counter() - in_flight[0]["t"]
                        >= self._partial_after_s
                        and in_flight[0]["l1"].is_ready()):
                    self._finish_chunk(in_flight.popleft())
            for (t_pad, s_pad), reqs in sorted(groups.items()):
                cap = self._chunk_cap(t_pad)
                for k in range(0, len(reqs), cap):
                    launch(reqs[k:k + cap], t_pad, s_pad)
            while in_flight:
                self._finish_chunk(in_flight.popleft())
        except Exception as exc:   # noqa: BLE001 — never hang a
            for req in fut_to_req.values():   # caller's future
                if not req.future.done():
                    self._fail(req, exc)
        return stop

    def _chunk_cap(self, t_pad: int) -> int:
        """Requests per device chunk for a bucket of padded length t_pad.

        The raw frames-budget cap (chunk_cap) must be PADDING-aware:
        _run_chunk pads B up to a power-of-two (x dp-multiple) bucket, so
        chunk_cap alone would let the padded device batch exceed the
        budget by up to ~2x. Floor to the largest chunk size whose PADDED
        batch still fits (floor at 1 — a single over-budget request must
        still run)."""
        if self.mesh is not None:
            # max_batch_frames is a PER-DEVICE budget; a dp x sp mesh
            # splits a chunk's B x t_pad frames across all its devices
            n_devs = int(np.prod(list(self.mesh.shape.values())))
            cap = max(1, (self._max_batch_frames * n_devs) // t_pad)
        else:
            cap = chunk_cap(t_pad, self._max_batch_frames)
        c = 1 << (cap.bit_length() - 1)
        while c > 1 and self._padded_batch(c) > cap:
            c >>= 1
        return c

    def _padded_batch(self, B: int) -> int:
        """Device batch size for B live requests: the power-of-two bucket,
        then (under a mesh) rounded UP to a multiple of the 'dp' extent —
        taking max() instead would leave e.g. dp=3, B=5 -> pow2 8, which
        violates vbx_sharded's divisibility contract (parallel/engine.py)."""
        Bp = 1 << max(B - 1, 1).bit_length() if B > 1 else 1
        if self.mesh is not None:
            n_dp = self.mesh.shape.get("dp", 1)
            Bp = -(-Bp // n_dp) * n_dp
        return Bp

    def _launch_chunk(self, reqs: List[_Request], t_pad: int,
                      s_pad: int) -> Optional[dict]:
        """Pad + dispatch one device chunk (asynchronous); returns an
        entry for _finish_chunk, or None if the dispatch itself failed
        (those requests are already failed)."""
        diar = self._diar
        cfg = diar.config
        B = len(reqs)
        # pad the batch axis to a power of two with copies of request 0
        # (results discarded): XLA compiles one executable per shape, and
        # a fresh compile costs seconds — far more than the padded lanes'
        # compute. All request counts in (2^(k-1), 2^k] share one
        # executable; padding lanes replicate real data (all-False masks
        # would put zero counts through the M-step divisions) and converge
        # identically to lane 0, so they add no EM iterations.
        Bp = self._padded_batch(B)
        PI = np.zeros((Bp, s_pad), dtype=diar.dtype)
        FM = np.zeros((Bp, t_pad), dtype=bool)
        SM = np.zeros((Bp, s_pad), dtype=bool)
        for b, req in enumerate(reqs):
            T, S = req.ts
            PI[b, :S] = 1.0 / S
            FM[b, :T] = True
            SM[b, :S] = True
        for b in range(B, Bp):
            PI[b], FM[b], SM[b] = PI[0], FM[0], SM[0]
        # the per-request feature/init planes were padded and uploaded at
        # INIT time (_init_one); the batch is assembled by a device-side
        # stack — no host->device bulk transfer on the launch path
        x_rows = [req.fea_dev for req in reqs]
        g_rows = [req.qinit_dev for req in reqs]
        x_rows += [x_rows[0]] * (Bp - B)
        g_rows += [g_rows[0]] * (Bp - B)
        X = jnp.stack(x_rows)
        G = jnp.stack(g_rows)
        from vbx_tpu.engine.pipeline import effective_vb_stop
        eps_eff, pu_eff, pi_eff = effective_vb_stop(
            cfg, None if self.mesh is not None else self._fb_impl)
        try:
            if self.mesh is not None:
                from vbx_tpu.parallel.engine import vbx_sharded
                res = vbx_sharded(
                    self.mesh, X,
                    jnp.asarray(reqs[0].phi, diar.dtype), G,
                    jnp.asarray(PI), jnp.asarray(FM), jnp.asarray(SM),
                    loop_prob=cfg.vb.loop_prob, Fa=cfg.vb.Fa, Fb=cfg.vb.Fb,
                    max_iters=cfg.vb.max_iters, epsilon=cfg.vb.epsilon,
                    plateau_ulps=cfg.vb.plateau_ulps,
                    plateau_iters=cfg.vb.plateau_iters)
            else:
                res = vbx_batched(
                    X, jnp.asarray(reqs[0].phi, diar.dtype),
                    G, jnp.asarray(PI), jnp.asarray(FM),
                    jnp.asarray(SM), loop_prob=cfg.vb.loop_prob,
                    Fa=cfg.vb.Fa, Fb=cfg.vb.Fb, max_iters=cfg.vb.max_iters,
                    epsilon=eps_eff, fb_impl=self._fb_impl,
                    plateau_ulps=pu_eff,
                    plateau_iters=pi_eff)
        except Exception as exc:   # noqa: BLE001 — fail the chunk, not the
            for req in reqs:       # service
                self._fail(req, exc)
            return None
        # top-2 labels computed on device at launch: the result fetch
        # then moves two small int32 planes instead of the full padded
        # gamma (engine.pipeline._top2_device — the gamma fetch was a
        # measured ~190 ms per chunk over the tunnel)
        from vbx_tpu.engine.pipeline import _top2_device
        l1, l2 = _top2_device(res.gamma, jnp.asarray(SM))
        now = time.perf_counter()
        for req in reqs:
            req.t_launch = now
        return {"reqs": reqs, "res": res, "l1": l1, "l2": l2, "B": B}

    def _finish_chunk(self, entry: dict) -> None:
        cfg = self._diar.config
        reqs, B = entry["reqs"], entry["B"]
        try:
            l1 = np.asarray(entry["l1"])
            l2 = np.asarray(entry["l2"])
            iters = np.asarray(entry["res"].n_iters)
        except Exception as exc:   # noqa: BLE001 — fetch failed: fail the
            for req in reqs:       # chunk, not the service
                self._fail(req, exc)
            return
        for b, req in enumerate(reqs):
            T, S = req.ts
            labels = l1[b, :T]
            labels2 = (l2[b, :T] if cfg.output_2nd and S > 1 else None)
            self._finish(req, labels, labels2nd=labels2,
                         n_iters=int(iters[b]), batch_size=B)

    # -- result assembly -------------------------------------------------------

    def _admit(self, req: _Request) -> None:
        """Count one submit()-admitted request against the working-set
        bound. Caller holds self._lock."""
        if self._pending >= self._max_pending:
            raise ServiceOverloaded(
                f"{self._pending} requests admitted and unfinished "
                f">= max_pending_requests={self._max_pending}; every "
                f"admitted request pins padded device planes until its "
                f"chunk launches — shed load or retry after results "
                f"drain")
        self._pending += 1
        req.admitted = True

    def _release(self, req: _Request) -> None:
        """Terminal accounting for an admitted request (idempotent; safe
        on warmup's non-admitted synthetic requests)."""
        with self._lock:
            if req.admitted and not req.released:
                req.released = True
                self._pending -= 1

    def _fail(self, req: _Request, exc: Exception) -> None:
        self._release(req)
        if req.future.done():
            # idempotent: a request can reach _fail twice (e.g. the
            # warmup compile chunk holds the same dummy request in every
            # lane); a second set_exception would raise InvalidStateError
            # inside an exception handler
            return
        with self._lock:
            self._stats["requests"] += 1
            self._stats["failed"] += 1
        self._runlog.write({"event": "request_failed",
                            "recording": req.recording,
                            "error": f"{type(exc).__name__}: {exc}"})
        # a caller may have cancel()ed the pending future; the claim below
        # makes set_exception safe (and a cancelled request stays counted)
        if req.future.set_running_or_notify_cancel():
            req.future.set_exception(exc)

    def _finish(self, req: _Request, labels: np.ndarray, *, n_iters: int,
                batch_size: int,
                labels2nd: Optional[np.ndarray] = None) -> None:
        self._release(req)
        if not req.future.set_running_or_notify_cancel():
            with self._lock:      # cancelled while queued/in flight
                self._stats["requests"] += 1
            self._runlog.write({"event": "request_cancelled",
                                "recording": req.recording})
            return
        start, end = req.timestamps.T
        starts, ends, out_labels = merge_adjacent_labels(start, end, labels)
        buf = io.StringIO()
        write_rttm(buf, req.recording, starts, ends, out_labels)
        rttm2 = None
        if labels2nd is not None:
            s2, e2, l2 = merge_adjacent_labels(start, end, labels2nd)
            buf2 = io.StringIO()
            write_rttm(buf2, req.recording, s2, e2, l2)
            rttm2 = buf2.getvalue()
        result = ServeResult(
            recording=req.recording, rttm=buf.getvalue(),
            labels1st=labels, n_speakers=len(np.unique(labels)),
            n_iters=n_iters,
            wall_ms=round((time.perf_counter() - req.t_submit) * 1e3, 3),
            batch_size=batch_size, labels2nd=labels2nd, rttm_2nd=rttm2)
        with self._lock:
            self._stats["requests"] += 1
        def _ms(t):
            return (round((t - req.t_submit) * 1e3, 1)
                    if t is not None else None)

        self._runlog.write({
            "event": "request", "recording": req.recording,
            "n_speakers": result.n_speakers, "n_iters": result.n_iters,
            "wall_ms": result.wall_ms, "batch_size": result.batch_size,
            "init_done_ms": _ms(req.t_init_done),
            "launched_ms": _ms(req.t_launch)})
        req.future.set_result(result)
