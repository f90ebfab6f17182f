"""AHC initialization: TPU pairwise similarity + 2-GMM threshold calibration
feeding the native average-linkage merge and flat cut.

Pipeline parity with the reference diarization CLI (vbhmm.py:131-146):
similarity matrix -> utterance-specific calibration threshold -> condensed
negative-similarity matrix -> average linkage -> distance cut at
-(thr + threshold_bias), implemented with the reference's nonnegative-shift
('adjust') transformation of the linkage distances.

Long recordings (cosine/host, N >= _BLOCKED_MIN_N) never materialize the
condensed matrix: the calibration threshold comes from a streamed blocked
histogram sweep and the linkage from the O(N*D)-memory cluster-sums
identity (clustering.linkage_dot_avg) — 103 s / 1.1 GB at N=50k vs the
round-2 condensed path's 183 s / 10 GB (BENCHMARKS.md). On the device
route (auto with an accelerator at N >= 16384, or explicit 'device') the
WHOLE front half now runs on the accelerator: the MXU-streamed 2-GMM
calibration (round 4) and the NN-chain linkage walk itself
(clustering.device.linkage_dot_avg_device, round 5 — one [N, D] matvec
per scan, ~5 s warm vs 66 s host at N=50k, labels identical).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vbx_tpu.clustering import (
    fcluster_by_distance, linkage, linkage_dot_avg, squareform_condensed)
from vbx_tpu.ops.calibration import two_gmm_calib_lin_binned
from vbx_tpu.ops.similarity import cos_similarity, kaldi_plda_scoring_dense


def _try_device_linkage(xn: np.ndarray):
    """NN-chain walk on the accelerator, or None when there is no
    non-CPU backend or the walk fails (callers fall back to the host f64
    chain). ONE definition keeps the >=16384 'device' branch and the
    mid-N 'auto' branch in lockstep — the fallback policy is
    parity-critical."""
    import jax
    if jax.default_backend() == "cpu":
        return None
    try:
        from vbx_tpu.clustering.device import linkage_dot_avg_device
        return linkage_dot_avg_device(xn)
    except Exception as exc:   # noqa: BLE001 — the recording must diarize
        import warnings
        warnings.warn(
            f"device linkage failed ({exc!r}); falling back to the host "
            f"NN-chain", stacklevel=3)
        return None


def ahc_labels(
    x: np.ndarray,
    threshold_bias: float,
    similarity: str = "cosine",
    plda: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    target_energy: float = 1.0,
    pca_dim: Optional[int] = None,
    linkage_backend: Optional[str] = None,
    compute_backend: str = "auto",
    precomputed_Z: Optional[np.ndarray] = None,
    precomputed_thr: Optional[float] = None,
) -> np.ndarray:
    """Cluster x-vectors; returns 0-based integer labels [N].

    x is the transformed (PLDA-space, length-normalized) x-vector matrix.
    `similarity` selects cosine (reference default, vbhmm.py:135) or the
    Kaldi-equivalent dense PLDA scoring (diarization_lib.py:59-93).

    `compute_backend`:
    - 'host': similarity + 2-GMM calibration in float64 NumPy. The
      calibration threshold feeds the linkage cut, so it decides the AHC
      cluster count, and f32 perturbations there measurably shift the VB
      init (observed: 31 -> 32 clusters on the ES2005a golden run).
    - 'device': N < _BLOCKED_MIN_N computes the N x N similarity on the
      accelerator in its dtype and calibrates in f64 on host over the
      device scores (the latency opt-in for serving-sized requests —
      labels may differ from 'host' at genuinely tied merges).
      N >= _BLOCKED_MIN_N streams the calibration sweep through the MXU
      (ops.calibration.two_gmm_calib_cosine_device — only scalars cross
      the device boundary; measured threshold agreement vs the host f64
      path ~1e-6, two orders below the AHC merge-decision scale) AND,
      when a non-CPU accelerator is attached, runs the NN-chain linkage
      walk on it too (clustering.device.linkage_dot_avg_device: f32
      HIGHEST-precision scans, measured label equality vs the host f64
      chain at N=50k, dist drift ~2e-7). This is the reference's
      acknowledged long-recording weakness (README.md:24) moved onto
      the accelerator end to end.
    - 'auto' (default): 'host' semantics everywhere EXCEPT long cosine
      recordings (N >= _DEVICE_CALIB_MIN_N = 16384, the measured
      crossover where the device sweep beats the host) when a non-CPU
      accelerator is attached, which take the streamed device
      calibration above. Short recordings — including the golden
      acceptance chain — keep the f64 host invariant bit-for-bit.
    """
    if compute_backend not in ("auto", "host", "device"):
        # strict, like `similarity` below: a typo ('Host', 'devcie') would
        # otherwise silently run the f32 device path and weaken the f64
        # init-chain invariant 'device' exists to opt out of deliberately
        raise ValueError(
            f"unknown compute_backend {compute_backend!r}; "
            f"expected 'auto', 'host' or 'device'")
    n = x.shape[0]
    if n == 1:
        return np.zeros(1, dtype=np.int32)

    condensed = thr = Z = None
    requested_backend = compute_backend
    if (precomputed_Z is not None and similarity == "cosine"
            and n >= _BLOCKED_MIN_N):
        # corpus pre-stage (engine.pipeline round 5): the caller already
        # ran this recording's NN-chain in one BATCHED device call
        # (clustering.device.linkage_dot_avg_device_batched). When the
        # caller also batched the CALIBRATION (round-5 continuation:
        # ops.calibration.two_gmm_calib_cosine_device_batched — one
        # device dispatch per EM pass for the whole corpus, amortizing
        # the ~21 tunnel round-trips that make per-meeting device
        # calibration LOSE in the mid-N band), `precomputed_thr` skips
        # every O(N^2) host pass here; it agrees with the sequential
        # device sweep bit-near-exactly and with the host f64 sweep at
        # the documented ~1e-7 bound (PARITY.md deviation 6). Otherwise
        # the threshold routes exactly as the unbatched 'auto' path
        # would (host blocked sweep mid-N, MXU-streamed sweep from
        # _DEVICE_CALIB_MIN_N).
        if precomputed_thr is not None:
            thr = float(precomputed_thr)
        else:
            x64 = np.asarray(x, dtype=np.float64)
            xn = x64 / (np.sqrt((x64 * x64).sum(axis=1, keepdims=True))
                        + 1e-32)
            if n >= _DEVICE_CALIB_MIN_N:
                import jax
                if jax.default_backend() != "cpu":
                    from vbx_tpu.ops.calibration import (
                        two_gmm_calib_cosine_device)
                    try:
                        thr = two_gmm_calib_cosine_device(xn)
                    except Exception as exc:   # noqa: BLE001
                        import warnings
                        warnings.warn(
                            f"device AHC calibration failed ({exc!r}); "
                            f"falling back to the blocked host sweep",
                            stacklevel=2)
            if thr is None:
                _, thr = _blocked_cosine_condensed_and_thr(
                    xn, want_condensed=False)
        Z = precomputed_Z
    elif similarity == "cosine":
        long_n = n >= _BLOCKED_MIN_N
        if compute_backend == "auto":
            # 'auto' routes to the device only where it measurably WINS:
            # the battery_r4 A/B put the streamed device calibration at
            # ~2 s warm vs 19.6 s host at N=50k but 4.5 s vs 1.2 s at
            # N=8000 (tunnel dispatch + per-octave compile dominate small
            # sweeps), crossing over around N~16k. An explicit 'device'
            # keeps the lower _BLOCKED_MIN_N threshold.
            import jax
            compute_backend = ("device" if n >= _DEVICE_CALIB_MIN_N
                               and jax.default_backend() != "cpu"
                               else "host")
        if compute_backend == "device" and long_n:
            # long-N 'device' streams the calibration sweep through the
            # MXU (only scalars cross the device boundary — the round-2
            # memory/transfer wall that warned this route off is gone);
            # the O(N*D) linkage stays f64 on host
            x64 = np.asarray(x, dtype=np.float64)
            xn = x64 / (np.sqrt((x64 * x64).sum(axis=1, keepdims=True))
                        + 1e-32)
            from vbx_tpu.ops.calibration import two_gmm_calib_cosine_device
            try:
                thr = two_gmm_calib_cosine_device(xn)
            except Exception as exc:   # noqa: BLE001 — device down: the
                import warnings        # recording must still diarize
                warnings.warn(
                    f"device AHC calibration failed ({exc!r}); falling "
                    f"back to the blocked host path", stacklevel=2)
                compute_backend = "host"
            if thr is not None:
                if linkage_backend != "scipy":
                    # round 5 (VERDICT r4 #3): the NN-chain walk itself
                    # runs on the accelerator — every nearest-neighbor
                    # scan is one [N, D] matvec on the cluster-sum
                    # matrix, 12.8x the 4-core host's bandwidth at
                    # N=50k (66.4 s -> ~5 s warm; labels identical,
                    # clustering/device.py has the parity contract)
                    Z = _try_device_linkage(xn)
                    if Z is None:
                        try:
                            Z = linkage_dot_avg(xn, backend="native")
                        except RuntimeError as exc:
                            import warnings
                            warnings.warn(
                                f"native linkage unavailable ({exc}); "
                                f"device threshold + condensed host "
                                f"linkage", stacklevel=2)
                if Z is None:
                    condensed, _ = _blocked_cosine_condensed_and_thr(
                        xn, want_thr=False)
        if compute_backend == "host":
            x64 = np.asarray(x, dtype=np.float64)
            xn = x64 / (np.sqrt((x64 * x64).sum(axis=1, keepdims=True)) + 1e-32)
            if n >= _BLOCKED_MIN_N:
                if linkage_backend != "scipy":
                    if (requested_backend == "auto"
                            and n >= _DEVICE_LINKAGE_MIN_N):
                        # 'auto' mid-N band [6144, 16384): calibration
                        # stays on the host (the device sweep only wins
                        # from ~16k) but the LINKAGE walk already wins on
                        # the accelerator from ~N=6k — measured warm
                        # 0.74 s vs 1.66 s (4-core) / 6.94 s
                        # (single-thread, the corpus init-pool context)
                        # at N=10k (BENCHMARKS round-5 crossover sweep).
                        # Explicit 'host' never takes this route.
                        Z = _try_device_linkage(xn)
                    if Z is None:
                        try:
                            # O(N.D)-memory path (VERDICT r2 #3):
                            # calibration from the streamed histogram
                            # sweep, linkage via the cluster-sums identity
                            # — the 10 GB condensed buffer at N=50k never
                            # exists (measured: 52 s / 0.3 GB vs 183 s /
                            # 10 GB, BENCHMARKS.md)
                            Z = linkage_dot_avg(xn, backend="native")
                        except RuntimeError:   # native library unavailable
                            Z = None
                    if Z is not None:
                        _, thr = _blocked_cosine_condensed_and_thr(
                            xn, want_condensed=False)
                if Z is None:
                    condensed, thr = _blocked_cosine_condensed_and_thr(xn)
            else:
                scr_mx = xn @ xn.T
        elif compute_backend == "device" and not long_n:
            scr_mx = np.asarray(cos_similarity(jnp.asarray(x)))
    elif similarity == "plda":
        if plda is None:
            raise ValueError("similarity='plda' requires a plda model")
        if compute_backend == "device":
            # override knobs LOUDLY (same policy as the N>=cutoff case
            # above): the dense PLDA scorer has no device path
            import warnings
            warnings.warn(
                "compute_backend='device' has no effect with "
                "similarity='plda'; scoring runs on host in f64",
                stacklevel=2)
        scr_mx = kaldi_plda_scoring_dense(
            plda, np.asarray(x), target_energy=target_energy, pca_dim=pca_dim)
    else:
        raise ValueError(f"unknown similarity {similarity!r}")

    if Z is None:
        if condensed is None:
            # utterance-specific calibration threshold over all N^2 scores
            # (vbhmm.py:137), in f64 on host for cut-threshold parity.
            thr = two_gmm_calib_lin_binned(scr_mx)
            condensed = squareform_condensed(scr_mx, negate=True)
        Z = linkage(condensed, method="average", backend=linkage_backend)
    # shift distances nonnegative exactly as the reference does
    # (vbhmm.py:143-146) so the cut threshold transforms identically
    adjust = abs(Z[:, 2].min())
    Z = Z.copy()
    Z[:, 2] += adjust
    labels = fcluster_by_distance(Z, -(thr + threshold_bias) + adjust,
                                  backend=linkage_backend)
    return labels.astype(np.int32)


# Blocked path cutoff: below this the full N x N materialization is cheap
# (the calibration over it is histogram-EM for N^2 > 2^18, exact below).
_BLOCKED_MIN_N = 4096
# 'auto' device-calibration cutoff: where the streamed MXU sweep beats the
# host histogram sweep on the measured hardware (battery_r4: device ~2 s
# warm vs host 19.6 s at N=50k, but 4.5 s vs 1.2 s at N=8000 — tunnel
# dispatch and per-octave compile dominate small sweeps).
_DEVICE_CALIB_MIN_N = 16384
# 'auto' device-LINKAGE cutoff (round 5, decoupled from the calibration
# cutoff): the device NN-chain walk beats the 4-core host from ~N=6k and
# the single-threaded corpus-init-pool host by ~10x at N=10k (measured
# warm: 0.47/0.74/1.37 s device vs 0.55/1.66/4.87 s host-4-core vs
# 2.23/6.94/19.2 s host-1-thread at N=6000/10000/16384).
_DEVICE_LINKAGE_MIN_N = 6144
# Fixed-range [-1, 1] bins for the blocked path's streamed histogram.
# 2^16 matches adaptive_bins' L2-bounded cap (bin width 3e-5 -> threshold
# error second-order, ~1e-9 — see adaptive_bins docstring measurements);
# the EM over the bins is 16x cheaper than the previous 2^20.
_COSINE_BINS = 1 << 16


def _blocked_cosine_condensed_and_thr(
        xn: np.ndarray, blk: int = 512, want_condensed: bool = True,
        want_thr: bool = True
        ) -> Tuple[Optional[np.ndarray], Optional[float]]:
    """Long-recording cosine AHC front half without materializing N x N:
    stream row blocks of xn @ xn.T, accumulating (a) the full-matrix score
    histogram moments for the binned 2-GMM calibration (reference parity:
    vbhmm.py:137 calibrates over ALL N^2 entries incl. the diagonal and
    both triangles) and (b) the negated upper triangle into the condensed
    distance vector. One pass over the N^2 scores, peak memory O(blk * N).
    want_condensed=False skips (b) entirely — the linkage_dot_avg path
    needs only the threshold, so the O(N^2) buffer is never allocated.
    want_thr=False skips (a) — the device-calibration fallback already
    holds the threshold and needs only the condensed distances.

    Bins are fixed to the cosine range [-1, 1] (scores are exactly bounded
    after l2 normalization) rather than data-tight — with exact per-bin
    moments the threshold differs from the data-tight binning at ~1e-8,
    far below any merge-decision scale."""
    from vbx_tpu.clustering import hist_moments
    from vbx_tpu.ops.calibration import two_gmm_calib_from_moments

    N = xn.shape[0]
    cond = (np.empty(N * (N - 1) // 2, np.float64) if want_condensed
            else None)
    nb = _COSINE_BINS
    lo, hi = -1.0, 1.0
    scale = nb / (hi - lo)
    # upper-triangle-only sweep: the matrix is symmetric, so each block
    # computes rows x columns[i0:] only (half the dgemm flops and half the
    # histogram traffic of the full-row form); strict-upper moments are
    # doubled and the diagonal counted once, reproducing the reference's
    # all-N^2-entries calibration (vbhmm.py:137). Mirror entries can
    # differ from an explicitly computed lower triangle by BLAS summation
    # order (~1 ulp) — far below the ~1e-8 binning tolerance above.
    cnt = np.zeros(nb)
    ssum = np.zeros(nb)
    s2sum = np.zeros(nb)

    def hist(arr):
        nonlocal cnt, ssum, s2sum
        if not hist_moments(arr, lo, scale, nb, cnt, ssum, s2sum):
            flat = arr.reshape(-1)
            idx = np.minimum(((flat - lo) * scale).astype(np.int64), nb - 1)
            np.maximum(idx, 0, out=idx)
            cnt += np.bincount(idx, minlength=nb)
            ssum += np.bincount(idx, weights=flat, minlength=nb)
            s2sum += np.bincount(idx, weights=flat * flat, minlength=nb)

    diag = np.empty(N, np.float64)
    mask = None
    o = 0
    for i0 in range(0, N, blk):
        i1 = min(i0 + blk, N)
        b = i1 - i0
        xb = xn[i0:i1]
        St = xb @ xb.T                             # [b, b] diagonal block
        # [b, N - i0]: in-block columns then the strict-upper rectangle.
        # St and the rectangle stay separate dgemm calls (same partition as
        # the per-row formulation), so every score is bit-identical to it.
        R = (np.concatenate((St, xb @ xn[i1:].T), axis=1)
             if i1 < N else St)
        if mask is None or mask.shape != R.shape:
            mask = np.arange(R.shape[1])[None, :] > np.arange(b)[:, None]
        # row-major boolean extraction == concatenated per-row strict-upper
        # spans == exactly this block's condensed-vector region
        upper = R[mask]
        if want_thr:
            hist(upper)
        if want_condensed:
            np.negative(upper, out=cond[o:o + upper.size])
            o += upper.size
        diag[i0:i1] = np.diagonal(St)
    if not want_thr:
        return cond, None
    cnt *= 2.0
    ssum *= 2.0
    s2sum *= 2.0
    hist(diag)
    thr = two_gmm_calib_from_moments(cnt, ssum, s2sum)
    return cond, thr


def smooth_labels_to_gamma(labels: np.ndarray, smoothing: float,
                           n_speakers: Optional[int] = None) -> np.ndarray:
    """Hard labels -> soft responsibilities: softmax(onehot * smoothing)
    (reference: vbhmm.py:150-152)."""
    labels = np.asarray(labels)
    S = int(labels.max()) + 1 if n_speakers is None else n_speakers
    onehot = np.zeros((len(labels), S))
    onehot[np.arange(len(labels)), labels] = 1.0
    z = onehot * smoothing
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def random_labels(n: int, n_speakers: int, seed: int = 0) -> np.ndarray:
    """Uniform random speaker assignment — the reference README's
    `random_<number>` init for long recordings where AHC is too slow
    (README.md:24; absent from the reference snapshot's CLI)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, n_speakers, size=n).astype(np.int32)
