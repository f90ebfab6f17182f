"""Two-Gaussian score calibration (shared-variance GMM EM).

Finds the utterance-specific AHC threshold by fitting a 2-component GMM with
shared variance to the N^2 pairwise similarity scores and returning the
equal-posterior crossing point (reference: diarization_lib.
twoGMMcalib_lin:13-31, 20 EM iterations).

TPU-first formulation: each EM iteration needs only six scalar reductions
over the scores (responsibility-weighted counts and first/second moments),
so instead of materializing the [N^2, 2] responsibility matrix we fuse the
reductions and run the whole 20-iteration EM as one jitted fori_loop — the
scores array is read once per iteration and nothing but scalars live between
iterations. Accumulation uses float32 tree reductions (XLA) which keep
~1e-6 relative error even at N^2 ~ 1e8 elements; float64 is available on CPU
for oracle validation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _em_params(s: jax.Array, niters: int, init_state=None):
    """Run the shared-variance 2-GMM EM on flattened scores; returns the
    final (weights, means, var). The single source of the device EM loop —
    both the threshold and the LLR entry points consume it. `init_state`
    resumes from given (weights, means, var) instead of the data init."""
    dtype = s.dtype
    n = s.shape[0]

    mean_s = jnp.mean(s)
    std_s = jnp.std(s)
    sum_s = jnp.sum(s)
    sum_s2 = jnp.sum(s * s)

    weights0 = jnp.array([0.5, 0.5], dtype=dtype)
    means0 = mean_s + std_s * jnp.array([-1.0, 1.0], dtype=dtype)
    var0 = jnp.var(s)
    if init_state is not None:
        weights0, means0, var0 = init_state

    def em_iter(_, state):
        weights, means, var = state
        # responsibilities for component 1 (sigmoid of the LLR); component 0
        # responsibility is 1 - g1. Only three weighted reductions of s are
        # needed: sum(g1), sum(g1*s), sum(g1*s^2).
        logw = jnp.log(weights)
        # ll_k(s) = logw_k - 0.5*log(var) - 0.5*(s - m_k)^2/var
        d = (means[1] - means[0]) / var
        c = (logw[1] - logw[0]) - 0.5 * (means[1] ** 2 - means[0] ** 2) / var
        g1 = jax.nn.sigmoid(s * d + c)
        cnt1 = jnp.sum(g1)
        s1 = jnp.dot(g1, s, preferred_element_type=dtype)
        s2 = jnp.dot(g1, s * s, preferred_element_type=dtype)
        cnt0 = n - cnt1
        s0 = sum_s - s1
        q0 = sum_s2 - s2
        cnts = jnp.stack([cnt0, cnt1])
        new_weights = cnts / (cnt0 + cnt1)
        new_means = jnp.stack([s0 / cnt0, s1 / cnt1])
        second = jnp.stack([q0 / cnt0, s2 / cnt1])
        new_var = jnp.dot(second - new_means ** 2, new_weights,
                          preferred_element_type=dtype)
        return new_weights, new_means, new_var

    return jax.lax.fori_loop(0, niters, em_iter, (weights0, means0, var0))


def _threshold_from(weights: jax.Array, means: jax.Array,
                    var: jax.Array) -> jax.Array:
    """Closed-form equal-LLR crossing of the fitted components:
    -0.5 * (log(w^2/var) - m^2/var) . [1,-1] / ((m/var) . [1,-1])."""
    sel = jnp.array([1.0, -1.0], dtype=means.dtype)
    return (-0.5 * jnp.dot(jnp.log(weights ** 2 / var) - means ** 2 / var,
                           sel)
            / jnp.dot(means / var, sel))


def two_gmm_calib_lin(scores: jax.Array, niters: int = 20) -> jax.Array:
    """Return the calibration threshold for flattened scores.

    Matches the reference fixed point: responsibilities via softmax over the
    two shared-variance Gaussians, weight/mean/variance M-steps, and the
    closed-form equal-LLR threshold (reference:
    diarization_lib.twoGMMcalib_lin:13-31)."""
    return _threshold_from(*_em_params(scores.reshape(-1), niters))


def _weighted_em_threshold(cnt, ssum, s2sum, sc, niters: int) -> float:
    """Shared-variance 2-GMM EM over weighted score atoms, returning the
    equal-LLR threshold (the fixed point of diarization_lib.
    twoGMMcalib_lin:13-31). Atoms are (count, sum, sum-of-squares,
    mean-score) — individual scores are atoms with cnt == 1, histogram bins
    carry their exact moments; both the exact and the binned public entry
    points run THIS loop so they cannot diverge.

    A GIL-free native twin (clustering.two_gmm_weighted_em_native, same
    init/updates/guards; agreement pinned at ~1e-12 by
    tests/test_clustering.py) runs when available — the EM is the serving
    init chain's hottest stage, and holding the GIL through 20 sigmoid
    sweeps serialized the whole init pool. This numpy loop remains the
    reference implementation and the fallback."""
    import numpy as np

    from vbx_tpu.clustering import two_gmm_weighted_em_native
    thr = two_gmm_weighted_em_native(cnt, ssum, s2sum, sc, niters)
    if thr is not None:
        return thr

    total = cnt.sum()
    sum_s = ssum.sum()
    sum_s2 = s2sum.sum()
    mean = sum_s / total
    var = sum_s2 / total - mean ** 2
    if not var > 1e-12 * max(1.0, mean * mean):
        # degenerate scores (all identical up to rounding — e.g. a
        # one-cluster recording): the 2-GMM variance is zero modulo float
        # cancellation and the EM below divides by it (components collapse,
        # responsibilities saturate, counts hit 0/0); any threshold is
        # equivalent for such scores, so return the common value. The
        # reference would emit NaN here (diarization_lib.py:13-31 divides
        # by the shared variance unguarded). Real score sets sit many
        # orders above this cutoff (cosine-score var ~1e-2..1e-1).
        return float(mean)
    weights = np.array([0.5, 0.5])
    means = mean + np.sqrt(var) * np.array([-1.0, 1.0])
    for _ in range(niters):
        if not var > 1e-12 * max(1.0, mean * mean):
            # components merged mid-EM (near-degenerate scores): the
            # shared variance collapsed to ~0 and every division below
            # degenerates — same fallback as the up-front guard
            return float(mean)
        d = (means[1] - means[0]) / var
        c = (np.log(weights[1]) - np.log(weights[0])
             - 0.5 * (means[1] ** 2 - means[0] ** 2) / var)
        z = sc * d + c
        ez = np.exp(-np.abs(z))          # always in (0, 1]: no overflow
        g1 = np.where(z >= 0, 1.0 / (1.0 + ez), ez / (1.0 + ez))
        cnt1 = g1 @ cnt
        s1 = g1 @ ssum
        s2 = g1 @ s2sum
        cnt0, s0, q0 = total - cnt1, sum_s - s1, sum_s2 - s2
        weights = np.array([cnt0, cnt1]) / total
        means = np.array([s0 / cnt0, s1 / cnt1])
        second = np.array([q0 / cnt0, s2 / cnt1])
        var = (second - means ** 2) @ weights
    sel = np.array([1.0, -1.0])
    with np.errstate(all="ignore"):
        thr = float(-0.5
                    * ((np.log(weights ** 2 / var) - means ** 2 / var) @ sel)
                    / ((means / var) @ sel))
    # a collapse during the FINAL iteration bypasses the top-of-loop guard
    # (NaN/inf params reach the closed form); same fallback as above
    return thr if np.isfinite(thr) else float(mean)


def two_gmm_calib_lin_np(scores, niters: int = 20) -> float:
    """Host float64 two-GMM calibration (same fixed point as
    `two_gmm_calib_lin`). The AHC init chain runs in float64 on the host by
    default because the calibration threshold feeds the linkage cut and
    therefore the cluster count: sub-1e-3 threshold shifts can change the
    number of AHC clusters and move the VB fixed point (reference parity:
    diarization_lib.twoGMMcalib_lin:13-31)."""
    import numpy as np

    s = np.asarray(scores, dtype=np.float64).reshape(-1)
    return _weighted_em_threshold(np.ones(s.size), s, s * s, s, niters)


def two_gmm_calib_from_moments(cnt, ssum, s2sum, niters: int = 20) -> float:
    """Binned 2-GMM calibration threshold from pre-accumulated per-bin
    moments (count, sum, sum-of-squares) — the streaming form of
    `two_gmm_calib_lin_binned` for callers that histogram scores
    block-by-block without materializing them (engine.ahc blocked cosine
    path). Empty bins are ignored; each bin's EM statistics use its exact
    moments, so the result is second-order-exact in the bin width."""
    import numpy as np

    cnt = np.asarray(cnt, np.float64)
    nz = cnt > 0
    cnt, ssum, s2sum = cnt[nz], np.asarray(ssum)[nz], np.asarray(s2sum)[nz]
    return _weighted_em_threshold(cnt, ssum, s2sum, ssum / cnt, niters)


def adaptive_bins(n: int, n_bins: Optional[int] = None) -> int:
    """Bin count for the histogram EM, scaled with the score count so the
    EM pass (niters x nonzero bins) stays well below the O(N^2) binning
    pass: ~n/64 bins, clamped to [2^12, 2^16]. Measured on the golden
    ES2005a scores (N=1025, n=N^2~1.05e6): the threshold error vs the
    exact EM is second-order in the bin width — 1.5e-10 at 2^16 bins,
    3.5e-9 at 2^14, 5.8e-8 at 2^12 — all 4-6 orders below the ~1e-4 scale
    of an AHC merge decision, while the serving-size EM drops 16 -> 2.7 ms
    from 2^17 to 2^14 bins. The 2^16 cap keeps the EM's working set (3
    moment arrays + temporaries) inside a core's L2: 2^17 bins measured
    6x SLOWER than 2^16 from cache spill alone (the previous rule's
    round-UP to 2^17 at ES2005a size violated exactly that). Every caller
    that histograms scores for `two_gmm_calib_from_moments` should use
    THIS rule so streamed and materialized paths bin comparably.

    `n_bins`, when given, OVERRIDES the 2^16 L2 cap (honored exactly as
    the new cap — a caller asking for 2^18 bins gets up to 2^18 and
    accepts the cache spill); None means the measured default."""
    cap = (1 << 16) if n_bins is None else n_bins
    target = max(n // 64, 1)
    return int(min(cap, max(1 << 12, 1 << (target - 1).bit_length())))


def two_gmm_calib_lin_binned(scores, niters: int = 20,
                             n_bins: Optional[int] = None) -> float:
    """Histogram-accelerated host f64 calibration for long recordings.

    The exact EM touches all N^2 scores every iteration — ~60 s of host
    time per AMI-length recording (N ~ 1e4). Binning the scores once into
    `n_bins` equal-width bins and running the SAME EM loop
    (_weighted_em_threshold) on (count, sum, sum-of-squares) per bin costs
    O(N^2 + niters * bins). With each bin carrying its exact moments the
    statistics error is second-order in the bin width: measured threshold
    agreement with the exact EM ~1e-9, far below the ~1e-4 scale that could
    move an AHC merge decision. Falls back to the exact EM for small inputs
    where it is already instant."""
    import numpy as np

    s = np.asarray(scores, dtype=np.float64).reshape(-1)
    n = s.size
    if n <= 1 << 18:
        # tiny inputs (N <~ 512 recordings): the exact EM is already ~ms
        return two_gmm_calib_lin_np(s, niters)

    lo, hi = s.min(), s.max()
    if hi <= lo:
        return float(lo)
    n_bins = adaptive_bins(n, n_bins)
    # chunked single pass: giant temporaries (idx int64, s*s) otherwise
    # dominate the runtime ~10x through allocator/memory-bandwidth churn.
    # The native single-pass accumulator (clustering.hist_moments — the
    # same routine the blocked cosine path streams through) does each chunk
    # in one C pass; the numpy fallback below bins identically (truncating
    # cast + clamp to the last bin).
    from vbx_tpu.clustering import hist_moments

    scale = n_bins / (hi - lo)
    cnt = np.zeros(n_bins)
    ssum = np.zeros(n_bins)
    s2sum = np.zeros(n_bins)
    CH = 8_000_000
    for i in range(0, n, CH):
        chunk = s[i:i + CH]
        if hist_moments(chunk, lo, scale, n_bins, cnt, ssum, s2sum):
            continue
        idx = np.clip(((chunk - lo) * scale).astype(np.int64), 0, n_bins - 1)
        cnt += np.bincount(idx, minlength=n_bins)
        ssum += np.bincount(idx, weights=chunk, minlength=n_bins)
        s2sum += np.bincount(idx, weights=chunk * chunk, minlength=n_bins)
    nz = cnt > 0
    cnt, ssum, s2sum = cnt[nz], ssum[nz], s2sum[nz]
    return _weighted_em_threshold(cnt, ssum, s2sum, ssum / cnt, niters)


@functools.lru_cache(maxsize=8)
def _cosine_sweep_jit(blk: int):
    """Jitted full pass over the implicit N x N cosine-score matrix
    (scores = xn @ xn.T, never materialized beyond one [blk, Np] tile; a
    device-side fori_loop walks the row blocks so the whole pass is ONE
    dispatch — a per-block dispatch variant measured 62 s at N=50k over
    the tunnel, ~30 ms launch latency x 98 blocks x 21 passes, vs ~1 s
    for this form). Returns per-block partial sums [nb, 5] of
    (g1, g1*s, g1*s^2, s, s^2) with g1 = sigmoid(s*d + c) — the only
    statistics one shared-variance 2-GMM EM iteration needs (_em_params);
    d=0, c=0 gives g1=0.5 so the same pass serves the init (sum_s,
    sum_s2). The caller f64-sums the per-block rows on host (bounds the
    f32 accumulation error to within-block, ~1e-6 relative at N=50k).
    HIGHEST-precision matmul: the threshold feeds the AHC cut, and
    bf16-rounded scores (~4e-3) would move it at merge-decision scale,
    while f32 scores keep it ~1e-7 (ops/vb_steps.py has the precision
    rationale)."""

    @jax.jit
    def full_pass(xn_pad, n_valid, d, c):
        Np = xn_pad.shape[0]
        nb = Np // blk
        col_valid = (jnp.arange(Np) < n_valid)[None, :]

        def body(i, acc):
            xb = jax.lax.dynamic_slice_in_dim(xn_pad, i * blk, blk, axis=0)
            s = jnp.dot(xb, xn_pad.T,
                        precision=jax.lax.Precision.HIGHEST)   # [blk, Np]
            rows = i * blk + jnp.arange(blk)
            w = ((rows < n_valid)[:, None] & col_valid).astype(s.dtype)
            g1 = jax.nn.sigmoid(s * d + c) * w
            sw = s * w
            part = jnp.stack([jnp.sum(g1), jnp.sum(g1 * s),
                              jnp.sum(g1 * s * s),
                              jnp.sum(sw), jnp.sum(sw * s)])
            return acc.at[i].set(part)

        return jax.lax.fori_loop(0, nb, body,
                                 jnp.zeros((nb, 5), xn_pad.dtype))

    return full_pass


def two_gmm_calib_cosine_device(xn, niters: int = 20,
                                blk: int = 512) -> float:
    """Device-blocked calibration threshold for the long-recording cosine
    AHC front half (VERDICT r3 #4): the N x N score matrix is streamed
    through the MXU one [blk, N] tile at a time — the O(N^2) compute the
    host spends ~19 s on at N=50k runs in ~1 s on the chip — and ONLY
    scalars cross the device boundary (the round-2 negative result for
    compute_backend='device' was the N x N score-matrix TRANSFER over the
    tunnel; this path never moves it). The EM parameter updates run in
    float64 on the host (same update alg + degenerate-variance guards as
    _weighted_em_threshold) over exact per-iteration f32 statistics, so
    the only approximations vs the host f64 path are f32 scores (~1e-7)
    and per-block partial-sum rounding (~1e-6 relative) — measured
    threshold agreement ~1e-6, two orders below the ~1e-4 AHC
    merge-decision scale (tests/test_ahc.py).

    xn: [N, D] float64/float32 L2-NORMALIZED x-vectors (the caller
    normalizes, engine.ahc). Unlike the reference's upper-triangle
    chunking (diarization_lib.py:203-210) every entry of the full
    symmetric N^2 matrix (diagonal included) is computed directly —
    matching twoGMMcalib_lin's all-N^2 semantics (vbhmm.py:137) with no
    mirror-rounding caveat."""
    import numpy as np

    xn = np.asarray(xn, np.float32)
    n, _ = xn.shape
    # pad rows to a power of two (>= blk): one compiled executable per
    # OCTAVE of recording length instead of one per distinct length —
    # the sweep itself costs ~10 ms/pass while a fresh compile costs
    # seconds over the tunnel; the masked padded rows add < 2x flops
    n_pad = max(blk, 1 << (n - 1).bit_length())
    xn_pad = jnp.asarray(np.pad(xn, ((0, n_pad - n), (0, 0))))
    sweep = _cosine_sweep_jit(blk)

    def full_pass(d, c):
        parts = np.asarray(sweep(xn_pad, n, np.float32(d), np.float32(c)),
                           np.float64)                        # [nb, 5]
        return parts.sum(axis=0)       # host f64 across blocks

    total = float(n) * float(n)
    _, _, _, sum_s, sum_s2 = full_pass(0.0, 0.0)
    mean = sum_s / total
    var = sum_s2 / total - mean ** 2
    if not var > 1e-12 * max(1.0, mean * mean):
        return float(mean)             # degenerate scores (see host twin)
    weights = np.array([0.5, 0.5])
    means = mean + np.sqrt(var) * np.array([-1.0, 1.0])
    for _ in range(niters):
        if not var > 1e-12 * max(1.0, mean * mean):
            return float(mean)
        d = (means[1] - means[0]) / var
        c = (np.log(weights[1]) - np.log(weights[0])
             - 0.5 * (means[1] ** 2 - means[0] ** 2) / var)
        cnt1, s1, s2, _, _ = full_pass(d, c)
        cnt0, s0, q0 = total - cnt1, sum_s - s1, sum_s2 - s2
        weights = np.array([cnt0, cnt1]) / total
        means = np.array([s0 / cnt0, s1 / cnt1])
        second = np.array([q0 / cnt0, s2 / cnt1])
        var = (second - means ** 2) @ weights
    sel = np.array([1.0, -1.0])
    with np.errstate(all="ignore"):
        thr = float(-0.5
                    * ((np.log(weights ** 2 / var) - means ** 2 / var) @ sel)
                    / ((means / var) @ sel))
    return thr if np.isfinite(thr) else float(mean)


@functools.lru_cache(maxsize=8)
def _cosine_sweep_batched_jit(blk: int):
    """vmapped form of _cosine_sweep_jit: one dispatch sweeps EVERY lane's
    implicit N x N score matrix. This is what makes the device calibration
    win in the mid-N band: the per-meeting sweep is ~10 ms of MXU work
    behind ~21 tunnel round-trips (1 init + 20 EM passes), so sequential
    per-meeting calls pay 21 x ~26 ms latency EACH (measured: device
    0.9 s warm vs host 1.2 s at N=10k — no win), while the batched form
    pays the same 21 round-trips ONCE for the whole corpus."""
    single = _cosine_sweep_jit(blk)
    return jax.jit(jax.vmap(single, in_axes=(0, 0, 0, 0)))


def two_gmm_calib_cosine_device_batched(xns, niters: int = 20,
                                        blk: int = 512) -> np.ndarray:
    """Batched `two_gmm_calib_cosine_device`: one calibration threshold
    per recording, all lanes swept by ONE device dispatch per EM pass.

    xns: list of [N_m, D] L2-NORMALIZED x-vector matrices (same caller
    contract as the single form). Returns float64 thresholds [M].

    Per-lane semantics mirror the single function exactly — same init,
    same update order, same degenerate-variance freeze (a frozen lane
    keeps sweeping with d=c=0 and returns its overall mean, like the
    single form's early return) and the same non-finite closed-form
    fallback. Lanes are padded to the GROUP's octave (the single form
    pads to its own), which regroups the f32 block partial sums — the
    threshold agrees with the sequential device path to the same
    ~1e-6-relative partial-sum bound documented there, two orders below
    the ~1e-4 AHC merge-decision scale. The caller (engine.pipeline
    pre-stage) bounds lane-width waste with the same size-aware grouping
    it uses for the batched linkage."""
    import numpy as np

    m = len(xns)
    if m == 0:
        return np.zeros(0)
    ns = np.array([x.shape[0] for x in xns], np.int64)
    d_dim = xns[0].shape[1]
    # finer padding quantum than the single form's octave: the sweep's
    # cost is O(n_pad^2) HIGHEST-f32 MXU work, so pow-2 padding at AMI
    # meeting sizes (N=10-11k -> 16384) wastes ~78% extra flops — the
    # same-process A/B measured 65 ms/pass at n_pad=12288 vs 94 ms at
    # 16384 (1.44x). The clustering walk uses the same quantum
    # (_NP_QUANTUM); padded rows are exact zeros, so the statistics are
    # unchanged (the ops parity test pins batched == single across
    # padding choices). More distinct shapes per octave means more
    # one-time compiles; the persistent compile cache amortizes them.
    q = 2048
    n_pad = int(max(blk, -(-int(ns.max()) // q) * q))
    x_pad = np.zeros((m, n_pad, d_dim), np.float32)
    for i, x in enumerate(xns):
        x_pad[i, :x.shape[0]] = np.asarray(x, np.float32)
    xd = jnp.asarray(x_pad)
    nsd = jnp.asarray(ns, jnp.int32)
    sweep = _cosine_sweep_batched_jit(blk)

    def full_pass(d, c):
        parts = np.asarray(
            sweep(xd, nsd, jnp.asarray(d, np.float32),
                  jnp.asarray(c, np.float32)), np.float64)     # [M, nb, 5]
        return parts.sum(axis=1)                               # [M, 5]

    total = ns.astype(np.float64) ** 2
    zeros = np.zeros(m)
    _, _, _, sum_s, sum_s2 = full_pass(zeros, zeros).T
    mean = sum_s / total
    var = sum_s2 / total - mean ** 2
    floor = 1e-12 * np.maximum(1.0, mean * mean)   # fixed, like the
    frozen = ~(var > floor)                        # single form's `mean`
    weights = np.full((m, 2), 0.5)
    means = (mean[:, None]
             + np.sqrt(np.maximum(var, 0.0))[:, None] * np.array([-1., 1.]))
    sel = np.array([1.0, -1.0])
    for _ in range(niters):
        frozen |= ~(var > floor)
        active = ~frozen
        if not active.any():
            break
        with np.errstate(all="ignore"):
            d = (means[:, 1] - means[:, 0]) / var
            c = (np.log(weights[:, 1]) - np.log(weights[:, 0])
                 - 0.5 * (means[:, 1] ** 2 - means[:, 0] ** 2) / var)
        d = np.where(active, d, 0.0)
        c = np.where(active, c, 0.0)
        cnt1, s1, s2, _, _ = full_pass(d, c).T
        with np.errstate(all="ignore"):
            cnt0, s0, q0 = total - cnt1, sum_s - s1, sum_s2 - s2
            w_new = np.stack([cnt0, cnt1], axis=1) / total[:, None]
            m_new = np.stack([s0 / cnt0, s1 / cnt1], axis=1)
            second = np.stack([q0 / cnt0, s2 / cnt1], axis=1)
            v_new = ((second - m_new ** 2) * w_new).sum(axis=1)
        weights = np.where(active[:, None], w_new, weights)
        means = np.where(active[:, None], m_new, means)
        var = np.where(active, v_new, var)
    with np.errstate(all="ignore"):
        thr = (-0.5
               * ((np.log(weights ** 2 / var[:, None])
                   - means ** 2 / var[:, None]) @ sel)
               / ((means / var[:, None]) @ sel))
    return np.where(np.isfinite(thr) & ~frozen, thr, mean)


def two_gmm_calib_with_llrs(scores: jax.Array,
                            niters: int = 20) -> Tuple[jax.Array, jax.Array]:
    """Threshold plus linearly calibrated log-odds-ratio scores.

    Reference semantics exactly (diarization_lib.twoGMMcalib_lin:13-31):
    the returned lls are those computed at the TOP of the final EM
    iteration (i.e. from the parameters after niters-1 updates — the
    reference's loop computes lls before updating), while the threshold and
    the target-component ordering (argmax/argmin of means, so equal means
    give all-zero llrs) use the post-loop parameters."""
    if niters < 1:
        raise ValueError("niters must be >= 1")
    s = scores.reshape(-1)
    prev = _em_params(s, niters - 1)             # params entering last iter
    weights, means, var = _em_params(s, 1, init_state=prev)
    threshold = _threshold_from(weights, means, var)
    pw, pm, pv = prev
    lls = (jnp.log(pw) - 0.5 * jnp.log(pv)
           - 0.5 * (s[:, None] - pm) ** 2 / pv)
    llrs = lls[:, jnp.argmax(means)] - lls[:, jnp.argmin(means)]
    return threshold, llrs
