"""HTK/Kaldi-compatible log-Mel filterbank frontend, TPU-first.

Semantics-parity with the reference NumPy frontend (VBx/features.py:9-146):
same framing, preemphasis, Povey window, HTK power-of-two NFFT rounding,
HTK mel filterbank construction (including the `htk_bug` low-bin zeroing),
USEPOWER/ZMEANSOURCE handling, log-floor at 1.0, and Kaldi floating-window
CMVN with edge-shifted windows.

TPU-first split of responsibilities:
- constants (mel filterbank matrix, window weights) are built once on the
  host in float64 NumPy — they are model preparation, not throughput work;
- the per-signal pipeline (framing -> zero-mean -> preemphasis -> window ->
  rFFT -> power -> mel matmul -> log, then floating CMVN) is a single
  jittable JAX function over a fixed-length signal: one gather, one rFFT
  batch and one [frames, nfft/2+1] x [nfft/2+1, nmel] MXU matmul, with the
  elementwise stages fused by XLA. Variable-length VAD segments are bucketed
  by the extractor so each bucket compiles once.
- dithering stays host-side NumPy: the reference seeds `np.random.seed(3)`
  and adds uniform noise (predict.py:163-164); bit-compatible embeddings
  require NumPy's exact RNG stream, and it is O(signal) host work.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host-side constants (model prep, float64 NumPy)
# ---------------------------------------------------------------------------

def mel(x):
    return 1127.0 * np.log(1.0 + np.asarray(x, float) / 700.0)


def mel_inv(x):
    return (np.exp(np.asarray(x, float) / 1127.0) - 1.0) * 700.0


def htk_nfft(winlen: int) -> int:
    """HTK rounds the FFT size up to the next power of two
    (features.py:44)."""
    return 2 ** int(np.ceil(np.log2(winlen)))


def povey_window(winlen: int) -> np.ndarray:
    """Kaldi's 'povey' window: hann^0.85 (features.py:120-121)."""
    return np.power(0.5 - 0.5 * np.cos(np.linspace(0, 2 * np.pi, winlen)),
                    0.85)


def mel_filterbank(winlen_nfft: int, fs: float, numchans: int = 20,
                   lofreq: float = 0.0, hifreq: Optional[float] = None,
                   htk_bug: bool = True) -> np.ndarray:
    """Triangular mel filterbank [nfft/2+1, numchans], HTK semantics
    (features.py:28-56): channel edges at integer FFT bins via
    floor(inv_mel(edge)/fs*nfft)+1, triangle slopes computed in mel space,
    and the HTK low-bin quirk when lofreq > 0."""
    hifreq = 0.5 * fs if not hifreq else hifreq
    nfft = htk_nfft(winlen_nfft) if winlen_nfft > 0 else -int(winlen_nfft)

    fbin_mel = mel(np.arange(nfft // 2 + 1, dtype=float) * fs / nfft)
    cbin_mel = np.linspace(mel(lofreq), mel(hifreq), numchans + 2)
    cind = np.floor(mel_inv(cbin_mel) / fs * nfft).astype(int) + 1

    # Broadcast formulation (vs the reference's per-channel slice loop):
    # each channel c is a triangle whose rising edge spans FFT bins
    # [cind[c], cind[c+1]) and falling edge [cind[c+1], cind[c+2]), with
    # the slope evaluated in MEL space at each bin's mel frequency. The
    # slope ratios below are sign-flipped rewrites of HTK's and divide two
    # exact IEEE negations, so they are bit-identical to the reference.
    bins = np.arange(len(fbin_mel))[:, None]             # [F, 1]
    lo, mid, hi = cind[:-2], cind[1:-1], cind[2:]        # [numchans] each
    rise = ((fbin_mel[:, None] - cbin_mel[:-2])
            / (cbin_mel[1:-1] - cbin_mel[:-2]))          # [F, numchans]
    fall = ((cbin_mel[2:] - fbin_mel[:, None])
            / (cbin_mel[2:] - cbin_mel[1:-1]))
    mfb = (np.where((bins >= lo) & (bins < mid), rise, 0.0)
           + np.where((bins >= mid) & (bins < hi), fall, 0.0))
    if lofreq > 0.0 and float(lofreq) / fs * nfft + 0.5 > cind[0] and htk_bug:
        mfb[cind[0], :] = 0.0
    return mfb


def add_dither(x: np.ndarray, level: float = 8.0) -> np.ndarray:
    """HTK-style dithering with NumPy's global RNG (features.py:124-125);
    the extractor seeds np.random.seed(3) for reproducibility
    (predict.py:163)."""
    return x + level * (np.random.rand(*x.shape) * 2 - 1)


# ---------------------------------------------------------------------------
# device-side pipeline (jittable, batched)
# ---------------------------------------------------------------------------

def frame_signal(x: jax.Array, window: int, shift: int) -> jax.Array:
    """[N] -> [num_frames, window] via one gather
    (reference strided view, features.py:9-12)."""
    n_frames = (x.shape[0] - window) // shift + 1
    idx = (jnp.arange(n_frames)[:, None] * shift
           + jnp.arange(window)[None, :])
    return x[idx]


@partial(jax.jit, static_argnames=("noverlap", "nfft", "use_power",
                                   "zmean_source", "preemcoef", "energy",
                                   "raw_energy", "enormalise", "escale",
                                   "silfloor"))
def fbank_htk(x: jax.Array, window_weights: jax.Array, fbank_mx: jax.Array,
              *, noverlap: int, nfft: Optional[int] = None,
              use_power: bool = True, zmean_source: bool = False,
              preemcoef: Optional[float] = 0.97,
              energy: Optional[str] = None, raw_energy: bool = True,
              enormalise: bool = True, escale: float = 0.1,
              silfloor: float = 50.0) -> jax.Array:
    """Log mel-filterbank features [num_frames, numchans] of a 1-D signal.

    Parity with features.fbank_htk (features.py:59-117) for the extractor's
    configuration (USEPOWER=True, ZMEANSOURCE=True, povey window,
    predict.py:172-173); USEPOWER=False gives magnitude spectra like the
    reference's `USEPOWER+1 != 2` path.

    `energy` appends the HTK log-energy coefficient as the 'first' or
    'last' column (reference _E, features.py:78-80,96-117; no recipe uses
    it, but it completes the frontend's HTK option surface):
    raw_energy computes it before pre-emphasis/windowing (RAWENERGY),
    enormalise/escale/silfloor apply HTK's max-normalization with the
    silence floor (ENORMALISE/ESCALE/SILFLOOR). Energy normalization
    depends on the SEGMENT maximum, so fixed-shape batching of padded
    segments must mask before the max — the extractor pipeline does not
    consume energy, so this stays the documented caveat.
    """
    winlen = window_weights.shape[0]
    if energy not in (None, "first", "last"):
        raise ValueError(f"energy must be None, 'first' or 'last'; "
                         f"got {energy!r}")
    if nfft is None:
        nfft = htk_nfft(winlen)
    frames = frame_signal(x, winlen, winlen - noverlap)
    if zmean_source:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    log_e = None
    if energy is not None and raw_energy:
        log_e = jnp.log(jnp.sum(frames * frames, axis=1))
    if preemcoef is not None:
        shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemcoef * shifted
    frames = frames * window_weights[None, :]
    if energy is not None and not raw_energy:
        log_e = jnp.log(jnp.sum(frames * frames, axis=1))
    spec = jnp.fft.rfft(frames, nfft)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if not use_power:
        power = jnp.sqrt(power)
    out = jnp.log(jnp.maximum(1.0, power @ fbank_mx))
    if energy is None:
        return out
    if enormalise:
        log_e = (log_e - jnp.max(log_e)) * escale + 1.0
        min_val = -jnp.log(10.0 ** (silfloor / 10.0)) * escale + 1.0
        log_e = jnp.maximum(log_e, min_val)
    cols = [log_e[:, None], out] if energy == "first" else [out,
                                                            log_e[:, None]]
    return jnp.concatenate(cols, axis=1)


@partial(jax.jit, static_argnames=("lc", "rc", "norm_vars"))
def cmvn_floating(x: jax.Array, lc: int, rc: int,
                  norm_vars: bool = False) -> jax.Array:
    """Kaldi-style floating-window mean (and optionally variance)
    normalization (features.py:128-146): fixed-size windows shifted, not
    shrunk, at the edges; global stats when the segment is shorter than the
    window."""
    N, dim = x.shape
    win_len = min(N, lc + rc + 1)
    win_start = jnp.clip(jnp.minimum(jnp.arange(-lc, N - lc), N - win_len),
                         0, None)
    zeros = jnp.zeros((1, dim), x.dtype)
    f = jnp.concatenate([zeros, jnp.cumsum(x, axis=0)])
    x = x - (f[win_start + win_len] - f[win_start]) / win_len
    if norm_vars:
        f2 = jnp.concatenate([zeros, jnp.cumsum(x * x, axis=0)])
        x = x / jnp.sqrt((f2[win_start + win_len] - f2[win_start]) / win_len)
    return x


@partial(jax.jit, static_argnames=("lc", "rc", "norm_vars"))
def cmvn_floating_masked(x: jax.Array, n_valid: jax.Array, lc: int, rc: int,
                         norm_vars: bool = False) -> jax.Array:
    """cmvn_floating for a zero-padded [T_pad, dim] array whose first
    `n_valid` rows are real: identical output on the valid prefix (padded
    rows contribute nothing to the cumsums and window indices never cross
    n_valid), letting variable-length VAD segments share one compiled
    shape."""
    N, dim = x.shape
    win_len = jnp.minimum(jnp.asarray(n_valid, jnp.int32), lc + rc + 1)
    win_start = jnp.clip(
        jnp.minimum(jnp.arange(-lc, N - lc), n_valid - win_len), 0, None)
    zeros = jnp.zeros((1, dim), x.dtype)
    f = jnp.concatenate([zeros, jnp.cumsum(x, axis=0)])
    x = x - (f[win_start + win_len] - f[win_start]) / win_len
    if norm_vars:
        f2 = jnp.concatenate([zeros, jnp.cumsum(x * x, axis=0)])
        x = x / jnp.sqrt((f2[win_start + win_len] - f2[win_start]) / win_len)
    return x


def fbank_config(sample_rate: int):
    """The extractor's per-bandwidth fbank configuration
    (predict.py:145-158): 8 kHz -> (200, 120, 3700 Hz); 16 kHz ->
    (400, 240, 7600 Hz); 64 channels, 20 Hz low cut, povey window."""
    if sample_rate == 8000:
        winlen, noverlap, hifreq = 200, 120, 3700
    elif sample_rate == 16000:
        winlen, noverlap, hifreq = 400, 240, 7600
    else:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    window = povey_window(winlen)
    fbank_mx = mel_filterbank(winlen, sample_rate, numchans=64,
                              lofreq=20.0, hifreq=hifreq, htk_bug=False)
    return window, fbank_mx, winlen, noverlap
