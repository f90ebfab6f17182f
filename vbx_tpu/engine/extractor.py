"""x-vector extraction engine: wav + VAD -> embeddings ark + segments.

Pipeline parity with the reference extractor CLI (VBx/predict.py:81-210):
per-file dither (np.random.seed(3), predict.py:163-164), per-VAD-segment
mirror padding (:169-171), 64-d log-fbank + floating CMVN (:172-174),
sliding 144-frame windows with 24-frame hop plus the >=10-frame tail chunk
(:179-210), identical segment keys/times, NaN guard (:185-186).

TPU-first re-architecture (nothing like the reference's one-window-at-a-time
loop): ALL windows of a file — full 144-frame windows and variable-length
tails together — are batched into fixed-shape [B, 64, 144] chunks and run
through ONE jitted ResNet forward per chunk, using the model's
masked-variable-length support (models.resnet.ResNetXVector) which makes a
zero-padded window bit-equivalent to a true-length run. Fbank/CMVN run
jitted on device over length-bucketed segments; only wav decode, dither and
ark writing stay on the host.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vbx_tpu.config import ExtractorConfig
from vbx_tpu.models.features import (add_dither, cmvn_floating_masked,
                                     fbank_config, fbank_htk)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ExtractedSegment:
    key: str
    start: float
    end: float
    xvector: np.ndarray


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


class XVectorExtractor:
    """Reusable extraction engine holding the jitted model + fbank config."""

    def __init__(self, model, variables, sample_rate: int,
                 config: Optional[ExtractorConfig] = None,
                 batch_size: int = 128,
                 signal_bucket_s: float = 2.0):
        self.config = config or ExtractorConfig()
        self.sample_rate = sample_rate
        self.batch_size = batch_size
        self.signal_bucket = int(signal_bucket_s * sample_rate)
        window, fbank_mx, winlen, noverlap = fbank_config(sample_rate)
        self.window = jnp.asarray(window)
        self.fbank_mx = jnp.asarray(fbank_mx)
        self.winlen = winlen
        self.noverlap = noverlap
        self.shift = winlen - noverlap
        self.model = model
        self.variables = variables

        @jax.jit
        def embed(feats, lengths):
            # feats [B, 64, T=seg_len]; lengths [B]
            return model.apply(variables, feats, lengths=lengths)

        self._embed = embed

        seg_len_ = self.config.seg_len
        feat_dim_ = self.config.feat_dim

        @jax.jit
        def embed_windows(all_fea, starts, lengths):
            """Window gather + ResNet forward in ONE program over the
            DEVICE-resident feature stream. The windows overlap 6x
            (144-frame windows at a 24-frame hop, predict.py:179), so
            building them on host re-uploaded every feature frame ~6
            times — 77 MB per 8 minutes of audio over a ~12 MB/s tunnel
            was the measured extraction bottleneck. Here only the [B]
            int32 start/length tables cross the boundary. all_fea must
            carry >= seg_len zero rows of tail padding (dynamic_slice
            clamps at the array end; the length mask zeroes the
            overhang exactly like the host buf[:, :length] fill)."""
            def one(s, ln):
                w = jax.lax.dynamic_slice(
                    all_fea, (s, jnp.asarray(0, s.dtype)),
                    (seg_len_, feat_dim_))
                mask = (jnp.arange(seg_len_) < ln)[:, None]
                return (w * mask).T                  # [64, seg_len]
            feats = jax.vmap(one)(starts, lengths)
            return model.apply(variables, feats, lengths=lengths)

        self._embed_windows = embed_windows

        winlen_ = self.winlen
        noverlap_ = self.noverlap
        shift_ = self.shift
        window_ = self.window
        fbank_mx_ = self.fbank_mx
        cfg_ = self.config

        @functools.partial(jax.jit, static_argnames=("bucket_len",))
        def seg_features_dev(sig, start, seg_len, n_true, *,
                             bucket_len: int):
            """Features for one VAD segment from the device-resident
            signal: dynamic-slice + mirror-pad by index arithmetic (the
            reference's np.r_[head-mirror, seg, tail-mirror],
            predict.py:169-171), then fbank + masked CMVN. One compile per
            power-of-two bucket length; the audio is uploaded once per
            file instead of once per segment."""
            h = noverlap_ // 2
            w2 = winlen_ // 2
            chunk = jax.lax.dynamic_slice(sig, (start,), (bucket_len,))
            p = jnp.arange(bucket_len)
            idx = jnp.where(
                p < h, h - 1 - p,
                jnp.where(p < h + seg_len, p - h,
                          2 * seg_len + h - 1 - p))
            valid = p < h + seg_len + w2
            padded = jnp.where(
                valid, chunk[jnp.clip(idx, 0, bucket_len - 1)], 0.0)
            fea = fbank_htk(padded, window_, fbank_mx_,
                            noverlap=noverlap_, use_power=True,
                            zmean_source=True)
            return cmvn_floating_masked(fea, n_true, cfg_.cmvn_lc,
                                        cfg_.cmvn_rc)

        self._seg_features_dev = seg_features_dev

        @functools.partial(jax.jit, static_argnames=("bucket_len",))
        def seg_features_dev_batch(sig, starts, seg_lens, n_trues, *,
                                   bucket_len: int):
            """All of a file's same-bucket segments in ONE device call
            (vmapped over the segment axis): per-call latency, not compute,
            dominates when the chip sits behind a network hop."""
            return jax.vmap(
                lambda st, sl, nt: seg_features_dev(
                    sig, st, sl, nt, bucket_len=bucket_len)
            )(starts, seg_lens, n_trues)

        self._seg_features_dev_batch = seg_features_dev_batch

    # -- feature stage ----------------------------------------------------

    def segment_features(self, seg_signal: np.ndarray) -> np.ndarray:
        """Mirror-padded fbank + CMVN for one VAD segment (float32
        [n_frames, 64]). Pads the signal to a length bucket so XLA compiles
        once per bucket, then trims to the true frame count."""
        cfg = self.config
        seg = np.concatenate([
            seg_signal[self.noverlap // 2 - 1::-1],
            seg_signal,
            seg_signal[-1:-self.winlen // 2 - 1:-1]])
        n_true = (len(seg) - self.winlen) // self.shift + 1
        # geometric (power-of-two) length buckets: VAD segments span two
        # orders of magnitude, and every distinct padded shape is a fresh
        # XLA compile — linear buckets produced dozens of compiles per
        # corpus, pow2 caps them at ~log2(max/min)
        padded_len = self.signal_bucket
        while padded_len < len(seg):
            padded_len *= 2
        sig = np.zeros(padded_len, seg.dtype)
        sig[:len(seg)] = seg
        fea = fbank_htk(jnp.asarray(sig), self.window, self.fbank_mx,
                        noverlap=self.noverlap, use_power=True,
                        zmean_source=True)
        fea = cmvn_floating_masked(fea, n_true, cfg.cmvn_lc, cfg.cmvn_rc)
        return np.asarray(fea[:n_true], dtype=np.float32)

    # -- windowing --------------------------------------------------------

    def iter_windows(self, slen: int) -> Iterator[Tuple[int, int]]:
        """(start, length) of each extraction window over `slen` frames —
        exact reference semantics (predict.py:179-210): 144/24 sliding
        windows, then a tail of the remaining >=10 frames."""
        cfg = self.config
        start = -cfg.seg_jump
        for start in range(0, slen - cfg.seg_len, cfg.seg_jump):
            yield start, cfg.seg_len
        if slen - start - cfg.seg_jump >= cfg.min_tail_frames:
            yield start + cfg.seg_jump, slen - start - cfg.seg_jump

    # -- full-file extraction --------------------------------------------

    def extract_file(self, signal: np.ndarray, labs_s: np.ndarray,
                     name: str) -> List[ExtractedSegment]:
        """signal: [N] float in [-1, 1); labs_s: [V, 2] VAD (seconds)."""
        cfg = self.config
        fs = self.sample_rate
        labs = np.atleast_2d((np.asarray(labs_s) * fs).astype(int))
        np.random.seed(cfg.dither_seed)
        signal = add_dither((signal * 2 ** 15).astype(int),
                            cfg.dither_level)

        # one upload per file: VAD segments are sliced + mirror-padded on
        # device (the per-segment-upload path cost ~100 host->device
        # transfers per file)
        max_bucket = self.signal_bucket
        longest = max((labs[:, 1] - labs[:, 0]).max(initial=0)
                      + self.winlen, self.signal_bucket)
        while max_bucket < longest:
            max_bucket *= 2
        sig_dev = jnp.asarray(np.concatenate(
            [signal, np.zeros(max_bucket, signal.dtype)]).astype(np.float32))

        # plan segments, grouped by power-of-two bucket, so each bucket is
        # ONE vmapped device call
        plans: Dict[int, List[Tuple[int, int, int, int]]] = {}
        host_feas: Dict[int, np.ndarray] = {}
        for segnum in range(len(labs)):
            seg = signal[labs[segnum, 0]:labs[segnum, 1]]
            if seg.shape[0] <= 0.01 * fs:
                continue
            if seg.shape[0] >= self.winlen:
                seg_len = int(seg.shape[0])
                padded_total = (self.noverlap // 2 + seg_len
                                + self.winlen // 2)
                n_true = (padded_total - self.winlen) // self.shift + 1
                bucket = self.signal_bucket
                while bucket < padded_total:
                    bucket *= 2
                plans.setdefault(bucket, []).append(
                    (segnum, int(labs[segnum, 0]), seg_len, n_true))
            else:
                # mirror arithmetic needs seg_len >= winlen; tiny segments
                # (rare: < 25 ms of frames) take the host-upload path with
                # the reference's exact truncating-mirror semantics
                host_feas[segnum] = self.segment_features(seg)

        # features stay ON DEVICE: each segment becomes a (device array,
        # row, n_true) slice reference; only the tiny host-path segments
        # upload. The window stage gathers from the device-resident
        # stream inside the embed jit (self._embed_windows) — features
        # never round-trip to host and the 6x-overlapping windows are
        # never materialized (the old host windowing re-uploaded ~77 MB
        # per 8 min of audio over the tunnel).
        feas: Dict[int, object] = {
            k: (jnp.asarray(v), None, len(v)) for k, v in host_feas.items()}
        GROUP = 8       # fixed vmap width: exactly ONE compile per bucket
        for bucket, items in plans.items():
            for gi in range(0, len(items), GROUP):
                group = items[gi:gi + GROUP]
                padded = group + [group[0]] * (GROUP - len(group))
                starts = jnp.asarray([it[1] for it in padded])
                seg_lens = jnp.asarray([it[2] for it in padded])
                n_trues = jnp.asarray([it[3] for it in padded])
                out = self._seg_features_dev_batch(
                    sig_dev, starts, seg_lens, n_trues, bucket_len=bucket)
                for row, (segnum, _, _, n_true) in enumerate(group):
                    feas[segnum] = (out, row, n_true)

        # device-side concat of the per-segment valid prefixes (+ seg_len
        # zero rows so tail-window dynamic_slices never clamp), padded to
        # a power-of-two frame count: one embed_windows compile per octave
        parts = []
        offsets: Dict[int, int] = {}
        off = 0
        for segnum in sorted(feas):
            arr, row, n_true = feas[segnum]
            parts.append(arr[:n_true] if row is None else arr[row, :n_true])
            offsets[segnum] = off
            off += n_true
        if not parts:
            return []
        t_pad = 2048
        while t_pad < off + cfg.seg_len:
            t_pad *= 2
        all_fea = jnp.concatenate(
            parts + [jnp.zeros((t_pad - off, cfg.feat_dim), jnp.float32)])

        win_starts: List[int] = []
        win_lens: List[int] = []
        meta: List[Tuple[str, float, float]] = []
        for segnum in sorted(feas):
            slen = feas[segnum][2]
            t0 = labs[segnum, 0] / float(fs)
            for start, length in self.iter_windows(slen):
                win_starts.append(offsets[segnum] + start)
                win_lens.append(length)
                key = f"{name}_{segnum:04}-{start:08}-{start + length:08}"
                if length == cfg.seg_len:
                    end = round(t0 + start / 100.0 + cfg.seg_len / 100.0, 3)
                else:
                    end = round(labs[segnum, 1] / float(fs), 3)
                meta.append((key, round(t0 + start / 100.0, 3), end))

        return self._run_window_batches(all_fea, win_starts, win_lens, meta)

    def _run_window_batches(self, all_fea, starts, lengths,
                            meta) -> List[ExtractedSegment]:
        """PIPELINED window batches over the device-resident feature
        stream: per batch only [B] int32 start/length tables cross the
        host->device boundary and the gather happens inside the embed
        jit (self._embed_windows). Dispatch is asynchronous with a
        bounded in-flight window, so launches run ahead of fetches — the
        old per-batch dispatch-then-fetch serialized a full tunnel
        round-trip per batch on top of re-uploading every (6x
        overlapped) window. `max_in_flight` bounds device memory."""
        from collections import deque

        out: List[ExtractedSegment] = []
        B = self.batch_size
        max_in_flight = 8
        in_flight: deque = deque()

        def drain(entry):
            emb = np.asarray(entry["res"])[:entry["n"]]
            for (key, s, e), vec in zip(entry["meta"], emb):
                if np.isnan(vec).any():
                    logger.warning("NaN found, not processing: %s", key)
                    continue
                out.append(ExtractedSegment(key, s, e,
                                            vec.astype(np.float32)))

        for i in range(0, len(starts), B):
            st = starts[i:i + B]
            lens = lengths[i:i + B]
            n = len(st)
            if n < B:                      # pad the final chunk
                st = st + [0] * (B - n)
                lens = lens + [self.config.seg_len] * (B - n)
            res = self._embed_windows(all_fea,
                                      jnp.asarray(st, jnp.int32),
                                      jnp.asarray(lens, jnp.int32))
            in_flight.append({"res": res, "n": n, "meta": meta[i:i + n]})
            while len(in_flight) > max_in_flight:
                drain(in_flight.popleft())
        while in_flight:
            drain(in_flight.popleft())
        return out


def extract_to_ark(wav_paths: Sequence[str], lab_paths: Sequence[str],
                   names: Sequence[str], ark_path: str, segments_path: str,
                   extractor: XVectorExtractor) -> Dict[str, int]:
    """Extract every file and write Kaldi ark + segments (the durable
    stage boundary the diarization CLI consumes, predict.py:192-193)."""
    from vbx_tpu.io.ark import write_vec_ark
    from vbx_tpu.io.segments import write_segments
    from vbx_tpu.io.vad import read_lab
    from vbx_tpu.io.wav import read_wav
    from vbx_tpu.utils.timing import Timer

    from concurrent.futures import ThreadPoolExecutor

    def load(wav, lab):
        signal, fs = read_wav(wav)
        if signal.ndim > 1:
            signal = signal.mean(axis=1)
        return signal, fs, read_lab(lab)

    counts: Dict[str, int] = {}
    vecs: List[Tuple[str, np.ndarray]] = []
    rows: List[Tuple[str, str, float, float]] = []
    files = list(zip(wav_paths, lab_paths, names))
    # one-deep prefetch: decode file i+1 on a reader thread while the
    # device embeds file i (host wav/VAD I/O otherwise serializes with
    # the accelerator)
    with ThreadPoolExecutor(max_workers=1) as io_pool:
        nxt = io_pool.submit(load, *files[0][:2]) if files else None
        for idx, (wav, lab, name) in enumerate(files):
            fut, nxt = nxt, (io_pool.submit(load, *files[idx + 1][:2])
                             if idx + 1 < len(files) else None)
            try:
                with Timer(f"Processing file {name}"):
                    signal, fs, lab_segs = fut.result()
                    if fs != extractor.sample_rate:
                        raise ValueError(
                            f"{wav}: sample rate {fs} != extractor "
                            f"{extractor.sample_rate}")
                    segs = extractor.extract_file(signal, lab_segs, name)
            except Exception as exc:   # noqa: BLE001 — per-file isolation
                # reference parity: extraction task lines are one process
                # per file (extract.sh:20-36); a single-file run fails
                # visibly
                if len(files) == 1:
                    raise
                import sys as _sys
                print(f"ERROR: file {name!r} failed and is skipped: "
                      f"{type(exc).__name__}: {exc}", file=_sys.stderr)
                continue
            counts[name] = len(segs)
            vecs.extend((s.key, s.xvector) for s in segs)
            rows.extend((s.key, name, s.start, s.end) for s in segs)
    write_vec_ark(ark_path, vecs)
    write_segments(segments_path, rows)
    return counts
