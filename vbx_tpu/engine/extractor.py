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
                 batch_size: int = 64,
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
        padded_len = _round_up(len(seg), self.signal_bucket)
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

        batch_feats: List[np.ndarray] = []
        batch_lens: List[int] = []
        meta: List[Tuple[str, float, float]] = []
        for segnum in range(len(labs)):
            seg = signal[labs[segnum, 0]:labs[segnum, 1]]
            if seg.shape[0] <= 0.01 * fs:
                continue
            fea = self.segment_features(seg)
            slen = len(fea)
            t0 = labs[segnum, 0] / float(fs)
            for start, length in self.iter_windows(slen):
                buf = np.zeros((cfg.feat_dim, cfg.seg_len), np.float32)
                buf[:, :length] = fea[start:start + length].T
                batch_feats.append(buf)
                batch_lens.append(length)
                key = f"{name}_{segnum:04}-{start:08}-{start + length:08}"
                if length == cfg.seg_len:
                    end = round(t0 + start / 100.0 + cfg.seg_len / 100.0, 3)
                else:
                    end = round(labs[segnum, 1] / float(fs), 3)
                meta.append((key, round(t0 + start / 100.0, 3), end))

        return self._run_batches(batch_feats, batch_lens, meta)

    def _run_batches(self, feats, lengths, meta) -> List[ExtractedSegment]:
        out: List[ExtractedSegment] = []
        B = self.batch_size
        for i in range(0, len(feats), B):
            chunk = feats[i:i + B]
            lens = lengths[i:i + B]
            n = len(chunk)
            if n < B:                      # pad the final chunk
                chunk = chunk + [np.zeros_like(chunk[0])] * (B - n)
                lens = lens + [self.config.seg_len] * (B - n)
            emb = np.asarray(self._embed(
                jnp.asarray(np.stack(chunk)), jnp.asarray(lens)))[:n]
            for (key, s, e), vec in zip(meta[i:i + n], emb):
                if np.isnan(vec).any():
                    logger.warning("NaN found, not processing: %s", key)
                    continue
                out.append(ExtractedSegment(key, s, e,
                                            vec.astype(np.float32)))
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

    counts: Dict[str, int] = {}
    vecs: List[Tuple[str, np.ndarray]] = []
    rows: List[Tuple[str, str, float, float]] = []
    for wav, lab, name in zip(wav_paths, lab_paths, names):
        with Timer(f"Processing file {name}"):
            signal, fs = read_wav(wav)
            if signal.ndim > 1:
                signal = signal.mean(axis=1)
            if fs != extractor.sample_rate:
                raise ValueError(
                    f"{wav}: sample rate {fs} != extractor "
                    f"{extractor.sample_rate}")
            segs = extractor.extract_file(signal, read_lab(lab), name)
        counts[name] = len(segs)
        vecs.extend((s.key, s.xvector) for s in segs)
        rows.extend((s.key, name, s.start, s.end) for s in segs)
    write_vec_ark(ark_path, vecs)
    write_segments(segments_path, rows)
    return counts
