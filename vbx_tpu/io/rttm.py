"""RTTM read/write.

Output format matches the reference writer byte-for-byte
(vbhmm.py:48-51): `SPEAKER <file> 1 <start:03f> <dur:03f> <NA> <NA>
<label+1> <NA> <NA>` — note the reference's `:03f` format spec means
min-width 3 with default 6-digit precision, and integer cluster labels are
written 1-based.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from vbx_tpu.io.common import open_sink


@dataclasses.dataclass(frozen=True)
class RttmSegment:
    recording: str
    start: float
    duration: float
    speaker: str

    @property
    def end(self) -> float:
        return self.start + self.duration


def write_rttm(path_or_fd, recording: str, starts: Sequence[float],
               ends: Sequence[float], labels: Sequence[int]) -> None:
    """Write merged, integer-labeled segments for one recording."""

    with open_sink(path_or_fd) as fp:
        for label, s, e in zip(labels, starts, ends):
            fp.write(f"SPEAKER {recording} 1 {s:03f} {e - s:03f} "
                     f"<NA> <NA> {int(label) + 1} <NA> <NA>{os.linesep}")


def write_rttm_str(path_or_fd, segments: Iterable[RttmSegment]) -> None:
    """Write arbitrary (string-labeled) RTTM segments."""

    with open_sink(path_or_fd) as fp:
        for seg in segments:
            fp.write(f"SPEAKER {seg.recording} 1 {seg.start:03f} "
                     f"{seg.duration:03f} <NA> <NA> {seg.speaker} "
                     f"<NA> <NA>{os.linesep}")


def read_rttm(path: str) -> List[RttmSegment]:
    """Parse SPEAKER lines of an RTTM file."""
    out: List[RttmSegment] = []
    with open(path) as fp:
        for line in fp:
            parts = line.split()
            if not parts or parts[0].upper() != "SPEAKER":
                continue
            if len(parts) < 8:
                raise ValueError(
                    f"{path}: malformed RTTM SPEAKER line "
                    f"({len(parts)} fields < 8): {line.rstrip()!r}")
            out.append(RttmSegment(
                recording=parts[1],
                start=float(parts[3]),
                duration=float(parts[4]),
                speaker=parts[7],
            ))
    return out


def rttm_by_recording(segs: Iterable[RttmSegment]) -> Dict[str, List[RttmSegment]]:
    out: Dict[str, List[RttmSegment]] = {}
    for s in segs:
        out.setdefault(s.recording, []).append(s)
    return out


def merge_adjacent_labels(
    starts: np.ndarray, ends: np.ndarray, labels: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact labeled segments: merge adjacent/overlapping same-label
    segments; split the boundary of overlapping different-label segments at
    the middle of the overlap (reference semantics: diarization_lib.py:113-135).
    """
    starts = np.asarray(starts, dtype=float)
    ends = np.asarray(ends, dtype=float)
    labels = np.asarray(labels)
    if len(starts) == 0:
        return starts, ends, labels

    adjacent_or_overlap = np.logical_or(
        np.isclose(ends[:-1], starts[1:]), ends[:-1] > starts[1:])
    to_split = np.nonzero(
        np.logical_or(~adjacent_or_overlap, labels[1:] != labels[:-1]))[0]
    starts = starts[np.r_[0, to_split + 1]]
    ends = ends[np.r_[to_split, -1]]
    labels = labels[np.r_[0, to_split + 1]]

    overlapping = np.nonzero(starts[1:] < ends[:-1])[0]
    mid = (ends[overlapping] + starts[overlapping + 1]) / 2.0
    ends[overlapping] = mid
    starts[overlapping + 1] = mid
    return starts, ends, labels


def segment_to_frame_labels(
    starts: np.ndarray, ends: np.ndarray, labels: np.ndarray,
    length: int = 0, frame_rate: float = 100.0, empty_label=None,
) -> np.ndarray:
    """Expand labeled segments into per-frame labels at `frame_rate`
    (reference semantics: diarization_lib.py:138-159). `length>0` truncates or
    pads to exactly `length`; `length<0` only pads up to `-length`."""
    min_len, max_len = (length, length) if length > 0 else (-length, None)
    starts = np.rint(frame_rate * np.asarray(starts, dtype=float)).astype(int)
    ends = np.rint(frame_rate * np.asarray(ends, dtype=float)).astype(int)
    labels = np.asarray(labels)
    if not ends.size:
        return np.full(min_len, empty_label)

    vals: List = []
    reps: List[int] = []
    prev_end = 0
    for s, e, lab in zip(starts, ends, labels):
        vals += [empty_label, lab]
        reps += [s - prev_end, e - s]
        prev_end = e
    vals.append(empty_label)
    reps.append(max(0, min_len - prev_end))
    frms = np.repeat(np.array(vals, dtype=object), np.array(reps))
    return frms[:max_len]
