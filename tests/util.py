"""Shared test helpers: reference-module import and corpus fixtures."""

from __future__ import annotations

import importlib
import sys
from typing import List, Optional, Tuple

REF = "/root/reference"


def import_reference(module: str):
    """Import a module from the read-only reference checkout.

    Modules are imported directly off /root/reference/VBx — the package
    name `VBx` is shadowed by VBx.py once that directory is on sys.path
    (CLAUDE.md), so `import VBx.features` would resolve to the wrong thing.
    The path is inserted once per process."""
    path = f"{REF}/VBx"
    if path not in sys.path:
        sys.path.insert(0, path)
    return importlib.import_module(module)


def split_ark_corpus(out_dir, n_rec: int,
                     frames_per_rec: Optional[int] = None,
                     prefix: str = "rec",
                     ark_name: str = "xvectors.ark",
                     seg_name: str = "xvectors.seg",
                     ) -> Tuple[str, str, List[str]]:
    """Build an n_rec-recording corpus from ES2005a's shipped x-vectors.

    Consecutive slices of the real embeddings become pseudo-recordings
    (keeps AHC/VB well-posed, unlike random vectors). With
    frames_per_rec=None the 1025 vectors are split evenly. Returns
    (ark_path, seg_path, recording_names); files are written inside
    out_dir (created if missing)."""
    import os

    from vbx_tpu.io.ark import iter_vec_ark, write_vec_ark
    from vbx_tpu.io.segments import read_segments, write_segments

    vecs = list(iter_vec_ark(f"{REF}/exp/ES2005a.ark"))
    segs = read_segments(f"{REF}/exp/ES2005a.seg")
    per = frames_per_rec or len(vecs) // n_rec
    if per * n_rec > len(vecs):
        raise ValueError(f"{n_rec} x {per} frames > {len(vecs)} available")
    names = []
    out_vecs, out_rows = [], []
    for r in range(n_rec):
        rec = (f"{prefix}{chr(ord('A') + r)}" if n_rec <= 26
               else f"{prefix}{r}")
        names.append(rec)
        # with no explicit frames_per_rec the last recording absorbs the
        # remainder, so every shipped vector is used (even-split semantics
        # of the original per-file builders)
        stop = ((r + 1) * per if frames_per_rec or r < n_rec - 1
                else len(vecs))
        for i in range(r * per, stop):
            (key, v), (_, _, s, e) = vecs[i], segs[i]
            newkey = f"{rec}_{key.split('_', 1)[1]}"
            out_vecs.append((newkey, v))
            out_rows.append((newkey, rec, s, e))
    os.makedirs(str(out_dir), exist_ok=True)
    ark = os.path.join(str(out_dir), ark_name)
    seg = os.path.join(str(out_dir), seg_name)
    write_vec_ark(ark, out_vecs)
    write_segments(seg, out_rows)
    return ark, seg, names
