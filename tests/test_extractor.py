"""Extraction engine vs a reference-semantics oracle: the exact predict.py
loop (reference features + torch model, random weights) replayed in NumPy.
"""

import os
import sys

import numpy as np
import pytest

from vbx_tpu.engine.extractor import XVectorExtractor, extract_to_ark
from vbx_tpu.io.wav import read_wav, write_wav
from vbx_tpu.models.resnet import (BasicBlock, ResNetXVector,
                                   convert_torch_state_dict)

from .util import import_reference

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(f"{REF}/VBx"),
                               reason="reference not mounted")
torch = pytest.importorskip("torch")


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1, 1, 16000) * 0.5)
    p = tmp_path / "a.wav"
    write_wav(str(p), x, 16000)
    y, fs = read_wav(str(p))
    assert fs == 16000
    np.testing.assert_allclose(y, np.clip(np.rint(x * 32768) / 32768, -1, 1),
                               atol=1e-9)


def test_wav_matches_scipy(tmp_path):
    from scipy.io import wavfile
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.9, 0.9, 8000)
    p = tmp_path / "b.wav"
    write_wav(str(p), x, 8000)
    fs, ref = wavfile.read(str(p))
    y, fs2 = read_wav(str(p))
    assert fs == fs2 == 8000
    np.testing.assert_allclose(y, ref.astype(np.float64) / 32768, atol=1e-12)


def _small_model():
    """Tiny BasicBlock ResNet shared between torch and flax."""
    ref_resnet = import_reference("models.resnet")
    torch.manual_seed(0)
    tm = ref_resnet.ResNet(ref_resnet.BasicBlock, [1, 1, 1, 1],
                           feat_dim=64, embed_dim=32)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_torch_state_dict(sd, num_blocks=(1, 1, 1, 1))
    fm = ResNetXVector(block=BasicBlock, num_blocks=(1, 1, 1, 1),
                       feat_dim=64, embed_dim=32)
    return tm, fm, {**params, **stats}


def _reference_extract(tm, signal, labs_s, fs, name):
    """The exact predict.py:140-210 loop with reference features.

    NOTE on the CLAUDE.md no-copy rule: this replay necessarily restates the
    reference's __main__-block logic (predict.py keeps it un-importable
    inside `if __name__ == '__main__'`), used here solely as the parity
    oracle; the feature/window math itself is imported from the reference
    (import_reference('features')), not copied."""
    features = import_reference("features")
    if fs != 16000:
        raise ValueError(f"_reference_extract supports fs=16000 only, "
                         f"got {fs}")
    noverlap, winlen = 240, 400
    fbank_mx = features.mel_fbank_mx(winlen, fs, NUMCHANS=64,
                                     LOFREQ=20.0, HIFREQ=7600,
                                     htk_bug=False)
    window = features.povey_window(winlen)
    labs = np.atleast_2d((np.asarray(labs_s) * fs).astype(int))
    np.random.seed(3)
    signal = features.add_dither((signal * 2 ** 15).astype(int))
    seg_len, seg_jump = 144, 24
    out = []
    for segnum in range(len(labs)):
        seg = signal[labs[segnum, 0]:labs[segnum, 1]]
        if seg.shape[0] <= 0.01 * fs:
            continue
        seg = np.r_[seg[noverlap // 2 - 1::-1], seg,
                    seg[-1:-winlen // 2 - 1:-1]]
        fea = features.fbank_htk(seg, window, noverlap, fbank_mx,
                                 USEPOWER=True, ZMEANSOURCE=True)
        fea = features.cmvn_floating_kaldi(fea, 150, 149,
                                           norm_vars=False).astype(np.float32)
        slen = len(fea)
        start = -seg_jump
        windows = []
        for start in range(0, slen - seg_len, seg_jump):
            windows.append((start, seg_len))
        if slen - start - seg_jump >= 10:
            windows.append((start + seg_jump, slen - start - seg_jump))
        for start, length in windows:
            data = fea[start:start + length]
            with torch.no_grad():
                xv = tm(torch.tensor(data.T[None].copy())).numpy()[0]
            key = f"{name}_{segnum:04}-{start:08}-{start + length:08}"
            out.append((key, xv))
    return out


@needs_ref
def test_extractor_matches_reference_loop():
    tm, fm, variables = _small_model()
    fs = 16000
    rng = np.random.default_rng(5)
    signal = rng.uniform(-0.5, 0.5, int(7.5 * fs))     # 7.5 s
    # VAD: one long segment (several windows + tail), one short (<0.01 s,
    # skipped), one mid (tail only)
    labs_s = np.array([[0.2, 5.0], [5.1, 5.105], [5.5, 7.0]])

    ref_out = _reference_extract(tm, signal.copy(), labs_s, fs, "rec")
    ex = XVectorExtractor(fm, variables, fs, batch_size=8)
    ours = ex.extract_file(signal.copy(), labs_s, "rec")

    assert [s.key for s in ours] == [k for k, _ in ref_out]
    ours_m = np.stack([s.xvector for s in ours])
    ref_m = np.stack([v for _, v in ref_out])
    scale = np.abs(ref_m).max()
    np.testing.assert_allclose(ours_m, ref_m, atol=5e-4 * scale)


@needs_ref
def test_extract_to_ark_roundtrip(tmp_path):
    from vbx_tpu.io.ark import read_vec_ark
    from vbx_tpu.io.segments import read_xvector_timing_dict

    _, fm, variables = _small_model()
    fs = 16000
    rng = np.random.default_rng(7)
    signal = rng.uniform(-0.5, 0.5, 3 * fs)
    wav = tmp_path / "recA.wav"
    write_wav(str(wav), signal, fs)
    lab = tmp_path / "recA.lab"
    lab.write_text("0.10 2.80 sp\n")

    ex = XVectorExtractor(fm, variables, fs, batch_size=4)
    counts = extract_to_ark([str(wav)], [str(lab)], ["recA"],
                            str(tmp_path / "x.ark"), str(tmp_path / "x.seg"),
                            ex)
    assert counts["recA"] > 0
    vecs = read_vec_ark(str(tmp_path / "x.ark"))
    assert len(vecs) == counts["recA"]
    names, times = read_xvector_timing_dict(str(tmp_path / "x.seg"))["recA"]
    assert len(names) == len(vecs)
    assert np.all(times[:, 1] > times[:, 0])
    # window hop is 0.24 s
    np.testing.assert_allclose(np.diff(times[:-1, 0]), 0.24, atol=1e-6)


@needs_ref
def test_bf16_extraction_close_to_f32(tmp_path):
    """--dtype bfloat16 path: the MXU-native precision must produce
    embeddings whose cosine agreement with float32 stays > 0.999 (the
    pipeline length-normalizes embeddings, so direction is what matters)."""
    import jax.numpy as jnp

    from vbx_tpu.io.ark import read_vec_ark

    _, fm, variables = _small_model()
    fm16 = ResNetXVector(block=BasicBlock, num_blocks=(1, 1, 1, 1),
                         feat_dim=64, embed_dim=32, dtype=jnp.bfloat16)
    fs = 16000
    rng = np.random.default_rng(11)
    write_wav(str(tmp_path / "r.wav"), rng.uniform(-0.5, 0.5, 3 * fs), fs)
    (tmp_path / "r.lab").write_text("0.10 2.80 sp\n")
    outs = {}
    for tag, m in (("f32", fm), ("bf16", fm16)):
        extract_to_ark([str(tmp_path / "r.wav")], [str(tmp_path / "r.lab")],
                       ["r"], str(tmp_path / f"{tag}.ark"),
                       str(tmp_path / f"{tag}.seg"),
                       XVectorExtractor(m, variables, fs, batch_size=4))
        outs[tag] = read_vec_ark(str(tmp_path / f"{tag}.ark"))
    assert outs["f32"].keys() == outs["bf16"].keys()
    for k in outs["f32"]:
        a, b = outs["f32"][k], outs["bf16"][k]
        assert np.isfinite(b).all()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, (k, cos)


@needs_ref
def test_failed_file_is_isolated(tmp_path, capsys):
    """A corrupt wav skips only its own file (reference parity: one
    extraction task line per file, extract.sh:20-36); a single-file run
    still raises."""
    _, fm, variables = _small_model()
    fs = 16000
    rng = np.random.default_rng(3)
    for n in ("good", "bad"):
        write_wav(str(tmp_path / f"{n}.wav"), rng.uniform(-0.5, 0.5, 2 * fs),
                  fs)
        (tmp_path / f"{n}.lab").write_text("0.10 1.80 sp\n")
    (tmp_path / "bad.wav").write_bytes(b"RIFFgarbage")

    ex = XVectorExtractor(fm, variables, fs, batch_size=4)
    counts = extract_to_ark(
        [str(tmp_path / "good.wav"), str(tmp_path / "bad.wav")],
        [str(tmp_path / "good.lab"), str(tmp_path / "bad.lab")],
        ["good", "bad"], str(tmp_path / "x.ark"), str(tmp_path / "x.seg"), ex)
    assert "good" in counts and "bad" not in counts
    assert "bad" in capsys.readouterr().err

    with pytest.raises(Exception):
        extract_to_ark([str(tmp_path / "bad.wav")],
                       [str(tmp_path / "bad.lab")], ["bad"],
                       str(tmp_path / "y.ark"), str(tmp_path / "y.seg"), ex)
