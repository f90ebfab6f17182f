"""Split-zip weights reassembly (reference setup.py:21-39 / AMI_run.sh:20-23
equivalent)."""

import os
import zipfile

import pytest

from vbx_tpu.models.weights import find_checkpoint, reassemble_split_zip


def _make_split_zip(tmp_path, payload: bytes):
    zp = tmp_path / "model.zip"
    member_src = tmp_path / "payload.bin"
    member_src.write_bytes(payload)
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(member_src, "ResNet101_16kHz/raw_81.pth")
    data = zp.read_bytes()
    os.remove(zp)
    third = len(data) // 3
    for i, chunk in enumerate([data[:third], data[third:2 * third],
                               data[2 * third:]]):
        (tmp_path / f"model.zip.part-a{chr(97 + i)}").write_bytes(chunk)


def test_reassemble_and_find(tmp_path):
    payload = os.urandom(4096)
    _make_split_zip(tmp_path, payload)
    out = reassemble_split_zip(str(tmp_path / "model.zip.part-a*"),
                               str(tmp_path / "models"))
    assert len(out) == 1
    assert open(out[0], "rb").read() == payload
    ckpt = find_checkpoint(str(tmp_path / "models"))
    assert ckpt and ckpt.endswith("raw_81.pth")
    # idempotent re-entry
    out2 = reassemble_split_zip(str(tmp_path / "model.zip.part-a*"),
                                str(tmp_path / "models"))
    assert out2 == out


def test_missing_parts(tmp_path):
    with pytest.raises(FileNotFoundError):
        reassemble_split_zip(str(tmp_path / "nope.part-a*"), str(tmp_path))
    assert find_checkpoint(str(tmp_path)) is None


def test_reassemble_manifest_short_circuits(tmp_path):
    """Second call must not redo assembly I/O: the manifest lists members
    and all exist -> early return (and the parts can even be gone)."""
    import zipfile

    from vbx_tpu.models.weights import reassemble_split_zip

    z = tmp_path / "m.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("w/a.txt", "A")
        zf.writestr("w/b.txt", "B")
    blob = z.read_bytes()
    z.unlink()
    (tmp_path / "m.zip.part-aa").write_bytes(blob[:20])
    (tmp_path / "m.zip.part-ab").write_bytes(blob[20:])
    out = tmp_path / "out"
    first = reassemble_split_zip(str(tmp_path / "m.zip.part-a*"), str(out))
    assert sorted(os.path.basename(p) for p in first) == ["a.txt", "b.txt"]
    # corrupt the parts: a re-run can only succeed via the manifest
    # (reassembly would produce an unreadable zip)
    for p in tmp_path.glob("m.zip.part-a*"):
        p.write_bytes(b"garbage")
    second = reassemble_split_zip(str(tmp_path / "m.zip.part-a*"), str(out))
    assert sorted(second) == sorted(first)
