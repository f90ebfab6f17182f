"""Build the native linkage extension with g++ (no pybind11 — plain C ABI
consumed via ctypes). Idempotent: rebuilds only when the source is newer
than the shared object."""

from __future__ import annotations

import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "linkage.cpp")
SO = os.path.join(_HERE, "liblinkage.so")
_LOCK = threading.Lock()


def build(force: bool = False) -> str:
    """Compile linkage.cpp -> liblinkage.so; returns the .so path."""
    with _LOCK:
        if (not force and os.path.exists(SO)
                and os.path.getmtime(SO) >= os.path.getmtime(SRC)):
            return SO
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-fopenmp",
            "-shared", "-fPIC", SRC, "-o", SO,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", str(e))
            print(f"[vbx_tpu] native linkage build failed: {msg}",
                  file=sys.stderr)
            raise
        return SO


if __name__ == "__main__":
    print(build(force=True))
