"""Native (C++) host components, bound via ctypes.

The compute path is JAX/XLA on TPU; these are host-side hot loops that are
sequential by nature (bitstream decoding) and benefit from native code on
the weak CPUs typical of QA workstations. Each component compiles lazily on
first use with g++ into a cached shared object and falls back to the
pure-numpy implementation when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_BUILD_DIR = Path(__file__).parent / "_build"
_SRC_DIR = Path(__file__).parent

_lib_cache: dict[str, ctypes.CDLL | None] = {}


def _compile(name: str) -> Path | None:
    src = _SRC_DIR / f"{name}.cpp"
    out = _BUILD_DIR / f"lib{name}.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return out


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile (if needed) and load ``pylinac_tpu/native/<name>.cpp``.

    Returns None when the toolchain or compile fails — callers fall back to
    their numpy implementation. Set ``PYLINAC_TPU_NO_NATIVE=1`` to disable.
    """
    if os.environ.get("PYLINAC_TPU_NO_NATIVE"):
        return None
    if name not in _lib_cache:
        path = _compile(name)
        try:
            _lib_cache[name] = ctypes.CDLL(str(path)) if path else None
        except OSError:
            _lib_cache[name] = None
    return _lib_cache[name]
