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


def xim_decode_native():
    """(kept for parity with existing callers; see xim usage)"""
    return load_library("xim_decode")


def jpegls_native():
    """ctypes wrappers for the JPEG-LS codec, or None.

    Returns (decode, encode): ``decode(bytes) -> np.ndarray`` (uint8/uint16
    by codestream precision) and ``encode(np.ndarray, prec) -> bytes``."""
    lib = load_library("jpegls")
    if lib is None:
        return None
    import numpy as np

    dec = lib.jls_decode
    dec.restype = ctypes.c_int
    dec.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
    enc = lib.jls_encode
    enc.restype = ctypes.c_int
    enc.argtypes = [ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64)]

    def decode(data: bytes):
        cap = 8192 * 8192
        idx = data.find(b"\xff\xf7")              # SOF55: exact sizing
        if 0 <= idx and idx + 9 < len(data):
            rows_s = int.from_bytes(data[idx + 5:idx + 7], "big")
            cols_s = int.from_bytes(data[idx + 7:idx + 9], "big")
            if rows_s and cols_s:
                cap = rows_s * cols_s
        out = np.empty(cap, np.uint16)
        rows, cols, prec = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        rc = dec(data, len(data),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap,
                 ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(prec))
        if rc != 0:
            raise ValueError(f"native JPEG-LS decode failed (code {rc})")
        arr = out[:rows.value * cols.value].reshape(rows.value, cols.value).copy()
        return arr.astype(np.uint8) if prec.value <= 8 else arr

    def encode(frame, prec: int) -> bytes:
        img = np.ascontiguousarray(frame, np.uint16)
        h, w = img.shape
        cap = h * w * 2 + 1024
        out = np.empty(cap, np.uint8)
        out_len = ctypes.c_int64()
        rc = enc(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w,
                 prec, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                 cap, ctypes.byref(out_len))
        if rc != 0:
            raise ValueError(f"native JPEG-LS encode failed (code {rc})")
        return out[:out_len.value].tobytes()

    return decode, encode


def j2k_native():
    """ctypes wrappers for the JPEG 2000 codec, or None.

    Returns (decode, encode): ``decode(bytes) -> (np.ndarray int32, prec,
    sgnd)`` and ``encode(np.ndarray, prec, sgnd) -> bytes`` (lossless 5/3)."""
    lib = load_library("jpeg2000")
    if lib is None:
        return None
    import numpy as np

    dec = lib.j2k_decode
    dec.restype = ctypes.c_int
    dec.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    enc = lib.j2k_encode
    enc.restype = ctypes.c_int
    enc.argtypes = [ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64)]

    _ERR = {1: "malformed codestream", 2: "unsupported codestream feature",
            3: "corrupt entropy data", 4: "output capacity", 5:
            "irreversible (9/7) wavelets are not supported — lossless only"}

    def decode(data: bytes):
        cap = 4096 * 4096
        out = np.empty(cap, np.int32)
        rows, cols = ctypes.c_int(), ctypes.c_int()
        prec, sgnd = ctypes.c_int(), ctypes.c_int()
        rc = dec(data, len(data),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
                 ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(prec),
                 ctypes.byref(sgnd))
        if rc != 0:
            raise ValueError(
                f"JPEG 2000 decode failed: {_ERR.get(rc, rc)}")
        arr = out[:rows.value * cols.value].reshape(rows.value, cols.value)
        return arr.copy(), prec.value, bool(sgnd.value)

    def encode(frame, prec: int, sgnd: bool) -> bytes:
        img = np.ascontiguousarray(frame, np.int32)
        h, w = img.shape
        cap = h * w * 4 + 65536
        out = np.empty(cap, np.uint8)
        out_len = ctypes.c_int64()
        rc = enc(img.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
                 prec, int(sgnd),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
                 ctypes.byref(out_len))
        if rc != 0:
            raise ValueError(f"JPEG 2000 encode failed: {_ERR.get(rc, rc)}")
        return out[:out_len.value].tobytes()

    return decode, encode


def jpeg_lossless_native():
    """ctypes wrapper for the JPEG Lossless decoder, or None.

    Returns a callable ``bytes -> np.ndarray`` (uint16, or uint8 when the
    codestream precision is 8)."""
    lib = load_library("jpeg_lossless")
    if lib is None:
        return None
    import numpy as np

    fn = lib.jpegll_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                   ctypes.POINTER(ctypes.c_int)]

    def decode(data: bytes):
        # size the output exactly via a cheap SOF3 marker scan
        cap = 8192 * 8192
        idx = data.find(b"\xff\xc3")
        if 0 <= idx and idx + 9 < len(data):
            rows_s = int.from_bytes(data[idx + 5:idx + 7], "big")
            cols_s = int.from_bytes(data[idx + 7:idx + 9], "big")
            if rows_s and cols_s:
                cap = rows_s * cols_s
        out = np.empty(cap, np.uint16)
        rows = ctypes.c_int()
        cols = ctypes.c_int()
        prec = ctypes.c_int()
        rc = fn(data, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap,
                ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(prec))
        if rc != 0:
            raise ValueError(f"native JPEG-lossless decode failed (code {rc})")
        arr = out[:rows.value * cols.value].reshape(rows.value, cols.value).copy()
        return arr.astype(np.uint8) if prec.value <= 8 else arr

    return decode
