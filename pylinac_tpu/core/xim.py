"""Varian .xim image reader (+ a test-oriented writer).

Format parity with the reference's ``XIM`` class (``core/image.py:1105``),
but the diff decompression is **fully vectorized**: the XIM recurrence
``a[k] = diff[k] + a[k-1] + a[k-W] - a[k-W-1]`` factors into two cumulative
sums (flat cumsum of diffs, then a column cumsum), so the whole decode is a
handful of numpy array ops instead of the reference's sequential per-row
Python loop (``core/image.py:1207-1267``) — no native code needed.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, BinaryIO

import numpy as np

XIM_PROP_INT = 0
XIM_PROP_DOUBLE = 1
XIM_PROP_STRING = 2
XIM_PROP_DOUBLE_ARRAY = 4
XIM_PROP_INT_ARRAY = 5


def _read_int(f: BinaryIO) -> int:
    return struct.unpack("<i", f.read(4))[0]


def _read_double(f: BinaryIO) -> float:
    return struct.unpack("<d", f.read(8))[0]


def _read_str(f: BinaryIO, n: int) -> str:
    return f.read(n).decode("latin-1")


def is_xim(path: str | Path) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(8).decode("latin-1", "replace").startswith("VMS.XI")
    except Exception:
        return False


def _expand_lookup_table(lut_bytes: np.ndarray, n_diffs: int) -> np.ndarray:
    """Expand the 2-bit-per-entry lookup table to per-diff byte-size codes."""
    bit_shift = np.array([0, 2, 4, 6], dtype=np.uint8)
    codes = ((lut_bytes[:, None] >> bit_shift[None, :]) & 0b11).ravel()
    return codes[:n_diffs]


def _decode_diffs(buf: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Vectorized variable-length little-endian signed int decode.

    ``codes``: 0 → 1 byte, 1 → 2 bytes, 2 → 4 bytes.
    """
    sizes = np.left_shift(1, codes.astype(np.int64))  # 1, 2, 4
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    b = buf.astype(np.int64)
    n_total = len(buf)

    def byte(i):
        idx = offsets + i
        return np.where(idx < n_total, b[np.minimum(idx, n_total - 1)], 0)

    b0, b1, b2, b3 = byte(0), byte(1), byte(2), byte(3)
    v1 = ((b0 ^ 0x80) - 0x80)
    v2_raw = b0 | (b1 << 8)
    v2 = (v2_raw ^ 0x8000) - 0x8000
    v4_raw = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    v4 = (v4_raw ^ 0x80000000) - 0x80000000
    return np.where(codes == 0, v1, np.where(codes == 1, v2, v4))


def _decode_native(buf: np.ndarray, lut: np.ndarray, width: int,
                   height: int) -> np.ndarray | None:
    """Single-pass C++ stream decode (``native/xim_decode.cpp``); None on
    any failure so the caller falls back to the vectorized numpy path."""
    import ctypes

    from ..native import load_library

    lib = load_library("xim_decode")
    if lib is None:
        return None
    fn = lib.xim_decode
    fn.restype = ctypes.c_int
    out = np.empty(height * width, dtype=np.int32)
    buf = np.ascontiguousarray(buf)
    lut = np.ascontiguousarray(lut)
    rc = fn(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.nbytes),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(lut.nbytes),
        ctypes.c_int64(width), ctypes.c_int64(height),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out.reshape(height, width)


def _reconstruct(first_vals: np.ndarray, diffs: np.ndarray, width: int, height: int) -> np.ndarray:
    """Invert the XIM 2D differencing with two cumsums.

    ``first_vals``: the W+1 uncompressed int32 values (row 0 + a[1,0]).
    ``diffs``: the remaining H*W - W - 1 diff values (flat order).
    """
    n = width * height
    a = np.zeros(n, dtype=np.int64)
    a[: width + 1] = first_vals
    # b[k] = a[k] - a[k-width] for k >= width; b[width] = a[width] - a[0];
    # b[k] = b[k-1] + diff[k] → flat cumsum
    b = np.zeros(n - width, dtype=np.int64)
    b[0] = a[width] - a[0]
    b[1:] = diffs
    b = np.cumsum(b)
    # a[k] = b[k] + a[k-width] → column cumsum of b reshaped under row 0
    b2 = b.reshape(height - 1, width)
    rows = np.cumsum(np.vstack([a[:width][None, :], b2]), axis=0)
    return rows


class XimImage:
    """Parsed .xim file: ``array`` (2D int array) + ``properties`` dict."""

    def __init__(self, path: str | Path | BinaryIO, read_pixels: bool = True):
        if hasattr(path, "read"):
            f = path
            self.path = getattr(path, "name", "")
            self._parse(f, read_pixels)
        else:
            self.path = str(path)
            with open(path, "rb") as f:
                self._parse(f, read_pixels)

    def _parse(self, f: BinaryIO, read_pixels: bool) -> None:
        self.format_id = _read_str(f, 8)
        if not self.format_id.startswith("VMS.XI"):
            raise ValueError(f"Not a XIM file: format id {self.format_id!r}")
        self.format_version = _read_int(f)
        self.img_width_px = _read_int(f)
        self.img_height_px = _read_int(f)
        self.bits_per_pixel = _read_int(f)
        self.bytes_per_pixel = _read_int(f)
        self.compression = _read_int(f)
        self.array = None
        w, h = self.img_width_px, self.img_height_px
        if not self.compression:
            buf_size = _read_int(f)
            raw = np.frombuffer(f.read(buf_size), dtype=f"<i{self.bytes_per_pixel}")
            if read_pixels:
                self.array = raw.reshape(h, w).copy()
        else:
            lut_size = _read_int(f)
            lut = np.frombuffer(f.read(lut_size), dtype=np.uint8)
            buf_size = _read_int(f)
            buf = np.frombuffer(f.read(buf_size), dtype=np.uint8)
            _ = _read_int(f)  # uncompressed buffer size (unused)
            if read_pixels:
                dtype = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[self.bytes_per_pixel]
                native = _decode_native(buf, lut, w, h)
                if native is not None:
                    self.array = native.astype(dtype)
                else:
                    n_diffs = h * w - w - 1
                    codes = _expand_lookup_table(lut, n_diffs)
                    first_vals = buf[: (w + 1) * 4].view("<i4").astype(np.int64)
                    diffs = _decode_diffs(buf[(w + 1) * 4:], codes)
                    self.array = _reconstruct(first_vals, diffs, w, h).astype(dtype)
        self.num_hist_bins = _read_int(f)
        self.histogram = list(
            struct.unpack(f"<{self.num_hist_bins}i", f.read(4 * self.num_hist_bins))
        )
        self.num_properties = _read_int(f)
        self.properties: dict[str, Any] = {}
        for _i in range(self.num_properties):
            name_len = _read_int(f)
            name = _read_str(f, name_len)
            ptype = _read_int(f)
            if ptype == XIM_PROP_INT:
                value = _read_int(f)
            elif ptype == XIM_PROP_DOUBLE:
                value = _read_double(f)
            elif ptype == XIM_PROP_STRING:
                nb = _read_int(f)
                value = _read_str(f, nb)
            elif ptype == XIM_PROP_DOUBLE_ARRAY:
                nb = _read_int(f)
                value = np.frombuffer(f.read(nb), dtype="<f8")
            elif ptype == XIM_PROP_INT_ARRAY:
                nb = _read_int(f)
                value = np.frombuffer(f.read(nb), dtype="<i4")
            else:
                raise ValueError(f"Unknown XIM property type {ptype}")
            self.properties[name] = value

    @property
    def dpmm(self) -> float:
        """dots/mm; the XIM PixelWidth/Height properties are in cm."""
        if self.properties["PixelWidth"] != self.properties["PixelHeight"]:
            raise ValueError("XIM pixel height and width differ")
        return 1 / (10 * self.properties["PixelHeight"])

    def as_dicom(self):
        """Convert to an RT Image DICOM dataset (Varian Standard → IEC 61217)."""
        from .array_utils import array_to_dicom
        from .scale import MachineScale, convert

        iec_g, iec_c, iec_p = convert(
            input_scale=MachineScale.VARIAN_STANDARD,
            output_scale=MachineScale.IEC61217,
            gantry=self.properties["GantryRtn"],
            collimator=self.properties["MVCollimatorRtn"],
            rotation=self.properties["CouchRtn"],
        )
        return array_to_dicom(
            array=self.array, dpi=25.4 * self.dpmm,
            gantry=iec_g, coll=iec_c, couch=iec_p, sid=1000,
        )

    def save_as(self, file: str | Path, format: str | None = None) -> None:
        """Save to a standard image format (PNG keeps properties as text tags)."""
        from PIL import Image
        from PIL.PngImagePlugin import PngInfo

        img = Image.fromarray(self.array)
        metadata = PngInfo()
        for prop, value in self.properties.items():
            if isinstance(value, np.ndarray):
                value = value.tolist()
            if not isinstance(value, str):
                value = json.dumps(value)
            metadata.add_text(prop, value)
        img.save(file, format=format, pnginfo=metadata)


def write_xim(path: str | Path, array: np.ndarray, properties: dict | None = None) -> None:
    """Write a compressed .xim file (used for tests & synthetic data)."""
    array = np.asarray(array)
    h, w = array.shape
    flat = array.astype(np.int64).ravel()
    # forward difference transform
    diffs = np.zeros(h * w - w - 1, dtype=np.int64)
    k = np.arange(w + 1, h * w)
    diffs = flat[k] - flat[k - 1] - flat[k - w] + flat[k - w - 1]
    # choose byte size per diff
    codes = np.where(
        (diffs >= -128) & (diffs <= 127), 0,
        np.where((diffs >= -32768) & (diffs <= 32767), 1, 2),
    ).astype(np.uint8)
    # pack 2-bit codes, 4 per byte
    pad = (-len(codes)) % 4
    codes_p = np.concatenate([codes, np.zeros(pad, np.uint8)])
    lut = (codes_p[0::4] | (codes_p[1::4] << 2) | (codes_p[2::4] << 4) | (codes_p[3::4] << 6))
    # encode diffs
    chunks = [flat[: w + 1].astype("<i4").tobytes()]
    for d, c in zip(diffs, codes):
        if c == 0:
            chunks.append(struct.pack("<b", int(d)))
        elif c == 1:
            chunks.append(struct.pack("<h", int(d)))
        else:
            chunks.append(struct.pack("<i", int(d)))
    buf = b"".join(chunks)

    props = properties or {}
    lo, hi = int(flat.min()), int(flat.max())
    if -128 <= lo and hi <= 127:
        bpp = 1
    elif -32768 <= lo and hi <= 32767:
        bpp = 2
    else:
        bpp = 4
    with open(path, "wb") as f:
        f.write(b"VMS.XI\x00\x00")
        f.write(struct.pack("<i", 3))
        f.write(struct.pack("<i", w))
        f.write(struct.pack("<i", h))
        f.write(struct.pack("<i", bpp * 8))
        f.write(struct.pack("<i", bpp))
        f.write(struct.pack("<i", 1))  # compressed
        f.write(struct.pack("<i", len(lut)))
        f.write(lut.tobytes())
        f.write(struct.pack("<i", len(buf)))
        f.write(buf)
        f.write(struct.pack("<i", h * w * 2))
        hist = np.zeros(8, dtype=np.int32)
        f.write(struct.pack("<i", len(hist)))
        f.write(hist.tobytes())
        f.write(struct.pack("<i", len(props)))
        for name, value in props.items():
            f.write(struct.pack("<i", len(name)))
            f.write(name.encode("latin-1"))
            if isinstance(value, int):
                f.write(struct.pack("<i", XIM_PROP_INT))
                f.write(struct.pack("<i", value))
            elif isinstance(value, float):
                f.write(struct.pack("<i", XIM_PROP_DOUBLE))
                f.write(struct.pack("<d", value))
            elif isinstance(value, str):
                f.write(struct.pack("<i", XIM_PROP_STRING))
                f.write(struct.pack("<i", len(value)))
                f.write(value.encode("latin-1"))
            else:
                arr = np.asarray(value, dtype="<f8")
                f.write(struct.pack("<i", XIM_PROP_DOUBLE_ARRAY))
                f.write(struct.pack("<i", arr.nbytes))
                f.write(arr.tobytes())
