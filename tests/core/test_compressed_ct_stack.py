"""End-to-end: a CT stack written with compressed transfer syntaxes loads
through the product image stack and analyzes identically to the
uncompressed original (reference reads compressed exports via pydicom,
``/root/reference/pylinac/core/image.py:1369``)."""

import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

from pylinac_tpu.core import dcm, image


@pytest.fixture(scope="module")
def ct_dir():
    from pylinac_tpu.imggen.ct import generate_catphan504

    tmp = tempfile.mkdtemp()
    generate_catphan504(tmp, num_slices=24, slice_thickness_mm=2.5)
    return tmp


@pytest.mark.parametrize("ts", [dcm.RLE_LOSSLESS, dcm.JPEG_LS_LOSSLESS,
                                dcm.J2K_LOSSLESS])
def test_stack_roundtrip_compressed(ct_dir, ts, tmp_path):
    files = sorted(Path(ct_dir).glob("*.dcm"))[:8]
    out_dir = tmp_path / ts.split(".")[-1]
    out_dir.mkdir()
    for f in files:
        ds = dcm.dcmread(f)
        dcm.dcmwrite(out_dir / f.name, ds, transfer_syntax=ts)
    ref = image.DicomImageStack(ct_dir, min_number=4)
    comp = image.DicomImageStack(out_dir, min_number=4)
    assert len(comp.images) == 8
    for c in comp.images:
        # match against the same source slice by z position
        match = min(ref.images, key=lambda r: abs(r.z_position - c.z_position))
        np.testing.assert_array_equal(np.asarray(c.array), np.asarray(match.array))
