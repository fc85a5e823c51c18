"""Host-side stateless array utilities, API-parity with the reference
(``/root/reference/pylinac/core/array_utils.py``).

Filtering routes through the JAX kernels in :mod:`pylinac_tpu.ops.filters`
so host and device paths share one implementation.
"""

from __future__ import annotations

import numpy as np

from ..ops import filters as _jf


def geometric_center_idx(array: np.ndarray) -> float:
    """Center index of a profile ((n-1)/2)."""
    return (array.shape[0] - 1) / 2.0


def geometric_center_value(array: np.ndarray) -> float:
    """Center value of a profile (mean of the two central samples when even)."""
    n = array.shape[0]
    if n % 2 == 0:
        return (array[n // 2] + array[n // 2 - 1]) / 2.0
    return array[(n - 1) // 2]


def normalize(array: np.ndarray, value: float | None = None) -> np.ndarray:
    val = array.max() if value is None else value
    return array / val


def invert(array: np.ndarray) -> np.ndarray:
    """Value inversion: max+min-a (dtype-agnostic)."""
    return -array + array.max() + array.min()


def bit_invert(array: np.ndarray) -> np.ndarray:
    """Bitwise inversion (dtype-specific)."""
    try:
        return np.invert(array)
    except TypeError:
        raise ValueError(
            f"The datatype {array.dtype} could not be safely inverted. "
            "Cast to an integer-like datatype first."
        )


def ground(array: np.ndarray, value: float = 0) -> np.ndarray:
    return array - array.min() + value


def filter(array: np.ndarray, size: float | int = 0.05, kind: str = "median") -> np.ndarray:
    """Median/Gaussian filter with ratio-or-absolute size semantics."""
    if isinstance(size, float):
        if 0 < size < 1:
            size = int(round(len(array) * size))
            size = max(size, 1)
        else:
            raise ValueError("Float was passed but was not between 0 and 1")
    from ..ops import route

    if kind == "median":
        out = _jf.median_filter(route.put(np.asarray(array)), int(size))
    elif kind == "gaussian":
        out = _jf.gaussian_filter(
            route.put(np.asarray(array, dtype=np.float32)), float(size))
    else:
        raise ValueError(f"Filter type {kind} unsupported. Use 'median' or 'gaussian'")
    return np.asarray(out).astype(array.dtype if kind == "median" else np.float32)


def stretch(array: np.ndarray, min: float = 0, max: float = 1) -> np.ndarray:
    """Ground + normalize to fit [min, max]."""
    if max <= min:
        raise ValueError(f"Max must be larger than min. Passed max of {max} was <= {min}")
    dtype_info = get_dtype_info(array.dtype)
    if max > dtype_info.max:
        raise ValueError(f"Max of {max} larger than datatype maximum {dtype_info.max}")
    if min < dtype_info.min:
        raise ValueError(f"Min of {min} smaller than datatype minimum {dtype_info.min}")
    return ground(normalize(ground(array)) * (max - min), value=min)


def get_dtype_info(dtype) -> np.iinfo | np.finfo:
    try:
        return np.iinfo(dtype)
    except ValueError:
        return np.finfo(dtype)


def convert_to_dtype(array: np.ndarray, dtype) -> np.ndarray:
    """Range-preserving dtype conversion (value 100 of uint8 → ~25,690 of uint16)."""
    old_info = get_dtype_info(array.dtype)
    if isinstance(old_info, np.finfo):
        relative_values = stretch(array, min=0, max=1)
    else:
        relative_values = array.astype(float) / old_info.max
    new_info = get_dtype_info(dtype)
    new_range = new_info.max - new_info.min
    return np.array(relative_values * new_range - new_info.max - 1, dtype=dtype)


def find_nearest_idx(array: np.ndarray, value: float) -> int:
    return int((np.abs(array - value)).argmin())


def fill_middle_zeros(array: np.ndarray, cutoff_px: int = 0) -> np.ndarray:
    """Fill 0s that are surrounded by 1s (used for light/rad field masks)."""
    array = array.astype(float)
    if np.max(array) > 1 or np.min(array) < 0:
        raise ValueError("Array values must be between 0 and 1")
    if cutoff_px:
        array[:cutoff_px] = 0
        array[-cutoff_px:] = 0
    edges = np.diff(array)
    left_edge = np.min(np.where(edges > 0.5)[0])
    right_edge = np.max(np.where(edges < -0.5)[0])
    filled = array.copy()
    filled[left_edge + 1: right_edge + 1] = 1.0
    return filled


def is_monotonically_increasing(array: np.ndarray) -> bool:
    return bool(np.all(np.diff(array) > 0))


def is_monotonically_decreasing(array: np.ndarray) -> bool:
    return bool(np.all(np.diff(array) < 0))


def is_monotonic(array: np.ndarray) -> bool:
    return is_monotonically_increasing(array) or is_monotonically_decreasing(array)


def _rt_image_position(array: np.ndarray, dpmm: float) -> list[float]:
    """RT Image Position tag value for an array centered at the origin."""
    rows, cols = array.shape
    px = 1.0 / dpmm
    return [-(cols * px / 2) + px / 2, -(rows * px / 2) + px / 2]


def array_to_dicom(
    array: np.ndarray,
    sid: float,
    gantry: float,
    coll: float,
    couch: float,
    dpi: float | None = None,
    extra_tags: dict | None = None,
):
    """Construct an RT Image DICOM dataset from a 2D array
    (reference ``core/array_utils.py:216``)."""
    from . import dcm

    if array.ndim != 2:
        raise ValueError("Array must be 2D")
    ds = dcm.Dataset()
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.481.1"  # RT Image Storage
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.StudyInstanceUID = dcm.generate_uid()
    ds.SeriesInstanceUID = dcm.generate_uid()
    ds.Modality = "RTIMAGE"
    ds.ImageType = ["ORIGINAL", "PRIMARY", "PORTAL"]
    ds.PatientName = "pylinac-tpu"
    ds.PatientID = "123456789"
    ds.RTImageSID = sid
    ds.RadiationMachineSAD = 1000.0
    ds.GantryAngle = gantry
    ds.BeamLimitingDeviceAngle = coll
    ds.PatientSupportAngle = couch
    if dpi is not None:
        dpmm = dpi / 25.4
        pixel_mm = 1.0 / dpmm
        ds.ImagePlanePixelSpacing = [pixel_mm, pixel_mm]
        ds.RTImagePosition = _rt_image_position(array, dpmm)
    if array.dtype.kind == "f":
        array = convert_to_dtype(array, np.uint16)
    ds.set_pixel_data(np.ascontiguousarray(array))
    if extra_tags:
        for key, value in extra_tags.items():
            setattr(ds, key, value)
    return ds

def create_dicom_files_from_3d_array(
    array: np.ndarray,
    out_dir=None,
    slice_thickness: float = 1,
    pixel_size: float = 1,
):
    """Write a 3D array as a pseudo-CT DICOM series, one file per slice along
    the last axis (reference ``core/array_utils.py:314``)."""
    import tempfile
    from pathlib import Path

    from . import dcm

    series_uid = dcm.generate_uid()
    out_dir = Path(out_dir) if out_dir is not None else Path(tempfile.mkdtemp())
    out_dir.mkdir(exist_ok=True, parents=True)
    for i in range(array.shape[-1]):
        arr = array[..., i].astype(np.uint16)
        ds = array_to_dicom(
            arr, sid=1000, gantry=0, coll=0, couch=0, dpi=25.4,
            extra_tags={
                "SeriesInstanceUID": series_uid,
                "ImagePositionPatient": [0.0, 0.0, float(i * slice_thickness)],
                "SliceThickness": slice_thickness,
                "PixelSpacing": [float(pixel_size), float(pixel_size)],
            })
        dcm.dcmwrite(out_dir / f"{i}.dcm", ds)
    return out_dir
