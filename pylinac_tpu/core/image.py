"""Host image model: universal loading + the in-memory image classes.

API parity with the reference (``/root/reference/pylinac/core/image.py``):
``load()``, ``BaseImage``/``DicomImage``/``LinacDicomImage``/``FileImage``/
``ArrayImage``/``XIM`` and the CT stacks.  The host holds numpy arrays and
DICOM metadata; analysis modules push pixel tensors to the TPU via
:mod:`pylinac_tpu.ops`.
"""

from __future__ import annotations

import io as _io
import os.path as osp
import re
import warnings
from datetime import datetime
from io import BufferedReader, BytesIO
from pathlib import Path
from typing import Any, BinaryIO, Sequence, Union

import numpy as np

from . import dcm
from .array_utils import (
    bit_invert,
    convert_to_dtype,
    filter as _filter_array,
    get_dtype_info,
    ground,
    invert,
    normalize,
    stretch as stretcharray,
)
from .geometry import Point
from .io import is_dicom_image, retrieve_filenames
from .xim import XimImage, is_xim

MM_PER_INCH = 25.4
FILE_TYPE = "file"
STREAM_TYPE = "stream"

ImageLike = Union["DicomImage", "ArrayImage", "FileImage", "LinacDicomImage"]


def equate_images(image1: BaseImage, image2: BaseImage) -> tuple[BaseImage, BaseImage]:
    """Crop and resample two images so their physical size & resolution match
    (reference ``core/image.py:equate_images``)."""
    import math

    image1 = ArrayImage(np.copy(image1.array), dpi=image1.dpi)
    image2 = ArrayImage(np.copy(image2.array), dpi=image2.dpi)
    # crop to the same physical size
    phys_h1, phys_w1 = image1.physical_shape
    phys_h2, phys_w2 = image2.physical_shape
    if phys_h1 > phys_h2:
        diff = int(round((phys_h1 - phys_h2) * image1.dpmm / 2))
        if diff > 0:
            image1.crop(diff, edges=("top", "bottom"))
    elif phys_h2 > phys_h1:
        diff = int(round((phys_h2 - phys_h1) * image2.dpmm / 2))
        if diff > 0:
            image2.crop(diff, edges=("top", "bottom"))
    if phys_w1 > phys_w2:
        diff = int(round((phys_w1 - phys_w2) * image1.dpmm / 2))
        if diff > 0:
            image1.crop(diff, edges=("left", "right"))
    elif phys_w2 > phys_w1:
        diff = int(round((phys_w2 - phys_w1) * image2.dpmm / 2))
        if diff > 0:
            image2.crop(diff, edges=("left", "right"))
    # resample the higher-res image down to the lower-res grid
    if image1.shape != image2.shape:
        from ..ops.interp import map_coordinates
        import jax.numpy as jnp

        target_shape = (min(image1.shape[0], image2.shape[0]),
                        min(image1.shape[1], image2.shape[1]))
        for img in (image1, image2):
            if img.shape != target_shape:
                rr = np.linspace(0, img.shape[0] - 1, target_shape[0])
                cc = np.linspace(0, img.shape[1] - 1, target_shape[1])
                grid = np.stack(np.meshgrid(rr, cc, indexing="ij"))
                img.array = np.asarray(
                    map_coordinates(jnp.asarray(img.array, jnp.float32), grid, order=1)
                )
    return image1, image2


def load(path, **kwargs) -> ImageLike:
    """Load a DICOM, image file, XIM, or numpy array (reference ``load:244``)."""
    if isinstance(path, BaseImage):
        return path
    if _is_array(path):
        return ArrayImage(path, **kwargs)
    elif _is_dicom(path):
        return DicomImage(path, **kwargs)
    elif _is_xim_file(path):
        return XIM(path, **kwargs)
    elif _is_image_file(path):
        return FileImage(path, **kwargs)
    raise TypeError(
        f"The argument `{path}` was not found to be a valid DICOM file, Image file, or array"
    )


def load_url(url: str, progress_bar: bool = True, **kwargs) -> ImageLike:
    from .io import get_url

    filename = get_url(url, progress_bar=progress_bar)
    return load(filename, **kwargs)


def load_multiples(
    image_file_list: Sequence,
    method: str = "mean",
    stretch_each: bool = True,
    loader=load,
    **kwargs,
) -> ImageLike:
    """Combine multiple images into one (reference ``load_multiples:306``)."""
    img_list = [loader(path, **kwargs) for path in image_file_list]
    first_img = img_list[0]
    for img in img_list:
        if img.shape != first_img.shape:
            raise ValueError("Images were not the same shape")
        if stretch_each:
            img.array = stretcharray(img.array)
    new_array = np.stack([img.array for img in img_list], axis=-1)
    if method == "mean":
        combined = np.mean(new_array, axis=-1)
    elif method == "max":
        combined = np.max(new_array, axis=-1)
    elif method == "sum":
        combined = np.sum(new_array, axis=-1)
    else:
        raise ValueError(f"Unknown combination method {method}")
    first_img.array = combined
    first_img._raw_pixels = True
    return first_img


def _rescale_dicom_values(unscaled, metadata, raw_pixels, invert_pixels):
    """Apply rescale slope/intercept and intensity-sign inversion
    (reference ``core/image.py:363``)."""
    if raw_pixels:
        return unscaled
    slope = metadata.get("RescaleSlope")
    intercept = metadata.get("RescaleIntercept")
    scaled = unscaled
    if slope is not None and intercept is not None:
        scaled = unscaled * slope + intercept
    sign = metadata.get("PixelIntensityRelationshipSign")
    if invert_pixels or (invert_pixels is None and sign == -1):
        scaled = scaled.max() - scaled + scaled.min()
    return scaled


def _unscale_dicom_values(scaled, metadata, raw_pixels, invert_pixels):
    if raw_pixels:
        return scaled
    sign = metadata.get("PixelIntensityRelationshipSign")
    if invert_pixels or (invert_pixels is None and sign == -1):
        unscaled = scaled.max() + scaled.min() - scaled
    else:
        unscaled = scaled
    slope = metadata.get("RescaleSlope")
    intercept = metadata.get("RescaleIntercept")
    if slope is not None and intercept is not None:
        unscaled = (unscaled - intercept) / slope
    return unscaled


def _is_dicom(path) -> bool:
    try:
        return is_dicom_image(path)
    except Exception:
        return False


def _is_image_file(path) -> bool:
    try:
        from PIL import Image as pImage

        with pImage.open(path):
            return True
    except Exception:
        return False


def _is_xim_file(path) -> bool:
    try:
        return is_xim(path)
    except Exception:
        return False


def _is_array(obj) -> bool:
    return isinstance(obj, np.ndarray)


class BaseImage:
    """Base class for images: a numpy pixel array + path/metric machinery."""

    array: np.ndarray
    path: str | Path

    @property
    def truncated_path(self) -> str:
        """Shortened path for report display (reference ``image.py:285``)."""
        p = str(getattr(self, "path", ""))
        if len(p) > 50:
            return "..." + p[-47:]
        return p

    def __init__(self, path):
        super().__init__()
        self.metrics: list = []
        self.metric_values: dict[str, Any] = {}
        if isinstance(path, (str, Path)) and not osp.isfile(path):
            raise FileExistsError(
                f"File `{path}` does not exist. Verify the file path name.")
        elif isinstance(path, (str, Path)):
            self.path = path
            self.base_path = osp.basename(path)
            self.source = FILE_TYPE
        else:
            self.source = STREAM_TYPE
            try:
                path.seek(0)
            except Exception:
                pass
            try:
                self.path = str(Path(path.name))
            except AttributeError:
                self.path = ""

    @classmethod
    def from_multiples(cls, filelist, method="mean", stretch=True, **kwargs):
        return load_multiples(filelist, method, stretch, **kwargs)

    @property
    def center(self) -> Point:
        return Point((self.shape[1] / 2) - 0.5, (self.shape[0] / 2) - 0.5)

    @property
    def physical_shape(self) -> tuple[float, float]:
        return self.shape[0] / self.dpmm, self.shape[1] / self.dpmm

    def date_created(self, format: str = "%A, %B %d, %Y") -> str:
        date = None
        try:
            date = datetime.strptime(
                self.metadata.InstanceCreationDate
                + str(round(float(self.metadata.InstanceCreationTime))),
                "%Y%m%d%H%M%S",
            ).strftime(format)
        except Exception:
            try:
                date = datetime.strptime(self.metadata.StudyDate, "%Y%m%d").strftime(format)
            except Exception:
                pass
        if date is None:
            try:
                date = datetime.fromtimestamp(osp.getctime(self.path)).strftime(format)
            except Exception:
                date = "Unknown"
        return date

    # --- array ops ---------------------------------------------------------
    def filter(self, size: float | int = 0.05, kind: str = "median") -> None:
        self.array = _filter_array(self.array, size=size, kind=kind)

    def crop(self, pixels: int = 15, edges: tuple[str, ...] = ("top", "bottom", "left", "right")) -> None:
        if pixels < 0:
            raise ValueError("Pixels to remove must be a positive number")
        if pixels == 0:
            return
        if "top" in edges:
            self.array = self.array[pixels:, :]
        if "bottom" in edges:
            self.array = self.array[:-pixels, :]
        if "left" in edges:
            self.array = self.array[:, pixels:]
        if "right" in edges:
            self.array = self.array[:, :-pixels]
        if self.array.size == 0:
            raise ValueError("Too many pixels removed; array is empty")

    def flipud(self) -> None:
        self.array = np.flipud(self.array)

    def fliplr(self) -> None:
        self.array = np.fliplr(self.array)

    def invert(self) -> None:
        self.array = invert(self.array)

    def bit_invert(self) -> None:
        self.array = bit_invert(self.array)

    def roll(self, direction: str = "x", amount: int = 1) -> None:
        axis = 1 if direction == "x" else 0
        self.array = np.roll(self.array, amount, axis=axis)

    def rot90(self, n: int = 1) -> None:
        self.array = np.rot90(self.array, n)

    def rotate(self, angle: float, mode: str = "edge", *args, **kwargs) -> None:
        """Rotate CCW by ``angle`` degrees (bilinear, edge-padded)."""
        import jax.numpy as jnp

        from ..ops.interp import map_coordinates

        h, w = self.array.shape
        cy, cx = (h - 1) / 2, (w - 1) / 2
        theta = np.deg2rad(angle)
        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        # inverse rotation mapping
        ys = cy + np.cos(theta) * (yy - cy) - np.sin(theta) * (xx - cx)
        xs = cx + np.sin(theta) * (yy - cy) + np.cos(theta) * (xx - cx)
        ys = np.clip(ys, 0, h - 1)
        xs = np.clip(xs, 0, w - 1)
        self.array = np.asarray(
            map_coordinates(jnp.asarray(self.array, jnp.float32), np.stack([ys, xs]), order=1)
        )

    def threshold(self, threshold: float, kind: str = "high") -> None:
        if kind == "high":
            self.array = np.where(self.array >= threshold, self.array, 0)
        else:
            self.array = np.where(self.array <= threshold, self.array, 0)

    def as_binary(self, threshold: float) -> ArrayImage:
        return ArrayImage(np.where(self.array >= threshold, 1, 0))

    def dist2edge_min(self, point: Point | tuple) -> float:
        if isinstance(point, tuple):
            point = Point(point)
        rows, cols = self.shape[0], self.shape[1]
        return min(rows - point.y, cols - point.x, point.y, point.x)

    def ground(self) -> float:
        min_val = self.array.min()
        self.array = ground(self.array)
        return min_val

    def normalize(self, norm_val=None) -> None:
        if norm_val == "max":
            norm_val = None
        self.array = normalize(self.array, value=norm_val)

    def check_inversion(self, box_size: int = 20, position: tuple[float, float] = (0.0, 0.0)) -> None:
        """Invert if the 4 corner-sample mean is above the image mean
        (reference ``core/image.py:867``)."""
        row_pos = max(int(position[0] * self.array.shape[0]), 1)
        col_pos = max(int(position[1] * self.array.shape[1]), 1)
        lt_upper = self.array[row_pos: row_pos + box_size, col_pos: col_pos + box_size]
        rt_upper = self.array[row_pos: row_pos + box_size, -col_pos - box_size: -col_pos]
        lt_lower = self.array[-row_pos - box_size: -row_pos, col_pos: col_pos + box_size]
        rt_lower = self.array[-row_pos - box_size: -row_pos, -col_pos - box_size: -col_pos]
        avg = np.mean((lt_upper, lt_lower, rt_upper, rt_lower))
        if avg > np.mean(self.array.flatten()):
            self.invert()

    def check_inversion_by_histogram(self, percentiles=(5, 50, 95)) -> bool:
        """Invert when the median is closer to the high percentile
        (reference ``core/image.py:898``)."""
        was_inverted = False
        p_low = np.percentile(self.array, percentiles[0])
        p_mid = np.percentile(self.array, percentiles[1])
        p_high = np.percentile(self.array, percentiles[2])
        if abs(p_mid - p_low) > abs(p_mid - p_high):
            was_inverted = True
            self.invert()
        return was_inverted

    def gamma(self, comparison_image: BaseImage, doseTA: float = 1, distTA: float = 1,
              threshold: float = 0.1, ground: bool = True, normalize: bool = True) -> np.ndarray:
        """Bakai-approximation gamma vs a comparison image (device kernel)."""
        import jax.numpy as jnp

        from ..ops.gamma import gamma_bakai

        def _is_close(a, b, delta):
            return abs(a - b) <= delta

        if not _is_close(self.dpi, comparison_image.dpi, delta=0.1):
            raise AttributeError(
                f"The image DPIs do not match: {self.dpi:.2f} vs. {comparison_image.dpi:.2f}")
        if not (_is_close(self.shape[1], comparison_image.shape[1], 1.1)
                and _is_close(self.shape[0], comparison_image.shape[0], 1.1)):
            raise AttributeError(
                f"The images are not the same size: {self.shape} vs. {comparison_image.shape}")
        # histogram-based inversion check on copies, mirroring reference
        ref = ArrayImage(np.copy(self.array))
        ref.check_inversion_by_histogram()
        comp = ArrayImage(np.copy(comparison_image.array))
        comp.check_inversion_by_histogram()
        return np.asarray(gamma_bakai(
            jnp.asarray(ref.array, jnp.float32), jnp.asarray(comp.array, jnp.float32),
            dpmm=self.dpmm, doseTA=doseTA, distTA=distTA, threshold=threshold,
            ground=ground, normalize=normalize,
        ))

    def compute(self, metrics) -> Any:
        """Compute plugin image metrics (reference ``core/image.py:1022``)."""
        from ..metrics.image import MetricBase

        values = {}
        if isinstance(metrics, MetricBase):
            metrics = [metrics]
        for metric in metrics:
            metric.inject_image(self)
            self.metrics.append(metric)
            value = metric.context_calculate()
            key = metric.full_name
            suffix = 1
            while key in values or key in self.metric_values:
                suffix += 1
                key = f"{metric.full_name}{suffix}"
            values[key] = value
        self.metric_values.update(values)
        if len(values) == 1:
            return values[key]
        return values

    def as_dicom(self, *args, **kwargs):
        raise NotImplementedError(
            f"as_dicom is not implemented for {type(self).__name__}")

    def as_type(self, dtype) -> np.ndarray:
        return self.array.astype(dtype)

    @property
    def shape(self):
        return self.array.shape

    @property
    def size(self) -> int:
        return self.array.size

    @property
    def ndim(self) -> int:
        return self.array.ndim

    @property
    def dtype(self):
        return self.array.dtype

    def sum(self) -> float:
        return self.array.sum()

    def __getitem__(self, item):
        return self.array[item]

    def __array__(self, dtype=None, copy=None):
        # no-copy numpy protocol: without this, np.asarray(image) falls back
        # to element iteration and COPIES the frame (~1 ms per 512² slice —
        # the CatPhan module stage made hundreds of such calls per scan)
        if dtype is None or dtype == self.array.dtype:
            return self.array if not copy else self.array.copy()
        return self.array.astype(dtype)

    def __len__(self):
        return len(self.array)

    def __sub__(self, other):
        return ArrayImage(self.array - other.array)

    # --- plotting ----------------------------------------------------------
    def plot(self, ax=None, show: bool = True, clear_fig: bool = False,
             show_metrics: bool = True, metric_kwargs: dict | None = None, **kwargs):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots()
        if clear_fig:
            plt.clf()
        ax.imshow(self.array, cmap=kwargs.pop("cmap", "gray"), **kwargs)
        if show_metrics:
            for metric in self.metrics:
                try:
                    metric.plot(ax, **(metric_kwargs or {}))
                except Exception:
                    pass
        if show:
            plt.show()
        return ax

    def plotly(self, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError("plotly is not available in this environment")


class XIM(BaseImage):
    """A Varian .xim image (decoded by :mod:`pylinac_tpu.core.xim`)."""

    def __init__(self, file_path, read_pixels: bool = True):
        super().__init__(path=file_path)
        self._xim = XimImage(file_path, read_pixels=read_pixels)
        if self._xim.array is not None:
            self.array = self._xim.array

    @property
    def properties(self) -> dict:
        return self._xim.properties

    @property
    def dpmm(self) -> float:
        return self._xim.dpmm

    @property
    def dpi(self) -> float:
        return self.dpmm * MM_PER_INCH

    def as_dicom(self):
        return self._xim.as_dicom()

    def save_as(self, file, format=None):
        self._xim.save_as(file, format=format)


class DicomImage(BaseImage):
    """An image from a DICOM file (RT Image, CT slice, MR slice, NM frame)."""

    def __init__(self, path, *, dtype=None, dpi: float | None = None,
                 sid: float | None = None, sad: float = 1000,
                 raw_pixels: bool = False, invert_pixels: bool | None = None):
        super().__init__(path)
        self._sid = sid
        self._dpi = dpi
        self._sad = sad
        self.metadata = dcm.dcmread(path if isinstance(path, (str, Path, bytes)) else path.read())
        self._original_dtype = self.metadata.pixel_array.dtype
        self._raw_pixels = raw_pixels
        self._invert_pixels = invert_pixels
        arr = self.metadata.pixel_array
        self.array = arr.astype(dtype) if dtype is not None else arr.copy()
        self.array = _rescale_dicom_values(
            self.array, self.metadata, raw_pixels=raw_pixels, invert_pixels=invert_pixels)

    @classmethod
    def from_dataset(cls, dataset: dcm.Dataset):
        stream = _io.BytesIO()
        dcm.dcmwrite(stream, dataset)
        stream.seek(0)
        return cls(path=stream)

    def save(self, filename):
        """Save back out to DICOM, un-rescaling values (reference ``:1453``)."""
        unscaled = _unscale_dicom_values(
            self.array, self.metadata, self._raw_pixels, self._invert_pixels)
        info = get_dtype_info(self._original_dtype)
        if unscaled.max() > info.max or unscaled.min() < info.min:
            warnings.warn(
                "Pixel values outside original dtype range; normalizing to fit.")
            unscaled = convert_to_dtype(unscaled, self._original_dtype)
        if self._raw_pixels:
            unscaled = convert_to_dtype(unscaled, self._original_dtype)
        self.metadata.set_pixel_data(
            np.ascontiguousarray(unscaled.astype(self._original_dtype)))
        dcm.dcmwrite(filename, self.metadata)
        return filename

    @property
    def z_position(self) -> float:
        return z_position(self.metadata)

    @property
    def slice_spacing(self) -> float:
        spacing = self.metadata.get("SpacingBetweenSlices")
        if spacing is not None:
            return abs(spacing)
        return self.metadata.SliceThickness

    @property
    def sid(self) -> float | None:
        v = self.metadata.get("RTImageSID")
        if v is not None:
            try:
                return float(v)
            except (TypeError, ValueError):
                pass
        return self._sid

    @property
    def sad(self) -> float:
        v = self.metadata.get("RadiationMachineSAD")
        if v is not None:
            try:
                return float(v)
            except (TypeError, ValueError):
                pass
        return self._sad

    @property
    def dpi(self) -> float | None:
        try:
            return self.dpmm * MM_PER_INCH
        except Exception:
            return self._dpi

    @property
    def dpmm(self) -> float | None:
        """Dots-per-mm at isocenter, scaled by SID/SAD (reference ``:1534``)."""
        dpmm = None
        for tag in ("PixelSpacing", "ImagePlanePixelSpacing", "ImagerPixelSpacing"):
            mmpd = self.metadata.get(tag)
            if mmpd is not None:
                if isinstance(mmpd, (int, float)):
                    mmpd = [mmpd]
                dpmm = 1 / mmpd[0]
                break
        if dpmm is not None and self.sid is not None:
            dpmm *= self.sid / self.sad
        elif dpmm is None and self._dpi is not None:
            dpmm = self._dpi / MM_PER_INCH
        return dpmm

    @property
    def cax(self) -> Point:
        """Beam CAX accounting for EPID translations (reference ``:1550``)."""
        try:
            translation = self.metadata.XRayImageReceptorTranslation
            mag_factor = self.sid / self.sad
            x = self.center.x - translation[0] * self.dpmm / mag_factor
            y = self.center.y + translation[1] * self.dpmm / mag_factor
        except (AttributeError, ValueError, TypeError):
            return self.center
        return Point(x, y)

    def as_dicom(self) -> dcm.Dataset:
        return self.metadata


class LinacDicomImage(DicomImage):
    """DICOM image from a linac; gantry/coll/couch from tags or filename."""

    gantry_keyword = "Gantry"
    collimator_keyword = "Coll"
    couch_keyword = "Couch"

    def __init__(self, path, use_filenames: bool = False,
                 axes_precision: int | None = None,
                 missing_axis_value: float | str = 0, **kwargs):
        self._axis_overrides = {}
        for axis in ("gantry", "coll", "couch"):
            if axis in kwargs:
                self._axis_overrides[axis] = kwargs.pop(axis)
        super().__init__(path, **kwargs)
        self._use_filenames = use_filenames
        self._axes_precision = axes_precision
        self._missing_axis_value = missing_axis_value

    def _get_axis_value(self, axis_str: str, axis_dcm_attr: str, override_key: str) -> float:
        if override_key in self._axis_overrides:
            return float(self._axis_overrides[override_key])
        if self._use_filenames:
            filename = osp.basename(str(self.path))
            match = re.search(
                rf"(?<={axis_str})\d+\.?\d*", filename, flags=re.IGNORECASE)
            if match is None:
                if self._missing_axis_value == "raise":
                    raise ValueError(
                        f"The filename {filename} did not contain a {axis_str} value")
                return float(self._missing_axis_value)
            return self._round(float(match.group()))
        value = self.metadata.get(axis_dcm_attr)
        if value is None:
            if self._missing_axis_value == "raise":
                raise ValueError(f"No {axis_dcm_attr} tag found in the DICOM file")
            return float(self._missing_axis_value)
        return self._round(float(value))

    def _round(self, value: float) -> float:
        wrapped = value % 360
        if self._axes_precision is not None:
            wrapped = round(wrapped, self._axes_precision)
        if wrapped in (360.0,):
            wrapped = 0.0
        return wrapped

    @property
    def gantry_angle(self) -> float:
        return self._get_axis_value(self.gantry_keyword, "GantryAngle", "gantry")

    @property
    def collimator_angle(self) -> float:
        return self._get_axis_value(
            self.collimator_keyword, "BeamLimitingDeviceAngle", "coll")

    @property
    def couch_angle(self) -> float:
        return self._get_axis_value(self.couch_keyword, "PatientSupportAngle", "couch")


class FileImage(BaseImage):
    """An image from a standard image file (TIFF/PNG/JPEG via Pillow)."""

    def __init__(self, path, *, dpi: float | None = None, sid: float | None = None,
                 dtype=None):
        from PIL import Image as pImage

        super().__init__(path)
        pil_image = pImage.open(path)
        if pil_image.mode not in ("F", "I", "I;16", "L", "P"):
            pil_image = pil_image.convert("F")
        self.info = pil_image.info
        if dtype is not None:
            self.array = np.array(pil_image, dtype=dtype)
        else:
            self.array = np.array(pil_image)
        self._dpi = dpi
        self.sid = sid

    @property
    def dpi(self) -> float | None:
        dpi = None
        for key in ("dpi", "resolution"):
            dpi = self.info.get(key)
            if dpi is not None:
                dpi = float(dpi[0])
                if dpi < 3:
                    dpi = None
                break
        if dpi is None:
            dpi = self._dpi
        if self.sid is not None and dpi is not None:
            dpi *= self.sid / 1000
        return dpi

    @property
    def dpmm(self) -> float | None:
        try:
            return self.dpi / MM_PER_INCH
        except TypeError:
            return None


class ArrayImage(BaseImage):
    """An image constructed directly from a numpy array."""

    def __init__(self, array: np.ndarray, *, dpi: float | None = None,
                 sid: float | None = None, dtype=None):
        self.metrics = []
        self.metric_values = {}
        if dtype is not None:
            self.array = np.asarray(array, dtype=dtype)
        else:
            self.array = np.asarray(array)
        self._dpi = dpi
        self.sid = sid
        self.source = STREAM_TYPE
        self.path = ""

    @property
    def dpmm(self) -> float | None:
        try:
            return self.dpi / MM_PER_INCH
        except Exception:
            return None

    @property
    def dpi(self) -> float | None:
        dpi = None
        if self._dpi is not None:
            dpi = self._dpi
            if self.sid is not None:
                dpi *= self.sid / 1000
        return dpi

    def __sub__(self, other):
        return ArrayImage(self.array - other.array)


def z_position(metadata: dcm.Dataset) -> float:
    """Z position of a slice: ImagePositionPatient[2] or SliceLocation."""
    try:
        return float(metadata.ImagePositionPatient[2])
    except AttributeError:
        return float(metadata.SliceLocation)


# --------------------------------------------------------------------------
# CT stacks
# --------------------------------------------------------------------------
def _is_ct_slice(path) -> bool:
    try:
        ds = dcm.dcmread(path)
        # reference accepts any DICOM image here (its pseudo-CT generator
        # emits RTIMAGE datasets); only require pixel data
        return "PixelData" in ds
    except Exception:
        return False


class DicomImageStack:
    """An eager stack of DICOM CT/MR slices, z-sorted and UID-filtered
    (reference ``core/image.py:2115``)."""

    images: list[DicomImage]

    def __init__(self, folder, dtype=None, min_number: int = 39,
                 check_uid: bool = True, raw_pixels: bool = False):
        self.images = []
        paths = retrieve_filenames(folder)
        candidates = []
        for path in paths:
            if _is_ct_slice(path):
                candidates.append(DicomImage(path, dtype=dtype, raw_pixels=raw_pixels))
        if check_uid:
            candidates = self._filter_uid(candidates, min_number)
        candidates.sort(key=lambda img: img.z_position)
        self.images = candidates
        if len(self.images) < 2:
            raise FileNotFoundError(
                f"No CT images were found in {folder}")

    @staticmethod
    def _filter_uid(images: list[DicomImage], min_number: int) -> list[DicomImage]:
        from collections import Counter

        uids = [img.metadata.get("SeriesInstanceUID") for img in images]
        if not uids:
            return images
        most_common, count = Counter(uids).most_common(1)[0]
        if count < min_number:
            raise ValueError(
                f"The minimum number of CT images ({min_number}) was not found")
        return [img for img in images if img.metadata.get("SeriesInstanceUID") == most_common]

    @classmethod
    def from_zip(cls, zip_path, dtype=None, **kwargs):
        from .io import TemporaryZipDirectory

        with TemporaryZipDirectory(zip_path) as tmpzip:
            obj = cls(tmpzip, dtype=dtype, **kwargs)
        return obj

    @property
    def metadata(self) -> dcm.Dataset:
        return self.images[0].metadata

    @property
    def metadatas(self) -> list[dcm.Dataset]:
        return [img.metadata for img in self.images]

    def side_view(self, axis: int) -> np.ndarray:
        return np.stack([i.array for i in self.images], axis=-1).max(axis=axis)

    @property
    def slice_spacing(self) -> float:
        """Median z-gap between slices."""
        zs = sorted(img.z_position for img in self.images)
        diffs = np.diff(zs)
        return float(np.median(np.abs(diffs)))

    def array_3d(self) -> np.ndarray:
        """The full (Z, H, W) float32 volume — the device-side payload."""
        return np.stack([img.array for img in self.images]).astype(np.float32)

    def roll(self, direction: str = "x", amount: int = 1):
        for img in self.images:
            img.roll(direction, amount)

    def plot(self, slice_idx: int = 0, **kwargs):  # pragma: no cover
        return self.images[slice_idx].plot(**kwargs)

    def __getitem__(self, item) -> DicomImage:
        return self.images[item]

    def __setitem__(self, key, value: DicomImage):
        self.images[key] = value

    def __delitem__(self, key):
        del self.images[key]

    def __len__(self):
        return len(self.images)


class LazyDicomImageStack(DicomImageStack):
    """Metadata-eager, pixel-lazy stack (reference ``core/image.py:1873``).

    Keeps only file paths + z-positions in memory; pixel arrays are decoded
    on item access.  For the TPU path this is the preferred loader: slices
    stream from disk straight into the device batch.
    """

    def __init__(self, folder, dtype=None, min_number: int = 39,
                 check_uid: bool = True, raw_pixels: bool = False):
        self._dtype = dtype
        self._raw_pixels = raw_pixels
        paths = retrieve_filenames(folder)
        metas = []
        for path in paths:
            try:
                ds = dcm.dcmread(path)
            except Exception:
                continue
            if ds.get("Modality") in ("CT", "MR") and "PixelData" in ds:
                metas.append((path, ds))
        if check_uid and metas:
            from collections import Counter

            uids = [m[1].get("SeriesInstanceUID") for m in metas]
            most_common, count = Counter(uids).most_common(1)[0]
            if count < min_number:
                raise ValueError(
                    f"The minimum number of CT images ({min_number}) was not found")
            metas = [m for m in metas if m[1].get("SeriesInstanceUID") == most_common]
        metas.sort(key=lambda m: z_position(m[1]))
        self._paths = [m[0] for m in metas]
        self._metas = [m[1] for m in metas]
        if len(self._paths) < 2:
            raise FileNotFoundError(f"No CT images were found in {folder}")

    @property
    def metadata(self) -> dcm.Dataset:
        return self._metas[0]

    @property
    def metadatas(self) -> list[dcm.Dataset]:
        return self._metas

    @property
    def images(self):
        return [self[i] for i in range(len(self))]

    @images.setter
    def images(self, value):  # pragma: no cover — compat shim
        pass

    def __getitem__(self, item) -> DicomImage:
        return DicomImage(self._paths[item], dtype=self._dtype,
                          raw_pixels=self._raw_pixels)

    def __len__(self):
        return len(self._paths)

    @property
    def slice_spacing(self) -> float:
        zs = sorted(z_position(m) for m in self._metas)
        return float(np.median(np.abs(np.diff(zs))))

    def array_3d(self) -> np.ndarray:
        return np.stack([self[i].array for i in range(len(self))]).astype(np.float32)


class LazyZipDicomImageStack(LazyDicomImageStack):
    """Lazy stack kept inside an extracted zip dir until GC
    (reference ``core/image.py:2012``)."""

    @classmethod
    def from_zip(cls, zip_path, dtype=None, **kwargs):
        from .io import TemporaryZipDirectory

        tmp = TemporaryZipDirectory(zip_path, delete=False)
        obj = cls(tmp.name, dtype=dtype, **kwargs)
        obj._tmp = tmp
        return obj


class NMImageStack:
    """A stack of frames from a single multi-frame NM DICOM file
    (reference ``core/image.py:2216``)."""

    def __init__(self, path):
        self.path = path
        self.metadata = dcm.dcmread(path)
        if self.metadata.get("Modality") != "NM":
            raise ValueError("The file is not an NM image")
        arr = self.metadata.pixel_array
        if arr.ndim == 2:
            arr = arr[None]
        self.frames = []
        for frame in arr:
            img = ArrayImage(np.asarray(frame, dtype=float))
            img.metadata = self.metadata  # shared file-level metadata
            self.frames.append(img)
        self.images = self.frames

    def as_3d_array(self) -> np.ndarray:
        return np.stack([f.array for f in self.frames]).astype(np.float32)

    def __len__(self):
        return len(self.frames)


def tiff_to_dicom(tiff_file, sid: float, gantry: float, coll: float, couch: float,
                  dpi: float | None = None) -> dcm.Dataset:
    """Convert a TIFF image to an RT Image dataset (reference ``:2252``)."""
    from .array_utils import array_to_dicom

    img = FileImage(tiff_file, dpi=dpi)
    if img.dpi is None:
        raise ValueError("TIFF file has no DPI tag; pass dpi explicitly")
    return array_to_dicom(img.array, sid=sid, gantry=gantry, coll=coll, couch=couch,
                          dpi=img.dpi)


def load_raw_visionrt(path: str | Path, shape: tuple[int, int] = (600, 960)) -> ArrayImage:
    """Load a raw VisionRT file (float32 little-endian)."""
    arr = np.fromfile(path, dtype="<f4").reshape(shape)
    return ArrayImage(arr)


def load_raw_cyberknife(path: str | Path, shape: tuple[int, int] = (512, 512)) -> ArrayImage:
    """Load a raw CyberKnife image file (uint16 little-endian)."""
    arr = np.fromfile(path, dtype="<u2").reshape(shape)
    return ArrayImage(arr)
