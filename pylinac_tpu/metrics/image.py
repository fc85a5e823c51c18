"""Image-attached plugin metrics (parity: reference ``metrics/image.py``):
ROI metrics, sized/global disk locators, field locators, weighted centroid.
"""

from __future__ import annotations

import math
import weakref
from abc import ABC, abstractmethod
from collections.abc import Callable
from typing import Any

import numpy as np

import jax.numpy as jnp

from ..core.array_utils import invert, stretch
from ..core.geometry import Point
from ..core.roi import DiskROI, RectangleROI
from ..ops import label as jlabel
from .features import (
    is_right_area_square,
    is_right_circumference,
    is_right_size_bb,
    is_right_square_perimeter,
    is_round,
    is_solid,
    is_symmetric,
)
from .utils import (
    RegionView,
    deduplicate_points_and_boundaries,
    find_features,
    get_boundary,
)


class MetricBase(ABC):
    """Base for 2D image metrics (``metrics/image.py:38``)."""

    unit: str = ""
    image_compatibility: list | None = None
    name: str

    def inject_image(self, image) -> None:
        if self.image_compatibility is not None and not isinstance(
                image, tuple(self.image_compatibility)):
            raise TypeError(f"Image must be one of {self.image_compatibility}")
        self.image = weakref.proxy(image)

    @property
    def full_name(self) -> str:
        return f"{self.name} ({self.unit})" if self.unit else self.name

    def context_calculate(self) -> Any:
        img_hash = hash(self.image.array.tobytes())
        calculation = self.calculate()
        if hash(self.image.array.tobytes()) != img_hash:
            raise RuntimeError(
                "A metric modified an image. This is not allowed as it could "
                "affect downstream metrics.")
        return calculation

    @abstractmethod
    def calculate(self) -> Any:
        pass

    def plot(self, axis, **kwargs) -> None:
        pass

    def plotly(self, fig, **kwargs) -> None:  # pragma: no cover
        pass

    def additional_plots(self) -> list:
        return []


class DiskROIMetric(MetricBase):
    """Sample a disk ROI from the image."""

    _from_physical: bool = False

    @classmethod
    def from_physical(cls, radius_mm: float, center_mm: Point,
                      name: str = "Disk ROI Metric", edgecolor: str = "b", **kwargs):
        instance = cls(radius_mm, center_mm, name, edgecolor, **kwargs)
        instance._from_physical = True
        return instance

    def __init__(self, radius: float, center: Point, name: str = "Disk ROI Metric",
                 edgecolor: str = "b", **kwargs):
        self.radius = radius
        self.center = center
        self.name = name
        self.edge_color = edgecolor
        self.kwargs = kwargs

    def calculate(self) -> DiskROI:
        if self._from_physical:
            self.radius *= self.image.dpmm
            self.center = self.center * self.image.dpmm
        self.roi = DiskROI(array=self.image.array, center=self.center, radius=self.radius)
        return self.roi

    def plot(self, axis, **kwargs) -> None:
        edgecolor = kwargs.pop("edgecolor", self.edge_color)
        self.roi.plot2axes(axis, edgecolor=edgecolor, **{**self.kwargs, **kwargs})


class RectangleROIMetric(MetricBase):
    """Sample a rectangular ROI from the image."""

    _from_physical: bool = False

    @classmethod
    def from_physical(cls, width_mm: float, height_mm: float, center_mm: Point,
                      name: str = "Rectangle ROI Metric", edgecolor: str = "b", **kwargs):
        instance = cls(width_mm, height_mm, center_mm, name, edgecolor, **kwargs)
        instance._from_physical = True
        return instance

    def __init__(self, width: float, height: float, center: Point,
                 name: str = "Rectangle ROI Metric", edgecolor: str = "b", **kwargs):
        self.width = width
        self.height = height
        self.center = center
        self.name = name
        self.edge_color = edgecolor
        self.kwargs = kwargs

    def calculate(self) -> RectangleROI:
        if self._from_physical:
            self.width *= self.image.dpmm
            self.height *= self.image.dpmm
            self.center = self.center * self.image.dpmm
        self.roi = RectangleROI(array=self.image.array, center=self.center,
                                width=self.width, height=self.height)
        return self.roi

    def plot(self, axis, **kwargs) -> None:
        edgecolor = kwargs.pop("edgecolor", self.edge_color)
        self.roi.plot2axes(axis, edgecolor=edgecolor, **{**self.kwargs, **kwargs})


class GlobalSizedDiskLocator(MetricBase):
    """Find all BBs of a given size anywhere in the image (``metrics/image.py:275``)."""

    def __init__(self, radius_mm: float, radius_tolerance_mm: float,
                 detection_conditions: tuple[Callable, ...] = (
                     is_round, is_right_size_bb, is_right_circumference),
                 invert: bool = True, min_number: int = 1,
                 max_number: int | None = None, min_separation_mm: float = 5,
                 name="Global Disk Locator"):
        self.radius = radius_mm
        self.radius_tolerance = radius_tolerance_mm
        self.detection_conditions = list(detection_conditions)
        self.name = name
        self.invert = invert
        self.min_number = min_number
        self.max_number = max_number or 1e3
        self.min_separation_mm = min_separation_mm

    def calculate(self) -> list[Point]:
        sample = invert(self.image.array) if self.invert else self.image.array
        self.points, boundaries, _ = find_features(
            sample, top_offset=0, left_offset=0, min_number=self.min_number,
            max_number=self.max_number, dpmm=self.image.dpmm,
            detection_conditions=self.detection_conditions,
            radius_mm=self.radius, radius_tolerance_mm=self.radius_tolerance,
            min_separation_mm=self.min_separation_mm)
        self.y_boundaries = []
        self.x_boundaries = []
        for boundary in boundaries:
            by, bx = np.nonzero(boundary)
            self.y_boundaries.append(by)
            self.x_boundaries.append(bx)
        return self.points

    def plot(self, axis, show_boundaries: bool = True, color: str = "red",
             markersize: float = 3, alpha: float = 0.25) -> None:
        for point in self.points:
            axis.plot(point.x, point.y, "o", color=color)
        if show_boundaries:
            for by, bx in zip(self.y_boundaries, self.x_boundaries):
                axis.scatter(bx, by, c=color, marker="s", alpha=alpha, s=markersize)


class SizedDiskRegion(MetricBase):
    """Find a disk/BB near an expected position & size within a search window
    (``metrics/image.py:402``). Returns region properties."""

    is_from_physical: bool = False
    is_from_center: bool = False

    _DEFAULT_CONDITIONS = (is_right_size_bb, is_round, is_right_circumference,
                           is_symmetric, is_solid)

    def __init__(self, expected_position, search_window, radius: float,
                 radius_tolerance: float,
                 detection_conditions: tuple[Callable, ...] = _DEFAULT_CONDITIONS,
                 invert: bool = True, name: str = "Disk Region",
                 max_number: int = 1, min_number: int = 1,
                 min_separation_pixels: float = 5):
        self.expected_position = Point(expected_position)
        self.radius = radius
        self.radius_tolerance = radius_tolerance
        self.search_window = search_window
        self.detection_conditions = list(detection_conditions)
        self.name = name
        self.invert = invert
        self.max_number = max_number
        self.min_number = min_number
        self.min_separation = min_separation_pixels

    @classmethod
    def from_physical(cls, expected_position_mm, search_window_mm, radius_mm,
                      radius_tolerance_mm,
                      detection_conditions=_DEFAULT_CONDITIONS,
                      invert: bool = True, name="Disk Region", max_number: int = 1,
                      min_number: int = 1, min_separation_mm: float = 5):
        instance = cls(expected_position=expected_position_mm,
                       search_window=search_window_mm, radius=radius_mm,
                       radius_tolerance=radius_tolerance_mm,
                       detection_conditions=detection_conditions, name=name,
                       invert=invert, max_number=max_number, min_number=min_number,
                       min_separation_pixels=min_separation_mm)
        instance.is_from_physical = True
        return instance

    @classmethod
    def from_center(cls, expected_position, search_window, radius, radius_tolerance,
                    detection_conditions=_DEFAULT_CONDITIONS,
                    invert: bool = True, name="Disk Region", max_number: int = 1,
                    min_number: int = 1, min_separation_pixels: float = 5):
        instance = cls(expected_position=expected_position, search_window=search_window,
                       radius=radius, radius_tolerance=radius_tolerance,
                       detection_conditions=detection_conditions, name=name,
                       invert=invert, max_number=max_number, min_number=min_number,
                       min_separation_pixels=min_separation_pixels)
        instance.is_from_center = True
        return instance

    @classmethod
    def from_center_physical(cls, expected_position_mm, search_window_mm, radius_mm,
                             radius_tolerance_mm: float = 0.25,
                             detection_conditions=_DEFAULT_CONDITIONS,
                             invert: bool = True, name="Disk Region",
                             max_number: int = 1, min_number: int = 1,
                             min_separation_mm: float = 5):
        instance = cls(expected_position=expected_position_mm,
                       search_window=search_window_mm, radius=radius_mm,
                       radius_tolerance=radius_tolerance_mm,
                       detection_conditions=detection_conditions, name=name,
                       invert=invert, max_number=max_number, min_number=min_number,
                       min_separation_pixels=min_separation_mm)
        instance.is_from_physical = True
        instance.is_from_center = True
        return instance

    def calculate(self) -> list[RegionView]:
        if self.is_from_physical:
            self.expected_position = self.expected_position * self.image.dpmm
            self.search_window = np.asarray(self.search_window) * self.image.dpmm
        else:
            self.min_separation /= self.image.dpmm
            self.radius /= self.image.dpmm
            self.radius_tolerance /= self.image.dpmm
        if self.is_from_center:
            self.expected_position.x += self.image.shape[1] / 2
            self.expected_position.y += self.image.shape[0] / 2
        left = max(math.floor(self.expected_position.x - self.search_window[0] / 2), 0)
        right = math.ceil(self.expected_position.x + self.search_window[0] / 2)
        top = max(math.floor(self.expected_position.y - self.search_window[1] / 2), 0)
        bottom = math.ceil(self.expected_position.y + self.search_window[1] / 2)
        sample = self.image[top:bottom, left:right]
        if self.invert:
            sample = invert(sample)
        points, boundaries, regions = find_features(
            sample, top_offset=top, left_offset=left, min_number=self.min_number,
            max_number=self.max_number, dpmm=self.image.dpmm,
            detection_conditions=self.detection_conditions,
            radius_mm=self.radius, radius_tolerance_mm=self.radius_tolerance,
            min_separation_mm=self.min_separation)
        self.x_offset = left
        self.y_offset = top
        self.boundaries = boundaries
        self.points = points
        return regions

    def plot(self, axis, show_boundaries: bool = True, color: str = "red",
             markersize: float = 3, alpha: float = 0.25) -> None:
        if show_boundaries:
            for boundary in self.boundaries:
                by, bx = np.nonzero(boundary)
                axis.scatter(bx, by, c=color, marker="s", alpha=alpha, s=markersize)


class SizedDiskLocator(SizedDiskRegion):
    """Weighted centroid(s) of found disk(s) (``metrics/image.py:661``)."""

    def calculate(self) -> list[Point]:
        super().calculate()
        return self.points

    def plot(self, axis, show_boundaries: bool = True, color: str = "red",
             markersize: float = 3, alpha: float = 0.25) -> None:
        super().plot(axis, show_boundaries=show_boundaries, color=color,
                     markersize=markersize, alpha=alpha)
        for point in self.points:
            axis.plot(point.x, point.y, color=color, marker="o", alpha=1,
                      markersize=markersize)


class GlobalSizedFieldLocator(MetricBase):
    """Find open fields of roughly the given size (``metrics/image.py:727``)."""

    is_from_physical: bool = False

    def __init__(self, field_width_px: float, field_height_px: float,
                 field_tolerance_px: float, min_number: int = 1,
                 max_number: int | None = None, name: str = "Field Finder",
                 detection_conditions: tuple[Callable, ...] = (
                     is_right_square_perimeter, is_right_area_square)):
        self.field_width_mm = field_width_px
        self.field_height_mm = field_height_px
        self.field_tolerance_mm = field_tolerance_px
        self.min_number = min_number
        self.max_number = max_number or 1e6
        self.name = name
        self.detection_conditions = list(detection_conditions)

    @classmethod
    def from_physical(cls, field_width_mm: float, field_height_mm: float,
                      field_tolerance_mm: float, min_number: int = 1,
                      max_number: int | None = None, name: str = "Field Finder",
                      detection_conditions=(is_right_square_perimeter,
                                            is_right_area_square)):
        instance = cls(field_width_px=field_width_mm, field_height_px=field_height_mm,
                       field_tolerance_px=field_tolerance_mm, min_number=min_number,
                       max_number=max_number, name=name,
                       detection_conditions=detection_conditions)
        instance.is_from_physical = True
        return instance

    def calculate(self) -> list[Point]:
        if not self.is_from_physical:
            self.field_width_mm /= self.image.dpmm
            self.field_height_mm /= self.image.dpmm
            self.field_tolerance_mm /= self.image.dpmm
        fields: list[Point] = []
        boundaries: list = []
        sample = np.asarray(self.image.array, dtype=np.float32)
        from ..ops import route
        dev_sample = route.put(sample)
        imin, imax = float(sample.min()), float(sample.max())
        spread = imax - imin
        step_size = spread / 50
        cutoff = imin + step_size * 5  # start at 10% height like the reference
        while cutoff <= imax and len(fields) < self.max_number:
            regions = jlabel.regionprops(dev_sample > cutoff, dev_sample, K=16,
                                         connectivity=2, fill=True)
            # clear_border with 3px buffer: invalidate regions whose bbox is
            # within 3 px of the border
            host = jlabel.regions_to_host(regions)
            h, w = sample.shape
            views = []
            for i in np.nonzero(host.valid)[0]:
                v = RegionView(host, i)
                rmin, cmin, rmax, cmax = v.bbox
                if rmin <= 3 or cmin <= 3 or rmax >= h - 3 or cmax >= w - 3:
                    continue
                views.append(v)
            kept = [v for v in views if all(
                condition(v, dpmm=self.image.dpmm,
                          field_width_mm=self.field_width_mm,
                          field_height_mm=self.field_height_mm,
                          field_tolerance_mm=self.field_tolerance_mm,
                          shape=sample.shape)
                for condition in self.detection_conditions)]
            if kept:
                points = [Point(v.centroid[1], v.centroid[0]) for v in kept]
                new_boundaries = [get_boundary(v, top_offset=0, left_offset=0)
                                  for v in kept]
                fields, boundaries = deduplicate_points_and_boundaries(
                    original_points=fields, new_points=points,
                    min_separation_px=max(v.equivalent_diameter_area for v in kept) / self.image.dpmm,
                    original_boundaries=boundaries, new_boundaries=new_boundaries)
            cutoff += step_size
        if len(fields) < self.min_number:
            raise ValueError(
                f"Couldn't find the minimum number of fields in the image. "
                f"Found {len(fields)}; required: {self.min_number}")
        self.fields = fields
        self.boundaries = boundaries
        return fields

    def plot(self, axis, show_boundaries: bool = True, color: str = "red",
             markersize: float = 3, alpha: float = 0.25) -> None:
        for point in self.fields:
            axis.plot(point.x, point.y, color=color, marker="+", alpha=alpha)
        if show_boundaries:
            for boundary in self.boundaries:
                by, bx = np.nonzero(boundary)
                axis.scatter(bx, by, c=color, marker="s", alpha=alpha, s=markersize)


class GlobalFieldLocator(GlobalSizedFieldLocator):
    """Find open fields irrespective of size (``metrics/image.py:923``)."""

    def __init__(self, min_number: int = 1, max_number: int | None = None,
                 name: str = "Field Finder",
                 detection_conditions=(is_right_square_perimeter, is_right_area_square)):
        super().__init__(field_width_px=1e4, field_height_px=1e4,
                         field_tolerance_px=1e4, min_number=min_number,
                         max_number=max_number, name=name,
                         detection_conditions=detection_conditions)

    @classmethod
    def from_physical(cls, *args, **kwargs):
        raise NotImplementedError(
            "Not implemented for global field-finding; use the standard initializer.")


class WeightedCentroid(MetricBase):
    """The intensity-weighted centroid of the whole image."""

    def __init__(self, name: str = "Weighted Centroid"):
        self.name = name

    def calculate(self) -> Point:
        arr = self.image.array
        if np.sum(arr) == 0:
            raise ValueError("Image is blank; cannot calculate weighted centroid")
        y_indices, x_indices = np.indices(arr.shape)
        total = np.sum(arr)
        return Point(np.sum(x_indices * arr) / total, np.sum(y_indices * arr) / total)
