"""Quart DVT phantom analysis (Halcyon/Ethos CBCT QA).

Parity with ``/root/reference/pylinac/quart.py``: HU linearity (+optional
water vial), uniformity, geometric distortion via profile FWHM, slice
thickness from inverted air-gap ROIs, SNR/CNR per the Quart manual.
Built on the CatPhan engine (``ct.py``).
"""

from __future__ import annotations

import io as _io
import textwrap
import warnings
import webbrowser
from pathlib import Path
from typing import Callable

import numpy as np
from pydantic import BaseModel, Field

from .core import pdf
from .core.geometry import Line, Point
from .core.profile import FWXMProfilePhysical
from .core.utilities import ResultBase, ResultsDataMixin
from .core.warnings import capture_warnings
from .ct import (
    AIR,
    CTP404CP504,
    CTP486,
    WATER,
    CatPhanBase,
    CatPhanModule,
    Slice,
    ThicknessROI,
    get_regions,
    rois_to_results,
)

UNIFORMITY_OFFSET_MM = -45
GEOMETRY_OFFSET_MM = 45
ACRYLIC = 120
POLY = -35
TEFLON = 990


class QuartHUModuleOutput(BaseModel):
    offset: int = Field(description="Module slice offset in mm from origin")
    roi_settings: dict
    rois: dict
    measured_slice_thickness_mm: float = Field(
        title="Measured Slice Thickness (mm)")
    signal_to_noise: float = Field(title="SNR (Poly)")
    contrast_to_noise: float = Field(title="CNR (Poly/Acrylic)")


class QuartGeometryModuleOutput(BaseModel):
    offset: int
    roi_settings: dict
    rois: dict
    distances: dict = Field(description="Phantom size (mm) horizontal/vertical")
    high_contrast_distances: dict
    mean_high_contrast_distance: float = Field(
        title="Mean Distance -700->-200HU (mm)")


class QuartUniformityModuleOutput(BaseModel):
    offset: int
    roi_settings: dict
    rois: dict
    passed: bool


class QuartDVTResult(ResultBase):
    phantom_model: str
    phantom_roll_deg: float = Field(title="Quart roll (\N{DEGREE SIGN})")
    origin_slice: int
    num_images: int
    hu_module: QuartHUModuleOutput = Field(title="HU module")
    uniformity_module: QuartUniformityModuleOutput = Field(
        title="Uniformity module")
    geometric_module: QuartGeometryModuleOutput = Field(title="Geometry module")


class QuartHUModule(CTP404CP504):
    """HU linearity module incl. optional water vial (reference ``quart.py:130``)."""

    roi_dist_mm = 52.5
    roi_radius_mm = 6
    vial_radius_mm = 12
    roi_settings = {
        "Air": {"value": AIR, "angle": -90, "distance": roi_dist_mm,
                "radius": roi_radius_mm},
        "Poly": {"value": POLY, "angle": 0, "distance": roi_dist_mm,
                 "radius": roi_radius_mm},
        "Acrylic": {"value": ACRYLIC, "angle": 45, "distance": roi_dist_mm,
                    "radius": roi_radius_mm},
        "Teflon": {"value": TEFLON, "angle": 180, "distance": roi_dist_mm,
                   "radius": roi_radius_mm},
        "Water": {"value": WATER, "angle": -45, "distance": roi_dist_mm,
                  "radius": vial_radius_mm},
    }
    background_roi_settings = {}
    geometry_roi_settings = {}
    thickness_roi_height = 25
    thickness_roi_width = 15
    thickness_roi_distance_mm = 32
    thickness_roi_settings = {
        "Bottom": {"angle": 90, "width": thickness_roi_height,
                   "height": thickness_roi_width,
                   "distance": thickness_roi_distance_mm},
        "Top": {"angle": -90, "width": thickness_roi_height,
                "height": thickness_roi_width,
                "distance": thickness_roi_distance_mm},
    }

    def _setup_rois(self) -> None:
        """Drop the water ROI when the (v1 / empty-vial) slot isn't water."""
        super()._setup_rois()
        if "Water" in self.rois and abs(self.rois["Water"].pixel_value - 0) > 50:
            self.rois.pop("Water")

    def _setup_geometry_rois(self) -> None:
        pass  # no geometry nodes on the Quart

    def _setup_thickness_rois(self) -> None:
        """The thickness markers are air gaps, not wires: invert first."""
        self.thickness_image.invert()
        for name, setting in self.thickness_roi_settings.items():
            self.thickness_rois[name] = ThicknessROI.from_phantom_center(
                self.thickness_image, setting["width_pixels"],
                setting["height_pixels"], setting["angle_corrected"],
                setting["distance_pixels"], self.phan_center)

    @property
    def meas_slice_thickness(self) -> float:
        """Average gap FWHM x tan(30deg) inclination per the manual."""
        INCLINATION_CORRECTION = 0.577
        return float(np.mean(sorted(
            roi.wire_fwhm * self.mm_per_pixel * INCLINATION_CORRECTION
            for roi in self.thickness_rois.values())) / (1 + 2 * self.pad))

    @property
    def signal_to_noise(self) -> float:
        """SNR = (HU_poly + 1000) / sigma_poly per the Quart manual."""
        return (self.rois["Poly"].pixel_value + 1000) / self.rois["Poly"].std

    @property
    def contrast_to_noise(self) -> float:
        """CNR = |HU_poly - HU_acrylic| / sigma_acrylic."""
        return (abs(self.rois["Poly"].pixel_value
                    - self.rois["Acrylic"].pixel_value)
                / self.rois["Acrylic"].std)


class HypersightQuartHUModule(QuartHUModule):
    """Hypersight variant: the water vial is always present."""

    def _setup_rois(self) -> None:
        CTP404CP504._setup_rois(self)


class QuartUniformityModule(CTP486):
    """Uniformity: 5 ROIs at 53mm (reference ``quart.py:289``)."""

    common_name = "HU Uniformity"
    roi_dist_mm = 53
    roi_radius_mm = 10
    nominal_value = 120
    roi_settings = {
        "Top": {"value": nominal_value, "angle": -90, "distance": roi_dist_mm,
                "radius": roi_radius_mm},
        "Right": {"value": nominal_value, "angle": 0, "distance": roi_dist_mm,
                  "radius": roi_radius_mm},
        "Bottom": {"value": nominal_value, "angle": 90, "distance": roi_dist_mm,
                   "radius": roi_radius_mm},
        "Left": {"value": nominal_value, "angle": 180, "distance": roi_dist_mm,
                 "radius": roi_radius_mm},
        "Center": {"value": nominal_value, "angle": 0, "distance": 0,
                   "radius": roi_radius_mm},
    }


class QuartGeometryModule(CatPhanModule):
    """Phantom size via horizontal/vertical profile FWHM and -700/-200 HU
    edge distances (reference ``quart.py:332``)."""

    attr_name = "geometry_module"
    common_name = "Geometric Distortion"

    def _setup_rois(self) -> None:
        import jax.numpy as jnp

        from .ops.filters import median_filter

        self.profiles = {}
        img = np.asarray(median_filter(
            jnp.asarray(self.image.array.astype(np.float32)), 3))
        img = img - img.min()
        self.horiz_array = img[int(self.phan_center.y), :]
        prof = FWXMProfilePhysical(values=self.horiz_array,
                                   dpmm=1 / self.mm_per_pixel)
        line = Line(Point(round(prof.field_edge_idx("left")), self.phan_center.y),
                    Point(round(prof.field_edge_idx("right")), self.phan_center.y))
        self.profiles["horizontal"] = {"width (mm)": prof.field_width_mm,
                                       "line": line}
        self.vert_array = img[:, int(self.phan_center.x)]
        prof = FWXMProfilePhysical(values=self.vert_array,
                                   dpmm=1 / self.mm_per_pixel)
        line = Line(Point(self.phan_center.x, round(prof.field_edge_idx("left"))),
                    Point(self.phan_center.x, round(prof.field_edge_idx("right"))))
        self.profiles["vertical"] = {"width (mm)": prof.field_width_mm,
                                     "line": line}

    def plot_rois(self, axis):
        for profile_data in self.profiles.values():
            profile_data["line"].plot2axes(axis, width=2, color="blue")

    def distances(self) -> dict[str, float]:
        return {f"{name} mm": p["width (mm)"]
                for name, p in self.profiles.items()}

    def high_contrast_resolutions(self) -> dict:
        """Distance from -700HU to -200HU on each of the 4 phantom edges.

        The stack is HU-corrected so -1000 -> 0: search 300 and 800 raw."""
        dists = {"Top": np.nan, "Bottom": np.nan, "Left": np.nan, "Right": np.nan}
        edge_5mm = int(5 / self.mm_per_pixel)
        keys = iter(dists)
        for array in (self.horiz_array, self.vert_array):
            split_idx = len(array) // 2
            for profile_data in (array[:split_idx], array[split_idx:][::-1]):
                edge_idx = int(np.argmax(np.diff(profile_data)))
                edge_data = profile_data[max(edge_idx - edge_5mm, 0):
                                         edge_idx + edge_5mm]
                # invert the (monotonic about the edge) value->index mapping
                order = np.argsort(edge_data)
                idx_300, idx_800 = np.interp(
                    [300, 800], edge_data[order], np.arange(len(edge_data))[order])
                dists[next(keys)] = abs(idx_800 - idx_300) * self.mm_per_pixel
        return dists

    def mean_high_contrast_resolution(self) -> float:
        return float(np.mean(list(self.high_contrast_resolutions().values())))


@capture_warnings
class QuartDVT(CatPhanBase, ResultsDataMixin[QuartDVTResult]):
    """Quart DVT CBCT phantom analysis (reference ``quart.py:429``)."""

    _demo_url = "quart.zip"
    _model = "Quart DVT"
    hu_origin_slice_variance = 300
    catphan_radius_mm = 80
    hu_module_class = QuartHUModule
    uniformity_module_class = QuartUniformityModule
    geometry_module_class = QuartGeometryModule

    def _is_right_area(self, region) -> bool:
        """Looser area bounds: air ROIs can touch the localizer box."""
        thresh = np.pi * ((self.air_bubble_radius_mm / self.mm_per_pixel) ** 2)
        return thresh * 2.5 > region.area_filled > thresh / 2

    def find_phantom_roll(self, func: Callable | None = None) -> float:
        """Roll from the two vertical-axis HU inserts (reference ``quart.py:446``)."""
        if func is not None:
            return super().find_phantom_roll(func=func)
        slice_offset = round(self.roll_slice_offset
                             / self.dicom_stack.slice_spacing)
        slice_num = self.origin_slice + slice_offset
        slc = Slice(self, slice_num, clear_borders=self.clear_borders)
        _, regions, _ = get_regions(slc)
        x_tolerance_px = self.air_bubble_radius_mm / self.mm_per_pixel * 2
        hu_bubbles = [r for r in regions
                      if (self._is_right_area(r)
                          and self._is_right_eccentricity(r)
                          and abs(r.centroid[1] - slc.phan_center.x)
                          < x_tolerance_px)]
        sorted_bubbles = sorted(hu_bubbles, key=lambda x: x.centroid[0])
        if len(sorted_bubbles) < 2:
            warnings.warn("Could not reliably determine Quart phantom roll. "
                          "Setting roll to 0.", UserWarning)
            return 0.0
        y_dist = sorted_bubbles[-1].centroid[0] - sorted_bubbles[0].centroid[0]
        x_dist = sorted_bubbles[-1].centroid[1] - sorted_bubbles[0].centroid[1]
        phan_roll = float(np.rad2deg(np.arctan2(y_dist, x_dist)) - 90)
        if abs(phan_roll) > 10:
            warnings.warn("Phantom roll could not be reliably determined. "
                          "Setting roll to 0.", UserWarning)
            phan_roll = 0
        return phan_roll

    def analyze(self, hu_tolerance: float = 40, scaling_tolerance: float = 1,
                thickness_tolerance: float = 0.2, cnr_threshold: float = 5,
                x_adjustment: float = 0, y_adjustment: float = 0,
                angle_adjustment: float = 0, roi_size_factor: float = 1,
                scaling_factor: float = 1, origin_slice: int | None = None,
                roll_slice_offset: float = -8):
        self.x_adjustment = x_adjustment
        self.y_adjustment = y_adjustment
        self.angle_adjustment = angle_adjustment
        self.roi_size_factor = roi_size_factor
        self.scaling_factor = scaling_factor
        self.roll_slice_offset = roll_slice_offset
        self.localize(origin_slice=origin_slice)
        self.hu_module = self.hu_module_class(
            self, offset=0, hu_tolerance=hu_tolerance,
            thickness_tolerance=thickness_tolerance,
            scaling_tolerance=scaling_tolerance)
        self.uniformity_module = self.uniformity_module_class(
            self, offset=UNIFORMITY_OFFSET_MM, tolerance=hu_tolerance)
        self.geometry_module = self.geometry_module_class(
            self, tolerance=3, offset=GEOMETRY_OFFSET_MM)

    def plot_analyzed_image(self, show: bool = True, **plt_kwargs) -> None:
        import matplotlib.pyplot as plt

        plt.figure(**plt_kwargs)
        grid_size = (2, 3)
        self.hu_module.plot(plt.subplot2grid(grid_size, (0, 1)))
        self.hu_module.plot_linearity(plt.subplot2grid(grid_size, (0, 2)))
        self.uniformity_module.plot(plt.subplot2grid(grid_size, (1, 0)))
        self.uniformity_module.plot_profiles(plt.subplot2grid(grid_size, (1, 2)))
        self.geometry_module.plot(plt.subplot2grid(grid_size, (0, 0)))
        self.plot_side_view(plt.subplot2grid(grid_size, (1, 1)))
        plt.tight_layout()
        if show:
            plt.show()

    def plot_analyzed_subimage(self, *args, **kwargs) -> None:
        raise NotImplementedError()

    def results(self, as_str: bool = True) -> str | tuple:
        items = (
            f"\n - {self._model} QA Test - \n",
            f"HU Linearity ROIs: {self.hu_module.roi_vals_as_str}\n",
            f"HU Passed?: {self.hu_module.passed_hu}\n",
            f"Measured Slice Thickness (mm): "
            f"{self.hu_module.meas_slice_thickness:2.3f}\n",
            f"Slice Thickness Passed? {self.hu_module.passed_thickness}\n",
            f"Uniformity ROIs: {self.uniformity_module.roi_vals_as_str}\n",
            f"Uniformity Passed?: {self.uniformity_module.overall_passed}\n",
            f"Geometric width: {self.geometry_module.distances()}",
            f"High-Contrast distance (mm): "
            f"{self.geometry_module.mean_high_contrast_resolution():2.3f}",
        )
        return "\n".join(items) if as_str else items

    def _generate_results_data(self) -> QuartDVTResult:
        return QuartDVTResult(
            phantom_model=self._model,
            phantom_roll_deg=self.catphan_roll,
            origin_slice=self.origin_slice,
            num_images=self.num_images,
            uniformity_module=QuartUniformityModuleOutput(
                offset=UNIFORMITY_OFFSET_MM,
                roi_settings=self.uniformity_module.roi_settings,
                rois=rois_to_results(self.uniformity_module.rois),
                passed=self.uniformity_module.overall_passed),
            geometric_module=QuartGeometryModuleOutput(
                offset=GEOMETRY_OFFSET_MM,
                roi_settings=self.geometry_module.roi_settings,
                rois=rois_to_results(self.geometry_module.rois),
                distances=self.geometry_module.distances(),
                high_contrast_distances=self.geometry_module
                .high_contrast_resolutions(),
                mean_high_contrast_distance=self.geometry_module
                .mean_high_contrast_resolution()),
            hu_module=QuartHUModuleOutput(
                offset=0,
                roi_settings=self.hu_module.roi_settings,
                rois=rois_to_results(self.hu_module.rois),
                measured_slice_thickness_mm=self.hu_module.meas_slice_thickness,
                signal_to_noise=self.hu_module.signal_to_noise,
                contrast_to_noise=self.hu_module.contrast_to_noise))

    def plot_images(self, show: bool = True, **plt_kwargs) -> dict:
        import matplotlib.pyplot as plt

        figs = {}
        modules = {"HU linearity": self.hu_module,
                   "HU uniformity": self.uniformity_module,
                   "Geometry": self.geometry_module}
        for key, module in modules.items():
            fig, ax = plt.subplots(**plt_kwargs)
            module.plot(ax)
            figs[key] = fig
        fig, ax = plt.subplots(**plt_kwargs)
        self.plot_side_view(ax)
        figs["side"] = fig
        if show:
            plt.show()
        return figs

    def save_images(self, directory=None, to_stream: bool = False,
                    **plt_kwargs):
        figs = self.plot_images(show=False, **plt_kwargs)
        paths = []
        streams = {}
        for name, fig in figs.items():
            if to_stream:
                path = _io.BytesIO()
            else:
                destination = Path(directory) if directory is not None \
                    else Path.cwd()
                path = (destination / name).with_suffix(".png").absolute()
            fig.savefig(path)
            paths.append(path)
            streams[name] = path
        return streams if to_stream else paths

    def publish_pdf(self, filename, notes: str | None = None,
                    open_file: bool = False, metadata: dict | None = None,
                    logo=None) -> None:
        analysis_images = self.save_images(to_stream=True)
        canvas = pdf.PylinacCanvas(filename,
                                   page_title=f"{self._model} Analysis",
                                   metadata=metadata, logo=logo)
        if notes is not None:
            canvas.add_text(text="Notes:", location=(1, 4.5), font_size=14)
            canvas.add_text(text=notes, location=(1, 4))
        shortened = [textwrap.wrap(r, width=110)
                     for r in self.results(as_str=False)]
        idx = 0
        for lines in shortened:
            for text in lines:
                canvas.add_text(text=text, location=(1.5, 25 - idx * 0.5))
                idx += 1
        for img in analysis_images.values():
            canvas.add_new_page()
            canvas.add_image(img, location=(1, 5), dimensions=(18, 18))
        canvas.finish()
        if open_file:
            webbrowser.open(filename)

    def _module_offsets(self) -> list[float]:
        absolute_origin_position = self.dicom_stack[self.origin_slice].z_position
        return [absolute_origin_position + offset
                for offset in (0, UNIFORMITY_OFFSET_MM, GEOMETRY_OFFSET_MM)]

    def _detected_modules(self) -> list[CatPhanModule]:
        return [self.uniformity_module, self.hu_module, self.geometry_module]


@capture_warnings
class HypersightQuartDVT(QuartDVT):
    """Deprecated: QuartDVT now auto-handles the water vial."""

    _model = "Hypersight Quart DVT"
    hu_module_class = HypersightQuartHUModule

    def __init__(self, **kwargs):
        warnings.warn(
            "This class is now deprecated. Please use the QuartDVT class "
            "instead as it now handles the water vial that differentiated "
            "this class", DeprecationWarning)
        super().__init__(**kwargs)
