"""GE Helios daily CT QA phantom analysis.

Parity with ``/root/reference/pylinac/helios.py``: contrast scale
(Plexiglass vs water), high-contrast bar-pattern MTF, multi-slice
low-contrast grid statistics, and noise/uniformity — on the CatPhan
engine with a variance-based Section-1 origin finder.
"""

from __future__ import annotations

import io as _io
import textwrap
import webbrowser
from pathlib import Path
from typing import Callable

import numpy as np
from pydantic import BaseModel, Field

from .core import pdf
from .core.geometry import Point
from .core.mtf import MTF
from .core.roi import RectangleROI
from .core.utilities import QuaacDatum, ResultBase, ResultsDataMixin
from .core.warnings import capture_warnings
from .ct import CatPhanBase, CatPhanModule, Slice

SECTION_3_OFFSET_MM = 60
HELIOS_LOW_CONTRAST_SLICE_OFFSETS_INDEX = {"slice_1": 0, "slice_2": -1,
                                           "slice_3": -2}
HELIOS_VMIN = -25
HELIOS_VMAX = 175


class _HeliosVisualizationMixin:
    """Consistent window/level across the Helios figures."""

    @property
    def window_min(self) -> float:
        return HELIOS_VMIN

    @property
    def window_max(self) -> float:
        return HELIOS_VMAX


class HeliosContrastScaleModule(_HeliosVisualizationMixin, CatPhanModule):
    """Plexiglass-vs-water contrast scale (reference ``helios.py:46``)."""

    common_name = "Contrast Scale"
    attr_name = "contrast_scale_module"
    roi_settings = {
        "Plexiglass": {"width": 10, "height": 10, "distance": 35, "angle": -135},
        "Water": {"width": 10, "height": 10, "distance": 75, "angle": -90},
    }

    def _setup_rois(self) -> None:
        self.rois = {}
        for name, setting in self.roi_settings.items():
            self.rois[name] = RectangleROI.from_phantom_center(
                array=self.image, width=setting["width_pixels"],
                height=setting["height_pixels"],
                angle=setting["angle_corrected"],
                dist_from_center=setting["distance_pixels"],
                phantom_center=self.phan_center)

    @property
    def contrast_difference(self) -> float:
        """Mean HU difference: Plexiglass - Water."""
        return self.rois["Plexiglass"].mean - self.rois["Water"].mean

    def as_dict(self) -> dict:
        return {"data": {
            "mean_hu": {name: roi.mean for name, roi in self.rois.items()},
            "std": {name: roi.std for name, roi in self.rois.items()}}}

    def plot_rois(self, axis) -> None:
        for roi in self.rois.values():
            roi.plot2axes(axis, edgecolor="blue")


class HeliosContrastScaleModuleOutput(BaseModel):
    offset: float
    roi_settings: dict
    rois: dict
    mean_hu_water: float = Field(title="Mean HU Water")
    mean_hu_plastic: float = Field(title="Mean HU Plastic")
    hu_difference: float = Field(title="HU Difference")
    std_dev_water: float = Field(title="Std Dev Water")


class HeliosHighContrastModule(_HeliosVisualizationMixin, CatPhanModule):
    """Bar-pattern spatial resolution (reference ``helios.py:135``)."""

    common_name = "High Contrast"
    attr_name = "high_contrast_module"
    roi_settings = {
        "1.6mm": {"width": 8, "height": 8, "distance": 42, "angle": -53,
                  "bar_size": 1.6},
        "1.3mm": {"width": 7, "height": 7, "distance": 21, "angle": -62,
                  "bar_size": 1.3},
        "1.0mm": {"width": 6, "height": 6, "distance": 5, "angle": -120,
                  "bar_size": 1.0},
        "0.8mm": {"width": 5, "height": 5, "distance": 16, "angle": 146,
                  "bar_size": 0.8},
    }

    def _setup_rois(self) -> None:
        self.rois = {}
        for name, setting in self.roi_settings.items():
            self.rois[name] = RectangleROI.from_phantom_center(
                array=self.image, width=setting["width_pixels"],
                height=setting["height_pixels"],
                angle=setting["angle_corrected"],
                dist_from_center=setting["distance_pixels"],
                phantom_center=self.phan_center)

    @property
    def mtf(self) -> MTF:
        """rMTF from the bar ROIs; frequency = 1/(2*bar size)."""
        spacings = [1 / (2 * roi["bar_size"])
                    for roi in self.roi_settings.values()]
        return MTF.from_high_contrast_diskset(spacings=spacings,
                                              diskset=list(self.rois.values()))

    def as_dict(self) -> dict:
        return {name: roi.std for name, roi in self.rois.items()}

    def plot_rois(self, axis) -> None:
        for roi in self.rois.values():
            roi.plot2axes(axis, edgecolor="blue")


class HeliosHighContrastModuleOutput(BaseModel):
    offset: float
    rois: dict
    mtf_lp_mm: dict[int, float] = Field(title="MTF (lp/mm)")
    std_dev_1_6mm: float = Field(title="1.6mm Std Dev")
    std_dev_1_3mm: float = Field(title="1.3mm Std Dev")
    std_dev_1_0mm: float = Field(title="1.0mm Std Dev")
    std_dev_0_8mm: float = Field(title="0.8mm Std Dev")


class HeliosLowContrastModule(_HeliosVisualizationMixin, CatPhanModule):
    """15x15 grid of 5mm cells over the uniform water region
    (reference ``helios.py:261``)."""

    common_name = "Low Contrast Detectability"
    attr_name = "low_contrast_module"
    cell_size: float = 5.0
    num_cells: int = 15

    def _setup_rois(self) -> None:
        self.common_name = f"Low Contrast - {self.slice_num + 1}"
        roi_size_px = self.cell_size / self.mm_per_pixel
        total_size_px = roi_size_px * self.num_cells
        half_grid = total_size_px / 2
        half_roi = roi_size_px / 2
        self.rois = []
        for row in range(self.num_cells):
            for col in range(self.num_cells):
                center = Point(
                    self.phan_center.x - half_grid + col * roi_size_px + half_roi,
                    self.phan_center.y - half_grid + row * roi_size_px + half_roi)
                self.rois.append(RectangleROI(
                    array=self.image, width=roi_size_px, height=roi_size_px,
                    center=center))

    @property
    def mean(self) -> float:
        return float(np.mean([roi.mean for roi in self.rois]))

    @property
    def std(self) -> float:
        """Std of the per-cell means (cell-to-cell detectability)."""
        return float(np.std([roi.mean for roi in self.rois]))

    def plot_rois(self, axis) -> None:
        for roi in self.rois:
            roi.plot2axes(axis, edgecolor="orange")


class HeliosLowContrastModuleOutput(BaseModel):
    offset: float
    settings: dict
    mean: float
    std: float


class HeliosLowContrastMultiSliceModule:
    """Low contrast across 3 adjacent slices (reference ``helios.py:345``)."""

    roi_settings = {
        "slice_1": {"offset": HELIOS_LOW_CONTRAST_SLICE_OFFSETS_INDEX["slice_1"]},
        "slice_2": {"offset": HELIOS_LOW_CONTRAST_SLICE_OFFSETS_INDEX["slice_2"]},
        "slice_3": {"offset": HELIOS_LOW_CONTRAST_SLICE_OFFSETS_INDEX["slice_3"]},
    }

    def __init__(self, catphan) -> None:
        self.slices: dict[str, HeliosLowContrastModule] = {}
        slice_spacing = catphan.dicom_stack.slice_spacing
        for key, value in self.roi_settings.items():
            offset_mm = int(value["offset"] * slice_spacing + SECTION_3_OFFSET_MM)
            self.slices[key] = HeliosLowContrastModule(catphan, offset=offset_mm)

    @property
    def mean(self) -> float:
        return float(np.mean([s.mean for s in self.slices.values()]))

    @property
    def std(self) -> float:
        return float(np.mean([s.std for s in self.slices.values()]))


class HeliosLowContrastMultiSliceModuleOutput(BaseModel):
    slices: dict[str, HeliosLowContrastModuleOutput]
    mean: float
    std: float
    low_contrast_mean: float = Field(title="Low Contrast Mean (HU)")
    low_contrast_std: float = Field(title="Low Contrast Std Dev")


class HeliosNoiseUniformityModule(_HeliosVisualizationMixin, CatPhanModule):
    """Noise + center/edge uniformity (reference ``helios.py:461``)."""

    common_name = "Noise & Uniformity"
    attr_name = "noise_uniformity_module"
    roi_settings = {
        "Center": {"width": 15, "height": 15, "distance": 0, "angle": 0},
        "12 o'clock": {"width": 15, "height": 15, "distance": 75, "angle": -90},
        "3 o'clock": {"width": 15, "height": 15, "distance": 75, "angle": 0},
    }
    noise_roi_settings = {
        "Center": {"width": 25, "height": 25, "distance": 0, "angle": 0},
    }

    def _setup_rois(self) -> None:
        self.rois = {}
        self.noise_rois = {}
        for name, setting in self.roi_settings.items():
            self.rois[name] = RectangleROI.from_phantom_center(
                array=self.image, width=setting["width_pixels"],
                height=setting["height_pixels"],
                angle=setting["angle_corrected"],
                dist_from_center=setting["distance_pixels"],
                phantom_center=self.phan_center)
        for name, setting in self.noise_roi_settings.items():
            self.noise_rois[name] = RectangleROI.from_phantom_center(
                array=self.image, width=setting["width_pixels"],
                height=setting["height_pixels"],
                angle=setting["angle_corrected"],
                dist_from_center=setting["distance_pixels"],
                phantom_center=self.phan_center)

    @property
    def noise_center_std(self) -> float:
        return self.noise_rois["Center"].std

    @property
    def mean_outer(self) -> float:
        return float(np.mean([self.rois["12 o'clock"].mean,
                              self.rois["3 o'clock"].mean]))

    @property
    def uniformity_difference(self) -> float:
        return float(self.rois["Center"].mean - self.mean_outer)

    def as_dict(self) -> dict:
        return {"mean_hu": {name: roi.mean for name, roi in self.rois.items()},
                "std": {name: roi.std for name, roi in self.rois.items()}}

    def plot_rois(self, axis) -> None:
        for roi in self.rois.values():
            roi.plot2axes(axis, edgecolor="blue")
        for roi in self.noise_rois.values():
            roi.plot2axes(axis, edgecolor="blue")


class HeliosNoiseUniformityModuleOutput(BaseModel):
    offset: float
    roi_settings: dict
    rois: dict
    noise_center_std: float
    mean_outer: float
    means_diff: float = Field(title="Uniformity Difference (HU)")
    center_mean_hu: float = Field(title="Center Mean HU")
    center_noise_std_dev: float = Field(title="Center Noise Std Dev")
    three_oclock_mean_hu: float = Field(title="3 O'Clock Mean HU")
    twelve_oclock_mean_hu: float = Field(title="12 O'Clock Mean HU")
    average_outer_mean_hu: float = Field(title="Average Outer Mean HU")
    center_outer_mean_difference: float = Field(
        title="Center-Outer Mean Difference")


class GEHeliosResult(ResultBase):
    phantom_model: str
    phantom_roll_deg: float = Field(title="Phantom Roll (deg)")
    origin_slice: int
    num_images: int
    contrast_scale: HeliosContrastScaleModuleOutput = Field(
        title="Contrast Scale")
    high_contrast: HeliosHighContrastModuleOutput = Field(title="High Contrast")
    low_contrast: HeliosLowContrastMultiSliceModuleOutput = Field(
        title="Low Contrast")
    noise_uniformity: HeliosNoiseUniformityModuleOutput = Field(
        title="Noise/Uniformity")


@capture_warnings
class GEHeliosCTDaily(CatPhanBase, ResultsDataMixin[GEHeliosResult]):
    """GE Helios daily CT QA (reference ``helios.py:639``)."""

    _model = "GE Helios CT Daily"
    catphan_radius_mm = 107.5
    min_num_images = 8
    clear_borders = False
    contrast_scale_module = HeliosContrastScaleModule
    high_contrast_module = HeliosHighContrastModule
    low_contrast_multi_slice = HeliosLowContrastMultiSliceModule
    noise_uniformity_module = HeliosNoiseUniformityModule

    @classmethod
    def from_demo_image(cls):
        raise NotImplementedError("There is no demo file for this analysis")

    def plot_analyzed_subimage(self, *args, **kwargs):
        raise NotImplementedError("Use `plot_images`")

    def save_analyzed_subimage(self, *args, **kwargs):
        raise NotImplementedError("Use `save_images`")

    def analyze(self, x_adjustment: float = 0, y_adjustment: float = 0,
                angle_adjustment: float = 0, roi_size_factor: float = 1,
                scaling_factor: float = 1,
                origin_slice: int | None = None) -> None:
        self.x_adjustment = x_adjustment
        self.y_adjustment = y_adjustment
        self.angle_adjustment = angle_adjustment
        self.roi_size_factor = roi_size_factor
        self.scaling_factor = scaling_factor
        self.roll_slice_offset = 0
        self.localize(origin_slice=origin_slice)
        self.contrast_scale_module = self.contrast_scale_module(
            self, offset=0, clear_borders=self.clear_borders)
        self.high_contrast_module = self.high_contrast_module(
            self, offset=0, clear_borders=self.clear_borders)
        self.low_contrast_multi_slice = self.low_contrast_multi_slice(self)
        self.noise_uniformity_module = self.noise_uniformity_module(
            self, offset=SECTION_3_OFFSET_MM, clear_borders=self.clear_borders)

    def localize(self, origin_slice: int | None = None) -> None:
        self._phantom_center_func = self.find_phantom_axis()
        if origin_slice is not None:
            self.origin_slice = origin_slice
        else:
            self.origin_slice = self.find_origin_slice()
        self.catphan_roll = self.find_phantom_roll() + self.angle_adjustment
        if not self._ensure_physical_scan_extent():
            raise ValueError(
                "The physical scan extent does not cover the extent of "
                "module configuration. This means not all modules were "
                "included in the scan. Rescan the phantom to include all "
                "relevant modules, or change the offset values.")

    def find_origin_slice(self) -> int:
        """Section 1 = highest-variance slice (Plexiglass block in water)."""
        num_slices = len(self.dicom_stack)
        variances = np.zeros(num_slices)
        for idx in range(num_slices):
            slice_obj = Slice(self, slice_num=idx, combine=False,
                              clear_borders=self.clear_borders)
            if not slice_obj.is_phantom_in_view():
                continue
            center = slice_obj.phan_center
            radius_px = self.catphan_radius_mm * 0.8 / self.mm_per_pixel
            arr = np.asarray(slice_obj.image.array)
            h, w = arr.shape
            yy, xx = np.mgrid[:h, :w]
            disk = ((yy - center.y) ** 2 + (xx - center.x) ** 2) < radius_px**2
            variances[idx] = float(np.var(arr[disk]))
        max_variance = variances.max()
        candidate_indices = np.argwhere(variances > max_variance / 2)
        return int(np.mean(candidate_indices))

    def find_phantom_roll(self, func: Callable | None = None) -> float:
        """Bracket-mounted phantom: roll is always zero."""
        return 0.0

    def _module_offsets(self) -> list[float]:
        absolute_origin_position = self.dicom_stack[self.origin_slice].z_position
        return [absolute_origin_position,
                absolute_origin_position + SECTION_3_OFFSET_MM]

    def plot_analyzed_image(self, show: bool = True,
                            side_view_kwargs: dict | None = None,
                            **plt_kwargs):
        import matplotlib.pyplot as plt

        modules = [self.contrast_scale_module, self.high_contrast_module,
                   self.noise_uniformity_module]
        modules.extend(self.low_contrast_multi_slice.slices.values())
        fig, axs = plt.subplots(2, 4, **plt_kwargs)
        axes = axs.ravel()
        for ax_idx, module in enumerate(modules):
            module.plot(axes[ax_idx])
        self.plot_side_view(axes[len(modules)])
        self.high_contrast_module.mtf.plot(axes[len(modules) + 1])
        plt.tight_layout()
        if show:
            plt.show()
        return fig

    def plot_images(self, show: bool = True, **plt_kwargs) -> dict:
        import matplotlib.pyplot as plt

        figs = {}
        modules = {"contrast scale": self.contrast_scale_module,
                   "high contrast": self.high_contrast_module,
                   "noise uniformity": self.noise_uniformity_module}
        modules |= self.low_contrast_multi_slice.slices
        for key, module in modules.items():
            fig, ax = plt.subplots(**plt_kwargs)
            module.plot(ax)
            figs[key] = fig
        fig, ax = plt.subplots(**plt_kwargs)
        self.high_contrast_module.mtf.plot(ax)
        figs["mtf"] = fig
        fig, ax = plt.subplots(**plt_kwargs)
        self.plot_side_view(ax)
        figs["side"] = fig
        if show:
            plt.show()
        return figs

    def save_images(self, directory=None, to_stream: bool = False,
                    **plt_kwargs) -> list:
        figs = self.plot_images(show=False, **plt_kwargs)
        paths = []
        for name, fig in figs.items():
            if to_stream:
                path = _io.BytesIO()
            else:
                destination = Path(directory) if directory is not None \
                    else Path.cwd()
                path = (destination / name).with_suffix(".png").absolute()
            fig.savefig(path)
            paths.append(path)
        return paths

    def _quaac_datapoints(self) -> dict[str, QuaacDatum]:
        data = self.results_data(as_dict=True)
        return {
            "Contrast Difference": QuaacDatum(
                value=data["contrast_scale"]["hu_difference"], unit="HU"),
            "Noise Center Std": QuaacDatum(
                value=data["noise_uniformity"]["noise_center_std"], unit="HU"),
            "Uniformity Difference": QuaacDatum(
                value=data["noise_uniformity"]["means_diff"], unit="HU"),
            "Low Contrast Mean": QuaacDatum(
                value=data["low_contrast"]["mean"], unit="HU"),
        }

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
                canvas.add_text(text=text, location=(2.5, 24 - idx * 0.5))
                idx += 1
        for img in analysis_images:
            canvas.add_new_page()
            canvas.add_image(img, location=(1, 5), dimensions=(18, 18))
        canvas.finish()
        if open_file:
            webbrowser.open(filename)

    def results(self, as_str: bool = True) -> str | tuple:
        lines = [f" - {self._model} Results - ",
                 f"Phantom Roll: {self.catphan_roll:2.2f} deg"]
        for name, roi in self.contrast_scale_module.rois.items():
            lines.append(f"Contrast Scale {name} Mean HU: {roi.mean:2.2f}")
            lines.append(f"Contrast Scale {name} Std: {roi.std:2.2f}")
        lines.append(f"Contrast Difference: "
                     f"{self.contrast_scale_module.contrast_difference:2.2f}")
        for name, roi in self.high_contrast_module.rois.items():
            lines.append(f"High Contrast {name} ROI Std: {roi.std:2.2f}")
        for resolution in range(10, 91, 10):
            lp_mm = self.high_contrast_module.mtf.relative_resolution(resolution)
            lines.append(f"MTF {resolution}% (lp/mm): {lp_mm:2.2f}")
        for slice_name, mod in self.low_contrast_multi_slice.slices.items():
            lines.append(f"Low Contrast {slice_name} Mean: {mod.mean:2.2f}")
        for slice_name, mod in self.low_contrast_multi_slice.slices.items():
            lines.append(f"Low Contrast {slice_name} Std: {mod.std:2.2f}")
        lines.append(f"Low Contrast Mean: "
                     f"{self.low_contrast_multi_slice.mean:2.2f}")
        lines.append(f"Low Contrast Standard Deviation: "
                     f"{self.low_contrast_multi_slice.std:2.2f}")
        for name, roi in self.noise_uniformity_module.rois.items():
            lines.append(f"Noise Uniformity {name} Mean HU: {roi.mean:2.2f}")
            lines.append(f"Noise Uniformity {name} Std: {roi.std:2.2f}")
        lines.append(f"Noise Center Std: "
                     f"{self.noise_uniformity_module.noise_center_std:2.2f}")
        lines.append(f"Mean Outer HU: "
                     f"{self.noise_uniformity_module.mean_outer:2.2f}")
        lines.append(
            f"Uniformity Difference: "
            f"{self.noise_uniformity_module.uniformity_difference:2.2f}")
        return "\n".join(lines) if as_str else tuple(lines)

    def _generate_results_data(self) -> GEHeliosResult:
        mtfs = {r: self.high_contrast_module.mtf.relative_resolution(r)
                for r in range(10, 91, 10)}
        slice_outputs = {}
        for k, v in self.low_contrast_multi_slice.slices.items():
            slice_outputs[k] = HeliosLowContrastModuleOutput(
                offset=self.low_contrast_multi_slice.roi_settings[k]["offset"],
                settings={"cell_size": v.cell_size, "num_cells": v.num_cells},
                mean=v.mean, std=v.std)
        return GEHeliosResult(
            phantom_model=self._model,
            phantom_roll_deg=self.catphan_roll,
            origin_slice=self.origin_slice,
            num_images=self.num_images,
            contrast_scale=HeliosContrastScaleModuleOutput(
                offset=0,
                roi_settings=self.contrast_scale_module.roi_settings,
                rois=self.contrast_scale_module.as_dict(),
                mean_hu_water=self.contrast_scale_module.rois["Water"].mean,
                mean_hu_plastic=self.contrast_scale_module
                .rois["Plexiglass"].mean,
                hu_difference=self.contrast_scale_module.contrast_difference,
                std_dev_water=self.contrast_scale_module.rois["Water"].std),
            high_contrast=HeliosHighContrastModuleOutput(
                offset=0,
                rois=self.high_contrast_module.as_dict(),
                mtf_lp_mm=mtfs,
                std_dev_1_6mm=self.high_contrast_module.rois["1.6mm"].std,
                std_dev_1_3mm=self.high_contrast_module.rois["1.3mm"].std,
                std_dev_1_0mm=self.high_contrast_module.rois["1.0mm"].std,
                std_dev_0_8mm=self.high_contrast_module.rois["0.8mm"].std),
            low_contrast=HeliosLowContrastMultiSliceModuleOutput(
                slices=slice_outputs,
                mean=self.low_contrast_multi_slice.mean,
                std=self.low_contrast_multi_slice.std,
                low_contrast_mean=self.low_contrast_multi_slice.mean,
                low_contrast_std=self.low_contrast_multi_slice.std),
            noise_uniformity=HeliosNoiseUniformityModuleOutput(
                offset=SECTION_3_OFFSET_MM,
                roi_settings=self.noise_uniformity_module.roi_settings,
                rois=self.noise_uniformity_module.as_dict(),
                noise_center_std=self.noise_uniformity_module.noise_center_std,
                mean_outer=self.noise_uniformity_module.mean_outer,
                means_diff=self.noise_uniformity_module.uniformity_difference,
                center_mean_hu=self.noise_uniformity_module
                .rois["Center"].mean,
                center_noise_std_dev=self.noise_uniformity_module
                .noise_center_std,
                three_oclock_mean_hu=self.noise_uniformity_module
                .rois["3 o'clock"].mean,
                twelve_oclock_mean_hu=self.noise_uniformity_module
                .rois["12 o'clock"].mean,
                average_outer_mean_hu=self.noise_uniformity_module.mean_outer,
                center_outer_mean_difference=self.noise_uniformity_module
                .uniformity_difference))
