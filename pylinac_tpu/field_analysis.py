"""Field analysis (flatness/symmetry/penumbra) of open-field images.

API parity with the reference (``/root/reference/pylinac/field_analysis.py``):
``FieldAnalysis``, ``DeviceFieldAnalysis``, ``Protocol``, protocol functions.
Profile math runs on the JAX kernels via :class:`~pylinac_tpu.core.profile.SingleProfile`.
"""

from __future__ import annotations

import warnings
from enum import Enum
from math import ceil, floor
from pathlib import Path
from typing import BinaryIO

import numpy as np
from pydantic import Field

from .core import image
from .core.exceptions import NotAnalyzed
from .core.geometry import Point
from .core.hill import Hill
from .core.io import SNCProfiler, retrieve_demo_file
from .core.profile import (
    Centering,
    Edge,
    Interpolation,
    Normalization,
    SingleProfile,
    convert_to_enum,
)
from .core.roi import RectangleROI
from .core.utilities import QuaacDatum, QuaacMixin, ResultBase, ResultsDataMixin


def flatness_dose_difference(profile: SingleProfile, in_field_ratio: float = 0.8, **kwargs) -> float:
    """Varian flatness: 100·|max−min|/(max+min) (reference ``field_analysis.py:37``)."""
    dmax = profile.field_calculation(
        in_field_ratio=in_field_ratio, calculation="max",
        slope_exclusion_ratio=kwargs.get("slope_exclusion_ratio", 0.2))
    dmin = profile.field_calculation(
        in_field_ratio=in_field_ratio, calculation="min",
        slope_exclusion_ratio=kwargs.get("slope_exclusion_ratio", 0.2))
    return 100 * abs(dmax - dmin) / (dmax + dmin)


def flatness_dose_ratio(profile: SingleProfile, in_field_ratio: float = 0.8, **kwargs) -> float:
    """Elekta flatness: 100·max/min (reference ``field_analysis.py:60``)."""
    dmax = profile.field_calculation(in_field_ratio=in_field_ratio, calculation="max")
    dmin = profile.field_calculation(in_field_ratio=in_field_ratio, calculation="min")
    return 100 * (dmax / dmin)


def symmetry_point_difference(profile: SingleProfile, in_field_ratio: float, **kwargs) -> float:
    """Varian symmetry: max point difference about the CAX, % of CAX value."""
    field = profile.field_data(
        in_field_ratio=in_field_ratio,
        slope_exclusion_ratio=kwargs.get("slope_exclusion_ratio", 0.2))
    field_values = field["field values"]
    cax_value = field["beam center value (@rounded)"]
    sym_vals = [100 * (lt - rt) / cax_value
                for lt, rt in zip(field_values, field_values[::-1])]
    return sym_vals[int(np.argmax(np.abs(sym_vals)))]


def symmetry_pdq_iec(profile: SingleProfile, in_field_ratio: float, **kwargs) -> float:
    """Elekta symmetry: max point-difference-quotient (IEC), signed."""
    field = profile.field_data(
        in_field_ratio=in_field_ratio,
        slope_exclusion_ratio=kwargs.get("slope_exclusion_ratio", 0.2))
    field_values = field["field values"]

    def calc_sym(lt, rt) -> float:
        sym1 = lt / rt
        sym2 = rt / lt
        sign = np.sign(sym1) if abs(sym1) > abs(sym2) else np.sign(sym2)
        return max(abs(lt / rt), abs(rt / lt)) * sign

    sym_values = [calc_sym(lt, rt) for lt, rt in zip(field_values, field_values[::-1])]
    return sym_values[int(np.argmax(np.abs(sym_values)))]


def symmetry_area(profile: SingleProfile, in_field_ratio: float, **kwargs) -> float:
    """Siemens symmetry: area ratio about the beam center."""
    data = profile.field_data(
        in_field_ratio=in_field_ratio,
        slope_exclusion_ratio=kwargs.get("slope_exclusion_ratio", 0.2))
    n = len(data["field values"])
    area_left = np.sum(data["field values"][: floor(n / 2)])
    area_right = np.sum(data["field values"][ceil(n / 2):])
    return 100 * (area_left - area_right) / (area_left + area_right)


def plot_flatness(instance, profile: SingleProfile, axis) -> None:
    data = profile.field_data(in_field_ratio=instance._in_field_ratio,
                              slope_exclusion_ratio=instance._slope_exclusion_ratio)
    axis.axhline(np.max(data["field values"]), color="g", linestyle="-.", label="Flatness region")
    axis.axhline(np.min(data["field values"]), color="g", linestyle="-.")


def plot_symmetry_point_difference(instance, profile, axis) -> None:  # pragma: no cover
    pass


def plot_symmetry_pdq(instance, profile, axis) -> None:  # pragma: no cover
    pass


def plot_symmetry_area(instance, profile, axis) -> None:  # pragma: no cover
    pass


varian_protocol = {
    "symmetry": {"calc": symmetry_point_difference, "unit": "%", "plot": plot_symmetry_point_difference},
    "flatness": {"calc": flatness_dose_difference, "unit": "%", "plot": plot_flatness},
}
elekta_protocol = {
    "symmetry": {"calc": symmetry_pdq_iec, "unit": "", "plot": plot_symmetry_pdq},
    "flatness": {"calc": flatness_dose_ratio, "unit": "", "plot": plot_flatness},
}
siemens_protocol = {
    "symmetry": {"calc": symmetry_area, "unit": "", "plot": plot_symmetry_area},
    "flatness": {"calc": flatness_dose_difference, "unit": "", "plot": plot_flatness},
}


class Protocol(Enum):
    """Protocols for flatness/symmetry definitions."""

    NONE = {}  #:
    VARIAN = varian_protocol  #:
    SIEMENS = siemens_protocol  #:
    ELEKTA = elekta_protocol  #:


class Device(Enum):
    """Supported measurement devices."""

    PROFILER = {"device": SNCProfiler, "detector spacing (mm)": 5}  #:


class DeviceResult(ResultBase):
    protocol: str = Field(description="The protocol used for the analysis.")
    protocol_results: dict = Field(description="Results of the protocol calculations.")
    centering_method: str | None = Field(description="Field centering method.")
    normalization_method: str | None = Field(description="Normalization method.")
    interpolation_method: str | None = Field(description="Interpolation method.")
    edge_detection_method: str = Field(description="Edge detection method.")
    top_penumbra_mm: float = Field(description="Top penumbra width (mm).")
    bottom_penumbra_mm: float = Field(description="Bottom penumbra width (mm).")
    left_penumbra_mm: float = Field(description="Left penumbra width (mm).")
    right_penumbra_mm: float = Field(description="Right penumbra width (mm).")
    geometric_center_index_x_y: tuple[float, float] = Field(description="Geometric center (px).")
    beam_center_index_x_y: tuple[float, float] = Field(description="Beam center (px).")
    field_size_vertical_mm: float = Field(description="Vertical field size (mm).")
    field_size_horizontal_mm: float = Field(description="Horizontal field size (mm).")
    beam_center_to_top_mm: float = Field(description="Beam center to top (mm).")
    beam_center_to_bottom_mm: float = Field(description="Beam center to bottom (mm).")
    beam_center_to_left_mm: float = Field(description="Beam center to left (mm).")
    beam_center_to_right_mm: float = Field(description="Beam center to right (mm).")
    cax_to_top_mm: float = Field(description="CAX to top edge (mm).")
    cax_to_bottom_mm: float = Field(description="CAX to bottom edge (mm).")
    cax_to_left_mm: float = Field(description="CAX to left edge (mm).")
    cax_to_right_mm: float = Field(description="CAX to right edge (mm).")
    top_position_index_x_y: tuple[float, float] = Field(description="FFF 'top' position (px).")
    top_horizontal_distance_from_cax_mm: float = Field(description="Top-to-CAX horizontal (mm).")
    top_vertical_distance_from_cax_mm: float = Field(description="Top-to-CAX vertical (mm).")
    top_horizontal_distance_from_beam_center_mm: float = Field(description="Top-to-beam-center horizontal (mm).")
    top_vertical_distance_from_beam_center_mm: float = Field(description="Top-to-beam-center vertical (mm).")
    left_slope_percent_mm: float = Field(description="Left in-field slope (%/mm).")
    right_slope_percent_mm: float = Field(description="Right in-field slope (%/mm).")
    top_slope_percent_mm: float = Field(description="Top in-field slope (%/mm).")
    bottom_slope_percent_mm: float = Field(description="Bottom in-field slope (%/mm).")
    top_penumbra_percent_mm: float = Field(default=0, description="Top penumbra gradient (%/mm).")
    bottom_penumbra_percent_mm: float = Field(default=0, description="Bottom penumbra gradient (%/mm).")
    left_penumbra_percent_mm: float = Field(default=0, description="Left penumbra gradient (%/mm).")
    right_penumbra_percent_mm: float = Field(default=0, description="Right penumbra gradient (%/mm).")


class FieldResult(DeviceResult):
    """Typed results for :class:`FieldAnalysis` (reference ``field_analysis.py:412``)."""

    central_roi_mean: float = Field(default=0, description="Central ROI mean.")
    central_roi_max: float = Field(default=0, description="Central ROI max.")
    central_roi_std: float = Field(default=0, description="Central ROI std.")
    central_roi_min: float = Field(default=0, description="Central ROI min.")


class FieldAnalysis(ResultsDataMixin[FieldResult], QuaacMixin):
    """Analyze an open-field image for flatness/symmetry/penumbra/field size."""

    def __init__(self, path: str | Path | BinaryIO, filter: int | None = None,
                 image_kwargs: dict | None = None):
        super().__init__()
        self._path = path
        self.image = image.load(path, **(image_kwargs or {}))
        if filter:
            self.image.filter(size=filter)
        self._is_analyzed = False
        self._from_device = False
        self.image.check_inversion_by_histogram()

    @classmethod
    def from_demo_image(cls):
        demo_file = retrieve_demo_file(name="flatsym_demo.dcm")
        return cls(demo_file)

    @staticmethod
    def run_demo() -> None:
        fs = FieldAnalysis.from_demo_image()
        fs.analyze(protocol=Protocol.VARIAN)
        print(fs.results())
        fs.plot_analyzed_image()

    def _determine_center(self, centering: Centering) -> tuple[float, float]:
        vert_sum = np.sum(self.image.array, axis=1)
        horiz_sum = np.sum(self.image.array, axis=0)
        v_prof = SingleProfile(vert_sum)
        h_prof = SingleProfile(horiz_sum)
        if centering == Centering.GEOMETRIC_CENTER:
            horiz_ratio = v_prof.geometric_center()["index (exact)"] / self.image.shape[0]
            vert_ratio = h_prof.geometric_center()["index (exact)"] / self.image.shape[1]
        else:
            horiz_ratio = v_prof.beam_center()["index (exact)"] / self.image.shape[0]
            vert_ratio = h_prof.beam_center()["index (exact)"] / self.image.shape[1]
        return vert_ratio, horiz_ratio

    def _get_vert_values(self, vert_position: float, vert_width: float):
        w = self.image.array.shape[1]
        left_edge = max(int(round(w * vert_position - w * vert_width / 2)), 0)
        right_edge = min(int(round(w * vert_position + w * vert_width / 2)) + 1, w)
        return np.mean(self.image.array[:, left_edge:right_edge], 1), left_edge, right_edge

    def _get_horiz_values(self, horiz_position: float, horiz_width: float):
        h = self.image.array.shape[0]
        bottom_edge = max(int(round(h * horiz_position - h * horiz_width / 2)), 0)
        top_edge = min(int(round(h * horiz_position + h * horiz_width / 2)) + 1, h)
        return np.mean(self.image.array[bottom_edge:top_edge, :], 0), bottom_edge, top_edge

    def _extract_profiles(self, horiz_position, horiz_width,
                          interpolation_resolution_mm, vert_position, vert_width,
                          edge_detection_method, edge_smoothing_ratio, ground,
                          interpolation, interpolation_resolution,
                          normalization_method, centering, hill_window_ratio) -> None:
        if centering in (Centering.BEAM_CENTER, Centering.GEOMETRIC_CENTER):
            vert_position, horiz_position = self._determine_center(centering)

        horiz_values, upper_h_idx, lower_h_idx = self._get_horiz_values(horiz_position, horiz_width)
        self._upper_h_index = upper_h_idx
        self._lower_h_index = lower_h_idx
        self.horiz_profile = SingleProfile(
            horiz_values, dpmm=self.image.dpmm, interpolation=interpolation,
            interpolation_resolution_mm=interpolation_resolution_mm, ground=ground,
            edge_detection_method=edge_detection_method,
            normalization_method=normalization_method,
            edge_smoothing_ratio=edge_smoothing_ratio,
            hill_window_ratio=hill_window_ratio)

        vert_values, left_v_idx, right_v_idx = self._get_vert_values(vert_position, vert_width)
        self._left_v_index = left_v_idx
        self._right_v_index = right_v_idx
        self.vert_profile = SingleProfile(
            vert_values, dpmm=self.image.dpmm, interpolation=interpolation,
            interpolation_resolution_mm=interpolation_resolution_mm, ground=ground,
            edge_detection_method=edge_detection_method,
            normalization_method=normalization_method,
            edge_smoothing_ratio=edge_smoothing_ratio,
            hill_window_ratio=hill_window_ratio)

    def analyze(self, protocol: Protocol = Protocol.VARIAN,
                centering: Centering | str = Centering.BEAM_CENTER,
                vert_position: float = 0.5, horiz_position: float = 0.5,
                vert_width: float = 0, horiz_width: float = 0,
                in_field_ratio: float = 0.8, slope_exclusion_ratio: float = 0.2,
                invert: bool = False, is_FFF: bool = False,
                penumbra: tuple[float, float] = (20, 80),
                interpolation: Interpolation | str | None = Interpolation.LINEAR,
                interpolation_resolution_mm: float = 0.1, ground: bool = True,
                normalization_method: Normalization | str = Normalization.BEAM_CENTER,
                edge_detection_method: Edge | str = Edge.INFLECTION_DERIVATIVE,
                edge_smoothing_ratio: float = 0.003,
                hill_window_ratio: float = 0.15, **kwargs) -> None:
        """Analyze the field image. See the reference (``field_analysis.py:565``)
        for parameter semantics — they are identical here."""
        edge_detection_method = convert_to_enum(edge_detection_method, Edge)
        if is_FFF and edge_detection_method == Edge.FWHM:
            warnings.warn(
                "Using FWHM for an FFF beam is not advised. Consider using "
                "INFLECTION_DERIVATIVE or INFLECTION_HILL")
        if invert:
            self.image.invert()
        interpolation = convert_to_enum(interpolation, Interpolation)
        normalization_method = convert_to_enum(normalization_method, Normalization)
        centering = convert_to_enum(centering, Centering)

        self._protocol = protocol
        self._penumbra = penumbra
        self._centering = centering
        self._is_FFF = is_FFF
        self._edge_detection = edge_detection_method
        self._in_field_ratio = in_field_ratio
        self._slope_exclusion_ratio = slope_exclusion_ratio
        self._hill_window_ratio = hill_window_ratio
        self._interpolation_method = interpolation
        self._normalization_method = normalization_method
        self._extract_profiles(
            horiz_position, horiz_width, interpolation_resolution_mm, vert_position,
            vert_width, edge_detection_method, edge_smoothing_ratio, ground,
            interpolation, interpolation_resolution_mm, normalization_method,
            centering, hill_window_ratio)
        self._results: dict = {}

        if not self._from_device:
            width = max(abs(self._left_v_index - self._right_v_index), 2)
            height = max(abs(self._upper_h_index - self._lower_h_index), 2)
            center = Point(width / 2 + self._left_v_index, height / 2 + self._upper_h_index)
            self.central_roi = RectangleROI(
                array=self.image.array, width=width, height=height, center=center)

        v_pen = self.vert_profile.penumbra(penumbra[0], penumbra[1])
        h_pen = self.horiz_profile.penumbra(penumbra[0], penumbra[1])
        self._results["top_penumbra_mm"] = v_pen["left penumbra width (exact) mm"]
        self._results["bottom_penumbra_mm"] = v_pen["right penumbra width (exact) mm"]
        self._results["left_penumbra_mm"] = h_pen["left penumbra width (exact) mm"]
        self._results["right_penumbra_mm"] = h_pen["right penumbra width (exact) mm"]
        if edge_detection_method == Edge.INFLECTION_HILL:
            self._results["top_penumbra_percent_mm"] = abs(v_pen["left gradient (exact) %/mm"])
            self._results["bottom_penumbra_percent_mm"] = abs(v_pen["right gradient (exact) %/mm"])
            self._results["left_penumbra_percent_mm"] = abs(h_pen["left gradient (exact) %/mm"])
            self._results["right_penumbra_percent_mm"] = abs(h_pen["right gradient (exact) %/mm"])
        self._results["geometric_center_index_x_y"] = (
            self.horiz_profile.geometric_center()["index (exact)"],
            self.vert_profile.geometric_center()["index (exact)"])
        self._results["beam_center_index_x_y"] = (
            self.horiz_profile.beam_center()["index (exact)"],
            self.vert_profile.beam_center()["index (exact)"])
        v_full = self.vert_profile.field_data(in_field_ratio=1.0,
                                              slope_exclusion_ratio=slope_exclusion_ratio)
        h_full = self.horiz_profile.field_data(in_field_ratio=1.0,
                                               slope_exclusion_ratio=slope_exclusion_ratio)
        self._results["field_size_vertical_mm"] = v_full["width (exact) mm"]
        self._results["field_size_horizontal_mm"] = h_full["width (exact) mm"]
        self._results["beam_center_to_top_mm"] = v_full["left distance->beam center (exact) mm"]
        self._results["beam_center_to_bottom_mm"] = v_full["right distance->beam center (exact) mm"]
        self._results["beam_center_to_left_mm"] = h_full["left distance->beam center (exact) mm"]
        self._results["beam_center_to_right_mm"] = h_full["right distance->beam center (exact) mm"]
        self._results["cax_to_top_mm"] = v_full["left distance->CAX (exact) mm"]
        self._results["cax_to_bottom_mm"] = v_full["right distance->CAX (exact) mm"]
        self._results["cax_to_left_mm"] = h_full["left distance->CAX (exact) mm"]
        self._results["cax_to_right_mm"] = h_full["right distance->CAX (exact) mm"]

        h_field = self.horiz_profile.field_data(in_field_ratio=in_field_ratio,
                                                slope_exclusion_ratio=slope_exclusion_ratio)
        v_field = self.vert_profile.field_data(in_field_ratio=in_field_ratio,
                                               slope_exclusion_ratio=slope_exclusion_ratio)
        self._results["top_position_index_x_y"] = (
            h_field['"top" index (exact)'], v_field['"top" index (exact)'])
        self._results["top_horizontal_distance_from_cax_mm"] = h_field['"top"->CAX (exact) mm']
        self._results["top_vertical_distance_from_cax_mm"] = v_field['"top"->CAX (exact) mm']
        self._results["top_horizontal_distance_from_beam_center_mm"] = h_field['"top"->beam center (exact) mm']
        self._results["top_vertical_distance_from_beam_center_mm"] = v_field['"top"->beam center (exact) mm']
        self._results["left_slope_percent_mm"] = h_field["left slope (%/mm)"]
        self._results["right_slope_percent_mm"] = h_field["right slope (%/mm)"]
        self._results["top_slope_percent_mm"] = v_field["left slope (%/mm)"]
        self._results["bottom_slope_percent_mm"] = v_field["right slope (%/mm)"]

        self._extra_results = {}
        kwargs.update({"slope_exclusion_ratio": slope_exclusion_ratio})
        for name, item in protocol.value.items():
            self._extra_results[f"{name}_horizontal"] = item["calc"](
                self.horiz_profile, in_field_ratio, **kwargs)
            self._extra_results[f"{name}_vertical"] = item["calc"](
                self.vert_profile, in_field_ratio, **kwargs)
        self._is_analyzed = True

    def results(self, as_str: bool = True) -> str | list[str]:
        if not self._is_analyzed:
            raise NotAnalyzed("Image is not analyzed yet. Use analyze() first.")
        results = [
            "Field Analysis Results",
            "----------------------",
            f"File: {self._path}",
            f"Protocol: {self._protocol.name}",
        ]
        if not self._from_device:
            results += [f"Centering method: {self._centering.value}"]
        results += [
            f"Normalization method: {self.horiz_profile._norm_method.value}",
            f"Interpolation: {self.horiz_profile._interp_method.value}",
            f"Edge detection method: {self.horiz_profile._edge_method.value}",
            "",
            f"Penumbra width ({self._penumbra[0]}/{self._penumbra[1]}):",
            f"Left: {self._results['left_penumbra_mm']:3.1f}mm",
            f"Right: {self._results['right_penumbra_mm']:3.1f}mm",
            f"Top: {self._results['top_penumbra_mm']:3.1f}mm",
            f"Bottom: {self._results['bottom_penumbra_mm']:3.1f}mm",
            "",
            "Field Size:",
            f"Horizontal: {self._results['field_size_horizontal_mm']:3.1f}mm",
            f"Vertical: {self._results['field_size_vertical_mm']:3.1f}mm",
            "",
            "CAX to edge distances:",
            f"CAX -> Top edge: {self._results['cax_to_top_mm']:3.1f}mm",
            f"CAX -> Bottom edge: {self._results['cax_to_bottom_mm']:3.1f}mm",
            f"CAX -> Left edge: {self._results['cax_to_left_mm']:3.1f}mm",
            f"CAX -> Right edge: {self._results['cax_to_right_mm']:3.1f}mm",
            "",
            f"Top slope: {self._results['top_slope_percent_mm']:3.3f}%/mm",
            f"Bottom slope: {self._results['bottom_slope_percent_mm']:3.3f}%/mm",
            f"Left slope: {self._results['left_slope_percent_mm']:3.3f}%/mm",
            f"Right slope: {self._results['right_slope_percent_mm']:3.3f}%/mm",
            "",
            "Protocol data:",
            "--------------",
        ]
        for name, item in self._protocol.value.items():
            results.append(f"Vertical {name}: {self._extra_results[name + '_vertical']:3.3f}{item['unit']}")
            results.append(f"Horizontal {name}: {self._extra_results[name + '_horizontal']:3.3f}{item['unit']}")
            results.append("")
        if as_str:
            return "\n".join(results)
        return results

    def _generate_results_data(self) -> FieldResult:
        return FieldResult(
            **self._results,
            protocol=self._protocol.name,
            centering_method=getattr(self._centering, "value", None),
            normalization_method=self.horiz_profile._norm_method.value,
            interpolation_method=self.horiz_profile._interp_method.value,
            edge_detection_method=self.horiz_profile._edge_method.value,
            protocol_results=self._extra_results,
            central_roi_max=self.central_roi.max,
            central_roi_mean=self.central_roi.mean,
            central_roi_min=self.central_roi.min,
            central_roi_std=self.central_roi.std,
        )

    def _quaac_datapoints(self) -> dict[str, QuaacDatum]:
        data = {
            "Field Size Vertical": QuaacDatum(
                value=self._results["field_size_vertical_mm"], unit="mm"),
            "Field Size Horizontal": QuaacDatum(
                value=self._results["field_size_horizontal_mm"], unit="mm"),
            "Top Penumbra": QuaacDatum(value=self._results["top_penumbra_mm"], unit="mm"),
            "Bottom Penumbra": QuaacDatum(value=self._results["bottom_penumbra_mm"], unit="mm"),
            "Left Penumbra": QuaacDatum(value=self._results["left_penumbra_mm"], unit="mm"),
            "Right Penumbra": QuaacDatum(value=self._results["right_penumbra_mm"], unit="mm"),
        }
        for name, value in self._extra_results.items():
            data[name] = QuaacDatum(value=value)
        return data

    # -- plotting -----------------------------------------------------------
    def plot_analyzed_image(self, show: bool = True, grid: bool = True,
                            split_plots: bool = False, **plt_kwargs):
        """Plot the analyzed image and profiles."""
        import matplotlib.pyplot as plt

        if not self._is_analyzed:
            raise NotAnalyzed("Image is not analyzed yet. Use analyze() first.")
        fig, axes = plt.subplots(1, 3, figsize=(15, 5), **plt_kwargs)
        axes[0].imshow(self.image.array, cmap="gray")
        axes[0].axhline(self._upper_h_index, color="b")
        axes[0].axvline(self._left_v_index, color="r")
        axes[0].set_title("Image")
        self.vert_profile.plot(show=False)
        axes[1].plot(self.vert_profile.x_indices, self.vert_profile.values)
        axes[1].set_title("Vertical Profile")
        axes[1].grid(grid)
        axes[2].plot(self.horiz_profile.x_indices, self.horiz_profile.values)
        axes[2].set_title("Horizontal Profile")
        axes[2].grid(grid)
        if show:
            plt.show()
        return fig, axes

    def plotly_analyzed_images(self, show: bool = True, show_colorbar: bool = True,
                               show_legend: bool = True, **kwargs):
        """Plotly figures: image with strip locations + vertical/horizontal
        profiles (reference ``field_analysis.py:1214``). Returns
        ``{name: Figure}`` of plotly JSON-schema figures
        (:mod:`..core.plotly_utils`)."""
        from .core import plotly_utils as pu

        if not self._is_analyzed:
            raise NotAnalyzed("Image is not analyzed yet. Use analyze() first.")
        figs: dict[str, pu.Figure] = {}
        if not self._from_device:
            fig = pu.image_figure(self.image.array, title="Image",
                                  show_colorbar=show_colorbar, **kwargs)
            pu.add_horizontal_line(fig, self._upper_h_index, color="blue")
            pu.add_vertical_line(fig, self._left_v_index, color="red")
            figs["Image"] = fig
        for name, prof in (("Vertical Profile", self.vert_profile),
                           ("Horizontal Profile", self.horiz_profile)):
            pfig = pu.Figure()
            pfig.add_trace(pu.scatter_trace(prof.x_indices, prof.values,
                                            name=name))
            pu.add_title(pfig, name)
            pfig.update_layout(xaxis_title="Index", yaxis_title="Value",
                               showlegend=show_legend)
            figs[name] = pfig
        if show:
            for f in figs.values():
                f.show()
        return figs

    def publish_pdf(self, filename: str, notes: str | list[str] | None = None,
                    open_file: bool = False, metadata: dict | None = None,
                    logo: str | None = None) -> None:
        """Publish a PDF report of the analysis."""
        from .core import pdf

        if not self._is_analyzed:
            raise NotAnalyzed("Image is not analyzed yet. Use analyze() first.")
        canvas = pdf.PylinacCanvas(filename, page_title="Field Analysis",
                                   metadata=metadata, logo=logo)
        text = self.results(as_str=False)
        canvas.add_text(text=text, location=(2, 25.5), font_size=10)
        if notes is not None:
            canvas.add_text(text=notes, location=(2, 4))
        canvas.finish()


class DeviceFieldAnalysis(FieldAnalysis):
    """Field analysis on device (SNC Profiler) data (reference ``:1558``)."""

    def __init__(self, path: str, device: Device):
        self.device = device.value["device"](path=path)
        self._path = path
        self._from_device = True
        self._is_analyzed = False
        self.metrics = []
        self._captured_warnings = []

    @classmethod
    def from_demo_image(cls):
        demo_file = retrieve_demo_file(name="6fff.prs")
        return cls(demo_file, device=Device.PROFILER)

    def analyze(self, protocol: Protocol = Protocol.VARIAN,
                in_field_ratio: float = 0.8, slope_exclusion_ratio: float = 0.2,
                is_FFF: bool = False, penumbra: tuple = (20, 80),
                interpolation_resolution_mm: float = 0.1,
                normalization_method: Normalization | str = Normalization.GEOMETRIC_CENTER,
                edge_detection_method: Edge | str = Edge.INFLECTION_HILL,
                edge_smoothing_ratio: float = 0.003,
                hill_window_ratio: float = 0.15, ground: bool = True, **kwargs) -> None:
        self._protocol = protocol
        self._penumbra = penumbra
        self._centering = None
        self._is_FFF = is_FFF
        self._edge_detection = convert_to_enum(edge_detection_method, Edge)
        self._in_field_ratio = in_field_ratio
        self._slope_exclusion_ratio = slope_exclusion_ratio
        self._hill_window_ratio = hill_window_ratio
        self._interpolation_method = Interpolation.NONE
        self._normalization_method = convert_to_enum(normalization_method, Normalization)

        x_prof, y_prof, _, _ = self.device.to_profiles(
            dpmm=None, interpolation=Interpolation.NONE, ground=ground,
            edge_detection_method=self._edge_detection,
            normalization_method=self._normalization_method,
            edge_smoothing_ratio=edge_smoothing_ratio,
            hill_window_ratio=hill_window_ratio)
        # device detector spacing in mm: set dpmm manually
        spacing = Device.PROFILER.value["detector spacing (mm)"]
        x_prof.dpmm = 1 / spacing
        y_prof.dpmm = 1 / spacing
        self.horiz_profile = x_prof
        self.vert_profile = y_prof

        self._results = {}
        v_pen = self.vert_profile.penumbra(penumbra[0], penumbra[1])
        h_pen = self.horiz_profile.penumbra(penumbra[0], penumbra[1])
        self._results["top_penumbra_mm"] = v_pen["left penumbra width (exact) mm"]
        self._results["bottom_penumbra_mm"] = v_pen["right penumbra width (exact) mm"]
        self._results["left_penumbra_mm"] = h_pen["left penumbra width (exact) mm"]
        self._results["right_penumbra_mm"] = h_pen["right penumbra width (exact) mm"]
        if self._edge_detection == Edge.INFLECTION_HILL:
            self._results["top_penumbra_percent_mm"] = abs(v_pen["left gradient (exact) %/mm"])
            self._results["bottom_penumbra_percent_mm"] = abs(v_pen["right gradient (exact) %/mm"])
            self._results["left_penumbra_percent_mm"] = abs(h_pen["left gradient (exact) %/mm"])
            self._results["right_penumbra_percent_mm"] = abs(h_pen["right gradient (exact) %/mm"])
        self._results["geometric_center_index_x_y"] = (
            self.horiz_profile.geometric_center()["index (exact)"],
            self.vert_profile.geometric_center()["index (exact)"])
        self._results["beam_center_index_x_y"] = (
            self.horiz_profile.beam_center()["index (exact)"],
            self.vert_profile.beam_center()["index (exact)"])
        v_full = self.vert_profile.field_data(in_field_ratio=1.0,
                                              slope_exclusion_ratio=slope_exclusion_ratio)
        h_full = self.horiz_profile.field_data(in_field_ratio=1.0,
                                               slope_exclusion_ratio=slope_exclusion_ratio)
        self._results["field_size_vertical_mm"] = v_full["width (exact) mm"]
        self._results["field_size_horizontal_mm"] = h_full["width (exact) mm"]
        self._results["beam_center_to_top_mm"] = v_full["left distance->beam center (exact) mm"]
        self._results["beam_center_to_bottom_mm"] = v_full["right distance->beam center (exact) mm"]
        self._results["beam_center_to_left_mm"] = h_full["left distance->beam center (exact) mm"]
        self._results["beam_center_to_right_mm"] = h_full["right distance->beam center (exact) mm"]
        self._results["cax_to_top_mm"] = v_full["left distance->CAX (exact) mm"]
        self._results["cax_to_bottom_mm"] = v_full["right distance->CAX (exact) mm"]
        self._results["cax_to_left_mm"] = h_full["left distance->CAX (exact) mm"]
        self._results["cax_to_right_mm"] = h_full["right distance->CAX (exact) mm"]
        h_field = self.horiz_profile.field_data(in_field_ratio=in_field_ratio,
                                                slope_exclusion_ratio=slope_exclusion_ratio)
        v_field = self.vert_profile.field_data(in_field_ratio=in_field_ratio,
                                               slope_exclusion_ratio=slope_exclusion_ratio)
        self._results["top_position_index_x_y"] = (
            h_field['"top" index (exact)'], v_field['"top" index (exact)'])
        self._results["top_horizontal_distance_from_cax_mm"] = h_field['"top"->CAX (exact) mm']
        self._results["top_vertical_distance_from_cax_mm"] = v_field['"top"->CAX (exact) mm']
        self._results["top_horizontal_distance_from_beam_center_mm"] = h_field['"top"->beam center (exact) mm']
        self._results["top_vertical_distance_from_beam_center_mm"] = v_field['"top"->beam center (exact) mm']
        self._results["left_slope_percent_mm"] = h_field["left slope (%/mm)"]
        self._results["right_slope_percent_mm"] = h_field["right slope (%/mm)"]
        self._results["top_slope_percent_mm"] = v_field["left slope (%/mm)"]
        self._results["bottom_slope_percent_mm"] = v_field["right slope (%/mm)"]

        self._extra_results = {}
        kwargs.update({"slope_exclusion_ratio": slope_exclusion_ratio})
        for name, item in protocol.value.items():
            self._extra_results[f"{name}_horizontal"] = item["calc"](
                self.horiz_profile, in_field_ratio, **kwargs)
            self._extra_results[f"{name}_vertical"] = item["calc"](
                self.vert_profile, in_field_ratio, **kwargs)
        self._is_analyzed = True

    def _generate_results_data(self) -> DeviceResult:
        return DeviceResult(
            **self._results,
            protocol=self._protocol.name,
            centering_method=None,
            normalization_method=self.horiz_profile._norm_method.value,
            interpolation_method=self.horiz_profile._interp_method.value,
            edge_detection_method=self.horiz_profile._edge_method.value,
            protocol_results=self._extra_results,
        )


# ===========================================================================
# Batched session API: many open-field images in one device dispatch
# ===========================================================================
class FieldAnalysisBatch:
    """Analyze a batch of same-geometry open-field images in ONE device
    dispatch via the fully-fused pipeline
    (:mod:`pylinac_tpu.ops.field_pipeline`).

    TPU-native replacement for looping ``FieldAnalysis.analyze`` over a QA
    session (reference per-image semantics:
    ``/root/reference/pylinac/field_analysis.py:565``). All images must
    share shape and dpmm. Supports all three edge methods (FWHM,
    INFLECTION_DERIVATIVE, INFLECTION_HILL — the Hill sigmoid fits run as
    masked Levenberg-Marquardt solves vmapped over edges × images) with
    LINEAR interpolation; for cubic interpolation use the single-image class.
    """

    def __init__(self, images, filter: int | None = None,
                 image_kwargs: dict | None = None):
        self.images = []
        for item in images:
            img = image.load(item, **(image_kwargs or {}))
            if filter:
                img.filter(size=filter)
            img.check_inversion_by_histogram()
            self.images.append(img)
        if not self.images:
            raise ValueError("No images were provided")
        # projections + per-image extrema, computed once at load: the
        # centering stage consumes only these (and `invert` transforms them
        # linearly), so analyze() never re-reads the full frames
        self._col_sums = [np.asarray(i.array).sum(axis=0, dtype=np.float64)
                          for i in self.images]
        self._row_sums = [np.asarray(i.array).sum(axis=1, dtype=np.float64)
                          for i in self.images]
        self._extrema = [(float(np.min(i.array)), float(np.max(i.array)))
                         for i in self.images]
        # beam centers are a pure function of the loaded images (+ the invert
        # flag, keyed below), so they are computed once and reused across
        # analyze() calls instead of re-deriving them from the projections
        # every time (the staging hot path on large sessions)
        self._bc_cache: dict[bool, tuple[np.ndarray, np.ndarray]] = {}
        self._is_analyzed = False

    def analyze(self, protocol: Protocol = Protocol.VARIAN,
                centering: Centering | str = Centering.BEAM_CENTER,
                vert_position: float = 0.5, horiz_position: float = 0.5,
                vert_width: float = 0, horiz_width: float = 0,
                in_field_ratio: float = 0.8, slope_exclusion_ratio: float = 0.2,
                invert: bool = False, is_FFF: bool = False,
                penumbra: tuple[float, float] = (20, 80),
                interpolation: Interpolation | str | None = Interpolation.LINEAR,
                interpolation_resolution_mm: float = 0.1, ground: bool = True,
                normalization_method: Normalization | str = Normalization.BEAM_CENTER,
                edge_detection_method: Edge | str = Edge.INFLECTION_DERIVATIVE,
                edge_smoothing_ratio: float = 0.003,
                hill_window_ratio: float = 0.15, mesh=None, **kwargs) -> None:
        """Batch equivalent of :meth:`FieldAnalysis.analyze` (one device
        dispatch for the whole image set).

        ``mesh``: an optional :class:`jax.sharding.Mesh` with a ``data``
        axis — the strip batch shards over it
        (:func:`pylinac_tpu.parallel.mesh.sharded_fa_strips_batch`);
        per-image results bit-match the single-device path."""
        import functools

        import jax
        import jax.numpy as jnp

        from .ops import field_host
        from .ops.field_pipeline import (
            FAParams,
            field_analysis_strips_batch,
            field_analysis_strips_batch_packed,
        )

        edge = convert_to_enum(edge_detection_method, Edge)
        interpolation = convert_to_enum(interpolation, Interpolation)
        normalization = convert_to_enum(normalization_method, Normalization)
        centering = convert_to_enum(centering, Centering)
        if interpolation != Interpolation.LINEAR:
            raise ValueError(
                "Batch mode requires LINEAR interpolation; use FieldAnalysis")
        if is_FFF and edge == Edge.FWHM:
            warnings.warn(
                "Using FWHM for an FFF beam is not advised. Consider using "
                "INFLECTION_DERIVATIVE or INFLECTION_HILL")

        shapes = {img.shape for img in self.images}
        if len(shapes) != 1:
            raise ValueError(
                f"All images in a batch must share one shape; got {shapes}")
        dpmms = {round(float(img.dpmm), 6) for img in self.images}
        if len(dpmms) != 1:
            raise ValueError(f"All images in a batch must share dpmm; got {dpmms}")
        dpmm = float(self.images[0].dpmm)
        H, W = self.images[0].shape

        self._protocol = protocol
        self._centering = centering
        self._edge = edge
        self._interp = interpolation
        self._norm = normalization

        flat_name, sym_name = {
            Protocol.VARIAN: ("difference", "point difference"),
            Protocol.ELEKTA: ("ratio", "pdq"),
            Protocol.SIEMENS: ("difference", "area"),
            Protocol.NONE: ("difference", "point difference"),
        }[protocol]

        # -- host staging: the kernel consumes two 1-D strips per image, so
        # the projection/centering/strip-extraction stage runs in numpy here
        # and only ~2·(H+W) floats per image cross the (possibly tunneled)
        # host→device link instead of the full H×W frame (reference staging
        # semantics: /root/reference/pylinac/field_analysis.py:215-268).
        B = len(self.images)
        if centering == Centering.BEAM_CENTER:
            if bool(invert) not in self._bc_cache:
                col_sums = np.stack(self._col_sums)
                row_sums = np.stack(self._row_sums)
                if invert:
                    # invert (a -> max+min-a) transforms the projections linearly
                    span = np.asarray([mn + mx for mn, mx in self._extrema])
                    col_sums = H * span[:, None] - col_sums
                    row_sums = W * span[:, None] - row_sums
                self._bc_cache[bool(invert)] = (
                    field_host.beam_center_ratio_np_batch(col_sums),
                    field_host.beam_center_ratio_np_batch(row_sums))
            v_positions, h_positions = self._bc_cache[bool(invert)]
        elif centering == Centering.GEOMETRIC_CENTER:
            v_positions = np.full(B, ((W - 1) / 2.0) / W)
            h_positions = np.full(B, ((H - 1) / 2.0) / H)
        else:
            v_positions = np.full(B, vert_position)
            h_positions = np.full(B, horiz_position)

        vert_strips = np.empty((B, H), np.float32)
        horiz_strips = np.empty((B, W), np.float32)
        roi_stats: list[dict] = []
        for i, img in enumerate(self.images):
            arr = np.asarray(img.array)
            lv, rv = field_host.strip_indices(W, float(v_positions[i]), vert_width)
            uh, lh = field_host.strip_indices(H, float(h_positions[i]), horiz_width)
            vs = arr[:, lv:rv].mean(axis=1)
            hs = arr[uh:lh, :].mean(axis=0)
            if invert:
                mn, mx = self._extrema[i]
                vert_strips[i] = (mn + mx) - vs
                horiz_strips[i] = (mn + mx) - hs
                stats = field_host.central_roi_stats_np(arr, lv, rv, uh, lh)
                stats = {"mean": (mn + mx) - stats["mean"], "std": stats["std"],
                         "max": (mn + mx) - stats["min"],
                         "min": (mn + mx) - stats["max"]}
            else:
                vert_strips[i] = vs
                horiz_strips[i] = hs
                stats = field_host.central_roi_stats_np(arr, lv, rv, uh, lh)
            roi_stats.append(stats)

        from .ops.field_pipeline import N_FA_PARAMS, field_analysis_wire_packed
        from .ops.pack import tree_spec, unpack_tree

        static = dict(
            samples_v=int(round(H / (dpmm * interpolation_resolution_mm))),
            samples_h=int(round(W / (dpmm * interpolation_resolution_mm))),
            edge=edge.value, centering=centering.value,
            normalization=normalization.value,
            flatness=flat_name, symmetry=sym_name, ground=ground,
            edge_smoothing_ratio=edge_smoothing_ratio,
            hill_window_ratio=hill_window_ratio)
        if mesh is not None:
            from .parallel.mesh import sharded_fa_strips_batch

            params = FAParams(*(jnp.float32(v) for v in (
                dpmm, in_field_ratio, slope_exclusion_ratio, penumbra[0],
                penumbra[1], vert_position, horiz_position, vert_width,
                horiz_width)))
            self._out = sharded_fa_strips_batch(
                vert_strips, horiz_strips, params, mesh, **static)
        else:
            # one-wire dispatch: strips + params cross the link as a single
            # flat f32 buffer (one H2D), the whole analysis is one jitted
            # dispatch, and the packed return is one D2H fetch — three round
            # trips per batch total on a tunneled device (~31 ms/round trip).
            wire = np.empty(B * H + B * W + N_FA_PARAMS, np.float32)
            wire[: B * H] = vert_strips.ravel()
            wire[B * H: B * H + B * W] = horiz_strips.ravel()
            wire[B * H + B * W:] = (
                dpmm, in_field_ratio, slope_exclusion_ratio, penumbra[0],
                penumbra[1], vert_position, horiz_position, vert_width,
                horiz_width)
            packed = field_analysis_wire_packed(wire, B=B, H=H, W=W, **static)
            spec = tree_spec(
                functools.partial(field_analysis_strips_batch, **static),
                jax.ShapeDtypeStruct((B, H), jnp.float32),
                jax.ShapeDtypeStruct((B, W), jnp.float32),
                FAParams(*(jax.ShapeDtypeStruct((), jnp.float32),) * N_FA_PARAMS),
                cache_key=("fa-strips", (B, H), (B, W),
                           tuple(sorted(static.items()))))
            self._out = unpack_tree(packed, spec)
        self._out["central_roi"] = {
            k: np.asarray([s[k] for s in roi_stats], np.float64)
            for k in ("mean", "std", "max", "min")}
        self._is_analyzed = True

    def results_data(self, as_dict: bool = False, as_json: bool = False):
        """Per-image :class:`FieldResult` list from the device arrays."""
        if not self._is_analyzed:
            raise NotAnalyzed("The batch is not analyzed. Use analyze() first.")
        results = [self._image_result(i) for i in range(len(self.images))]
        if as_dict:
            return [r.model_dump() for r in results]
        if as_json:
            return [r.model_dump_json() for r in results]
        return results

    def _image_result(self, i: int) -> FieldResult:
        v = {k: float(a[i]) for k, a in self._out["vert"].items()}
        h = {k: float(a[i]) for k, a in self._out["horiz"].items()}
        roi = {k: float(a[i]) for k, a in self._out["central_roi"].items()}
        extra = {}
        if self._protocol != Protocol.NONE:
            for name in self._protocol.value:  # same key order as single path
                key = "flatness" if name == "flatness" else "symmetry"
                extra[f"{name}_horizontal"] = h[key]
                extra[f"{name}_vertical"] = v[key]
        grads = {}
        if self._edge == Edge.INFLECTION_HILL:
            grads = dict(
                top_penumbra_percent_mm=v["penumbra_left_grad_pct_mm"],
                bottom_penumbra_percent_mm=v["penumbra_right_grad_pct_mm"],
                left_penumbra_percent_mm=h["penumbra_left_grad_pct_mm"],
                right_penumbra_percent_mm=h["penumbra_right_grad_pct_mm"])
        return FieldResult(
            **grads,
            protocol=self._protocol.name,
            protocol_results=extra,
            centering_method=getattr(self._centering, "value", None),
            normalization_method=self._norm.value,
            interpolation_method=self._interp.value,
            edge_detection_method=self._edge.value,
            top_penumbra_mm=v["penumbra_left_mm"],
            bottom_penumbra_mm=v["penumbra_right_mm"],
            left_penumbra_mm=h["penumbra_left_mm"],
            right_penumbra_mm=h["penumbra_right_mm"],
            geometric_center_index_x_y=(h["geometric_center_idx"], v["geometric_center_idx"]),
            beam_center_index_x_y=(h["beam_center_idx"], v["beam_center_idx"]),
            field_size_vertical_mm=v["field_size_mm"],
            field_size_horizontal_mm=h["field_size_mm"],
            beam_center_to_top_mm=v["bc_to_left_mm"],
            beam_center_to_bottom_mm=v["bc_to_right_mm"],
            beam_center_to_left_mm=h["bc_to_left_mm"],
            beam_center_to_right_mm=h["bc_to_right_mm"],
            cax_to_top_mm=v["cax_to_left_mm"],
            cax_to_bottom_mm=v["cax_to_right_mm"],
            cax_to_left_mm=h["cax_to_left_mm"],
            cax_to_right_mm=h["cax_to_right_mm"],
            top_position_index_x_y=(h["top_idx"], v["top_idx"]),
            top_horizontal_distance_from_cax_mm=h["top_to_cax_mm"],
            top_vertical_distance_from_cax_mm=v["top_to_cax_mm"],
            top_horizontal_distance_from_beam_center_mm=h["top_to_bc_mm"],
            top_vertical_distance_from_beam_center_mm=v["top_to_bc_mm"],
            left_slope_percent_mm=h["left_slope_pct_mm"],
            right_slope_percent_mm=h["right_slope_pct_mm"],
            top_slope_percent_mm=v["left_slope_pct_mm"],
            bottom_slope_percent_mm=v["right_slope_pct_mm"],
            central_roi_mean=roi["mean"],
            central_roi_max=roi["max"],
            central_roi_min=roi["min"],
            central_roi_std=roi["std"],
        )


def analyze_field_batch(images, **analyze_kwargs) -> list[FieldResult]:
    """One-shot batched field analysis: load, analyze (single device
    dispatch), and return per-image :class:`FieldResult`."""
    init_keys = ("filter", "image_kwargs")
    init_kwargs = {k: analyze_kwargs.pop(k) for k in init_keys if k in analyze_kwargs}
    batch = FieldAnalysisBatch(images, **init_kwargs)
    batch.analyze(**analyze_kwargs)
    return batch.results_data()
