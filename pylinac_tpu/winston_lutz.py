"""Winston-Lutz isocenter QA.

API parity with the reference (``/root/reference/pylinac/winston_lutz.py``):
``WinstonLutz``, ``WinstonLutz2D``, ``WinstonLutzMultiTargetMultiField``,
BB arrangements, and the Low-et-al 3D solvers.  TPU-native notes:

* per-image BB detection runs on the jitted CCL/regionprops kernels
  (:mod:`pylinac_tpu.ops.label`) through the SizedDiskLocator metric;
* the gantry-iso minimax solve uses the jitted Nelder-Mead
  (:mod:`pylinac_tpu.ops.optimize`) over vectorized 3D point-line distances
  instead of scipy L-BFGS-B (``winston_lutz.py:1614-1641``);
* the 3D shift solve is the Low et al. pseudo-inverse least squares
  (``winston_lutz.py:3492``), a tiny dense solve.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
import math
import os.path as osp
import statistics
from functools import cached_property, lru_cache
from itertools import zip_longest
from pathlib import Path
from typing import BinaryIO, Iterable, Literal, Sequence

import numpy as np
from pydantic import BaseModel, Field

import jax
import jax.numpy as jnp

from .core import image
from .core.geometry import Line, Point, Vector, cos, sin
from .core.io import TemporaryZipDirectory, get_url, retrieve_demo_file
from .core.scale import MachineScale, convert
from .core.utilities import QuaacDatum, QuaacMixin, ResultBase, ResultsDataMixin, convert_to_enum
from .core.warnings import capture_warnings
from .metrics.features import (
    is_right_circumference,
    is_right_size_bb,
    is_round,
    is_solid,
    is_symmetric,
)
from .metrics.image import SizedDiskLocator
from .ops.optimize import nelder_mead

BB_ERROR_MESSAGE = (
    "The BB could not be detected. Please check the image for the BB and adjust "
    "analysis parameters (e.g. bb_size_mm) as needed.")


# --------------------------------------------------------------------------
# Rotation helpers (replace scipy.spatial.transform.Rotation)
# --------------------------------------------------------------------------
def _rot_x(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _rot_y(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rot_z(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _euler_xyz_extrinsic(ax: float, ay: float, az: float) -> np.ndarray:
    """scipy Rotation.from_euler('xyz', [ax, ay, az]) — extrinsic: R = Rz·Ry·Rx."""
    return _rot_z(az) @ _rot_y(ay) @ _rot_x(ax)


def is_close_degrees(angle1: float, angle2: float, delta: float = 1.0) -> bool:
    """Whether two angles are within delta degrees, accounting for wrap."""
    diff = abs((angle1 - angle2 + 180) % 360 - 180)
    return diff <= delta


# --------------------------------------------------------------------------
# BB configuration
# --------------------------------------------------------------------------
class BBConfig(BaseModel):
    name: str
    offset_left_mm: float
    offset_up_mm: float
    offset_in_mm: float
    bb_size_mm: float
    rad_size_mm: float

    def to_human(self) -> str:
        lr = "Left" if self.offset_left_mm >= 0 else "Right"
        ud = "Up" if self.offset_up_mm >= 0 else "Down"
        io = "In" if self.offset_in_mm >= 0 else "Out"
        return (f"{lr} {abs(self.offset_left_mm)}mm, {ud} {abs(self.offset_up_mm)}mm, "
                f"{io} {abs(self.offset_in_mm)}mm")


class BBArrangement:
    """Preset BB arrangements (reference ``winston_lutz.py:107``)."""

    ISO = (BBConfig(name="Iso", offset_left_mm=0, offset_up_mm=0, offset_in_mm=0,
                    bb_size_mm=5, rad_size_mm=20),)
    SNC_MULTIMET = (
        BBConfig(name="Iso", offset_left_mm=0, offset_up_mm=0, offset_in_mm=0, bb_size_mm=5, rad_size_mm=20),
        BBConfig(name="1", offset_left_mm=0, offset_up_mm=0, offset_in_mm=30, bb_size_mm=5, rad_size_mm=20),
        BBConfig(name="2", offset_left_mm=-30, offset_up_mm=0, offset_in_mm=15, bb_size_mm=5, rad_size_mm=20),
        BBConfig(name="3", offset_left_mm=0, offset_up_mm=0, offset_in_mm=-30, bb_size_mm=5, rad_size_mm=20),
        BBConfig(name="4", offset_left_mm=30, offset_up_mm=0, offset_in_mm=-50, bb_size_mm=5, rad_size_mm=20),
        BBConfig(name="5", offset_left_mm=0, offset_up_mm=0, offset_in_mm=-70, bb_size_mm=5, rad_size_mm=20),
    )
    DEMO = SNC_MULTIMET

    @staticmethod
    def to_human(arrangement: dict) -> str:
        a = arrangement
        lr = "Left" if a["offset_left_mm"] >= 0 else "Right"
        ud = "Up" if a["offset_up_mm"] >= 0 else "Down"
        io = "In" if a["offset_in_mm"] >= 0 else "Out"
        return (f"'{a['name']}': {lr} {abs(a['offset_left_mm'])}mm, "
                f"{ud} {abs(a['offset_up_mm'])}mm, {io} {abs(a['offset_in_mm'])}mm")


@dataclasses.dataclass
class BBFieldMatch:
    """A matched nominal/measured BB + field for one image (reference ``:252``)."""

    epid: Point
    field: Point
    bb: Point
    dpmm: float
    gantry_angle: float
    couch_angle: float
    sad: float

    @property
    def field_epid_vector_mm(self) -> Vector:
        v = (self.field - self.epid) / self.dpmm
        v.y = -v.y
        return v

    @property
    def bb_field_vector_mm(self) -> Vector:
        v = (self.bb - self.field) / self.dpmm
        v.y = -v.y
        return v

    @property
    def bb_epid_vector_mm(self) -> Vector:
        v = (self.bb - self.epid) / self.dpmm
        v.y = -v.y
        return v

    @property
    def bb_field_distance_mm(self) -> float:
        return self.field.distance_to(self.bb) / self.dpmm

    @property
    def bb_epid_distance_mm(self) -> float:
        return self.epid.distance_to(self.bb) / self.dpmm

    @property
    def field_epid_distance_mm(self) -> float:
        return self.epid.distance_to(self.field) / self.dpmm

    @property
    def bb_to_field_projection(self) -> Line:
        return straight_ray(self.bb_field_vector_mm, self.gantry_angle)


class BB3D:
    """A BB in 3D space reconstructed from 2D projections (reference ``:313``)."""

    def __init__(self, bb_config: BBConfig, bb_matches: Sequence[BBFieldMatch],
                 scale: MachineScale):
        self.bb_config = bb_config
        self.matches = bb_matches
        self.scale = scale

    @cached_property
    def measured_bb_position(self) -> Point:
        v = solve_3d_position_from_2d_planes(
            xs=[m.bb_epid_vector_mm.x for m in self.matches],
            ys=[m.bb_epid_vector_mm.y for m in self.matches],
            thetas=[m.gantry_angle for m in self.matches],
            phis=[m.couch_angle for m in self.matches],
            scale=self.scale)
        return Point(x=v.x, y=v.y, z=v.z)

    @cached_property
    def nominal_bb_position(self) -> Point:
        return Point(x=-self.bb_config.offset_left_mm,
                     y=self.bb_config.offset_in_mm,
                     z=self.bb_config.offset_up_mm)

    @cached_property
    def measured_field_position(self) -> Point:
        v = solve_3d_position_from_2d_planes(
            xs=[m.field_epid_vector_mm.x for m in self.matches],
            ys=[m.field_epid_vector_mm.y for m in self.matches],
            thetas=[m.gantry_angle for m in self.matches],
            phis=[m.couch_angle for m in self.matches],
            scale=self.scale)
        return Point(x=v.x, y=v.y, z=v.z)


class Axis(enum.Enum):
    GANTRY = "Gantry"  #:
    COLLIMATOR = "Collimator"  #:
    COUCH = "Couch"  #:
    GB_COMBO = "GB Combo"  #:
    GBP_COMBO = "GBP Combo"  #:
    EPID = "Epid"  #:
    REFERENCE = "Reference"  #:


# --------------------------------------------------------------------------
# Results models
# --------------------------------------------------------------------------
class WinstonLutz2DResult(ResultBase):
    variable_axis: str = Field(description="The axis that varied in this image.")
    cax2epid_vector: dict = Field(description="Vector from CAX to EPID center (mm).")
    cax2epid_distance: float = Field(description="Distance from CAX to EPID center (mm).")
    cax2bb_distance: float = Field(description="Distance from CAX to BB (mm).")
    cax2bb_vector: dict = Field(description="Vector from CAX to BB (mm).")
    bb_location: dict = Field(description="BB location (px).")
    field_cax: dict = Field(description="Field CAX (px).")


class WinstonLutzResult(ResultBase):
    max_2d_cax_to_bb_mm: float = Field(description="Max 2D CAX→BB distance (mm).")
    median_2d_cax_to_bb_mm: float = Field(description="Median 2D CAX→BB distance (mm).")
    mean_2d_cax_to_bb_mm: float = Field(description="Mean 2D CAX→BB distance (mm).")
    max_2d_cax_to_epid_mm: float = Field(description="Max 2D CAX→EPID distance (mm).")
    median_2d_cax_to_epid_mm: float = Field(description="Median 2D CAX→EPID distance (mm).")
    mean_2d_cax_to_epid_mm: float = Field(description="Mean 2D CAX→EPID distance (mm).")
    gantry_3d_iso_diameter_mm: float = Field(description="Gantry 3D isocenter diameter (mm).")
    coll_2d_iso_diameter_mm: float = Field(description="Collimator 2D isocenter diameter (mm).")
    couch_2d_iso_diameter_mm: float = Field(description="Couch 2D isocenter diameter (mm).")
    gantry_coll_3d_iso_diameter_mm: float = Field(description="Gantry+coll 3D isocenter diameter (mm).")
    num_total_images: int = Field(description="Total images analyzed.")
    num_gantry_images: int = Field(description="Gantry-axis image count.")
    num_coll_images: int = Field(description="Collimator-axis image count.")
    num_couch_images: int = Field(description="Couch-axis image count.")
    num_gantry_coll_images: int = Field(description="Gantry+coll image count.")
    max_gantry_rms_deviation_mm: float = Field(description="Max gantry RMS deviation (mm).")
    max_epid_rms_deviation_mm: float = Field(description="Max EPID RMS deviation (mm).")
    max_coll_rms_deviation_mm: float = Field(description="Max collimator RMS deviation (mm).")
    max_couch_rms_deviation_mm: float = Field(description="Max couch RMS deviation (mm).")
    bb_shift_vector: dict = Field(description="Cartesian shift to move BB to iso (mm).")
    image_details: list[WinstonLutz2DResult] = Field(description="Per-image results.")
    keyed_image_details: dict[str, WinstonLutz2DResult] = Field(
        description="Per-image results keyed by axes values (e.g. G0B45P0).")


class WinstonLutzMultiTargetMultiFieldResult(ResultBase):
    num_total_images: int = Field(description="Total images analyzed.")
    max_2d_field_to_bb_mm: float = Field(description="Max field→BB distance (mm).")
    mean_2d_field_to_bb_mm: float = Field(description="Mean field→BB distance (mm).")
    median_2d_field_to_bb_mm: float = Field(description="Median field→BB distance (mm).")
    bb_arrangement: tuple[BBConfig, ...] = Field(description="Expected BB arrangement.")
    bb_maxes: dict[str, float] = Field(description="Max distance per BB.")
    bb_shift_vector: dict = Field(description="Cartesian shift to align phantom (mm).")
    bb_shift_yaw: float = Field(description="Yaw to align phantom (deg).")
    bb_shift_pitch: float = Field(description="Pitch to align phantom (deg).")
    bb_shift_roll: float = Field(description="Roll to align phantom (deg).")


# --------------------------------------------------------------------------
# 3D solvers
# --------------------------------------------------------------------------
def max_distance_to_lines(p, lines: Iterable[Line]) -> float:
    """Maximum distance from point p (x, y, z) to any line."""
    point = Point(p[0], p[1], p[2])
    return max(line.distance_to(point) for line in lines)


def bb_projection_with_rotation(offset_left: float, offset_up: float, offset_in: float,
                                gantry: float, couch: float, sad: float = 1000,
                                machine_scale: MachineScale = MachineScale.IEC61217,
                                ) -> tuple[float, float]:
    """EPID isoplane projection of a 3D BB position (reference ``:3401``).

    Returns (left-right projection, superior-inferior projection) in mm."""
    bb_positions = np.array([offset_up, offset_left, offset_in])
    gantry_rot, _, couch_rot = convert(
        input_scale=machine_scale, output_scale=MachineScale.IEC61217,
        gantry=gantry, collimator=0, rotation=couch)
    rotation_matrix = _euler_xyz_extrinsic(-couch_rot, 0, gantry_rot)
    rotated = rotation_matrix @ bb_positions
    bb_magnification = sad / (sad - rotated[0])
    projection = np.array([rotated[1], rotated[2]]) * bb_magnification
    return -projection[0], projection[1]


def straight_ray(vector: Vector, gantry_angle: float) -> Line:
    """A straight line through the BB-field vector at the gantry angle
    (reference ``:3461``)."""
    p1 = Point()
    p2 = Point()
    p1.x = vector.x * cos(gantry_angle) + 20 * sin(gantry_angle)
    p1.z = vector.x * -sin(gantry_angle) + 20 * cos(gantry_angle)
    p1.y = vector.y
    p2.x = vector.x * cos(gantry_angle) - 20 * sin(gantry_angle)
    p2.z = vector.x * -sin(gantry_angle) - 20 * cos(gantry_angle)
    p2.y = vector.y
    return Line(p1, p2)


def solve_3d_shift_vector_from_2d_planes(xs: Sequence[float], ys: Sequence[float],
                                         thetas: Sequence[float], phis: Sequence[float],
                                         scale: MachineScale) -> Vector:
    """Low et al. generalized eqns 6/7/9: least-squares shift from 2D planes
    (reference ``:3492``)."""
    if not (len(xs) == len(ys) == len(thetas) == len(phis)):
        raise ValueError("The x, y, theta, and phi arrays must all be the same length.")
    n = len(xs)
    f_thetas, f_phis = [], []
    for theta, phi in zip(thetas, phis):
        g, _, c = convert(scale, MachineScale.VARIAN_STANDARD, gantry=theta,
                          collimator=0, rotation=phi)
        f_thetas.append(g)
        f_phis.append(c)

    A = np.zeros((2 * n, 3))
    xi = np.zeros(2 * n)
    for i in range(n):
        A[2 * i, :] = [-cos(f_phis[i]), -sin(f_phis[i]), 0]
        A[2 * i + 1, :] = [-cos(f_thetas[i]) * sin(f_phis[i]),
                           cos(f_thetas[i]) * cos(f_phis[i]),
                           -sin(f_thetas[i])]
        xi[2 * i] = ys[i]
        xi[2 * i + 1] = -xs[i]
    B = np.linalg.pinv(A)
    long, lat, vert = B.dot(xi).squeeze()
    return Vector(x=lat, y=-long, z=vert)


def solve_3d_position_from_2d_planes(xs, ys, thetas, phis, scale) -> Vector:
    """The 3D position is the inverse of the shift vector."""
    return -solve_3d_shift_vector_from_2d_planes(xs, ys, thetas, phis, scale)


def conventional_to_euler_notation(axes_resolution: str) -> str:
    EULER = {"pitch": "x", "yaw": "z", "roll": "y"}
    return "".join(EULER[a.strip()] for a in axes_resolution.split(","))


def _euler_extrinsic_decompose(R: np.ndarray, order: str) -> tuple[float, float, float]:
    """Decompose R into extrinsic euler angles for the given axis order string
    (e.g. 'yxz' meaning R = Rz(c)·Rx(b)·Ry(a), returning (a, b, c) degrees)."""
    # extrinsic order 'yxz': R = Rz(c) Rx(b) Ry(a)
    if order == "yxz":
        # R = Rz(c) @ Rx(b) @ Ry(a)
        # Compute: b from R[2,1]... derive symbolically:
        # Rx(b)Ry(a) = [[ca, 0, sa], [sb*sa, cb, -sb*ca], [-cb*sa, sb, cb*ca]]
        # Rz(c) @ that:
        # row2 = [-cb*sa, sb, cb*ca]
        b = math.degrees(math.asin(np.clip(R[2, 1], -1, 1)))
        a = math.degrees(math.atan2(-R[2, 0], R[2, 2]))
        c = math.degrees(math.atan2(-R[0, 1], R[1, 1]))
        return a, b, c
    raise ValueError(f"Unsupported euler order {order}")


def align_points(measured_points: Sequence[Point], ideal_points: Sequence[Point],
                 axes_order: str = "roll,pitch,yaw") -> tuple[Vector, float, float, float]:
    """Kabsch/SVD rigid alignment returning (translation, yaw, pitch, roll)
    (reference ``:3608``)."""
    measured_array = np.array([[p.x, p.y, p.z] for p in measured_points])
    ideal_array = np.array([[p.x, p.y, p.z] for p in ideal_points])
    measured_centroid = np.mean(measured_array, axis=0)
    ideal_centroid = np.mean(ideal_array, axis=0)
    measured_centered = measured_array - measured_centroid
    ideal_centered = ideal_array - ideal_centroid
    H = measured_centered.T @ ideal_centered
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt[2, :] *= -1
        R = Vt.T @ U.T
    euler = conventional_to_euler_notation(axes_order)
    roll, pitch, yaw = _euler_extrinsic_decompose(R, euler)
    rotated_measured_centroid = R @ measured_centroid
    translation = ideal_centroid - rotated_measured_centroid
    return Vector(*translation), yaw, pitch, roll


# --------------------------------------------------------------------------
# Detection predicates specific to WL (reference ``:1137-1230``)
# --------------------------------------------------------------------------
def is_near_center(region, *args, **kwargs) -> bool:
    dpmm = kwargs["dpmm"]
    shape = kwargs["shape"]
    extent_limit_mm = 20
    bottom, left, top, right = region.bbox
    bb_center_x = left + (right - left) / 2
    bb_center_y = bottom + (top - bottom) / 2
    return (shape[1] / 2 - dpmm * extent_limit_mm < bb_center_x < shape[1] / 2 + dpmm * extent_limit_mm
            and shape[0] / 2 - dpmm * extent_limit_mm < bb_center_y < shape[0] / 2 + dpmm * extent_limit_mm)


def is_modest_size(region, *args, **kwargs) -> bool:
    bb_area = region.area_filled / (kwargs["dpmm"] ** 2)
    bb_size = kwargs["bb_size"]
    larger = np.pi * ((bb_size + 2) / 2) ** 2
    smaller = max((np.pi * ((bb_size - 2) / 2) ** 2, 2))
    return smaller < bb_area < larger


def is_square(region, *args, **kwargs) -> bool:
    return region.filled_area / region.bbox_area > 0.8


def is_right_square_size(region, *args, **kwargs) -> bool:
    field_area = region.area_filled / (kwargs["dpmm"] ** 2)
    rad_size = max((kwargs["rad_size"], 5))
    return (rad_size - 5) ** 2 < field_area < (rad_size + 5) ** 2


# --------------------------------------------------------------------------
# Images
# --------------------------------------------------------------------------
def _filled_centroid_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(cy, cx) center of mass of the hole-filled mask (XLA form)."""
    from .ops.label import fill_holes

    filled = fill_holes(mask)
    h, w = mask.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    f = filled.astype(jnp.float32)
    mass = jnp.maximum(jnp.sum(f), 1.0)
    return jnp.stack([jnp.sum(f * yy) / mass, jnp.sum(f * xx) / mass])


@jax.jit
def _filled_centroid(arr: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    """(cy, cx) center of mass of the hole-filled threshold mask — the
    whole field-centroid pipeline as one dispatch (two-scalar result)."""
    return _filled_centroid_mask(arr >= threshold)


def _filled_centroid_batch(arrs: jnp.ndarray, thrs: jnp.ndarray) -> jnp.ndarray:
    """Batched field centroids. A radiation field mask is convex (a possibly
    rotated rectangle), so ``binary_fill_holes`` reduces to the 4-directional
    crossing test — four cumulative scans, one fused XLA dispatch, no
    iteration (default). ``PYLINAC_TPU_FLOOD`` selects the alternatives for
    A/B: ``packed`` = bit-packed pallas Kogge-Stone flood, ``xla`` = vmapped
    CCL-based fill (exact for non-convex masks); the knob is part of the jit
    cache key so it can flip mid-process."""
    import os

    return _filled_centroid_batch_jit(
        arrs, thrs, mode=os.environ.get("PYLINAC_TPU_FLOOD", ""))


def _convex_fill_centroids(masks: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) bool → (B, 2) centroids of convex-filled masks: a pixel is
    inside iff a set pixel exists in all four axis directions (equals
    fill_holes for convex regions)."""
    m = masks.astype(jnp.int32)
    left = jnp.cumsum(m, axis=2) > 0
    right = jnp.cumsum(m[:, :, ::-1], axis=2)[:, :, ::-1] > 0
    top = jnp.cumsum(m, axis=1) > 0
    bot = jnp.cumsum(m[:, ::-1, :], axis=1)[:, ::-1, :] > 0
    f = (left & right & top & bot).astype(jnp.float32)
    b, h, w = masks.shape
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    mass = jnp.maximum(jnp.sum(f, axis=(1, 2)), 1.0)
    return jnp.stack([jnp.sum(f * yy, axis=(1, 2)) / mass,
                      jnp.sum(f * xx, axis=(1, 2)) / mass], axis=-1)


@functools.partial(jax.jit, static_argnames=("mode",))
def _filled_centroid_batch_jit(arrs: jnp.ndarray, thrs: jnp.ndarray,
                               mode: str) -> jnp.ndarray:
    from .ops.pallas_label import filled_centroid_packed, flood_packed_supported

    masks = arrs >= thrs[:, None, None]
    if mode == "xla":
        return jax.vmap(_filled_centroid_mask)(masks)
    if mode == "packed" and flood_packed_supported(masks.shape[1:]):
        return filled_centroid_packed(masks)
    return _convex_fill_centroids(masks)


@functools.partial(jax.jit, static_argnames=("win", "K", "dpmm",
                                             "bb_radius_mm", "tolerance_mm",
                                             "invert_bb", "mode"))
def _wl_detect_packed(arrs: jnp.ndarray, thrs: jnp.ndarray, *,
                      win: tuple[int, int, int, int], K: int, dpmm: float,
                      bb_radius_mm: float, tolerance_mm: float,
                      invert_bb: bool, mode: str) -> jnp.ndarray:
    """The whole WL detection pass — field centroids AND the windowed
    multi-threshold BB scan — for every image in ONE dispatch, returning
    one packed (B, 2 + 1 + 3K) array so the host pays exactly one fetch.

    Semantics match the two separate pre-passes: the field half is
    :func:`_filled_centroid_batch_jit`; the BB half crops the central
    search window ON DEVICE (the staged frames already hold the
    preprocessed pixels), applies the host prep (invert = max+min-w,
    stretch to [0, 1]) per window, and runs
    :func:`pylinac_tpu.metrics.batch_find.bb_scan_core`.
    Reference semantics: ``/root/reference/pylinac/winston_lutz.py:764``
    (field) and ``:788-808`` + ``metrics/utils.py:66`` (BB scan)."""
    from .metrics.batch_find import bb_scan_core, reference_cutoffs

    cents = _filled_centroid_batch_jit(arrs, thrs, mode=mode)
    top, bottom, left, right = win
    w = arrs[:, top:bottom, left:right].astype(jnp.float32)
    wmin = w.min(axis=(1, 2), keepdims=True)
    wmax = w.max(axis=(1, 2), keepdims=True)
    if invert_bb:
        w = (wmax + wmin) - w
    # stretch(min=0, max=1): constant windows yield an all-zero window
    # (threshold masks all-False -> "not found", same as the host path)
    w = (w - w.min(axis=(1, 2), keepdims=True)) / jnp.maximum(wmax - wmin, 1e-30)
    cutoffs = jnp.asarray(reference_cutoffs())      # traced constant
    bb = bb_scan_core(w, cutoffs, K=K, dpmm=dpmm, bb_radius_mm=bb_radius_mm,
                      tolerance_mm=tolerance_mm)
    return jnp.concatenate([cents, bb], axis=1)


class WLBaseImage(image.LinacDicomImage):
    """Base WL image: find field CAX(s) and BB(s), match to nominal
    (reference ``:629``)."""

    detection_conditions: list = [is_right_size_bb, is_round, is_right_circumference,
                                  is_symmetric, is_solid]

    def __init__(self, file, use_filenames: bool = False, **kwargs):
        if conditions := kwargs.pop("detection_conditions", False):
            self.detection_conditions = conditions
        kwargs.setdefault("missing_axis_value", "raise")
        super().__init__(file, use_filenames=use_filenames, **kwargs)
        self._is_analyzed = False

    def analyze(self, bb_arrangement: tuple[BBConfig, ...],
                is_open_field: bool = False, is_low_density: bool = False,
                shift_vector: Vector | None = None, snap_tolerance: float = 3,
                gantry_reference: float = 0, collimator_reference: float = 0,
                couch_reference: float = 0, bb_proximity_mm: float = 20,
                machine_scale: MachineScale = MachineScale.IEC61217) -> None:
        if snap_tolerance < 0:
            raise ValueError("Snap tolerance must be >= 0")
        self._snap_tolerance = snap_tolerance
        self._gantry_reference = gantry_reference
        self._collimator_reference = collimator_reference
        self._couch_reference = couch_reference
        self.machine_scale = machine_scale
        if not getattr(self, "_wl_preprocessed", False):
            self.check_inversion_by_histogram(percentiles=(0.01, 50, 99.99))
            self._clean_edges()
            self.ground()
            self.normalize()
            self._wl_preprocessed = True
        self.bb_arrangement = bb_arrangement
        field_caxs = self.find_field_centroids(is_open_field=is_open_field)
        field_matches = self.find_field_matches(field_caxs, bb_proximity_mm=bb_proximity_mm)
        detected_bb_points = self.find_bb_centroids(
            bb_diameter_mm=bb_arrangement[0].bb_size_mm, low_density=is_low_density)
        if shift_vector:
            lat, sup_inf = bb_projection_with_rotation(
                offset_left=-shift_vector.x, offset_up=shift_vector.z,
                offset_in=shift_vector.y, sad=self.sad, gantry=self.gantry_angle,
                couch=self.couch_angle, machine_scale=machine_scale)
            for p in detected_bb_points:
                p.x += lat * self.dpmm
                p.y -= sup_inf * self.dpmm
        bb_matches = self.find_bb_matches(detected_points=detected_bb_points,
                                          bb_proximity_mm=bb_proximity_mm)
        if len(bb_matches) != len(field_matches):
            raise ValueError("The number of detected fields and BBs do not match")
        if not field_matches:
            raise ValueError("No fields were detected")
        if not bb_matches:
            raise ValueError(BB_ERROR_MESSAGE)
        combined = {}
        for bb_name, bb_match in bb_matches.items():
            combined[bb_name] = BBFieldMatch(
                epid=self.cax, field=field_matches[bb_name], bb=bb_match,
                dpmm=self.dpmm, gantry_angle=self.gantry_angle,
                couch_angle=self.couch_angle, sad=self.sad)
        self._is_analyzed = True
        self.arrangement_matches = combined

    def find_field_centroids(self, is_open_field: bool) -> list[Point]:
        """Open: EPID center. Otherwise 50%-threshold + fill + center-of-mass
        on the device kernels (reference ``:764``). The fill + centroid run
        as ONE fused dispatch returning two scalars — fetching the filled
        mask itself costs ~0.2 s/image on a tunneled device."""
        if is_open_field:
            return [self.cax]
        pre = getattr(self, "_precomputed_field_centroid", None)
        if pre is not None:
            return [pre]
        vmin, vmax = np.percentile(self.array, [5, 99.9])
        cy, cx = np.asarray(_filled_centroid(
            jnp.asarray(np.asarray(self.array, np.float32)),
            jnp.float32((vmax - vmin) / 2 + vmin)))
        return [Point(x=float(cx), y=float(cy))]

    def find_field_matches(self, detected_points: list[Point], bb_proximity_mm: float) -> dict[str, Point]:
        return self.find_bb_matches(detected_points, bb_proximity_mm=bb_proximity_mm)

    def find_bb_centroids(self, bb_diameter_mm: float, low_density: bool) -> list[Point]:
        pre = getattr(self, "_precomputed_bb_points", None)
        if pre is not None:
            if not pre:
                raise ValueError(
                    "Couldn't find the minimum number of disks in the image. "
                    "Found 0; required: 1")
            # fresh copies: callers mutate the points (virtual shift)
            return [Point(x=p.x, y=p.y) for p in pre]
        bb_tolerance_mm = self._calculate_bb_tolerance(bb_diameter_mm)
        return self.compute(metrics=SizedDiskLocator.from_center_physical(
            expected_position_mm=(0, 0),
            search_window_mm=(40 + bb_diameter_mm, 40 + bb_diameter_mm),
            radius_mm=bb_diameter_mm / 2, radius_tolerance_mm=bb_tolerance_mm,
            invert=not low_density, detection_conditions=self.detection_conditions,
            name="BB"))

    def find_bb_matches(self, detected_points: list[Point], bb_proximity_mm: float) -> dict[str, Point]:
        bbs = {}
        for bb_arng in self.bb_arrangement:
            nominal = self.nominal_bb_position(bb_arng)
            distances = [nominal.distance_to(p) for p in detected_points]
            if not distances:
                continue
            min_distance = min(distances)
            idx = distances.index(min_distance)
            if min_distance < bb_proximity_mm * self.dpmm:
                bbs[bb_arng.name] = detected_points[idx]
        return bbs

    def nominal_bb_position(self, bb_config: BBConfig) -> Point:
        shift_x_mm, shift_y_mm = bb_projection_with_rotation(
            offset_left=bb_config.offset_left_mm, offset_up=bb_config.offset_up_mm,
            offset_in=bb_config.offset_in_mm, sad=self.sad, gantry=self.gantry_angle,
            couch=self.couch_angle, machine_scale=self.machine_scale)
        return Point(x=self.epid.x + shift_x_mm * self.dpmm,
                     y=self.epid.y - shift_y_mm * self.dpmm)

    def field_to_bb_distances(self) -> list[float]:
        return [m.bb_field_distance_mm for m in self.arrangement_matches.values()]

    def epid_to_bb_distances(self) -> list[float]:
        return [m.bb_epid_distance_mm for m in self.arrangement_matches.values()]

    @property
    def epid(self) -> Point:
        return self.cax

    def _calculate_bb_tolerance(self, bb_diameter: float) -> float:
        return float(np.interp(bb_diameter, (1.5, 30), (2, 4)))

    def to_axes(self) -> str:
        return (f"Gantry={self.gantry_angle:.1f}, Coll={self.collimator_angle:.1f}, "
                f"Couch={self.couch_angle:.1f}")

    @property
    def variable_axis(self) -> Axis:
        G0 = is_close_degrees(self.gantry_angle, self._gantry_reference, delta=self._snap_tolerance)
        B0 = is_close_degrees(self.collimator_angle, self._collimator_reference, delta=self._snap_tolerance)
        P0 = is_close_degrees(self.couch_angle, self._couch_reference, delta=self._snap_tolerance)
        if G0 and B0 and not P0:
            return Axis.COUCH
        elif G0 and P0 and not B0:
            return Axis.COLLIMATOR
        elif P0 and B0 and not G0:
            return Axis.GANTRY
        elif P0 and B0 and G0:
            return Axis.REFERENCE
        elif P0:
            return Axis.GB_COMBO
        return Axis.GBP_COMBO

    def _clean_edges(self, window_size: int = 2) -> None:
        """Crop until edges are near background (reference ``:1109``)."""

        def has_noise():
            near_min, near_max = np.percentile(self.array, [5, 99.5])
            img_range = near_max - near_min
            edge = np.concatenate((
                self.array[:window_size, :].flatten(),
                self.array[:, :window_size].flatten(),
                self.array[-window_size:, :].flatten(),
                self.array[:, -window_size:].flatten()))
            return (edge.min() < (near_min - img_range / 10)
                    or edge.max() > (near_max + img_range / 10))

        safety_stop = np.min(self.shape) / 10
        while has_noise() and safety_stop > 0:
            self.crop(window_size)
            safety_stop -= 1

    def plot(self, ax=None, show: bool = True, clear_fig: bool = False, **kwargs):
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        ax.imshow(self.array, cmap="gray")
        if getattr(self, "_is_analyzed", False):
            for match in self.arrangement_matches.values():
                ax.plot(match.field.x, match.field.y, "gs", ms=8, fillstyle="none")
                ax.plot(match.bb.x, match.bb.y, "ro", ms=8, fillstyle="none")
        if show:
            plt.show()
        return ax


@capture_warnings
class WinstonLutz2D(WLBaseImage, ResultsDataMixin[WinstonLutz2DResult]):
    """A single WL EPID image (reference ``:1137``)."""

    detection_conditions: list = [is_right_size_bb, is_round, is_right_circumference,
                                  is_symmetric, is_solid]

    def analyze(self, bb_size_mm: float = 5, low_density_bb: bool = False,
                open_field: bool = False, shift_vector: Vector | None = None,
                snap_tolerance: float = 3, gantry_reference: float = 0,
                collimator_reference: float = 0, couch_reference: float = 0,
                bb_proximity_mm: float = 20,
                machine_scale: MachineScale = MachineScale.IEC61217) -> None:
        bb_config = BBArrangement.ISO
        bb_config[0].bb_size_mm = bb_size_mm
        super().analyze(bb_arrangement=bb_config, is_open_field=open_field,
                        is_low_density=low_density_bb, shift_vector=shift_vector,
                        snap_tolerance=snap_tolerance,
                        gantry_reference=gantry_reference,
                        collimator_reference=collimator_reference,
                        couch_reference=couch_reference,
                        bb_proximity_mm=bb_proximity_mm, machine_scale=machine_scale)
        self.bb_arrangement = bb_config
        self.field_cax = self.arrangement_matches["Iso"].field
        self.bb = self.arrangement_matches["Iso"].bb

    def __repr__(self):
        return (f"WLImage(gantry={self.gantry_angle:.1f}, "
                f"coll={self.collimator_angle:.1f}, couch={self.couch_angle:.1f})")

    @property
    def cax2bb_vector(self) -> Vector:
        dist = (self.bb - self.field_cax) / self.dpmm
        return Vector(dist.x, dist.y, dist.z)

    @property
    def cax2bb_distance(self) -> float:
        return self.field_cax.distance_to(self.bb) / self.dpmm

    @property
    def cax2epid_vector(self) -> Vector:
        dist = (self.epid - self.field_cax) / self.dpmm
        return Vector(dist.x, dist.y, dist.z)

    @property
    def cax2epid_distance(self) -> float:
        return self.field_cax.distance_to(self.epid) / self.dpmm

    def _generate_results_data(self) -> WinstonLutz2DResult:
        if not self._is_analyzed:
            raise ValueError("The image is not analyzed. Use .analyze() first.")
        return WinstonLutz2DResult(
            variable_axis=self.variable_axis.value,
            cax2bb_vector=self.cax2bb_vector.dict(),
            cax2epid_vector=self.cax2epid_vector.dict(),
            cax2bb_distance=self.cax2bb_distance,
            cax2epid_distance=self.cax2epid_distance,
            bb_location=self.bb.dict(),
            field_cax=self.field_cax.dict(),
        )


@capture_warnings
class WinstonLutz(ResultsDataMixin[WinstonLutzResult], QuaacMixin):
    """Winston-Lutz multi-image analysis (reference ``:1235``)."""

    images: list[WinstonLutz2D]
    image_type = WinstonLutz2D
    is_from_cbct: bool = False
    _virtual_shift: str | None = None
    detection_conditions: list = [is_right_size_bb, is_round, is_right_circumference,
                                  is_symmetric, is_solid]

    def __init__(self, directory, use_filenames: bool = False,
                 axis_mapping: dict | None = None, axes_precision: int | None = None,
                 dpi: float | None = None, sid: float | None = None,
                 missing_axis_value="raise"):
        super().__init__()
        self.images = []
        if axis_mapping and not use_filenames:
            for filename, (gantry, coll, couch) in axis_mapping.items():
                self.images.append(self._load_image(
                    Path(directory) / filename, sid=sid, dpi=dpi, gantry=gantry,
                    coll=coll, couch=couch, axes_precision=axes_precision,
                    missing_axis_value=missing_axis_value))
        elif isinstance(directory, list):
            for file in directory:
                self.images.append(self._load_image(
                    file, dpi=dpi, sid=sid, use_filenames=use_filenames,
                    axes_precision=axes_precision,
                    missing_axis_value=missing_axis_value))
        elif not osp.isdir(directory):
            raise ValueError("Invalid directory passed.")
        else:
            files = sorted(p for p in Path(directory).rglob("*") if p.is_file())
            for file in files:
                try:
                    self.images.append(self._load_image(
                        file, dpi=dpi, sid=sid, use_filenames=use_filenames,
                        axes_precision=axes_precision,
                        missing_axis_value=missing_axis_value))
                except Exception:
                    continue
        if len(self.images) < 2:
            raise ValueError("<2 valid WL images were found in the folder/file.")
        self.images.sort(key=lambda i: (i.gantry_angle, i.collimator_angle, i.couch_angle))
        self._is_analyzed = False

    def _load_image(self, file, sid, dpi, **kwargs) -> WinstonLutz2D:
        extra = {}
        if sid is not None:
            extra["sid"] = sid
        if dpi is not None:
            extra["dpi"] = dpi
        img = self.image_type(str(file), **kwargs, **extra)
        img.detection_conditions = self.detection_conditions
        return img

    @classmethod
    def from_demo_images(cls, **kwargs):
        demo_file = retrieve_demo_file(name="winston_lutz.zip")
        return cls.from_zip(demo_file, **kwargs)

    @classmethod
    def from_zip(cls, zfile, **kwargs):
        with TemporaryZipDirectory(zfile) as tmpz:
            obj = cls(tmpz, **kwargs)
        return obj

    @classmethod
    def from_url(cls, url: str, **kwargs):
        zfile = get_url(url)
        return cls.from_zip(zfile, **kwargs)

    @classmethod
    def from_cbct_zip(cls, file, raw_pixels: bool = False, **kwargs):
        """4-angle WL from a zipped CBCT of a BB (reference ``winston_lutz.py:1427``)."""
        with TemporaryZipDirectory(file) as tmpz:
            obj = cls.from_cbct(tmpz, raw_pixels=raw_pixels, **kwargs)
        return obj

    @classmethod
    def from_cbct(cls, directory, raw_pixels: bool = False, **kwargs):
        """Create a 4-angle WL test from a CBCT dataset: max-intensity
        projections viewed from top/bottom/left/right, z-axis resampled to
        isotropic spacing (reference ``winston_lutz.py:1445``). Sets
        ``is_from_cbct`` so analyze() forces low-density BB + open field."""
        import tempfile

        from .core import dcm
        from .core.array_utils import array_to_dicom

        stack = image.DicomImageStack(directory, min_number=10,
                                      raw_pixels=raw_pixels)
        np_stack = np.stack([im.array for im in stack.images], axis=-1)
        ratio = (float(stack.metadata.SliceThickness)
                 / float(stack.metadata.PixelSpacing[0]))

        def zoom_z(arr2d: np.ndarray) -> np.ndarray:
            # linear resample along z (scipy.zoom grid_mode=True semantics)
            n_in = arr2d.shape[1]
            n_out = int(round(n_in * ratio))
            x = np.clip((np.arange(n_out) + 0.5) / ratio - 0.5, 0, n_in - 1)
            x0 = np.floor(x).astype(int)
            x1 = np.minimum(x0 + 1, n_in - 1)
            f = x - x0
            return arr2d[:, x0] * (1 - f) + arr2d[:, x1] * f

        left_arr = np.rot90(zoom_z(np_stack.max(axis=0)), k=1)
        top_arr = np.rot90(zoom_z(np_stack.max(axis=1)), k=1)
        right_arr = np.fliplr(left_arr)
        bottom_arr = np.fliplr(top_arr)
        dicom_dir = Path(tempfile.mkdtemp())
        dpi = 25.4 / float(stack.metadata.PixelSpacing[0])
        for array, gantry in zip((left_arr, top_arr, right_arr, bottom_arr),
                                 (270, 0, 90, 180)):
            ds = array_to_dicom(np.ascontiguousarray(array), sid=1000,
                                gantry=gantry, coll=0, couch=0, dpi=dpi)
            dcm.dcmwrite(dicom_dir / f"G={gantry}.dcm", ds)
        instance = cls(dicom_dir, **kwargs)
        instance.is_from_cbct = True
        return instance

    @staticmethod
    def run_demo():
        wl = WinstonLutz.from_demo_images()
        wl.analyze()
        print(wl.results())

    def analyze(self, bb_size_mm: float = 5,
                machine_scale: MachineScale = MachineScale.IEC61217,
                low_density_bb: bool = False, open_field: bool = False,
                apply_virtual_shift: bool = False, snap_tolerance: float = 3,
                gantry_reference: float = 0, collimator_reference: float = 0,
                couch_reference: float = 0, bb_proximity_mm: float = 20) -> None:
        """Analyze the WL image set (reference ``:1519``)."""
        self.machine_scale = machine_scale
        if self.is_from_cbct:
            low_density_bb = True
            open_field = True
        if not (not open_field
                and self._batch_detect(bb_size_mm, low_density_bb)):
            if not open_field:
                self._batch_field_centroids()
            self._batch_bb_centroids(bb_size_mm=bb_size_mm,
                                     low_density=low_density_bb)
        for img in self.images:
            img.analyze(bb_size_mm=bb_size_mm, low_density_bb=low_density_bb,
                        open_field=open_field, snap_tolerance=snap_tolerance,
                        gantry_reference=gantry_reference,
                        collimator_reference=collimator_reference,
                        couch_reference=couch_reference,
                        bb_proximity_mm=bb_proximity_mm, machine_scale=machine_scale)
        bb_config = BBArrangement.ISO[0]
        bb_config.bb_size_mm = bb_size_mm
        self.bb = BB3D(bb_config=bb_config,
                       bb_matches=[img.arrangement_matches["Iso"] for img in self.images],
                       scale=self.machine_scale)
        if apply_virtual_shift:
            shift = self.bb_shift_vector
            self._virtual_shift = self.bb_shift_instructions()
            for img in self.images:
                img.analyze(bb_size_mm=bb_size_mm, low_density_bb=low_density_bb,
                            open_field=open_field, shift_vector=shift,
                            snap_tolerance=snap_tolerance,
                            gantry_reference=gantry_reference,
                            collimator_reference=collimator_reference,
                            couch_reference=couch_reference,
                            machine_scale=machine_scale)
            self.bb = BB3D(bb_config=bb_config,
                           bb_matches=[img.arrangement_matches["Iso"] for img in self.images],
                           scale=self.machine_scale)
        self._is_analyzed = True
        self._bb_diameter = bb_size_mm

    def _batch_field_centroids(self) -> None:
        """Pre-pass: preprocess every image (host numpy) then compute ALL
        field centroids in one fused device dispatch per shape group — the
        per-image dispatch round trips dominate WL latency on a tunneled
        device.

        The batch default fills the threshold mask with the 4-directional
        convex crossing test (:func:`_convex_fill_centroids`), which equals
        the sequential path's exact ``fill_holes`` for convex masks — a
        radiation field is a (possibly rotated) rectangle, so this holds for
        every supported field shape; ``PYLINAC_TPU_FLOOD=xla`` selects the
        exact fill for pathological non-convex masks
        (parity bound: ``tests/ops/test_label_batch.py``)."""
        self._ensure_preprocessed()
        staged = getattr(self, "_field_stage_cache", None)
        if staged is None:
            # preprocessed pixels are immutable for the session's lifetime:
            # stage them (and the percentile thresholds) on device ONCE —
            # re-shipping ~50 MB of EPID frames dominated repeat analyzes
            groups: dict[tuple, list] = {}
            for img in self.images:
                groups.setdefault(tuple(img.array.shape), []).append(img)
            staged = []
            for shaped in groups.values():
                arrs, thrs = [], []
                for img in shaped:
                    vmin, vmax = np.percentile(img.array, [5, 99.9])
                    arrs.append(np.asarray(img.array, np.float32))
                    thrs.append((vmax - vmin) / 2 + vmin)
                from .ops.staging import stage
                staged.append((shaped, stage(np.stack(arrs)),
                               jnp.asarray(thrs, jnp.float32)))
            self._field_stage_cache = staged
        for shaped, stackdev, thrsdev in staged:
            cents = np.asarray(_filled_centroid_batch(stackdev, thrsdev))
            for img, c in zip(shaped, cents):
                img._precomputed_field_centroid = Point(x=float(c[1]),
                                                        y=float(c[0]))

    def _ensure_preprocessed(self) -> None:
        """Apply the per-image WL preprocessing chain once (the pre-passes
        and ``WLBaseImage.analyze`` share this state)."""
        for img in self.images:
            if not getattr(img, "_wl_preprocessed", False):
                img.check_inversion_by_histogram(percentiles=(0.01, 50, 99.99))
                img._clean_edges()
                img.ground()
                img.normalize()
                img._wl_preprocessed = True

    def _batch_detect(self, bb_size_mm: float, low_density: bool) -> bool:
        """The fully fused detection pre-pass: field centroids + BB scan for
        the whole image set in ONE device dispatch and ONE packed fetch
        (:func:`_wl_detect_packed`). Returns False when the session isn't
        fusable — custom detection conditions, mixed dpmm, or mixed frame
        shapes — and the caller falls back to the two separate pre-passes.
        Results are identical to those pre-passes (same kernels, composed)."""
        import math as _math
        import os

        default = WLBaseImage.detection_conditions
        if any(list(img.detection_conditions) != list(default)
               for img in self.images):
            return False
        dpmms = {round(float(img.dpmm), 6) for img in self.images}
        if len(dpmms) != 1:
            return False
        self._ensure_preprocessed()
        shapes = {tuple(img.array.shape) for img in self.images}
        if len(shapes) != 1:
            return False
        cache_key = (round(float(bb_size_mm), 6), bool(low_density))
        cached = getattr(self, "_bb_scan_cache", None)
        if cached is not None and cached[0] == cache_key:
            # BB detections are cached; only the field half needs a pass
            for img, pts in zip(self.images, cached[1]):
                img._precomputed_bb_points = pts
            self._batch_field_centroids()
            return True
        # stage the (B, H, W) preprocessed stack + field thresholds once
        # (shared with _batch_field_centroids' cache format)
        staged = getattr(self, "_field_stage_cache", None)
        if staged is None:
            arrs, thrs = [], []
            for img in self.images:
                vmin, vmax = np.percentile(img.array, [5, 99.9])
                arrs.append(np.asarray(img.array, np.float32))
                thrs.append((vmax - vmin) / 2 + vmin)
            from .ops.staging import stage
            staged = [(list(self.images), stage(np.stack(arrs)),
                       jnp.asarray(thrs, jnp.float32))]
            self._field_stage_cache = staged
        if len(staged) != 1 or len(staged[0][0]) != len(self.images):
            return False
        _, stackdev, thrsdev = staged[0]
        H, W = stackdev.shape[1:]
        dpmm = float(self.images[0].dpmm)
        # window geometry mirrors SizedDiskRegion.calculate
        # (from_center_physical with expected position (0, 0))
        sw = (40 + bb_size_mm) * dpmm
        left = max(_math.floor(W / 2 - sw / 2), 0)
        right = min(_math.ceil(W / 2 + sw / 2), W)
        top = max(_math.floor(H / 2 - sw / 2), 0)
        bottom = min(_math.ceil(H / 2 + sw / 2), H)
        K = 24
        tol_mm = self.images[0]._calculate_bb_tolerance(bb_size_mm)
        packed = np.asarray(_wl_detect_packed(
            stackdev, thrsdev, win=(top, bottom, left, right), K=K,
            dpmm=dpmm, bb_radius_mm=float(bb_size_mm) / 2,
            tolerance_mm=float(tol_mm), invert_bb=not low_density,
            mode=os.environ.get("PYLINAC_TPU_FLOOD", "")))
        all_pts = []
        for img, row in zip(self.images, packed):
            img._precomputed_field_centroid = Point(x=float(row[1]),
                                                    y=float(row[0]))
            bb = row[2:]
            kept = bb[1:1 + K].astype(bool)
            wr = bb[1 + K:1 + 2 * K]
            wc = bb[1 + 2 * K:1 + 3 * K]
            pts = ([Point(x=float(c) + left, y=float(r) + top)
                    for r, c, k in zip(wr, wc, kept) if k]
                   if bool(bb[0]) else [])
            img._precomputed_bb_points = pts
            all_pts.append(pts)
        self._bb_scan_cache = (cache_key, all_pts)
        return True

    def _batch_bb_centroids(self, bb_size_mm: float, low_density: bool) -> None:
        """Pre-pass: the windowed multi-threshold BB search for ALL images in
        one fused device dispatch per shape group
        (:func:`pylinac_tpu.metrics.batch_find.batched_bb_windows`) — the
        per-image scan costs one device round trip per threshold, which
        dominates WL latency on a remote chip.  Results are cached on each
        image and are identical to the sequential path (reference semantics:
        ``/root/reference/pylinac/winston_lutz.py:788-808``)."""
        import math as _math

        from .metrics.batch_find import batched_bb_windows

        default = WLBaseImage.detection_conditions
        if any(list(img.detection_conditions) != list(default)
               for img in self.images):
            return  # custom predicate chains take the per-image path
        dpmms = {round(float(img.dpmm), 6) for img in self.images}
        if len(dpmms) != 1:
            return
        cache_key = (round(float(bb_size_mm), 6), bool(low_density))
        cached = getattr(self, "_bb_scan_cache", None)
        if cached is not None and cached[0] == cache_key:
            # detections are shift-independent (virtual shifts move copies),
            # so repeat analyzes reuse the batched scan outright
            for img, pts in zip(self.images, cached[1]):
                img._precomputed_bb_points = pts
            return
        self._ensure_preprocessed()
        dpmm = float(self.images[0].dpmm)
        windows, offsets = [], []
        for img in self.images:
            # window geometry mirrors SizedDiskRegion.calculate
            # (from_center_physical with expected position (0, 0))
            sw = (40 + bb_size_mm) * dpmm
            cx = img.shape[1] / 2
            cy = img.shape[0] / 2
            left = max(_math.floor(cx - sw / 2), 0)
            right = _math.ceil(cx + sw / 2)
            top = max(_math.floor(cy - sw / 2), 0)
            bottom = _math.ceil(cy + sw / 2)
            windows.append(np.asarray(img.array)[top:bottom, left:right])
            offsets.append((top, left))
        tol_mm = self.images[0]._calculate_bb_tolerance(bb_size_mm)
        found = batched_bb_windows(windows, dpmm, bb_size_mm / 2, tol_mm,
                                   invert=not low_density)
        all_pts = []
        for img, pts, (top, left) in zip(self.images, found, offsets):
            img._precomputed_bb_points = [Point(x=c + left, y=r + top)
                                          for r, c in pts]
            all_pts.append(img._precomputed_bb_points)
        self._bb_scan_cache = (cache_key, all_pts)

    @lru_cache()
    def _minimize_axis(self, axes=(Axis.GANTRY,)):
        """Minimax distance point to the projection rays — jitted Nelder-Mead."""
        if isinstance(axes, Axis):
            axes = (axes,)
        rays = [img.arrangement_matches["Iso"].bb_to_field_projection
                for img in self.images
                if img.variable_axis in (axes + (Axis.REFERENCE,))]
        if len(rays) <= 1:
            raise ValueError(
                "Not enough images of the given type to identify the axis isocenter")
        p1 = np.array([[l.point1.x, l.point1.y, l.point1.z] for l in rays], np.float32)
        p2 = np.array([[l.point2.x, l.point2.y, l.point2.z] for l in rays], np.float32)
        d = p2 - p1
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        p1j = jnp.asarray(p1)
        dj = jnp.asarray(d)

        def objective(p):
            w = p[None, :] - p1j
            cross = jnp.cross(dj, -w)
            dist = jnp.linalg.norm(cross, axis=1)
            return jnp.max(dist)

        x, fx = nelder_mead(objective, jnp.zeros(3, jnp.float32), xatol=1e-5,
                            fatol=1e-6, max_iter=600)

        class _Result:
            pass

        res = _Result()
        res.x = np.asarray(x)
        res.fun = float(fx)
        return res

    @property
    def gantry_iso_size(self) -> float:
        num = self._get_images((Axis.GANTRY, Axis.REFERENCE))[0]
        if num > 1:
            return self._minimize_axis(Axis.GANTRY).fun * 2
        return 0

    @property
    def gantry_coll_iso_size(self) -> float:
        num = self._get_images((Axis.GANTRY, Axis.COLLIMATOR, Axis.GB_COMBO, Axis.REFERENCE))[0]
        if num > 1:
            return self._minimize_axis((Axis.GANTRY, Axis.COLLIMATOR, Axis.GB_COMBO)).fun * 2
        return 0

    @staticmethod
    def _find_max_distance_between_points(images) -> float:
        points = [Point(img.cax2bb_vector.x, img.cax2bb_vector.y) for img in images]
        return max(p1.distance_to(p2) for p1 in points for p2 in points)

    @property
    def collimator_iso_size(self) -> float:
        num, imgs = self._get_images((Axis.COLLIMATOR, Axis.REFERENCE))
        if num > 1:
            return self._find_max_distance_between_points(imgs)
        return 0

    @property
    def couch_iso_size(self) -> float:
        num, imgs = self._get_images((Axis.COUCH, Axis.REFERENCE))
        if num > 1:
            return self._find_max_distance_between_points(imgs)
        return 0

    def _get_images(self, axis=(Axis.GANTRY,)) -> tuple[int, list]:
        if isinstance(axis, Axis):
            axis = (axis,)
        images = [img for img in self.images if img.variable_axis in axis]
        return len(images), images

    @property
    def bb_shift_vector(self) -> Vector:
        return self.bb.measured_field_position - self.bb.measured_bb_position

    def bb_shift_instructions(self, couch_vrt: float | None = None,
                              couch_lng: float | None = None,
                              couch_lat: float | None = None) -> str:
        sv = self.bb_shift_vector
        x_dir = "LEFT" if sv.x < 0 else "RIGHT"
        y_dir = "IN" if sv.y > 0 else "OUT"
        z_dir = "UP" if sv.z > 0 else "DOWN"
        move = (f"{x_dir} {abs(sv.x):2.2f}mm; {y_dir} {abs(sv.y):2.2f}mm; "
                f"{z_dir} {abs(sv.z):2.2f}mm")
        if all(v is not None for v in [couch_vrt, couch_lat, couch_lng]):
            new_lat = round(couch_lat + sv.x / 10, 2)
            new_vrt = round(couch_vrt + sv.z / 10, 2)
            new_lng = round(couch_lng + sv.y / 10, 2)
            move += (f"\nNew couch coordinates (cm): VRT: {new_vrt:3.2f}; "
                     f"LNG: {new_lng:3.2f}; LAT: {new_lat:3.2f}")
        return move

    def axis_rms_deviation(self, axis=Axis.GANTRY, value: str = "all"):
        if isinstance(axis, Iterable) and not isinstance(axis, (str, Axis)):
            axis = tuple(convert_to_enum(ax, Axis) for ax in axis)
        else:
            axis = convert_to_enum(axis, Axis)
        if axis != Axis.EPID:
            attr = "cax2bb_vector"
        else:
            attr = "cax2epid_vector"
            axis = (Axis.GANTRY, Axis.COLLIMATOR, Axis.REFERENCE)
        imgs = self._get_images(axis=axis)[1]
        if len(imgs) <= 1:
            return (0,)
        rms = [getattr(img, attr).as_scalar() for img in imgs]
        if value == "range":
            rms = max(rms) - min(rms)
        return rms

    def cax2bb_distance(self, metric: str = "max") -> float:
        distances = []
        for img in self.images:
            distances.extend(img.field_to_bb_distances())
        if metric == "max":
            return max(distances)
        elif metric == "median":
            return statistics.median(distances)
        elif metric == "mean":
            return statistics.mean(distances)
        raise ValueError(f"Unknown metric {metric}")

    def cax2epid_distance(self, metric: str = "max") -> float:
        distances = [img.cax2epid_distance for img in self.images]
        if metric == "max":
            return max(distances)
        elif metric == "median":
            return statistics.median(distances)
        elif metric == "mean":
            return statistics.mean(distances)
        raise ValueError(f"Unknown metric {metric}")

    def results(self, as_list: bool = False) -> str | list[str]:
        num_gantry = self._get_images((Axis.GANTRY, Axis.REFERENCE))[0]
        num_coll = self._get_images((Axis.COLLIMATOR, Axis.REFERENCE))[0]
        num_couch = self._get_images((Axis.COUCH, Axis.REFERENCE))[0]
        results = [
            "Winston-Lutz Analysis",
            "=====================",
            f"Number of images: {len(self.images)}",
            f"Maximum 2D CAX->BB distance: {self.cax2bb_distance('max'):.2f}mm",
            f"Median 2D CAX->BB distance: {self.cax2bb_distance('median'):.2f}mm",
            f"Mean 2D CAX->BB distance: {self.cax2bb_distance('mean'):.2f}mm",
            f"Shift to iso: facing gantry, move BB: {self.bb_shift_instructions()}",
            f"Gantry 3D isocenter diameter: {self.gantry_iso_size:.2f}mm ({num_gantry}/{len(self.images)} images considered)",
            f"Maximum Gantry RMS deviation (mm): {max(self.axis_rms_deviation(Axis.GANTRY)):.2f}mm",
            f"Maximum EPID RMS deviation (mm): {max(self.axis_rms_deviation(Axis.EPID)):.2f}mm",
            f"Gantry+Collimator 3D isocenter diameter: {self.gantry_coll_iso_size:.2f}mm",
            f"Collimator 2D isocenter diameter: {self.collimator_iso_size:.2f}mm ({num_coll}/{len(self.images)} images considered)",
            f"Maximum Collimator RMS deviation (mm): {max(self.axis_rms_deviation(Axis.COLLIMATOR)):.2f}",
            f"Couch 2D isocenter diameter: {self.couch_iso_size:.2f}mm ({num_couch}/{len(self.images)} images considered)",
            f"Maximum Couch RMS deviation (mm): {max(self.axis_rms_deviation(Axis.COUCH)):.2f}",
        ]
        if self._virtual_shift:
            results.insert(3, f"Virtual shift applied: {self._virtual_shift}")
        if not as_list:
            return "\n".join(results)
        return results

    def _generate_results_data(self) -> WinstonLutzResult:
        num_gantry = self._get_images((Axis.GANTRY, Axis.REFERENCE))[0]
        num_coll = self._get_images((Axis.COLLIMATOR, Axis.REFERENCE))[0]
        num_couch = self._get_images((Axis.COUCH, Axis.REFERENCE))[0]
        num_gantry_coll = self._get_images(
            (Axis.GANTRY, Axis.COLLIMATOR, Axis.GB_COMBO, Axis.REFERENCE))[0]
        individual_results = [img._generate_results_data() for img in self.images]
        keyed = {
            f"G{img.gantry_angle:g}B{img.collimator_angle:g}P{img.couch_angle:g}": res
            for img, res in zip(self.images, individual_results)}
        return WinstonLutzResult(
            num_total_images=len(self.images),
            num_gantry_images=num_gantry,
            num_coll_images=num_coll,
            num_couch_images=num_couch,
            num_gantry_coll_images=num_gantry_coll,
            max_2d_cax_to_bb_mm=self.cax2bb_distance("max"),
            median_2d_cax_to_bb_mm=self.cax2bb_distance("median"),
            mean_2d_cax_to_bb_mm=self.cax2bb_distance("mean"),
            max_2d_cax_to_epid_mm=self.cax2epid_distance("max"),
            median_2d_cax_to_epid_mm=self.cax2epid_distance("median"),
            mean_2d_cax_to_epid_mm=self.cax2epid_distance("mean"),
            coll_2d_iso_diameter_mm=self.collimator_iso_size,
            couch_2d_iso_diameter_mm=self.couch_iso_size,
            gantry_3d_iso_diameter_mm=self.gantry_iso_size,
            gantry_coll_3d_iso_diameter_mm=self.gantry_coll_iso_size,
            max_gantry_rms_deviation_mm=max(self.axis_rms_deviation(Axis.GANTRY)),
            max_coll_rms_deviation_mm=max(self.axis_rms_deviation(Axis.COLLIMATOR)),
            max_couch_rms_deviation_mm=max(self.axis_rms_deviation(Axis.COUCH)),
            max_epid_rms_deviation_mm=max(self.axis_rms_deviation(Axis.EPID)),
            bb_shift_vector=self.bb_shift_vector.dict(),
            image_details=individual_results,
            keyed_image_details=keyed,
        )

    def _quaac_datapoints(self) -> dict[str, QuaacDatum]:
        return {
            "Max 2D CAX->BB distance": QuaacDatum(value=self.cax2bb_distance("max"), unit="mm"),
            "Median 2D CAX->BB distance": QuaacDatum(value=self.cax2bb_distance("median"), unit="mm"),
            "Gantry 3D isocenter diameter": QuaacDatum(value=self.gantry_iso_size, unit="mm"),
            "Collimator 2D isocenter diameter": QuaacDatum(value=self.collimator_iso_size, unit="mm"),
            "Couch 2D isocenter diameter": QuaacDatum(value=self.couch_iso_size, unit="mm"),
        }

    def plot_images(self, show: bool = True, **kwargs):
        import matplotlib.pyplot as plt

        n = len(self.images)
        cols = min(4, n)
        rows = int(np.ceil(n / cols))
        fig, axes = plt.subplots(rows, cols, figsize=(cols * 3, rows * 3))
        for ax, img in zip_longest(np.atleast_1d(axes).ravel(), self.images):
            if img is None:
                ax.axis("off")
                continue
            img.plot(ax=ax, show=False)
        if show:
            plt.show()
        return fig, axes

    def plot_summary(self, show: bool = True, **kwargs):  # pragma: no cover
        return self.plot_images(show=show, **kwargs)

    def plot_axis_images(self, axis=Axis.GANTRY, show: bool = True, ax=None):
        """Plot the reference image with the BB/CAX markers of every image
        of the given axis overlaid (reference ``:2140``)."""
        import matplotlib.pyplot as plt

        axis = convert_to_enum(axis, Axis)
        images = [img for img in self.images
                  if img.variable_axis in (axis, Axis.REFERENCE)]
        if not images:
            raise ValueError(f"No images found for axis {axis}")
        if ax is None:
            _, ax = plt.subplots()
        images[0].plot(ax=ax, show=False)
        for img in images:
            for match in img.arrangement_matches.values():
                ax.plot(match.bb.x, match.bb.y, "r+", markersize=8)
                ax.plot(match.field.x, match.field.y, "bx", markersize=8)
        ax.set_title(f"{axis.value} images")
        if show:
            plt.show()
        return ax

    def plot_location(self, show: bool = True, viewbox_mm: float | None = None,
                      plot_bb: bool = True, plot_isocenter_sphere: bool = True,
                      plot_couch_iso: bool = True, plot_coll_iso: bool = True,
                      show_legend: bool = True):
        """3D plot of the BB location(s) and isocenter sphere, iso at the
        origin (reference ``:2191``)."""
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        limit = viewbox_mm or max(3.0, 2 * self.cax2bb_distance("max") + 2)
        if plot_bb:
            for bb in getattr(self, "bbs", []):
                m = bb.measured_position
                ax.scatter(m.x, m.y, m.z, color="green", label="BB")
        if plot_isocenter_sphere:
            u, v = np.mgrid[0: 2 * np.pi: 20j, 0: np.pi: 10j]
            try:
                r = self.gantry_iso_size / 2
            except NotImplementedError:
                r = 0
            ax.plot_wireframe(r * np.cos(u) * np.sin(v), r * np.sin(u) * np.sin(v),
                              r * np.cos(v), color="blue", alpha=0.3,
                              label="Gantry iso")
        ax.set_xlim(-limit, limit)
        ax.set_ylim(-limit, limit)
        ax.set_zlim(-limit, limit)
        ax.set_xlabel("X (mm), LEFT (+)")
        ax.set_ylabel("Y (mm), IN (+)")
        ax.set_zlabel("Z (mm), UP (+)")
        if show_legend:
            ax.legend()
        if show:
            plt.show()
        return fig, ax

    def plotly_analyzed_images(self, show: bool = True, show_colorbar: bool = True,
                               show_legend: bool = True, **kwargs):
        """Plotly figures: one per image (field/BB markers) plus a 3D
        isocenter visualization (reference ``winston_lutz.py:1830``).
        Returns ``{name: Figure}`` of plotly JSON-schema figures
        (:mod:`..core.plotly_utils`)."""
        from .core import plotly_utils as pu

        if not self._is_analyzed:
            raise RuntimeError("The images must be analyzed first. Use .analyze().")
        figs: dict[str, pu.Figure] = {}
        for idx, img in enumerate(self.images):
            fig = pu.image_figure(img.array, title=str(img.to_axes()),
                                  show_colorbar=show_colorbar, **kwargs)
            for match in img.arrangement_matches.values():
                fig.add_trace(pu.marker_trace(
                    [match.field.x], [match.field.y], name="Field CAX",
                    symbol="square-open", color="green",
                    showlegend=show_legend))
                fig.add_trace(pu.marker_trace(
                    [match.bb.x], [match.bb.y], name="BB",
                    symbol="circle-open", color="red",
                    showlegend=show_legend))
            figs[f"{idx} - {img.to_axes()}"] = fig

        iso_fig = pu.Figure()
        for bb in getattr(self, "bbs", []):
            m = bb.measured_position
            iso_fig.add_trace({
                "type": "scatter3d", "x": [m.x], "y": [m.y], "z": [m.z],
                "mode": "markers", "name": "BB",
                "marker": {"color": "green", "size": 4}})
        try:
            r = self.gantry_iso_size / 2
            u, v = np.mgrid[0:2 * np.pi:20j, 0:np.pi:10j]
            iso_fig.add_trace({
                "type": "surface",
                "x": r * np.cos(u) * np.sin(v),
                "y": r * np.sin(u) * np.sin(v),
                "z": r * np.cos(v),
                "opacity": 0.2, "showscale": False, "name": "Isocenter sphere"})
        except (NotImplementedError, ValueError):
            pass
        pu.add_title(iso_fig, "Isocenter Visualization")
        iso_fig.update_layout(showlegend=show_legend)
        figs["Isocenter Visualization"] = iso_fig
        if show:
            for f in figs.values():
                f.show()
        return figs

    def save_images(self, prefix: str = "", **kwargs) -> list[str]:
        """Save each image's analyzed plot to PNG files (reference ``:2242``)."""
        import matplotlib.pyplot as plt

        names = []
        for img in self.images:
            fig, ax = plt.subplots()
            img.plot(ax=ax, show=False)
            name = f"{prefix}{img.base_path if hasattr(img, 'base_path') else id(img)}.png"
            fig.savefig(name, **kwargs)
            plt.close(fig)
            names.append(name)
        return names

    def save_images_to_stream(self, **kwargs) -> dict:
        """Save each image's analyzed plot to BytesIO streams keyed by a
        human axis title (reference ``:2263``)."""
        import io as _io

        import matplotlib.pyplot as plt

        streams = {}
        for idx, img in enumerate(self.images):
            fig, ax = plt.subplots()
            img.plot(ax=ax, show=False)
            stream = _io.BytesIO()
            fig.savefig(stream, **kwargs)
            plt.close(fig)
            title = (f"G{img.gantry_angle:.0f}, C{img.collimator_angle:.0f}, "
                     f"P{img.couch_angle:.0f} ({idx})")
            streams[title] = stream
        return streams

    def save_summary(self, filename, **kwargs) -> None:
        """Save the summary plot to file."""
        import matplotlib.pyplot as plt

        fig, _ = self.plot_summary(show=False)
        fig.savefig(filename, **kwargs)
        plt.close(fig)

    def publish_pdf(self, filename, notes=None, open_file: bool = False,
                    metadata: dict | None = None, logo=None) -> None:
        from .core import pdf

        canvas = pdf.PylinacCanvas(filename, page_title="Winston-Lutz Analysis",
                                   metadata=metadata, logo=logo)
        canvas.add_text(text=self.results(as_list=True), location=(2, 25.5), font_size=11)
        if notes is not None:
            canvas.add_text(text=notes, location=(2, 4))
        canvas.finish()


class WinstonLutzMultiTargetMultiFieldImage(WLBaseImage):
    """A WL image with multiple fields/BBs (reference ``:2728``)."""

    detection_conditions = [is_round, is_modest_size, is_symmetric]

    def find_field_centroids(self, is_open_field: bool) -> list[Point]:
        """All fields at once: the locator is parameterized with the mean
        rad size and a tolerance spanning the arrangement's size range
        (reference ``:2734-2766``)."""
        if is_open_field:
            return [self.cax]
        from .metrics.image import GlobalSizedFieldLocator

        sizes = [bb.rad_size_mm for bb in self.bb_arrangement]
        mean_size = (max(sizes) + min(sizes)) / 2
        tolerance = max((max(sizes) - min(sizes)) * 1.2, 0.1 * mean_size)
        return self.compute(metrics=GlobalSizedFieldLocator.from_physical(
            field_width_mm=mean_size, field_height_mm=mean_size,
            field_tolerance_mm=tolerance, max_number=len(self.bb_arrangement)))

    def find_bb_centroids(self, bb_diameter_mm: float, low_density: bool) -> list[Point]:
        """Per-BB windowed search at each arrangement's projected position
        (reference ``:2768-2800``); individual misses are tolerated."""
        from .metrics.image import SizedDiskLocator

        centers = []
        for bb in self.bb_arrangement:
            bb_tolerance_mm = self._calculate_bb_tolerance(bb.bb_size_mm)
            left, sup = bb_projection_with_rotation(
                offset_left=bb.offset_left_mm, offset_up=bb.offset_up_mm,
                offset_in=bb.offset_in_mm, gantry=self.gantry_angle,
                couch=self.couch_angle, sad=self.sad)
            try:
                centers.extend(self.compute(
                    metrics=SizedDiskLocator.from_center_physical(
                        # -sup: WL coords vs image coords
                        expected_position_mm=Point(x=left, y=-sup),
                        search_window_mm=(40 + bb.bb_size_mm, 40 + bb.bb_size_mm),
                        radius_mm=bb.bb_size_mm / 2,
                        radius_tolerance_mm=bb_tolerance_mm / 2,
                        invert=not low_density,
                        detection_conditions=self.detection_conditions)))
            except ValueError:
                pass
        return centers


@capture_warnings
class WinstonLutzMultiTargetMultiField(WinstonLutz,
                                       ResultsDataMixin[WinstonLutzMultiTargetMultiFieldResult]):
    """Multi-target multi-field WL (reference ``:2804``)."""

    image_type = WinstonLutzMultiTargetMultiFieldImage
    bb_arrangement: tuple[BBConfig, ...]
    bbs: list[BB3D]

    @classmethod
    def from_demo_images(cls, **kwargs):
        demo_file = retrieve_demo_file(name="mt_mf_wl.zip")
        return cls.from_zip(demo_file, **kwargs)

    @staticmethod
    def run_demo():
        wl = WinstonLutzMultiTargetMultiField.from_demo_images()
        wl.analyze(bb_arrangement=BBArrangement.DEMO)
        print(wl.results())

    def analyze(self, bb_arrangement: tuple[BBConfig, ...],
                is_open_field: bool = False, is_low_density: bool = False,
                machine_scale: MachineScale = MachineScale.IEC61217,
                snap_tolerance: float = 3) -> None:
        self.machine_scale = machine_scale
        self.bb_arrangement = bb_arrangement
        for img in self.images:
            img.analyze(bb_arrangement=bb_arrangement, is_open_field=is_open_field,
                        is_low_density=is_low_density, snap_tolerance=snap_tolerance,
                        machine_scale=machine_scale)
        self.bbs = []
        for arrangement in bb_arrangement:
            matches = [img.arrangement_matches[arrangement.name]
                       for img in self.images
                       if arrangement.name in img.arrangement_matches]
            if len(matches) < 2:
                continue
            self.bbs.append(BB3D(bb_config=arrangement, bb_matches=matches,
                                 scale=machine_scale))
        self._is_analyzed = True

    def max_bb_deviation_2d(self, bb_name: str) -> float:
        for bb in self.bbs:
            if bb.bb_config.name == bb_name:
                return max(m.bb_field_distance_mm for m in bb.matches)
        raise ValueError(f"No BB arrangement named {bb_name}")

    @property
    def bb_maxes(self) -> dict[str, float]:
        return {bb.bb_config.name: self.max_bb_deviation_2d(bb.bb_config.name)
                for bb in self.bbs}

    def _field_to_bb_distances(self) -> list[float]:
        return [d for img in self.images for d in img.field_to_bb_distances()]

    def cax2bb_distance(self, metric: str = "max") -> float:
        distances = self._field_to_bb_distances()
        if metric == "max":
            return max(distances)
        elif metric == "median":
            return statistics.median(distances)
        elif metric == "mean":
            return statistics.mean(distances)
        raise ValueError(f"Unknown metric {metric}")

    @property
    def bb_shift_vector(self):
        """6DOF alignment of measured BBs to nominal (reference ``:2938``)."""
        measured = [bb.measured_bb_position for bb in self.bbs]
        # the ideal position is relative to the measured field positions
        ideal = [bb.measured_field_position for bb in self.bbs]
        vector, yaw, pitch, roll = align_points(measured, ideal)
        return vector, yaw, pitch, roll

    def bb_shift_instructions(self) -> str:
        vector, yaw, pitch, roll = self.bb_shift_vector
        x_dir = "LEFT" if vector.x < 0 else "RIGHT"
        y_dir = "IN" if vector.y > 0 else "OUT"
        z_dir = "UP" if vector.z > 0 else "DOWN"
        return (f"{x_dir} {abs(vector.x):2.2f}mm; {y_dir} {abs(vector.y):2.2f}mm; "
                f"{z_dir} {abs(vector.z):2.2f}mm; Rotation {yaw:2.2f}°")

    def results(self, as_list: bool = False) -> str | list[str]:
        results = [
            "Winston-Lutz Multi-Target Multi-Field Analysis",
            "==============================================",
            f"Number of images: {len(self.images)}",
            "",
            "2D distances",
            "============",
            f"Max 2D distance of any BB->Field: {self.cax2bb_distance('max'):.2f} mm",
            f"Mean 2D distance of any BB->Field: {self.cax2bb_distance('mean'):.2f} mm",
            f"Median 2D distance of any BB->Field: {self.cax2bb_distance('median'):.2f} mm",
        ]
        for name, value in self.bb_maxes.items():
            results.append(f"Max 2D distance of BB {name}: {value:.2f} mm")
        if not as_list:
            return "\n".join(results)
        return results

    def _generate_results_data(self) -> WinstonLutzMultiTargetMultiFieldResult:
        vector, yaw, pitch, roll = self.bb_shift_vector
        return WinstonLutzMultiTargetMultiFieldResult(
            num_total_images=len(self.images),
            max_2d_field_to_bb_mm=self.cax2bb_distance("max"),
            mean_2d_field_to_bb_mm=self.cax2bb_distance("mean"),
            median_2d_field_to_bb_mm=self.cax2bb_distance("median"),
            bb_arrangement=self.bb_arrangement,
            bb_maxes=self.bb_maxes,
            bb_shift_vector=vector.dict(),
            bb_shift_yaw=yaw,
            bb_shift_pitch=pitch,
            bb_shift_roll=roll,
        )

    def _quaac_datapoints(self) -> dict[str, QuaacDatum]:
        return {
            "Max 2D BB->Field distance": QuaacDatum(value=self.cax2bb_distance("max"), unit="mm"),
            "Mean 2D BB->Field distance": QuaacDatum(value=self.cax2bb_distance("mean"), unit="mm"),
        }
