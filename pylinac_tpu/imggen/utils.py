"""Scenario builders for synthetic QA images (parity: reference
``core/image_generator/utils.py``): picket fence, Winston-Lutz sets,
light/rad fields."""

from __future__ import annotations

import io
import os.path as osp
from typing import Sequence

import numpy as np

from ..core import dcm
from ..core.scale import MachineScale, convert
from .layers import (
    FilteredFieldLayer,
    FilterFreeConeLayer,
    FilterFreeFieldLayer,
    GaussianFilterLayer,
    Layer,
    PerfectBBLayer,
    PerfectConeLayer,
    PerfectFieldLayer,
)
from .simulators import Simulator


def generate_picketfence(
    simulator: Simulator,
    field_layer,
    file_out: str,
    final_layers: list[Layer] | None = None,
    pickets: int = 11,
    picket_spacing_mm: int = 20,
    picket_width_mm: int = 2,
    picket_height_mm: int = 300,
    gantry_angle: int = 0,
    orientation=None,
    picket_offset_error: Sequence | None = None,
) -> None:
    """Create a mock picket fence image (reference ``utils.py:78``)."""
    from ..picketfence import Orientation

    orientation = orientation or Orientation.UP_DOWN
    picket_pos_mm = range(-int((pickets - 1) * picket_spacing_mm / 2),
                          int((pickets - 1) * picket_spacing_mm / 2) + 1,
                          picket_spacing_mm)
    for idx, pos in enumerate(picket_pos_mm):
        if picket_offset_error is not None:
            if len(picket_offset_error) != pickets:
                raise ValueError(
                    "The length of the error array must equal the number of pickets.")
            pos += picket_offset_error[idx]
        if orientation == Orientation.UP_DOWN:
            position = (0, pos)
            layout = (picket_height_mm, picket_width_mm)
        else:
            position = (pos, 0)
            layout = (picket_width_mm, picket_height_mm)
        simulator.add_layer(field_layer(field_size_mm=layout, cax_offset_mm=position))
    if final_layers is not None:
        for layer in final_layers:
            simulator.add_layer(layer)
    simulator.generate_dicom(file_out, gantry_angle=gantry_angle)


def generate_winstonlutz(
    simulator: Simulator,
    field_layer,
    dir_out: str,
    field_size_mm: tuple[float, float] = (30, 30),
    final_layers: list[Layer] | None = None,
    bb_size_mm: float = 5,
    offset_mm_left: float = 0,
    offset_mm_up: float = 0,
    offset_mm_in: float = 0,
    image_axes: Sequence[tuple[int, int, int]] = ((0, 0, 0), (90, 0, 0), (180, 0, 0), (270, 0, 0)),
    machine_scale: MachineScale = MachineScale.IEC61217,
    gantry_tilt: float = 0,
    gantry_sag: float = 0,
    clean_dir: bool = True,
    field_alpha: float = 1.0,
    bb_alpha: float = -0.5,
    tags: dict | None = None,
) -> list[str]:
    """Create a mock set of WL images with the BB at the given 3D offset
    (reference ``utils.py:139``).  Uses the same projection math as the WL
    analysis (:func:`pylinac_tpu.winston_lutz.bb_projection_with_rotation`),
    so generated geometry and analysis geometry agree exactly.
    """
    import os
    import shutil

    from ..core.geometry import cos as deg_cos, sin as deg_sin
    from ..winston_lutz import bb_projection_with_rotation

    if field_alpha + bb_alpha > 1:
        raise ValueError("field_alpha and bb_alpha must sum to <=1")
    if field_alpha - bb_alpha < 0:
        raise ValueError("field_alpha and bb_alpha must have a sum >=0")
    if clean_dir and osp.isdir(dir_out):
        shutil.rmtree(dir_out)
    os.makedirs(dir_out, exist_ok=True)
    file_names = []
    for gantry_in, coll_in, couch_in in image_axes:
        gantry, coll, couch = convert(
            input_scale=machine_scale, output_scale=MachineScale.IEC61217,
            gantry=gantry_in, collimator=coll_in, rotation=couch_in)
        sim_single = type(simulator)(sid=simulator.sid)
        sim_single.add_layer(field_layer(
            field_size_mm=field_size_mm,
            cax_offset_mm=(gantry_sag * deg_sin(gantry), gantry_tilt * deg_cos(gantry)),
            alpha=field_alpha, rotation=coll))
        gplane_offset, long_offset = bb_projection_with_rotation(
            offset_left=offset_mm_left, offset_up=offset_mm_up,
            offset_in=offset_mm_in, gantry=gantry, couch=couch, sad=1000)
        sim_single.add_layer(PerfectBBLayer(
            # cax offset expects (out, right); negative of the long offset
            cax_offset_mm=(-long_offset, gplane_offset),
            bb_size_mm=bb_size_mm, alpha=bb_alpha))
        if final_layers is not None:
            for layer in final_layers:
                sim_single.add_layer(layer)
        file_name = (f"WL G={gantry}, C={coll}, P={couch}; Field={field_size_mm}mm; "
                     f"BB={bb_size_mm}mm @ left={offset_mm_left}, in={offset_mm_in}, "
                     f"up={offset_mm_up}.dcm")
        sim_single.generate_dicom(osp.join(dir_out, file_name),
                                  gantry_angle=gantry, coll_angle=coll,
                                  table_angle=couch, tags=tags)
        file_names.append(file_name)
    return file_names


def generate_lightrad(
    simulator: Simulator,
    field_layer=FilteredFieldLayer,
    file_out: str = "lightrad.dcm",
    final_layers: list[Layer] | None = None,
    field_size_mm: tuple[float, float] = (150, 150),
    cax_offset_mm: tuple[float, float] = (0, 0),
    bb_size_mm: float = 3,
    bb_positions=((-40, -40), (-40, 40), (40, -40), (40, 40)),
) -> None:
    """Create a mock light/rad image: open field + fiducial BBs
    (reference ``utils.py:26``)."""
    simulator.add_layer(field_layer(field_size_mm=field_size_mm,
                                    cax_offset_mm=cax_offset_mm))
    for bb in bb_positions:
        simulator.add_layer(PerfectBBLayer(bb_size_mm=bb_size_mm, cax_offset_mm=bb))
    if final_layers is not None:
        for layer in final_layers:
            simulator.add_layer(layer)
    simulator.generate_dicom(file_out)

def pixel_align(pixel_size: float, length_mm: float) -> float:
    """Round a physical length to the nearest pixel-grid multiple
    (reference ``utils.py:605``)."""
    return round(length_mm / pixel_size) * pixel_size


def _clean_make_dir(dir_out: str, clean_dir: bool) -> None:
    import os
    import shutil

    if clean_dir and osp.isdir(dir_out):
        shutil.rmtree(dir_out)
    os.makedirs(dir_out, exist_ok=True)


def _bb_offset_lui(offset, rng, jitter_mm: float) -> tuple[float, float, float]:
    """(left, up, in) from a 3-list or a BBConfig-style dict, with jitter."""
    if isinstance(offset, dict):
        left = offset["offset_left_mm"]
        up = offset["offset_up_mm"]
        inward = offset["offset_in_mm"]
    else:
        left, up, inward = offset[0], offset[1], offset[2]
    j = lambda: rng.uniform(-jitter_mm, jitter_mm) if jitter_mm else 0.0
    return left + j(), up + j(), inward + j()


def generate_winstonlutz_multi_bb_single_field(
    simulator: Simulator,
    field_layer,
    dir_out: str,
    offsets: Sequence,
    field_size_mm: tuple[float, float] = (30, 30),
    final_layers: list[Layer] | None = None,
    bb_size_mm: float = 5,
    image_axes: Sequence[tuple[int, int, int]] = ((0, 0, 0), (90, 0, 0),
                                                  (180, 0, 0), (270, 0, 0)),
    gantry_tilt: float = 0,
    gantry_sag: float = 0,
    clean_dir: bool = True,
    jitter_mm: float = 0,
    seed: int = 1234,
) -> list[str]:
    """One open field + one BB per entry in ``offsets`` (each a
    [left, up, in] triple or a BBConfig-style dict) per image axis
    (reference ``utils.py:266``)."""
    import random as _random

    from ..core.geometry import cos as deg_cos, sin as deg_sin
    from ..winston_lutz import bb_projection_with_rotation

    rng = _random.Random(seed)
    _clean_make_dir(dir_out, clean_dir)
    file_names = []
    for gantry, coll, couch in image_axes:
        sim_single = type(simulator)(sid=simulator.sid)
        sim_single.add_layer(field_layer(
            field_size_mm=field_size_mm,
            cax_offset_mm=(gantry_tilt * deg_cos(gantry),
                           gantry_sag * deg_sin(gantry))))
        for offset in offsets:
            left, up, inward = _bb_offset_lui(offset, rng, jitter_mm)
            gplane_offset, long_offset = bb_projection_with_rotation(
                offset_left=left, offset_up=up, offset_in=inward,
                gantry=gantry, couch=couch, sad=1000)
            sim_single.add_layer(PerfectBBLayer(
                # cax offset expects (out, right): negate the long offset
                cax_offset_mm=(-long_offset, gplane_offset),
                bb_size_mm=bb_size_mm))
        if final_layers is not None:
            for layer in final_layers:
                sim_single.add_layer(layer)
        file_name = (f"WL G={gantry}, C={coll}, P={couch}; "
                     f"Field={field_size_mm}mm; {len(offsets)} BBs.dcm")
        sim_single.generate_dicom(osp.join(dir_out, file_name),
                                  gantry_angle=gantry, coll_angle=coll,
                                  table_angle=couch)
        file_names.append(file_name)
    return file_names


def generate_winstonlutz_multi_bb_multi_field(
    simulator: Simulator,
    field_layer,
    dir_out: str,
    field_offsets: Sequence,
    bb_offsets: Sequence,
    field_size_mm: tuple[float, float] = (20, 20),
    final_layers: Sequence[Layer] | None = None,
    bb_size_mm: float = 5,
    image_axes: Sequence[tuple[int, int, int]] = ((0, 0, 0), (90, 0, 0),
                                                  (180, 0, 0), (270, 0, 0)),
    gantry_tilt: float = 0,
    gantry_sag: float = 0,
    clean_dir: bool = True,
    jitter_mm: float = 0,
    align_to_pixels: bool = True,
    seed: int = 1234,
) -> list[str]:
    """One field per entry in ``field_offsets`` and one BB per entry in
    ``bb_offsets`` per image axis — the MTMF scenario
    (reference ``utils.py:379``)."""
    import random as _random

    from ..core.geometry import cos as deg_cos, sin as deg_sin
    from ..winston_lutz import bb_projection_with_rotation

    rng = _random.Random(seed)
    _clean_make_dir(dir_out, clean_dir)
    file_names = []
    for gantry, coll, couch in image_axes:
        sim_single = type(simulator)(sid=simulator.sid)
        for field_offset in field_offsets:
            left, up, inward = _bb_offset_lui(list(field_offset) if not
                                              isinstance(field_offset, dict)
                                              else field_offset, rng, jitter_mm)
            gplane_offset, long_offset = bb_projection_with_rotation(
                offset_left=left, offset_up=up, offset_in=inward,
                gantry=gantry, couch=couch, sad=1000)
            long_offset += gantry_tilt * deg_cos(gantry)
            gplane_offset += gantry_sag * deg_sin(gantry)
            if align_to_pixels:
                long_offset = pixel_align(sim_single.pixel_size, long_offset)
                gplane_offset = pixel_align(sim_single.pixel_size, gplane_offset)
            sim_single.add_layer(field_layer(
                # cax offset expects (out, right): negate the long offset
                field_size_mm=field_size_mm,
                cax_offset_mm=(-long_offset, gplane_offset)))
        for offset in bb_offsets:
            left, up, inward = _bb_offset_lui(offset, rng, jitter_mm)
            gplane_offset, long_offset = bb_projection_with_rotation(
                offset_left=left, offset_up=up, offset_in=inward,
                gantry=gantry, couch=couch, sad=1000)
            sim_single.add_layer(PerfectBBLayer(
                # cax offset expects (out, right): negate the long offset
                cax_offset_mm=(-long_offset, gplane_offset),
                bb_size_mm=bb_size_mm))
        if final_layers is not None:
            for layer in final_layers:
                sim_single.add_layer(layer)
        file_name = (f"WL G={gantry}, C={coll}, P={couch}; "
                     f"{len(field_offsets)} fields; {len(bb_offsets)} BBs.dcm")
        sim_single.generate_dicom(osp.join(dir_out, file_name),
                                  gantry_angle=gantry, coll_angle=coll,
                                  table_angle=couch)
        file_names.append(file_name)
    return file_names


def generate_winstonlutz_cone(
    simulator: Simulator,
    cone_layer,
    dir_out: str,
    cone_size_mm: float = 17.5,
    final_layers: list[Layer] | None = None,
    bb_size_mm: float = 5,
    offset_mm_left: float = 0,
    offset_mm_up: float = 0,
    offset_mm_in: float = 0,
    image_axes: Sequence[tuple[int, int, int]] = ((0, 0, 0), (90, 0, 0),
                                                  (180, 0, 0), (270, 0, 0)),
    gantry_tilt: float = 0,
    gantry_sag: float = 0,
    clean_dir: bool = True,
) -> list[str]:
    """WL set with a circular cone field instead of a jaw/MLC field
    (reference ``utils.py:518``)."""
    from ..core.geometry import cos as deg_cos, sin as deg_sin
    from ..winston_lutz import bb_projection_with_rotation

    _clean_make_dir(dir_out, clean_dir)
    file_names = []
    for gantry, coll, couch in image_axes:
        sim_single = type(simulator)(sid=simulator.sid)
        sim_single.add_layer(cone_layer(
            cone_size_mm=cone_size_mm,
            cax_offset_mm=(gantry_tilt * deg_cos(gantry),
                           gantry_sag * deg_sin(gantry))))
        gplane_offset, long_offset = bb_projection_with_rotation(
            offset_left=offset_mm_left, offset_up=offset_mm_up,
            offset_in=offset_mm_in, gantry=gantry, couch=couch, sad=1000)
        sim_single.add_layer(PerfectBBLayer(
            # cax offset expects (out, right): negate the long offset
            cax_offset_mm=(-long_offset, gplane_offset), bb_size_mm=bb_size_mm))
        if final_layers is not None:
            for layer in final_layers:
                sim_single.add_layer(layer)
        file_name = (f"WL G={gantry}, C={coll}, P={couch}; "
                     f"Cone={cone_size_mm}mm; BB={bb_size_mm}mm.dcm")
        sim_single.generate_dicom(osp.join(dir_out, file_name),
                                  gantry_angle=gantry, coll_angle=coll,
                                  table_angle=couch)
        file_names.append(file_name)
    return file_names
