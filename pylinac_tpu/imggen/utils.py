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
    image_axes: list[tuple[int, int, int]] = ((0, 0, 0), (90, 0, 0), (180, 0, 0), (270, 0, 0)),
    gantry_tilt: float = 0,
    gantry_sag: float = 0,
    clean_dir: bool = True,
    align_to_pixels: bool = True,
    field_alpha: float = 1.0,
    bb_alpha: float = -0.5,
    tags: dict | None = None,
    field_offsets: Sequence[tuple[float, float]] | None = None,
    bb_offsets: Sequence[tuple[float, float]] | None = None,
    machine_scale: MachineScale = MachineScale.IEC61217,
) -> list[str]:
    """Create a mock set of WL images with the BB at the given 3D offset
    (reference ``utils.py:139``). Returns the generated file names.

    Offsets: left (+x towards gantry-left), up (+y vertical), in (+z towards
    gantry). Image projections follow the reference's derivation.
    """
    import os
    import shutil

    if clean_dir and osp.isdir(dir_out):
        shutil.rmtree(dir_out)
    os.makedirs(dir_out, exist_ok=True)
    file_names = []
    for gantry, coll, couch in image_axes:
        sim_single = type(simulator)(sid=simulator.sid)
        # find the in-plane BB projection for this gantry/couch combo
        bb_offset = bb_projection_long_short(
            offset_left=offset_mm_left, offset_up=offset_mm_up, offset_in=offset_mm_in,
            gantry=gantry, couch=couch, machine_scale=machine_scale,
            sad=1000)
        field_offset = (0, 0)
        gantry_tilt_offset = gantry_tilt * np.cos(np.deg2rad(gantry))
        gantry_sag_offset = gantry_sag * np.sin(np.deg2rad(gantry))
        sim_single.add_layer(field_layer(
            field_size_mm=field_size_mm,
            cax_offset_mm=(field_offset[0] + gantry_sag_offset + gantry_tilt_offset,
                           field_offset[1]),
            alpha=field_alpha))
        sim_single.add_layer(PerfectBBLayer(
            bb_size_mm=bb_size_mm, cax_offset_mm=bb_offset, alpha=bb_alpha))
        if final_layers is not None:
            for layer in final_layers:
                sim_single.add_layer(layer)
        file_name = f"WL G={gantry}, C={coll}, P={couch}; BB @ left={offset_mm_left}, in={offset_mm_in}, up={offset_mm_up}.dcm"
        sim_single.generate_dicom(osp.join(dir_out, file_name),
                                  gantry_angle=gantry, coll_angle=coll,
                                  table_angle=couch, tags=tags)
        file_names.append(file_name)
    return file_names


def bb_projection_long_short(offset_left: float, offset_up: float, offset_in: float,
                             gantry: float, couch: float = 0,
                             machine_scale: MachineScale = MachineScale.IEC61217,
                             sad: float = 1000) -> tuple[float, float]:
    """The 2D (down, right) EPID projection of a 3D BB offset for the given
    gantry/couch angles (small-angle parallel projection, IEC 61217)."""
    gantry, _, couch = convert(input_scale=machine_scale,
                               output_scale=MachineScale.IEC61217,
                               gantry=gantry, collimator=0, rotation=couch)
    # rotate the BB about the z-axis for the couch
    c = np.cos(np.deg2rad(couch))
    s = np.sin(np.deg2rad(couch))
    x = offset_left * c - offset_in * s
    z = offset_left * s + offset_in * c
    # gantry rotation: in-plane horizontal projection
    g = np.deg2rad(gantry)
    horiz = x * np.cos(g) - offset_up * np.sin(g)
    # vertical EPID axis = longitudinal (in/out); image "down" = -in
    long_offset = -z
    return (long_offset, horiz)


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
