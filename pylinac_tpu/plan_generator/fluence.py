"""RT Plan fluence rasterization.

Parity with ``/root/reference/pylinac/plan_generator/fluence.py``. The
control-point aperture accumulation is the same interval-add problem as the
machine-log fluence, so it rides the same scatter+cumsum device kernel
(:func:`pylinac_tpu.ops.fluence.interval_fluence`) instead of a per-leaf
mask loop.
"""

from __future__ import annotations

import numpy as np


def _iter_beam_mlc_stacks(beam) -> list[tuple[str, int, list[float]]]:
    """(device type, num pairs, boundaries) for each MLC stack of a beam."""
    stacks = []
    for bld in beam.BeamLimitingDeviceSequence:
        if "MLC" in str(bld.RTBeamLimitingDeviceType):
            stacks.append((str(bld.RTBeamLimitingDeviceType),
                           int(bld.NumberOfLeafJawPairs),
                           [float(b) for b in bld.LeafPositionBoundaries]))
    return stacks


def generate_fluences(rt_plan, width_mm: float, resolution_mm: float = 0.1,
                      dtype=np.uint16) -> np.ndarray:
    """Fluence maps of shape (num_beams, height, width) from an RT plan."""
    import jax.numpy as jnp

    from ..ops.fluence import interval_fluence

    beams = list(getattr(rt_plan, "BeamSequence", []) or [])
    if not beams:
        return np.empty(0)

    # global y-axis spans all stacks' leaf boundaries
    all_bounds = []
    for beam in beams:
        for _id, _n, bounds in _iter_beam_mlc_stacks(beam):
            all_bounds.append((bounds[0], bounds[-1]))
    all_bounds = np.array(all_bounds)
    y = np.arange(np.min(all_bounds), np.max(all_bounds) + resolution_mm,
                  resolution_mm)
    x = np.arange(-width_mm / 2, width_mm / 2 + resolution_mm, resolution_mm)

    fluences = np.zeros((len(beams), len(y), len(x)), dtype=dtype)
    for beam_idx, beam in enumerate(beams):
        if str(getattr(beam, "TreatmentDeliveryType", "")) == "SETUP":
            continue
        cps = list(beam.ControlPointSequence)
        cumulative = 1000 * np.array(
            [float(cp.CumulativeMetersetWeight) for cp in cps])
        mu_per_cp = np.diff(cumulative, prepend=0)

        stacks = _iter_beam_mlc_stacks(beam)
        stack_fluences = np.zeros((len(stacks), len(y), len(x)), dtype=dtype)
        for stack_idx, (mlc_id, n_pairs, boundaries) in enumerate(stacks):
            # (P, S) leaf edges per control point; DICOM mandates positions
            # on cp0 and they persist until re-specified
            lefts = np.zeros((n_pairs, len(cps)))
            rights = np.zeros((n_pairs, len(cps)))
            cur_b = cur_a = np.zeros(n_pairs)
            for cp_idx, cp in enumerate(cps):
                bldps = cp.get("BeamLimitingDevicePositionSequence")
                if cp_idx == 0 or bldps is not None:
                    positions = [bld.LeafJawPositions for bld in bldps
                                 if str(bld.RTBeamLimitingDeviceType) == mlc_id]
                    if positions:
                        arr = np.asarray(positions[0], dtype=float)
                        cur_b = arr[:n_pairs]
                        cur_a = arr[n_pairs:]
                lefts[:, cp_idx] = cur_b
                rights[:, cp_idx] = cur_a
            # to bin indices: reference semantics x > left & x <= right
            left_edges = np.searchsorted(x, lefts.ravel(), side="right")
            right_edges = np.searchsorted(x, rights.ravel(), side="right")
            left_edges = left_edges.reshape(n_pairs, len(cps)).astype(np.int32)
            right_edges = right_edges.reshape(n_pairs, len(cps)).astype(np.int32)
            compact = np.asarray(interval_fluence(
                jnp.asarray(np.clip(left_edges, 0, len(x))),
                jnp.asarray(np.clip(right_edges, 0, len(x))),
                jnp.asarray(mu_per_cp.astype(np.float32)),
                jnp.zeros(n_pairs, dtype=bool), len(x)))
            # expand leaf rows onto the y grid
            row_to_leaf = np.argmax(np.asarray(boundaries)[:, None] - y[None, :]
                                    > 0, axis=0) - 1
            valid = row_to_leaf >= 0
            stack_fluences[stack_idx, valid, :] = compact[
                np.clip(row_to_leaf[valid], 0, n_pairs - 1)].astype(dtype)
        if len(stacks) == 1:
            fluences[beam_idx] = stack_fluences[0]
        elif len(stacks) > 1:
            # dual stacks (Halcyon): the aperture is the intersection
            fluences[beam_idx] = np.min(stack_fluences, axis=0)
    return fluences


def plot_fluences(plan, width_mm: float, resolution_mm: float,
                  dtype=np.uint16, show: bool = True) -> list:
    """One figure per beam."""
    import matplotlib.pyplot as plt

    fluences = generate_fluences(plan, width_mm, resolution_mm, dtype)
    figs = []
    for i, fluence in enumerate(fluences):
        fig, ax = plt.subplots()
        m = ax.imshow(fluence, aspect="auto")
        fig.colorbar(m)
        name = str(plan.BeamSequence[i].BeamName)
        ax.set_title(name)
        figs.append(fig)
    if show:
        plt.show()
    return figs
