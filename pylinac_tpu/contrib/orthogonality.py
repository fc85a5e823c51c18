"""Jaw orthogonality via Hough line angles.

Parity with ``/root/reference/pylinac/contrib/orthogonality.py``; uses the
device Canny kernel + the planar module's Hough transform.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.array_utils import stretch
from ..core.image import load
from ..ops.edges import canny
from ..planar_imaging import hough_line, hough_line_peaks


class JawOrthogonality:
    """Angles between the 4 jaw edges of a (nominally square) field."""

    def __init__(self, path: str | Path):
        self.image = load(path)

    def analyze(self):
        import jax.numpy as jnp

        edge_image = stretch(self.image.array)
        edge_image = np.asarray(canny(jnp.asarray(edge_image, jnp.float32)))

        # 0.05 degree precision over the half circle
        tested_angles = np.linspace(-np.pi / 2, np.pi / 2, num=360 * 10,
                                    endpoint=False)
        h, theta, d = hough_line(edge_image, theta=tested_angles)
        hspace, angles, dists = hough_line_peaks(h, theta, d, num_peaks=4)
        sorted_angles_idx = np.argsort(np.abs(angles))
        sorted_angles = angles[sorted_angles_idx]
        sorted_dists = dists[sorted_angles_idx]
        # first two = horizontal-ish lines, last two = vertical-ish; lower
        # distance = top/left
        line_angles = {}
        if sorted_dists[0] < sorted_dists[1]:
            line_angles["left"] = {"angle": sorted_angles[0], "dist": sorted_dists[0]}
            line_angles["right"] = {"angle": sorted_angles[1], "dist": sorted_dists[1]}
        else:
            line_angles["left"] = {"angle": sorted_angles[1], "dist": sorted_dists[1]}
            line_angles["right"] = {"angle": sorted_angles[0], "dist": sorted_dists[0]}
        if sorted_dists[2] < sorted_dists[3]:
            line_angles["bottom"] = {"angle": sorted_angles[2], "dist": sorted_dists[2]}
            line_angles["top"] = {"angle": sorted_angles[3], "dist": sorted_dists[3]}
        else:
            line_angles["bottom"] = {"angle": sorted_angles[3], "dist": sorted_dists[3]}
            line_angles["top"] = {"angle": sorted_angles[2], "dist": sorted_dists[2]}

        result = {
            "top_left": abs(np.rad2deg(line_angles["left"]["angle"]
                                       - line_angles["top"]["angle"])),
            "top_right": abs(np.rad2deg(line_angles["right"]["angle"]
                                        - line_angles["top"]["angle"])),
            "bottom_left": abs(np.rad2deg(line_angles["left"]["angle"]
                                          - line_angles["bottom"]["angle"])),
            "bottom_right": abs(np.rad2deg(line_angles["right"]["angle"]
                                           - line_angles["bottom"]["angle"])),
        }
        self.line_angles = line_angles
        self.result = result

    def results(self) -> dict[str, float]:
        """Keys: 'top_left', 'top_right', 'bottom_left', 'bottom_right' (deg)."""
        return self.result

    def plot_analyzed_image(self, show: bool = True):
        import matplotlib.pyplot as plt

        colors = ["r", "b", "c", "m"]
        fig, axes = plt.subplots()
        axes.imshow(self.image.array, cmap="gray")
        for idx, (key, data) in enumerate(self.line_angles.items()):
            (x0, y0) = data["dist"] * np.array(
                [np.cos(data["angle"]), np.sin(data["angle"])])
            axes.axline((x0, y0), slope=np.tan(data["angle"] + np.pi / 2),
                        label=key, color=colors[idx])
        axes.set_title("Jaw Orthogonality")
        axes.set_axis_off()
        axes.legend()
        if show:
            plt.show()
