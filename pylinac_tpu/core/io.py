"""File plumbing: DICOM sniffing, zip handling, URL retrieval, SNC Profiler
parsing.  Parity with reference ``core/io.py``."""

from __future__ import annotations

import math
import os
import shutil
import tempfile
import zipfile
from pathlib import Path
from typing import BinaryIO

import numpy as np

from .dcm import dcmread, is_dicom, is_dicom_image  # re-exported

DEMO_URL_BASE = "https://storage.googleapis.com/pylinac_demo_files/"


class TemporaryZipDirectory(tempfile.TemporaryDirectory):
    """Extract a zip archive to a temporary directory; context-managed."""

    def __init__(self, zfile: str | Path | BinaryIO, delete: bool = True):
        super().__init__()
        self.delete = delete
        with zipfile.ZipFile(zfile) as zf:
            zf.extractall(self.name)

    def __exit__(self, exc, value, tb):
        if self.delete:
            super().__exit__(exc, value, tb)


def retrieve_filenames(
    directory: str | Path,
    func=None,
    recursive: bool = True,
    **kwargs,
) -> list[str]:
    """All filenames in a directory passing a filter function."""
    func = func or (lambda p: True)
    paths = []
    directory = Path(directory)
    it = directory.rglob("*") if recursive else directory.glob("*")
    for p in sorted(it):
        if p.is_file() and func(str(p), **kwargs):
            paths.append(str(p))
    return paths


def get_url(url: str, destination: str | Path | None = None, progress_bar: bool = True) -> str:
    """Download a URL to a local file (no-op cache if already present)."""
    import urllib.request

    if destination is None:
        destination = Path(tempfile.gettempdir()) / os.path.basename(url)
    destination = Path(destination)
    if not destination.exists():
        urllib.request.urlretrieve(url, destination)
    return str(destination)


def retrieve_demo_file(name: str, force: bool = False) -> Path:
    """Fetch a demo file from the public demo bucket into the local cache.

    Requires network egress; in air-gapped environments, pre-seed the cache
    directory ``~/.pylinac_tpu/demo_files``.
    """
    cache = Path.home() / ".pylinac_tpu" / "demo_files"
    cache.mkdir(parents=True, exist_ok=True)
    dest = cache / name
    if force or not dest.exists():
        get_url(DEMO_URL_BASE + name, destination=dest, progress_bar=False)
    return dest


def is_url(source: str) -> bool:
    return isinstance(source, str) and source.startswith(("http://", "https://"))


class SNCProfiler:
    """Parser for Sun Nuclear Profiler .prs text exports
    (reference ``core/io.py:246``)."""

    def __init__(
        self,
        path: str,
        gain_row: int = 20,
        detector_row: int = 106,
        bias_row: int = 107,
        calibration_row: int = 108,
        data_row: int = -1,
        data_columns: slice = slice(5, 259),
    ):
        with open(path, encoding="cp437") as f:
            raw = f.read().splitlines()
        self.detectors = raw[detector_row].split("\t")[data_columns]
        self.bias = np.array(raw[bias_row].split("\t")[data_columns]).astype(float)
        self.calibration = np.array(raw[calibration_row].split("\t")[data_columns]).astype(float)
        self.data = np.array(raw[data_row].split("\t")[data_columns]).astype(float)
        self.gain = float(raw[gain_row].split("\t")[1])
        self.timetic = float(raw[data_row].split("\t")[2])
        self.integrated_dose = (
            self.calibration * (self.data - self.bias * self.timetic) / self.gain
        )

    def to_profiles(self, n_detectors_row: int = 63, **kwargs):
        """Split the dose array into the 4 axis SingleProfiles (x, y, +45, -45)."""
        from .profile import SingleProfile

        def drop_cax_sides(vals: np.ndarray) -> np.ndarray:
            x_vals = np.arange(start=1, stop=len(vals) + 3)
            half_idx = math.ceil(len(x_vals) / 2) - 1
            return np.delete(x_vals, [half_idx - 1, half_idx + 1])

        y_vals = self.integrated_dose[n_detectors_row: 2 * n_detectors_row + 2]
        y_prof = SingleProfile(y_vals, x_values=np.arange(1, len(y_vals) + 1), **kwargs)
        x_vals = self.integrated_dose[:n_detectors_row]
        x_prof = SingleProfile(x_vals, x_values=drop_cax_sides(x_vals), **kwargs)
        pos_vals = self.integrated_dose[2 * n_detectors_row + 2: 3 * n_detectors_row + 2]
        pos_prof = SingleProfile(pos_vals, x_values=drop_cax_sides(pos_vals), **kwargs)
        neg_vals = self.integrated_dose[3 * n_detectors_row + 2: 4 * n_detectors_row + 2]
        neg_prof = SingleProfile(neg_vals, x_values=drop_cax_sides(neg_vals), **kwargs)
        return x_prof, y_prof, pos_prof, neg_prof
