"""General utilities: typed results machinery, binary decoding, QA-record
export.  Parity with reference ``core/utilities.py``."""

from __future__ import annotations

import json
import struct
from abc import abstractmethod
from collections.abc import Iterable
from dataclasses import dataclass
from datetime import datetime
from typing import BinaryIO, Generic, TypeVar

import numpy as np
from pydantic import BaseModel, ConfigDict, Field

from .warnings import WarningCollectorMixin
from .. import version as _version


def convert_to_enum(value, enum_cls):
    """Convert a value to an enum member (accepts member or value)."""
    if isinstance(value, enum_cls):
        return value
    for member in enum_cls:
        if member.value == value:
            return member
    for member in enum_cls:
        if str(member.value).lower() == str(value).lower():
            return member
    raise ValueError(f"{value} is not a valid option for {enum_cls}")


class OptionListMixin:
    """A mixin that lists class attribute options."""

    @classmethod
    def options(cls) -> list[str]:
        return [option for attr, option in cls.__dict__.items()
                if not callable(option) and not attr.startswith("__")]


class ResultBase(BaseModel):
    model_config = ConfigDict(arbitrary_types_allowed=True)
    pylinac_version: str = Field(
        default=_version.__version__, title="Pylinac version",
        description="The version of the framework used for the analysis.")
    date_of_analysis: datetime = Field(
        default_factory=datetime.today, title="Date of Analysis",
        description="The date the analysis was performed.")
    warnings: list[dict] = Field(
        title="Warnings", default_factory=list,
        description="Code warnings that occurred during the analysis.")


T = TypeVar("T")


class ResultsDataMixin(Generic[T], WarningCollectorMixin):
    """Generate typed results data as pydantic model / dict / JSON."""

    @abstractmethod
    def _generate_results_data(self) -> T:
        pass

    def results_data(self, as_dict: bool = False, as_json: bool = False,
                     by_alias: bool = False, exclude: set[str] | None = None):
        if as_dict and as_json:
            raise ValueError("Cannot return as both dict and JSON. Pick one.")
        data = self._generate_results_data()
        if hasattr(data, "warnings") and hasattr(self, "get_captured_warnings"):
            data.warnings = self.get_captured_warnings()
        if as_dict:
            return json.loads(data.model_dump_json(by_alias=by_alias, exclude=exclude))
        if as_json:
            return data.model_dump_json(by_alias=by_alias, exclude=exclude)
        return data


def is_iterable(obj) -> bool:
    return isinstance(obj, Iterable)


def simple_round(number, decimals: int | None = 0):
    """Round a number but allow None decimals (no-op)."""
    if decimals is None:
        return number
    return round(number, decimals)


def uniquify(seq: list[str], value: str) -> str:
    """Create a unique name by appending a number if needed."""
    if value not in seq:
        return value
    i = 1
    while f"{value}{i}" in seq:
        i += 1
    return f"{value}{i}"


class TemporaryAttribute:
    """Context manager to temporarily set an attribute."""

    def __init__(self, cls, attribute_name, temporary_value):
        self.cls = cls
        self.attribute_name = attribute_name
        self.temporary_value = temporary_value
        self.original_value = getattr(cls, attribute_name)

    def __enter__(self):
        setattr(self.cls, self.attribute_name, self.temporary_value)

    def __exit__(self, exc_type, exc_value, traceback):
        setattr(self.cls, self.attribute_name, self.original_value)


class Structure:
    """A simple attribute bag."""

    def __init__(self, **kwargs):
        self.__dict__.update(**kwargs)

    def update(self, **kwargs):
        self.__dict__.update(**kwargs)


def decode_binary(file: BinaryIO, dtype, num_values: int = 1,
                  cursor_shift: int = 0, strip_empty: bool = True):
    """Struct-based binary reader (reference ``core/utilities.py:232``);
    used by the log analyzer and XIM tag parsing."""
    f = file
    if isinstance(dtype, str):
        s = struct.calcsize(dtype) * num_values
        output = struct.unpack(dtype * num_values, f.read(s))
        if len(output) == 1:
            output = output[0]
    elif dtype is str:
        ssize = struct.calcsize("c") * num_values
        output = struct.unpack("c" * num_values, f.read(ssize))
        if strip_empty:
            output = "".join(o.decode() for o in output if o != b"\x00")
        else:
            output = "".join(o.decode() for o in output)
    elif dtype is int:
        ssize = struct.calcsize("i") * num_values
        output = np.asarray(struct.unpack("i" * num_values, f.read(ssize)))
        if len(output) == 1:
            output = int(np.squeeze(output))
    elif dtype is float:
        ssize = struct.calcsize("f") * num_values
        output = np.asarray(struct.unpack("f" * num_values, f.read(ssize)))
        if len(output) == 1:
            output = float(np.squeeze(output))
    else:
        raise TypeError(f"datatype '{dtype}' was not valid")
    if cursor_shift:
        f.seek(cursor_shift, 1)
    return output


@dataclass
class QuaacDatum:
    """Individual data point for a QA-record (QuAAC-style) export."""

    value: str | float | int
    unit: str = ""
    description: str = ""
    reference_value: str | float | int | None = None


class QuaacMixin:
    """Export analysis results as a QuAAC-style QA document (YAML/JSON).

    The reference delegates to the external ``quaac`` package
    (``core/utilities.py:301``); this build writes a structurally equivalent
    document natively so the capability exists without the dependency.
    """

    @abstractmethod
    def _quaac_datapoints(self) -> dict[str, QuaacDatum]:
        raise NotImplementedError

    def to_quaac(self, path, performer: dict | None = None,
                 primary_equipment: dict | None = None, format: str = "json",
                 overwrite: bool = False, **kwargs) -> None:
        import os

        if os.path.exists(str(path)) and not overwrite:
            raise FileExistsError(f"{path} exists; pass overwrite=True to overwrite")
        data = self._quaac_datapoints()
        doc = {
            "version": "1.0",
            "performer": performer or {},
            "primary_equipment": primary_equipment or {},
            "datapoints": [
                {
                    "name": name,
                    "perform_datetime": datetime.now().isoformat(),
                    "measurement_value": d.value,
                    "measurement_unit": d.unit,
                    "description": d.description,
                    "reference_value": d.reference_value,
                }
                for name, d in data.items()
            ],
        }
        with open(path, "w") as f:
            if format == "json":
                json.dump(doc, f, indent=2, default=str)
            else:  # simple YAML emission
                f.write(_to_yaml(doc))


def _to_yaml(obj, indent: int = 0) -> str:
    pad = "  " * indent
    lines = []
    if isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(v, (dict, list)) and v:
                lines.append(f"{pad}{k}:")
                lines.append(_to_yaml(v, indent + 1))
            else:
                lines.append(f"{pad}{k}: {v if not isinstance(v, (dict, list)) else '{}'}")
    elif isinstance(obj, list):
        for item in obj:
            if isinstance(item, (dict, list)):
                body = _to_yaml(item, indent + 1).lstrip()
                lines.append(f"{pad}- {body}")
            else:
                lines.append(f"{pad}- {item}")
    else:
        lines.append(f"{pad}{obj}")
    return "\n".join(lines)


def clear_data_files():  # pragma: no cover — parity shim
    """Delete cached demo files."""
    import shutil
    from pathlib import Path

    cache = Path.home() / ".pylinac_tpu" / "demo_files"
    if cache.is_dir():
        shutil.rmtree(cache)

def is_close(val: float, target, delta: float = 1) -> bool:
    """True if ``val`` is within ``delta`` of the target (or any of a
    sequence of targets) — reference ``core/utilities.py:144``."""
    try:
        targets = iter(target)
    except TypeError:
        targets = iter([target])
    return any(t - delta < val < t + delta for t in targets)


def is_close_degrees(angle1: float, angle2: float, delta: float = 1) -> bool:
    """is_close on the circle: compares angles the short way around
    (reference ``core/utilities.py:170``)."""
    from .scale import wrap360

    if delta < 0:
        raise ValueError("Delta must be positive")
    simple_diff = abs(wrap360(angle1) - wrap360(angle2))
    return min(simple_diff, 360 - simple_diff) <= delta


def assign2machine(source_file: str, machine_file: str) -> None:
    """Copy the TreatmentMachineName of ``machine_file``'s first beam onto
    every beam of ``source_file`` (overwritten in place) — the standard way
    to retarget canned QA plans (reference ``core/utilities.py:124``)."""
    from . import dcm

    dcm_source = dcm.dcmread(source_file)
    dcm_machine = dcm.dcmread(machine_file)
    for beam in dcm_source.BeamSequence:
        beam.TreatmentMachineName = dcm_machine.BeamSequence[0].TreatmentMachineName
    dcm.dcmwrite(source_file, dcm_source)
