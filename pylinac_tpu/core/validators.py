"""Array validators (reference ``core/validators.py``)."""

from __future__ import annotations

import numpy as np


def array_not_empty(array: np.ndarray) -> None:
    if array.size == 0:
        raise ValueError("Array must not be empty")


def single_dimension(array: np.ndarray) -> None:
    if array.ndim > 1:
        raise ValueError(f"Array was multidimensional. Must pass 1D array; found {array.ndim}")


def double_dimension(array: np.ndarray) -> None:
    if array.ndim != 2:
        raise ValueError(f"Array was not 2D. Must pass 2D array; found {array.ndim}")


def is_positive(value) -> None:
    if value < 0:
        raise ValueError("Value must be positive")
