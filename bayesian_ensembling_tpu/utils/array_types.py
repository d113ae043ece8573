"""Array type aliases (reference ``ensembles/array_types.py`` used nptyping;
here plain typing aliases over jax/numpy arrays keep annotations lightweight
and dependency-free)."""

from __future__ import annotations

import typing as tp

import jax
import numpy as np

Array = tp.Union[np.ndarray, jax.Array]
Vector = Array  # shape (N,)
ColumnVector = Array  # shape (N, 1)
Matrix = Array  # shape (N, M)

__all__ = ["Array", "Vector", "ColumnVector", "Matrix"]
