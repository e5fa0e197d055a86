"""Numeric helpers shared by pipelines and their SQL oracles."""

from __future__ import annotations

import numpy as np

__all__ = ["round_half_away"]


def round_half_away(x, ndigits: int):
    """Round half away from zero — DuckDB/SQL ROUND semantics.

    numpy/python round are banker's (half-to-even): round(0.8203125, 6)
    gives 0.820312 while SQL gives 0.820313.  Every float column that is
    hash-compared against a DuckDB oracle must round THIS way."""
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
