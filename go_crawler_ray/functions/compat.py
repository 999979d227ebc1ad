"""Numeric compatibility helpers for oracle parity.

numpy/pandas ``round`` is banker's (half-to-even); DuckDB/ANSI ``ROUND``
is half-away-from-zero. Values that are exact binary halves (e.g. any
x/2^k) round differently, so every float the engine reports next to a
SQL oracle goes through ``round_half_away``.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int = 4):
    """Half-away-from-zero rounding, elementwise (matches SQL ROUND)."""
    scale = 10.0 ** ndigits
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if np.isscalar(x) or np.ndim(x) == 0:
        return float(out)
    try:
        import pandas as pd

        if isinstance(x, pd.Series):
            return pd.Series(out, index=x.index, name=x.name)
    except ImportError:
        pass
    return out
