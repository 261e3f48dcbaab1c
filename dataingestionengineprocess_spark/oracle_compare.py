"""Shared result normalization for the DuckDB oracle comparisons.

ONE implementation of the cell-normalization rules (NULL/NaN folding,
-0.0 collapse, timestamp stringify, numpy scalar unwrap) used by BOTH
the local parity gate (`tests/test_oracle_parity.py`) and the driver
pre-flight tool (`tools/driver_replica.py`) -- two drifting copies
would let the pre-flight and the gate disagree about the same query.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import numpy as np
import pandas as pd


def norm_cell(v, float_digits: int | None = None) -> str:
    """Engine-neutral string form of one result cell.

    ``float_digits``: optionally round floats before repr (the
    pre-flight tool uses 9 digits to absorb engine ulp drift; the
    strict local gate passes None because the queries themselves are
    required to round anything order-sensitive).
    """
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float) and v == 0.0:
        return "0.0"  # collapse -0.0 vs 0.0
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date, np.datetime64)):
        return str(pd.Timestamp(v))
    if isinstance(v, float):
        return repr(round(v, float_digits) if float_digits is not None else v)
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.floating):
        return norm_cell(float(v), float_digits)
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x, float_digits) for x in v) + "]"
    return str(v)


def normalize_frame(df: pd.DataFrame,
                    float_digits: int | None = None) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-sorted, cell-normalized tuples."""
    cols = sorted(df.columns)
    if len(cols) != len(set(df.columns)):
        raise AssertionError(f"duplicate column names: {list(df.columns)}")
    rows = [
        tuple(norm_cell(v, float_digits) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def digest_frame(df: pd.DataFrame, float_digits: int | None = None) -> str:
    """Order-insensitive content digest (the driver-style value hash)."""
    h = hashlib.sha256()
    for row in normalize_frame(df, float_digits):
        h.update(",".join(row).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]
