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
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date, np.datetime64)):
        # NaT (pandas' null timestamp, an instance of datetime) must
        # fold to NULL like None does -- Spark's toPandas yields None
        # for a null date while DuckDB's .df() yields NaT for the
        # same logical value.
        if pd.isna(v):
            return "NULL"
        return str(pd.Timestamp(v))
    if isinstance(v, float):
        # Round BEFORE the -0.0 collapse: a tiny negative (cancelling
        # ulp drift, e.g. -4.7e-13) rounds to -0.0 and must then fold
        # to "0.0" exactly like a positive underflow folds -- the
        # drift float_digits exists to absorb.
        if float_digits is not None:
            v = round(v, float_digits)
        if v == 0.0:
            return "0.0"  # collapse -0.0 vs 0.0
        return repr(v)
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
        # \x1f separator: a bare comma would make ('a,b','c') and
        # ('a','b,c') hash identically (raw_record cells really do
        # contain commas)
        h.update("\x1f".join(row).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]
