"""THE single home of the FIXTURES.md exactness grid: snap floats to
the 1e-6 grid / quantize to int64 1e-6 units. Every portable query
and its DuckDB oracle share this arithmetic (floor(x * 1e6 + 0.5)),
so the rounding rule can never drift between modules -- change it
here and the SQL twins in the oracles, nowhere else.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def snap6(col: Column) -> Column:
    """Portable 1e-6 float snap: floor(x * 1e6 + 0.5) / 1e6."""
    return F.floor(col * 1e6 + F.lit(0.5)) / 1e6


def q6(col: Column) -> Column:
    """Quantize to 1e-6 int64 -- the order-independent reduce unit."""
    return F.floor(col * 1e6 + F.lit(0.5)).cast("long")


def q6f(x: float) -> int:
    """Driver-side mirror of q6 for bounded-model-state loops that
    must replay the exact SQL arithmetic (PCA power iteration)."""
    return int(math.floor(x * 1e6 + 0.5))


#: microseconds per day -- the shared unit for `unix_micros`-based
#: day numbers (the SQL twin divides `epoch_us(ts)` by this)
US_PER_DAY = 86_400_000_000


def epoch_day(col: Column | str) -> Column:
    """Days since 1970-01-01 from a date/timestamp column -- works on
    BOTH timestamp flavors (a plain driver session reads parquet
    timestamps as TIMESTAMP_NTZ, which `unix_micros` rejects). The
    SQL twin is ``date_diff('day', DATE '1970-01-01', CAST(x AS
    DATE))``. One home so the day-number rule can never drift between
    modules."""
    return F.datediff(F.to_date(col), F.to_date(F.lit("1970-01-01")))


#: epoch-day of 2024-01-16 -- the fixture's half-month split used by
#: every before/after comparison (PSI, RFM migration, price index,
#: DiD). One home: regenerating the fixture with a new date span
#: means changing exactly one literal.
FIXTURE_SPLIT_DAY = 19738
