"""Skew mitigation: salted joins for hot keys.

AQE's skew-join split (enabled engine-wide, session.ENGINE_CONFS)
handles most skew by splitting oversized shuffle partitions, but it
only works for sort-merge joins AFTER a shuffle materializes the skew.
Explicit salting is the planned-ahead variant for the pathological
case AQE can't fix: one key so hot that even a split partition's
build side won't fit, or a broadcast-ineligible dimension joined on a
power-law key. This is the standard fan-out trick:

- fact side: append a random salt in [0, n_salts) to the join key;
- dim side: replicate each row n_salts times (explode), once per salt;
- join on (key, salt): the hot key's rows now spread over n_salts
  shuffle partitions instead of one straggler.

Cost model at 100 TB: dim side grows n_salts x (keep it the SMALL
side), fact side gains one narrow column. n_salts ~ executor-count /
hot-key-share; over-salting wastes dim replication, under-salting
leaves stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join fact⋈dim on `on` with the dim side replicated across
    `n_salts` salts. Semantics identical to `fact.join(dim, on, how)`
    for inner/left joins (each fact row still matches each dim row
    exactly once -- it carries exactly one salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} "
            "(right/outer would need fact-side replication instead)"
        )
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [on, SALT_COL], how).drop(SALT_COL)
