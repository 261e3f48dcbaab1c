"""Round-6h query: the stream-stream LEFT SEMI join -- completing
the streaming join matrix (inner r1, left outer + full outer r5,
semi here).

Semantics (Spark structured streaming): a left-semi joined purchase
emits AS SOON AS a qualifying click arrives (no watermark wait for
matched rows, each left row at most once); unmatched purchases age
out of state when the global watermark passes and are never emitted.
An availableNow drain therefore yields exactly the purchases with at
least one click in their trailing 30-minute window -- the oracle is
a plain EXISTS over the batch table, no watermark term needed (every
match is processed by the drain's trailing batch).

Scale: state is bounded by the watermark horizon on BOTH inputs (the
same contract as the outer joins); semi joins hold strictly less
state than inner (left rows drop on first match instead of waiting
to re-match).

Reference parity: diagram-only reference (SURVEY.md §0); extends the
ST+ stream-stream join family.

Registered LAST (queries/__init__._load_all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register

_SS_SEMI_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id AS click_user, ts AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id, p.purchase_ts
FROM p
WHERE EXISTS (
  SELECT 1 FROM c
  WHERE c.click_user = p.user_id
    AND c.click_ts <= p.purchase_ts
    AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
)
ORDER BY purchase_id
"""


@register("stream_stream_semi_join", oracle=_SS_SEMI_ORACLE)
def stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases with >= 1 click in their trailing 30-minute window,
    as a watermarked stream-stream LEFT SEMI join drained
    availableNow."""
    from ..streaming.analytics import read_events_stream, run_to_table

    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("click_user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts")
           >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left_semi",
    ).select("purchase_id", "user_id", "purchase_ts")
    return run_to_table(joined, spark, output_mode="append") \
        .orderBy("purchase_id")
