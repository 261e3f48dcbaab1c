"""Property test: the bucketed range-join rewrite agrees with a per-row
reference on arbitrary bands (overlapping, empty, negative, sub-bucket
and multi-bucket widths) — cases the price-band fixture never hits."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataingestionengineprocess_spark.operators.skew import range_bucket_join

VALS = st.integers(min_value=-50, max_value=50)


@st.composite
def range_case(draw):
    facts = draw(st.lists(VALS, min_size=1, max_size=15, unique=True))
    n_bands = draw(st.integers(min_value=1, max_value=5))
    bands = []
    for i in range(n_bands):
        lo = draw(VALS)
        width = draw(st.integers(min_value=1, max_value=40))
        bands.append((f"b{i}", float(lo), float(lo + width)))
    bucket_w = draw(st.sampled_from([1.0, 3.0, 7.5, 64.0]))
    return facts, bands, bucket_w


@given(range_case())
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_bucketed_range_join_matches_reference(spark, case):
    facts, bands, bucket_w = case
    fdf = spark.createDataFrame([(v, float(v)) for v in facts], ["fid", "val"])
    bdf = spark.createDataFrame(bands, ["name", "lo", "hi"])

    got = sorted(
        (r["fid"], r["name"])
        for r in range_bucket_join(fdf, "val", bdf, "lo", "hi", bucket_w).collect()
    )
    want = sorted(
        (v, name) for v in facts for name, lo, hi in bands if lo <= v < hi
    )
    assert got == want
