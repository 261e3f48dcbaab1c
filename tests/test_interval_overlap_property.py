"""Property test: the bucket-grid interval-overlap join agrees with a
per-pair reference on arbitrary interval sets (touching endpoints,
nested, negative coordinates, widths above and below the bucket) —
and emits each overlapping pair exactly once."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataingestionengineprocess_spark.operators.skew import interval_overlap_join

COORD = st.integers(min_value=-60, max_value=60)


@st.composite
def overlap_case(draw):
    def side(n_max):
        out = []
        for i in range(draw(st.integers(min_value=1, max_value=n_max))):
            start = draw(COORD)
            length = draw(st.integers(min_value=0, max_value=50))
            out.append((i, start, start + length))
        return out

    return side(8), side(8), draw(st.sampled_from([1, 4, 9, 64]))


@given(overlap_case())
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_interval_overlap_matches_reference(spark, case):
    lrows, rrows, width = case
    ldf = spark.createDataFrame(lrows, ["lid", "l_start", "l_end"])
    rdf = spark.createDataFrame(rrows, ["rid", "r_start", "r_end"])

    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(ldf, rdf, bucket_width=width)
        .select("lid", "rid").collect()
    )
    want = sorted(
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls <= re and rs <= le
    )
    assert got == want  # exactly-once: no misses AND no duplicates
