"""Property test: the union+carry-forward as-of join agrees with a
per-row reference implementation on arbitrary generated inputs
(hypothesis drives keys, timestamps, tie cases, and missing-match
cases the fixture never hits)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataingestionengineprocess_spark.operators.asof import asof_join_backward

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=20)


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12, unique=True)
    )
    right = draw(
        st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12, unique=True)
    )
    return left, right


def _reference(left, right):
    """Per-row reference: latest right value at-or-before, else None."""
    out = {}
    for i, (k, lt) in enumerate(left):
        best = None
        for k2, rt in right:
            if k2 == k and rt <= lt and (best is None or rt > best):
                best = rt
        out[(k, lt)] = best
    return out


@given(asof_case())
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_asof_matches_reference(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k int, lt bigint"
    )
    # right is unique per (k, ts) by construction; payload = its ts
    right = spark.createDataFrame(
        [(k, t, t) for k, t in right_rows], "k int, rt bigint, rv bigint"
    ) if right_rows else spark.createDataFrame([], "k int, rt bigint, rv bigint")

    joined = asof_join_backward(
        left, right, on="k", left_ts="lt", right_ts="rt",
        payload_cols=["rv"], how="inner",
    )
    got = {(r.k, r.lt): r.rv for r in joined.collect()}
    expect = {
        kl: v for kl, v in _reference(left_rows, right_rows).items()
        if v is not None
    }
    assert got == expect


def _reference_forward(left, right):
    """Per-row reference: earliest right value at-or-after, else None."""
    out = {}
    for k, lt in left:
        best = None
        for k2, rt in right:
            if k2 == k and rt >= lt and (best is None or rt < best):
                best = rt
        out[(k, lt)] = best
    return out


@given(asof_case())
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_asof_forward_matches_reference(spark, case):
    from dataingestionengineprocess_spark.operators.asof import (
        asof_join_forward,
    )

    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k int, lt bigint"
    )
    right = spark.createDataFrame(
        [(k, t, t) for k, t in right_rows], "k int, rt bigint, rv bigint"
    ) if right_rows else spark.createDataFrame([], "k int, rt bigint, rv bigint")

    joined = asof_join_forward(
        left, right, on="k", left_ts="lt", right_ts="rt",
        payload_cols=["rv"], how="inner",
    )
    got = {(r.k, r.lt): r.rv for r in joined.collect()}
    expect = {
        kl: v for kl, v in _reference_forward(left_rows, right_rows).items()
        if v is not None
    }
    assert got == expect


def _reference_nearest(left, right, tol=None):
    """Per-row reference: nearest right on either side within
    tolerance, ties to the backward (at-or-before) candidate."""
    out = {}
    for k, lt in left:
        back = None
        fwd = None
        for k2, rt in right:
            if k2 != k:
                continue
            if rt <= lt and (back is None or rt > back):
                back = rt
            if rt >= lt and (fwd is None or rt < fwd):
                fwd = rt
        db = None if back is None else lt - back
        df = None if fwd is None else fwd - lt
        if tol is not None:
            if db is not None and db > tol:
                db, back = None, None
            if df is not None and df > tol:
                df, fwd = None, None
        if db is not None and (df is None or db <= df):
            out[(k, lt)] = (back, -db)
        elif df is not None:
            out[(k, lt)] = (fwd, df)
    return out


@given(asof_case(), st.one_of(st.none(), st.integers(0, 10)))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_asof_nearest_matches_reference(spark, case, tol):
    from dataingestionengineprocess_spark.operators.asof import (
        asof_join_nearest,
    )

    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k int, lt bigint"
    )
    right = spark.createDataFrame(
        [(k, t, t) for k, t in right_rows], "k int, rt bigint, rv bigint"
    ) if right_rows else spark.createDataFrame([], "k int, rt bigint, rv bigint")

    joined = asof_join_nearest(
        left, right, on="k", left_ts="lt", right_ts="rt",
        payload_cols=["rv"], tolerance_seconds=tol, how="inner",
    )
    got = {(r["k"], r["lt"]): (r["rv"], r["__delta_us"])
           for r in joined.collect()}
    assert got == _reference_nearest(left_rows, right_rows, tol)
