"""Unit/edge coverage for the round-4k queries (spatial grid join,
rolling median, Markov stationary). The oracle gate (including the
grid-vs-naive losslessness proof) lives in test_oracle_parity.py;
this file drives the analytic edges: boundary cells, brute-force
cross-checks, partial frames and even-run medians, absorbing states,
and a hand-solvable two-state chain.
"""

from __future__ import annotations

import hashlib
import math


def _events(spark, tmp_path, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _points_fixture(spark, tmp_path, n_cust, n_supp):
    spark.createDataFrame(
        [(i, 0, 0.0, "A") for i in range(n_cust)],
        "c_custkey long, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(i, f"s{i}", 0) for i in range(n_supp)],
        "s_suppkey long, s_name string, s_nationkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    return str(tmp_path)


def _coord(key: int, axis: str) -> float:
    h = hashlib.md5(f"{key}:{axis}".encode()).hexdigest()[:6]
    return (int(h, 16) % 10000) / 10000.0


# --- spatial grid join -------------------------------------------------------


def test_spatial_grid_matches_bruteforce(spark, tmp_path):
    # Replay the md5 coordinates in Python and brute-force the radius
    # join: the grid rewrite must return the same pair set (top-k by
    # distance) and the same total count.
    from dataingestionengineprocess_spark.queries.round4k import (
        _R, join_spatial_grid,
    )

    n_c, n_s = 120, 80
    sf = _points_fixture(spark, tmp_path, n_c, n_s)
    want = []
    for c in range(n_c):
        cx, cy = _coord(c, "cx"), _coord(c, "cy")
        for s in range(n_s):
            sx, sy = _coord(s, "sx"), _coord(s, "sy")
            d2 = (cx - sx) ** 2 + (cy - sy) ** 2
            if d2 <= _R * _R:
                want.append((math.floor(math.sqrt(d2) * 1e6 + 0.5) / 1e6,
                             c, s))
    want.sort()
    got = join_spatial_grid(spark, sf).collect()
    assert all(r["n_pairs"] == len(want) for r in got)
    got_keys = [(r["dist_s"], r["c_custkey"], r["s_suppkey"]) for r in got]
    assert got_keys == want[:50]


def test_spatial_grid_cell_boundary_pair_found(spark, tmp_path):
    # A pair straddling a cell boundary (points in adjacent cells,
    # distance < R) must be found by the 3x3 probe -- the classic
    # off-by-one failure of grid joins. Search the md5 space for such
    # a pair among the fixture keys and assert it appears.
    from dataingestionengineprocess_spark.queries.round4k import (
        _R, join_spatial_grid,
    )

    n_c, n_s = 200, 120
    sf = _points_fixture(spark, tmp_path, n_c, n_s)
    straddlers = []
    for c in range(n_c):
        cx, cy = _coord(c, "cx"), _coord(c, "cy")
        for s in range(n_s):
            sx, sy = _coord(s, "sx"), _coord(s, "sy")
            d2 = (cx - sx) ** 2 + (cy - sy) ** 2
            if d2 <= _R * _R and (math.floor(cx / _R) != math.floor(sx / _R)
                                  or math.floor(cy / _R)
                                  != math.floor(sy / _R)):
                straddlers.append((c, s))
    assert straddlers, "fixture too small to exercise the boundary"
    # probe the operator directly (no top-k LIMIT): EVERY straddling
    # pair must be found -- the off-by-one a one-cell probe would drop
    from dataingestionengineprocess_spark.catalog import load
    from dataingestionengineprocess_spark.operators.spatial import (
        grid_radius_pairs,
    )
    from dataingestionengineprocess_spark.queries.round4k import md5_points

    cust = md5_points(load(spark, sf, "customer"), "c_custkey", "cx", "cy")
    supp = md5_points(load(spark, sf, "supplier"), "s_suppkey", "sx", "sy")
    got = {(r["c_custkey"], r["s_suppkey"])
           for r in grid_radius_pairs(cust, supp, _R, "c_custkey",
                                      "s_suppkey").collect()}
    for pair in straddlers:
        assert pair in got, pair


# --- rolling median ----------------------------------------------------------


def test_rolling_median_hand_window(spark, tmp_path):
    # One type, 8 days with counts 1..7 then 9 on day 7: day 6 median
    # of (1..7) = 4; day 7 median of (2..7, 9) = 5; earlier days NULL.
    from dataingestionengineprocess_spark.queries.round4k import (
        window_rolling_median,
    )

    rows, eid = [], 0
    counts = [1, 2, 3, 4, 5, 6, 7, 9]
    for d, n in enumerate(counts):
        for k in range(n):
            rows.append((eid, f"2024-01-{d + 1:02d} 12:00:00", k, "view",
                         0.0, ""))
            eid += 1
    out = {r["day_num"]: r for r in
           window_rolling_median(spark, _events(spark, tmp_path, rows)
                                 ).collect()}
    for d in range(6):
        assert out[d]["med7_s"] is None
    assert out[6]["med7_s"] == 4.0
    assert out[7]["med7_s"] == 5.0


def test_rolling_median_per_type_partitions(spark, tmp_path):
    # Two types with different levels: each keeps its own median --
    # no cross-partition leakage.
    from dataingestionengineprocess_spark.queries.round4k import (
        window_rolling_median,
    )

    rows, eid = [], 0
    for d in range(7):
        for k in range(2):
            rows.append((eid, f"2024-01-{d + 1:02d} 12:00:00", k, "view",
                         0.0, ""))
            eid += 1
        for k in range(10):
            rows.append((eid, f"2024-01-{d + 1:02d} 12:00:00", k, "click",
                         0.0, ""))
            eid += 1
    out = {(r["event_type"], r["day_num"]): r for r in
           window_rolling_median(spark, _events(spark, tmp_path, rows)
                                 ).collect()}
    assert out[("view", 6)]["med7_s"] == 2.0
    assert out[("click", 6)]["med7_s"] == 10.0


# --- Markov stationary -------------------------------------------------------


def test_markov_two_state_hand_solution(spark, tmp_path):
    # One user alternating a -> b -> a -> b ...: P = [[0,1],[1,0]],
    # pi stays uniform (0.5, 0.5) -- the exact fixed point survives
    # all six snapped steps.
    from dataingestionengineprocess_spark.queries.round4k import (
        events_markov_stationary,
    )

    rows = []
    for t in range(8):
        rows.append((t, f"2024-01-01 00:0{t}:00", 1,
                     "a" if t % 2 == 0 else "b", 0.0, ""))
    out = {r["state"]: r for r in
           events_markov_stationary(spark, _events(spark, tmp_path, rows)
                                    ).collect()}
    assert out["a"]["stationary_s"] == 0.5
    assert out["b"]["stationary_s"] == 0.5
    assert out["a"]["out_transitions"] == 4  # a->b x4
    assert out["b"]["out_transitions"] == 3


def test_markov_absorbing_state_self_loop(spark, tmp_path):
    # 'end' never transitions out: the densified matrix gives it a
    # self-loop, so mass flows in and stays -- its stationary weight
    # must dominate after six steps.
    from dataingestionengineprocess_spark.queries.round4k import (
        events_markov_stationary,
    )

    rows = []
    eid = 0
    for u in range(3):
        rows.append((eid, "2024-01-01 00:00:00", u, "start", 0.0, ""))
        eid += 1
        rows.append((eid, "2024-01-01 00:01:00", u, "end", 0.0, ""))
        eid += 1
    out = {r["state"]: r for r in
           events_markov_stationary(spark, _events(spark, tmp_path, rows)
                                    ).collect()}
    assert out["end"]["out_transitions"] == 0
    assert out["end"]["stationary_s"] > 0.9
    assert out["start"]["stationary_s"] < 0.1


def test_markov_rows_sum_to_one_after_steps(spark, tmp_path):
    # Generic chain: the stationary vector keeps total mass ~1
    # (quantization drift bounded by steps * states * 1e-6).
    from dataingestionengineprocess_spark.queries.round4k import (
        events_markov_stationary,
    )

    rows, eid = [], 0
    seq = ["a", "b", "c", "a", "c", "b", "a", "b", "b", "c"]
    for u in range(4):
        for t, s in enumerate(seq):
            rows.append((eid, f"2024-01-01 00:{t:02d}:00", u, s, 0.0, ""))
            eid += 1
    out = events_markov_stationary(spark, _events(spark, tmp_path, rows)
                                   ).collect()
    total = sum(r["stationary_s"] for r in out)
    assert abs(total - 1.0) < 6 * 3 * 1e-6 + 1e-9
