"""The bench artifact contract (VERDICT r5 #2): the driver keeps only
the last 2000 chars of bench stdout, so the FINAL line must be a
complete, parseable summary. These tests pin the pieces without
running the sweep."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_baseline_table_parses_all_rows():
    table = bench._baseline_table()
    # the authoritative table covers (at least) the current registry
    assert len(table) >= 366
    assert all(isinstance(v, float) and v >= 0 for v in table.values())
    # spot-pin rows from different eras of the table
    assert "q1_pricing_summary" in table
    assert "knn_hnsw_layer_portable" in table


def test_compact_summary_fits_tail_and_flags_regressions():
    base = bench._baseline_table()
    # a clean run: everything at baseline -> no flags
    timings = dict(base)
    line = json.dumps(bench._compact_summary(timings, 0.1))
    assert len(line) <= 1500          # survives the 2000-char tail
    s = json.loads(line)
    assert s["flags_2x"] == [] and s["flags_2x_count"] == 0
    assert s["n"] == len(base) and s["unit"] == "sec"
    assert len(s["top10"]) == 10
    # a real regression (>2x AND >1s absolute) flags; sub-second
    # noise does not
    timings = dict(base)
    timings["q1_pricing_summary"] = base["q1_pricing_summary"] * 3 + 2
    some_small = min(base, key=base.get)
    timings[some_small] = base[some_small] * 3  # tiny absolute delta
    s2 = bench._compact_summary(timings, 0.1)
    assert "q1_pricing_summary" in s2["flags_2x"]
    assert some_small not in s2["flags_2x"]


def test_compact_summary_handles_unknown_queries():
    # queries missing from the baseline table (added mid-round) must
    # not crash or flag
    s = bench._compact_summary({"brand_new_query": 9.9}, 0.1)
    assert s["flags_2x"] == []
    assert s["value"] == 9.9
