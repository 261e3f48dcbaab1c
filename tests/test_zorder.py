"""Z-order layout: per-file min/max spans must be narrow on BOTH
z-columns (that is the whole point vs a single-column sort), and the
rewrite must preserve the rows."""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.sinks.warehouse import zorder_write

N_FILES = 8


def _avg_span(path: str, col: str) -> float:
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        s = pd.read_parquet(f, columns=[col])[col]
        spans.append(float(s.max() - s.min()))
    return sum(spans) / len(spans)


def _avg_box_area(path: str) -> float:
    areas = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pdf = pd.read_parquet(f, columns=["x", "y"])
        areas.append(
            float(pdf["x"].max() - pdf["x"].min())
            * float(pdf["y"].max() - pdf["y"].min())
        )
    return sum(areas) / len(areas)


def test_zorder_narrows_both_dims_and_preserves_rows(spark, tmp_path):
    wh = str(tmp_path)
    # Two independent uniform dims: any 1-D sort leaves the other dim's
    # per-file span at ~full range.
    df = (
        spark.range(40_000)
        .withColumn("x", (F.hash("id") % 10_000 + 10_000) % 10_000)
        .withColumn("y", (F.hash(F.col("id") + 7) % 10_000 + 10_000) % 10_000)
    )
    df.repartition(N_FILES).write.parquet(os.path.join(wh, "plain"))
    zorder_write(df, wh, "zorded", ["x", "y"], n_files=N_FILES)

    plain, zpath = os.path.join(wh, "plain"), os.path.join(wh, "zorded")

    got = spark.read.parquet(zpath)
    assert got.count() == 40_000
    assert got.agg(F.sum("x"), F.sum("y")).first() == \
        df.agg(F.sum("x"), F.sum("y")).first()

    # Random layout: every file spans ~the full 10k range of each dim,
    # so each file's (x-span * y-span) bounding box covers ~the whole
    # plane. 8 files = 3 z-bits split the plane into 8 curve cells:
    # both dims narrow SIMULTANEOUSLY (one halving + one quartering,
    # ideal area 1/8; range-boundary sampling blurs cell edges, so
    # demand 1/3). A 1-D sort can only ever shrink one factor.
    for col in ("x", "y"):
        assert _avg_span(plain, col) > 9_000, col
        assert _avg_span(zpath, col) < 0.75 * _avg_span(plain, col), col
    assert _avg_box_area(zpath) < _avg_box_area(plain) / 3
