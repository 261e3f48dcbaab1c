"""Grid-bucketed spatial radius join.

The rewrite every distributed radius join uses: bucket both point
sets into cells of side R, equi-join each left point against the 3x3
neighborhood of its cell, and filter candidates on the exact squared
distance. Any pair within R differs by at most one cell per axis, so
the rewrite is lossless -- `join_spatial_grid`'s oracle PROVES that
by computing the naive quadratic join over the same points.

Scale: the equi-join shuffles on cell ids; each point meets only its
9-cell candidates, never the full other side. Hot cells (clustered
real-world data) take the same salting treatment as any skewed join
key (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_cells(points: DataFrame, r: float) -> DataFrame:
    """Attach (cell_x, cell_y) grid coordinates for cell side ``r``.
    Expects ``x``/``y`` columns."""
    return (points
            .withColumn("cell_x", F.floor(F.col("x") / r).cast("long"))
            .withColumn("cell_y", F.floor(F.col("y") / r).cast("long")))


def grid_radius_pairs(left: DataFrame, right: DataFrame, r: float,
                      left_key: str, right_key: str) -> DataFrame:
    """All (left_key, right_key, d2) pairs within distance ``r``.

    Both inputs need ``x``/``y`` plus their key column; cells are
    derived here. The left side explodes over the 9 neighbor offsets
    (a literal array -- no shuffle of its own); candidates equi-join
    on the probed cell and the exact d2 <= r^2 filter keeps only true
    neighbors.
    """
    lc = with_cells(left, r)
    rc = with_cells(right, r)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probes = (
        lc.withColumn("o", F.explode(offsets))
        .select(left_key, "x", "y",
                (F.col("cell_x") + F.col("o.dx")).alias("px"),
                (F.col("cell_y") + F.col("o.dy")).alias("py"))
    )
    d2 = ((F.col("x") - F.col("rx")) * (F.col("x") - F.col("rx"))
          + (F.col("y") - F.col("ry")) * (F.col("y") - F.col("ry")))
    return (
        probes.join(
            rc.select(right_key, F.col("x").alias("rx"),
                      F.col("y").alias("ry"), "cell_x", "cell_y"),
            (F.col("px") == F.col("cell_x"))
            & (F.col("py") == F.col("cell_y")))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(r * r))
        .select(left_key, right_key, "d2")
    )

