"""Level-synchronous DataFrame quadtree build vs the recursive numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from geospatial_cuda_spark import oracle
from geospatial_cuda_spark.operators import quadtree as QT


@pytest.fixture(scope="module")
def built(spark, small_points, small_points_df):
    x, y = small_points
    root = oracle.build_quadtree(x, y)
    want = {r["cell_id"]: r for r in oracle.cells_relation(root)}
    got_rows = QT.build_cells(small_points_df).collect()
    return want, got_rows


def test_cells_relation_equals_oracle(built):
    want, got_rows = built
    got = {r.cell_id: r for r in got_rows}
    assert set(got) == set(want)
    for cid, w in want.items():
        g = got[cid]
        assert g.depth == w["depth"], cid
        assert g["count"] == w["count"], cid
        assert g.is_leaf == w["is_leaf"], cid
        assert (g.min_x, g.min_y, g.max_x, g.max_y) == (
            np.float32(w["min_x"]),
            np.float32(w["min_y"]),
            np.float32(w["max_x"]),
            np.float32(w["max_y"]),
        ), cid


def test_no_point_outside_leaf(spark, small_points_df, built):
    """validate_grid (cuda/kernels.cu:422-492) as an anti-join: zero points
    violate their assigned leaf bbox."""
    from pyspark.sql import functions as F

    cells = QT.build_cells(small_points_df)
    pts = QT.with_cell_id(small_points_df, 18)
    leaves = cells.where("is_leaf AND count > 0")
    # assign each point to the leaf owning its finest-prefix chain
    joined = pts.join(
        leaves.select("cell_id", "depth", "min_x", "min_y", "max_x", "max_y").withColumnRenamed(
            "cell_id", "leaf_id"
        ),
        on=QT.ancestor_dyn_col(F.col("cell_id"), F.lit(18) - F.col("depth")) == F.col("leaf_id"),
        how="inner",
    )
    n = small_points_df.count()
    assert joined.count() == n  # every point owned by exactly one leaf
    violations = joined.where(
        ~(
            (F.col("x") >= F.col("min_x"))
            & (F.col("x") <= F.col("max_x"))
            & (F.col("y") >= F.col("min_y"))
            & (F.col("y") <= F.col("max_y"))
        )
    )
    assert violations.count() == 0
