"""PIP (J3) and kNN (J4) vs oracles: ray-cast golden labels, brute==pruned."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospatial_cuda_spark import oracle
from geospatial_cuda_spark.datagen import polygons, queries_table
from geospatial_cuda_spark.operators import knn as K, pip as P, quadtree as QT


def test_pip_matches_oracle(spark, small_points, small_points_df):
    x, y = small_points
    polys = polygons()
    got = (
        P.point_in_polygons(small_points_df, polys)
        .select("pid", "poly_id")
        .toPandas()
        .groupby("pid")["poly_id"]
        .apply(set)
        .to_dict()
    )
    for pid, verts in polys:
        want = oracle.ray_cast_pip(x, y, verts)
        for j in np.flatnonzero(want):
            assert pid in got.get(j, set()), f"poly {pid} point {j} missing"
        for j, hits in got.items():
            if pid in hits:
                assert want[j], f"poly {pid} point {j} spurious"


def test_pip_rects_agree_with_bbox_containment(spark, small_points_df):
    """Axis-aligned rect polygons == inclusive bbox filter (P2 semantics)."""
    rect = [(0, np.array([[100000.0, 100000.0], [400000.0, 100000.0],
                          [400000.0, 300000.0], [100000.0, 300000.0]]))]
    got = set(
        P.point_in_polygons(small_points_df, rect).select("pid").toPandas()["pid"]
    )
    want = set(
        small_points_df.where(
            (F.col("x") >= 100000) & (F.col("x") <= 400000)
            & (F.col("y") >= 100000) & (F.col("y") <= 300000)
        )
        .select("pid")
        .toPandas()["pid"]
    )
    assert got == want


@pytest.fixture(scope="module")
def knn_world(spark, small_points_df):
    queries = queries_table(spark, n_random=40).where(F.col("qid") >= 6)
    pts = QT.with_cell_id(small_points_df, 18).persist()
    return queries.persist(), pts


def test_knn_brute_vs_numpy(spark, small_points, knn_world):
    queries, pts = knn_world
    x, y = small_points
    k = 5
    got = K.knn_bruteforce(queries, pts.drop("cell_id"), k).toPandas()
    qpdf = queries.orderBy("qid").toPandas()
    for _, q in qpdf.iterrows():
        d2 = (x.astype(np.float64) - q.x) ** 2 + (y.astype(np.float64) - q.y) ** 2
        order = np.lexsort((np.arange(len(d2)), d2))[:k]
        mine = got[got.qid == q.qid].sort_values("rank")["pid"].tolist()
        assert mine == list(order), f"qid {q.qid}"


def test_knn_cells_matches_brute_when_exact(knn_world):
    queries, pts = knn_world
    k = 5
    brute = K.knn_bruteforce(queries, pts.drop("cell_id"), k).toPandas()
    pruned = K.knn_cells(queries, pts, k, depth=3, radius=2).toPandas()
    exact_q = set(pruned.groupby("qid")["exact"].all().pipe(lambda s: s[s].index))
    assert len(exact_q) > 0  # the ring must certify a decent share at this density
    for qid in exact_q:
        a = brute[brute.qid == qid].sort_values("rank")["pid"].tolist()
        b = pruned[pruned.qid == qid].sort_values("rank")["pid"].tolist()
        assert a == b, f"qid {qid}"
