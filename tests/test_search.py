"""Quadrant-search join (J1) + point lookup (J2) vs the numpy oracle,
including the verbatim inference.cu:109-117 scenario and agreement between
the two physical strategies."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospatial_cuda_spark import oracle
from geospatial_cuda_spark.datagen import queries_table
from geospatial_cuda_spark.operators import quadtree as QT, search as S


@pytest.fixture(scope="module")
def world(spark, small_points, small_points_df):
    x, y = small_points
    root = oracle.build_quadtree(x, y)
    bnds = oracle.boundaries_array(root)
    cells = QT.build_cells(small_points_df).persist()
    cells.count()
    queries = queries_table(spark, n_random=300).persist()
    qpdf = queries.orderBy("qid").toPandas()
    want = oracle.quadrant_search(qpdf["x"].to_numpy(), qpdf["y"].to_numpy(), bnds)
    return root, bnds, cells, queries, qpdf, want


def _got(df, qpdf):
    got = df.select("qid", S.RESULT_COL).orderBy("qid").toPandas()
    assert got["qid"].tolist() == qpdf["qid"].tolist()
    return got[S.RESULT_COL].to_numpy()


def test_broadcast_path_matches_oracle(world):
    _, _, cells, queries, qpdf, want = world
    got = _got(S.quadrant_search_broadcast(queries, cells), qpdf)
    assert np.array_equal(got, want)


def test_prefix_path_matches_oracle(world):
    _, _, cells, queries, qpdf, want = world
    got = _got(S.quadrant_search_prefix(queries, cells), qpdf)
    assert np.array_equal(got, want)


def test_out_of_domain_returns_minus_one(spark, world):
    _, _, cells, _, _, _ = world
    oob = spark.createDataFrame(
        [(0, -1.0, 5.0), (1, 1000001.0, 5.0), (2, 5.0, -0.5)], "qid long, x float, y float"
    )
    for fn in (S.quadrant_search_broadcast, S.quadrant_search_prefix):
        res = fn(oob, cells).select(S.RESULT_COL).toPandas()[S.RESULT_COL]
        assert (res == -1).all()


def test_point_lookup_inference_scenario(spark, world, small_points, small_points_df):
    """The reference driver's membership check on the six hard-coded queries:
    found ⇔ the exact point exists in the located quadrant's subtree."""
    root, bnds, cells, queries, qpdf, want = world
    x, y = small_points
    pts = QT.with_cell_id(small_points_df, 18)
    got = (
        S.point_lookup(queries, pts, cells)
        .orderBy("qid")
        .toPandas()
    )
    member_want = oracle.point_membership(
        root, x, y, qpdf["x"].to_numpy(), qpdf["y"].to_numpy(), want
    )
    assert np.array_equal(got[S.RESULT_COL].to_numpy(), want)
    assert np.array_equal(got["found"].to_numpy(), member_want)
    # scenario sanity: (100,100) sparse-region search resolves to a quadrant
    # but the exact point is absent (inference.cu behavior)
    row3 = got[got.qid == 3].iloc[0]
    assert row3[S.RESULT_COL] >= 0 and not row3["found"]


def test_strategies_agree_on_edge_pack(spark, world):
    """Midline/corner queries (shared-edge containment) must resolve
    identically under both physical paths."""
    _, _, cells, _, _, _ = world
    edge = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": range(6),
                "x": np.float32([500000, 500000, 250000, 0, 999999, 1000000]),
                "y": np.float32([500000, 123456, 750000, 0, 999999, 1000000]),
            }
        )
    )
    a = S.quadrant_search_broadcast(edge, cells).orderBy("qid").toPandas()
    b = S.quadrant_search_prefix(edge, cells).orderBy("qid").toPandas()
    assert a[S.RESULT_COL].tolist() == b[S.RESULT_COL].tolist()


def test_cells_cache_lru_evicts_and_unpersists(spark, monkeypatch):
    """ADVICE r2: the per-dataset index cache must not grow (and hold
    executor storage) without bound across datasets — the LRU bound evicts
    AND unpersists the oldest entry."""
    from geospatial_cuda_spark import entrypoints as E

    E._CELLS_CACHE.clear()
    monkeypatch.setattr(E, "_CELLS_CACHE_MAX", 1)
    df1 = E._cells(spark, "/root/testdata/sf0.001")
    assert df1.storageLevel.useMemory
    df2 = E._cells(spark, "/root/testdata/sf0.01")
    assert len(E._CELLS_CACHE) == 1
    assert not df1.storageLevel.useMemory  # evicted entry unpersisted
    # the build's INTERNAL counts persist is released too (review finding:
    # leaving it cached leaked executor storage per rebuild)
    assert all(not d.storageLevel.useMemory for d in df1._graft_persists)
    assert df2.storageLevel.useMemory
    # re-request of the evicted dataset rebuilds (cache miss, no stale entry)
    df1b = E._cells(spark, "/root/testdata/sf0.001")
    assert df1b.storageLevel.useMemory and len(E._CELLS_CACHE) == 1
    E._CELLS_CACHE.clear()
    df1b.unpersist()


def test_candidate_impls_agree(spark, world):
    """The Arrow-kernel candidate path (one-shot-plan fast: no Janino
    compile) must return exactly the JVM codegen path's results."""
    _root, _bnds, cells, queries, _qpdf, _want = world
    a = S.quadrant_search_prefix(queries, cells, max_depth=8).orderBy("qid")
    b = S.quadrant_search_prefix(
        queries, cells, max_depth=8, candidate_impl="arrow"
    ).orderBy("qid")
    assert [tuple(r) for r in a.select("qid", S.RESULT_COL).collect()] == [
        tuple(r) for r in b.select("qid", S.RESULT_COL).collect()
    ]


# ---------------------------------------------------------------------------
# distance_join (radius / ST_DWithin)
# ---------------------------------------------------------------------------


def _brute_pairs(qx, qy, px, py, r):
    """All (qi, pi) index pairs within inclusive Euclidean distance r."""
    dx = px[None, :].astype(np.float64) - qx[:, None].astype(np.float64)
    dy = py[None, :].astype(np.float64) - qy[:, None].astype(np.float64)
    return np.argwhere(dx * dx + dy * dy <= float(r) * float(r))


def test_distance_join_matches_numpy_brute_force(spark):
    rng = np.random.RandomState(7)
    px = rng.randint(0, 1_000_000, 400).astype(np.float64)
    py = rng.randint(0, 1_000_000, 400).astype(np.float64)
    qx = rng.randint(0, 1_000_000, 40).astype(np.float64)
    qy = rng.randint(0, 1_000_000, 40).astype(np.float64)
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(400), "x": px, "y": py})
    )
    qs = spark.createDataFrame(pd.DataFrame({"qid": np.arange(40), "x": qx, "y": qy}))
    for r in (50_000.0, 180_000.0):
        got = (
            S.distance_join(qs, pts, radius=r)
            .select("qid", "pid")
            .toPandas()
            .sort_values(["qid", "pid"])
            .to_numpy()
        )
        want = _brute_pairs(qx, qy, px, py, r)
        assert np.array_equal(got, want), f"radius {r}"


def test_distance_join_inclusive_boundary_and_bin_edges(spark):
    """A point EXACTLY at distance r is kept (inclusive), one lattice step
    beyond is dropped — including when query, point, and the r-offset all sit
    exactly on blocking-grid bin boundaries (the conservative-rectangle edge
    case the pad guards)."""
    # depth for r=31250 is 5 -> bin width 31250: q at a bin corner, matches
    # at exactly r along each axis land on bin boundaries too
    r = 31_250.0
    q = spark.createDataFrame(pd.DataFrame({"qid": [0], "x": [500_000.0], "y": [500_000.0]}))
    pts = pd.DataFrame(
        {
            "pid": [0, 1, 2, 3, 4, 5],
            "x": [500_000.0 - r, 500_000.0 + r, 500_000.0, 500_000.0, 500_000.0 + r + 1, 500_000.0],
            "y": [500_000.0, 500_000.0, 500_000.0 - r, 500_000.0 + r, 500_000.0, 500_000.0 + r + 1],
        }
    )
    got = (
        S.distance_join(q, spark.createDataFrame(pts), radius=r)
        .select("pid")
        .toPandas()["pid"]
        .sort_values()
        .tolist()
    )
    assert got == [0, 1, 2, 3]


def test_distance_join_reserved_columns_rejected(spark):
    q = spark.createDataFrame(pd.DataFrame({"qid": [0], "x": [1.0], "y": [1.0]}))
    p = spark.createDataFrame(pd.DataFrame({"dist2": [0.0], "x": [1.0], "y": [1.0]}))
    with pytest.raises(ValueError, match="reserved"):
        S.distance_join(q, p, radius=10.0)


def test_distance_join_plan_broadcasts_queries_not_points(spark):
    """Scale invariant: the points side must reach the join without an
    exchange — the exploded query rectangle is the broadcast side."""
    import contextlib, io

    q = spark.createDataFrame(pd.DataFrame({"qid": [0], "x": [1.0], "y": [1.0]}))
    p = spark.createDataFrame(pd.DataFrame({"pid": [0], "x": [1.0], "y": [1.0]}))
    df = S.distance_join(q, p, radius=10.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
