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


def _polys_df(spark, polys):
    return spark.createDataFrame(
        [(int(pid), v[:, 0].tolist(), v[:, 1].tolist()) for pid, v in polys],
        "poly_id int, xs array<double>, ys array<double>",
    )


def test_pip_join_matches_closure_path(spark, small_points_df):
    """The polygon-relation path (blocking join + cogrouped kernel) must hit
    exactly the same (point, polygon) pairs as the closure path — including
    non-convex polygons and boundary points — with and without salting."""
    polys = polygons()
    want = set(
        map(
            tuple,
            P.point_in_polygons(small_points_df, polys)
            .select("pid", "poly_id")
            .toPandas()
            .itertuples(index=False),
        )
    )
    pdf = _polys_df(spark, polys)
    for salt in (None, 3):
        got = set(
            map(
                tuple,
                P.point_in_polygons_join(small_points_df, pdf, salt=salt)
                .select("pid", "poly_id")
                .toPandas()
                .itertuples(index=False),
            )
        )
        assert got == want, f"salt={salt}"


def test_pip_join_no_driver_polygon_state(spark, small_points_df, monkeypatch):
    """Closure-size regression (VERDICT r3 item 3): with 500 polygons the
    relational path must neither collect the polygon set to the driver nor
    close over it — the plan is a blocking equi-join feeding a cogrouped
    Arrow kernel."""
    from pyspark.sql import DataFrame

    pdf = spark.range(500).select(
        F.col("id").cast("int").alias("poly_id"),
        F.expr(
            "transform(array(0, 1, 1, 0), i -> CAST((id * 7717) % 950000"
            " + i * 30000 AS DOUBLE))"
        ).alias("xs"),
        F.expr(
            "transform(array(0, 0, 1, 1), i -> CAST((id * 4013) % 950000"
            " + i * 25000 AS DOUBLE))"
        ).alias("ys"),
    )
    joined = P.point_in_polygons_join(small_points_df, pdf, block_depth=5)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan  # vertices meet candidates via cogroup
    assert "Join" in plan  # grid-blocking equi-join, not a cross product
    monkeypatch.setattr(
        DataFrame, "collect", lambda self: (_ for _ in ()).throw(
            AssertionError("driver-side collect in the PIP join path")
        )
    )
    assert joined.count() > 0


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


def test_knn_cells_exact_equals_brute_everywhere(spark, knn_world):
    """Ring escalation makes the cell path exact for EVERY query — including
    ones whose initial radius-1 ring is too tight (sparse neighborhoods), the
    case the non-escalating path flags exact=false."""
    queries, pts = knn_world
    k = 5
    # depth 6 cells are sparse at this fixture density, so radius=1 leaves
    # queries inexact in round 1 and the escalation loop genuinely runs
    first = K.knn_cells(queries, pts, k, depth=6, radius=1).toPandas()
    per_q = first.groupby("qid").apply(lambda g: bool(g["exact"].all()) and len(g) == k)
    assert not per_q.all()
    brute = K.knn_bruteforce(queries, pts.drop("cell_id"), k).toPandas()
    exact = K.knn_cells_exact(queries, pts, k, depth=6, radius=1).toPandas()
    for qid in brute.qid.unique():
        a = brute[brute.qid == qid].sort_values("rank")["pid"].tolist()
        b = exact[exact.qid == qid].sort_values("rank")["pid"].tolist()
        assert a == b, f"qid {qid}"
    assert len(exact) == len(brute)


def test_knn_cells_exact_10k_queries_no_driver_state(spark, small_points, small_points_df, monkeypatch):
    """VERDICT r2: the escalation loop must hold NO per-query driver state.
    10k queries through ≥2 genuine escalation rounds with DataFrame.collect
    FORBIDDEN for the duration (the round-2 implementation collected every
    qid and built O(Q) ``isin`` literal plans — at this Q that is a 10k-element
    IN-list per round and a 64 KB-codegen hazard). Result must equal brute
    force row-for-row, and the returned plan is a checkpoint scan with no
    O(Q) literals."""
    import pandas as pd
    from pyspark.sql import DataFrame as SparkDF

    from geospatial_cuda_spark.util import hash2

    n_q = 10_000
    ids = np.arange(n_q, dtype=np.uint64)
    qx = (hash2(ids, np.full_like(ids, 301)) % np.uint64(1_000_000)).astype(np.float64)
    qy = (hash2(ids, np.full_like(ids, 302)) % np.uint64(1_000_000)).astype(np.float64)
    queries = spark.createDataFrame(
        pd.DataFrame({"qid": ids.astype(np.int64), "x": qx, "y": qy})
    ).persist()
    pts = QT.with_cell_id(small_points_df, 18).persist()
    k = 3
    # at depth 6 / radius 1 the fixture density leaves many queries inexact,
    # so the loop genuinely escalates (≥2 rounds)
    first = K.knn_cells(queries, pts, k, depth=6, radius=1)
    per_q = first.groupBy("qid").agg(
        F.min(F.col("exact").cast("int")).alias("ok"), F.count(F.lit(1)).alias("n")
    )
    n_settled_r1 = per_q.where((F.col("ok") == 1) & (F.col("n") >= k)).count()
    assert 0 < n_settled_r1 < n_q

    def no_collect(self):
        raise AssertionError("driver-side DataFrame.collect during knn_cells_exact")

    monkeypatch.setattr(SparkDF, "collect", no_collect)
    try:
        out = K.knn_cells_exact(queries, pts, k, depth=6, radius=1)
    finally:
        monkeypatch.undo()
    # checkpointed result: plan has no O(Q) IN-lists (it is a scan)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "extended"
    )
    assert len(plan) < 20_000, f"plan unexpectedly large ({len(plan)} chars)"
    got = out.toPandas()
    brute = K.knn_bruteforce(
        queries, pts.drop("cell_id"), k, max_collected_queries=20_000
    ).toPandas()
    assert len(got) == len(brute) == n_q * k
    g = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = brute.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert g["pid"].tolist() == b["pid"].tolist()
    assert g["qid"].tolist() == b["qid"].tolist()
    queries.unpersist()
    pts.unpersist()


def test_choose_knn_depth_tracks_density():
    """Derived candidate depth (VERDICT r3 item 5): reproduces the
    hand-tuned sf0.1 value and moves ~log4 with density, keeping per-query
    ring cost flat instead of inflating the join."""
    from geospatial_cuda_spark import MAX_DEPTH

    d1 = K.choose_knn_depth(600_000, k=5)
    assert d1 == 6  # the previously hand-tuned sf0.1 constant
    d2 = K.choose_knn_depth(60_000_000, k=5)  # 100x the density
    assert d2 - d1 in (3, 4)  # ≈ log4(100)
    assert K.choose_knn_depth(100, k=5) == 1  # tiny corpus: coarsest grid
    assert K.choose_knn_depth(10**14, k=5) <= MAX_DEPTH  # clamped


def test_knn_bruteforce_empty_queries(spark, knn_world):
    queries, pts = knn_world
    empty = queries.where(F.lit(False))
    out = K.knn_bruteforce(empty, pts.drop("cell_id"), 5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["qid", "pid", "x", "y", "dist2", "rank"]


def test_ann_ivf_recall_gate(spark):
    """IVF with hash-sampled centroids (n_centroids = ⌈√N⌉): recall@10 vs the
    exact brute-force baseline must be ≥ 0.9 at the default probe width, and
    the n_probe sweep must be monotone (more probes ⇒ no less recall)."""
    # clustered corpus (mixture of Gaussians) — IVF's contract: real
    # embedding spaces cluster; on isotropic noise no coarse quantizer can
    # co-locate near-orthogonal "neighbors"
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(20, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, 20, size=400)
    vecs = (centers[assign] + rng.normal(scale=0.08, size=(400, 64))).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()
    queries = emb.where(F.col("vec_id") < 15)

    brute = K.ann_bruteforce(emb, queries, k=10).toPandas()
    truth = {
        q: set(g.sort_values("rank")["vec_id"])
        for q, g in brute.groupby("q_vec_id")
    }

    def recall(n_probe: int, quantizer: str = "sample") -> float:
        got = K.ann_ivf(
            emb, queries, k=10, n_probe=n_probe, quantizer=quantizer
        ).toPandas()
        hits = total = 0
        for q, want in truth.items():
            have = set(got[got.q_vec_id == q]["vec_id"])
            hits += len(have & want)
            total += len(want)
        return hits / total

    sweep = {p: recall(p) for p in (1, 4, 8)}
    assert sweep[8] >= sweep[1] - 1e-9, sweep
    assert sweep[8] >= 0.9, sweep

    # trained quantizer (VERDICT r3 item 4): measurably above the
    # hash-sample baseline at fixed probe width (measured 0.96 vs 0.81 at
    # n_probe=1, 1.0 vs 0.96 at n_probe=4 on this fixture)
    km = {p: recall(p, "kmeans") for p in (1, 4, 8)}
    assert km[1] >= sweep[1] + 0.05, (km, sweep)
    assert km[4] >= sweep[4] + 0.02, (km, sweep)
    # at EVERY probe width the trained quantizer is no worse than the
    # hash sample (VERDICT r4 item 8) — at wide probes both saturate, so
    # the gate is ≥, not strictly-better
    for p in (1, 4, 8):
        assert km[p] >= sweep[p] - 1e-9, (p, km, sweep)
    # deterministic: training is a pure function of the data — identical
    # centroids regardless of partitioning
    c1 = K.kmeans_centroids(emb, 20)
    c2 = K.kmeans_centroids(emb.repartition(13), 20)
    assert np.array_equal(c1, c2)
    emb.unpersist()


def test_choose_block_depth_tracks_polygon_scale(spark):
    """Derived blocking depth: cell edge ~ median bbox edge, so big
    polygons get a coarse grid and small ones a fine grid, and the derived
    depth produces identical results to the fixed default."""
    def rects(n, size):
        return spark.range(n).select(
            F.col("id").cast("int").alias("poly_id"),
            F.expr(
                f"transform(array(0,1,1,0), i -> CAST((id*7717)%900000"
                f" + i*{size} AS DOUBLE))"
            ).alias("xs"),
            F.expr(
                f"transform(array(0,0,1,1), i -> CAST((id*4013)%900000"
                f" + i*{size} AS DOUBLE))"
            ).alias("ys"),
        )

    d_small = P.choose_block_depth(rects(100, 2_000))     # ~2km boxes
    d_big = P.choose_block_depth(rects(100, 250_000))     # ~250km boxes
    assert d_small > d_big
    assert 7 <= d_small <= 10 and 1 <= d_big <= 3
    # depth only moves cost, never results
    pts = spark.range(2000).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 7919) % 1_000_000).cast("double").alias("x"),
        ((F.col("id") * 6101) % 1_000_000).cast("double").alias("y"),
    )
    fixed = set(map(tuple, P.point_in_polygons_join(pts, rects(50, 50_000), block_depth=4)
                    .select("pid", "poly_id").toPandas().itertuples(index=False)))
    auto = set(map(tuple, P.point_in_polygons_join(pts, rects(50, 50_000), block_depth=None)
                   .select("pid", "poly_id").toPandas().itertuples(index=False)))
    assert fixed == auto


# ---------------------------------------------------------------------------
# Multi-ring polygons + fill rules (VERDICT r4 item 6)
# ---------------------------------------------------------------------------


def _naive_pip(px: float, py: float, rings, rule: str) -> bool:
    """Independent per-point scalar reference (plain Python loop — no shared
    vectorized code with the kernel): signed +x-ray crossing count."""
    wn = 0
    onedge = False
    for poly in rings:
        k = len(poly)
        for i in range(k):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % k]
            cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            if (
                cross == 0.0
                and min(x1, x2) <= px <= max(x1, x2)
                and min(y1, y2) <= py <= max(y1, y2)
            ):
                onedge = True
            if (y1 > py) != (y2 > py):
                xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xint:
                    wn += 1 if y2 > y1 else -1
    inside = (wn % 2 == 1) if rule == "evenodd" else (wn != 0)
    return inside or onedge


# classic self-intersecting pentagram (pentagon vertices in 0,2,4,1,3 order):
# the central core is wound TWICE, so nonzero keeps it and even-odd drops it
PENTAGRAM = np.array(
    [(0.0, 100.0), (59.0, -81.0), (-95.0, 31.0), (95.0, 31.0), (-59.0, -81.0)]
)


def test_fill_rules_disagree_on_selfoverlap_pinned_to_naive():
    from geospatial_cuda_spark.functions.geo import pip_mask_rings

    xs, ys = np.meshgrid(np.linspace(-120, 120, 41), np.linspace(-100, 120, 41))
    px, py = xs.ravel(), ys.ravel()
    eo = pip_mask_rings(px, py, [PENTAGRAM], "evenodd")
    nz = pip_mask_rings(px, py, [PENTAGRAM], "nonzero")
    want_eo = np.array([_naive_pip(a, b, [PENTAGRAM], "evenodd") for a, b in zip(px, py)])
    want_nz = np.array([_naive_pip(a, b, [PENTAGRAM], "nonzero") for a, b in zip(px, py)])
    assert (eo == want_eo).all()
    assert (nz == want_nz).all()
    # the double-wound core: nonzero includes it, even-odd excludes it
    core = pip_mask_rings(np.array([0.0]), np.array([0.0]), [PENTAGRAM], "nonzero")
    core_eo = pip_mask_rings(np.array([0.0]), np.array([0.0]), [PENTAGRAM], "evenodd")
    assert bool(core[0]) and not bool(core_eo[0])
    assert (eo != nz).any()  # and they disagree on a real region, not a point


def test_hole_semantics_by_rule_and_orientation():
    """A rect-with-rect-hole donut: even-odd punches the hole regardless of
    the inner ring's winding; nonzero punches it ONLY when the inner ring
    winds opposite to the outer."""
    from geospatial_cuda_spark.functions.geo import pip_mask_rings

    outer = np.array([(0.0, 0.0), (100.0, 0.0), (100.0, 100.0), (0.0, 100.0)])  # CCW
    hole_cw = np.array([(25.0, 25.0), (25.0, 75.0), (75.0, 75.0), (75.0, 25.0)])
    hole_ccw = hole_cw[::-1]
    mid = (np.array([50.0]), np.array([50.0]))
    ringy = (np.array([10.0]), np.array([10.0]))  # between outer and hole
    for hole in (hole_cw, hole_ccw):
        assert not pip_mask_rings(*mid, [outer, hole], "evenodd")[0]
        assert pip_mask_rings(*ringy, [outer, hole], "evenodd")[0]
    assert not pip_mask_rings(*mid, [outer, hole_cw], "nonzero")[0]
    assert pip_mask_rings(*mid, [outer, hole_ccw], "nonzero")[0]  # same winding: no hole
    # a point ON the hole's edge is boundary-inclusive inside
    assert pip_mask_rings(np.array([25.0]), np.array([50.0]), [outer, hole_cw], "evenodd")[0]
    # single-ring delegation is bit-identical to the historical kernel surface
    from geospatial_cuda_spark.functions.geo import pip_mask

    rng = np.random.default_rng(11)
    poly = rng.uniform(0, 100, size=(7, 2))
    qx, qy = rng.uniform(-10, 110, 500), rng.uniform(-10, 110, 500)
    assert (pip_mask(qx, qy, poly) == pip_mask_rings(qx, qy, [poly], "evenodd")).all()


def test_pip_join_multiring(spark):
    """The relational path carries array-of-array ring columns through the
    same blocking join + cogrouped kernel; results match the naive per-point
    reference under both fill rules."""
    rows = []
    for pid_, (ox, oy, w) in enumerate([(100_000.0, 100_000.0, 80_000.0),
                                        (400_000.0, 300_000.0, 120_000.0)]):
        hx, hy, hw = ox + w / 4, oy + w / 4, w / 2
        rows.append((
            pid_,
            [[ox, ox + w, ox + w, ox], [hx, hx + hw, hx + hw, hx]],
            [[oy, oy, oy + w, oy + w], [hy, hy, hy + hw, hy + hw]],
        ))
    polys = spark.createDataFrame(
        rows, "poly_id long, xs array<array<double>>, ys array<array<double>>"
    )
    rng = np.random.default_rng(5)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(0, 600_000, 400), rng.uniform(0, 600_000, 400)))]
    pts_df = spark.createDataFrame(pts, "pid long, x double, y double")
    rings_by_id = {
        r[0]: [np.column_stack([np.array(rx), np.array(ry)])
               for rx, ry in zip(r[1], r[2])]
        for r in rows
    }
    for rule in ("evenodd", "nonzero"):
        got = {
            (r["pid"], r["poly_id"])
            for r in P.point_in_polygons_join(
                pts_df, polys, block_depth=3, salt=2, rule=rule
            ).collect()
        }
        want = {
            (pid_, qid)
            for pid_, x, y in pts
            for qid, rings in rings_by_id.items()
            if _naive_pip(x, y, rings, rule)
        }
        assert got == want, rule


def test_cluster_assign_matches_numpy_and_kmeans_refines(spark):
    """cluster_assign: (a) the sample-quantizer assignment equals a numpy
    re-derivation (md5-ordered centroids, rounded-cosine argmax, lowest-index
    tie-break); (b) the kmeans quantizer yields mean member→centroid cosine
    ≥ the sample quantizer's (the refinement claim, mirroring the IVF recall
    gate); (c) every doc is assigned exactly once."""
    import hashlib

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, 8, size=300)
    vecs = (centers[assign] + rng.normal(scale=0.1, size=(300, 32))).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()
    k = 8

    got = K.cluster_assign(emb, k).toPandas().sort_values("vec_id", ignore_index=True)
    assert len(got) == 300 and got["vec_id"].is_unique

    # numpy oracle: identical centroid choice + rounded argmax
    order = sorted(range(300), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = np.array([vecs[i] for i in order[:k]], dtype=np.float64)
    x = vecs.astype(np.float64)
    sims = (x @ cents.T) / (
        np.linalg.norm(x, axis=1, keepdims=True) * np.linalg.norm(cents, axis=1)
    )
    from geospatial_cuda_spark.util import round_half_away

    sims = round_half_away(sims, 6)
    want = np.argmax(sims, axis=1)
    assert (got["cluster"].to_numpy() == want).all()
    assert np.array_equal(
        got["sim"].to_numpy(), sims[np.arange(300), want]
    )

    mean_sample = got["sim"].mean()
    km = K.cluster_assign(emb, k, quantizer="kmeans").toPandas()
    assert km["sim"].mean() >= mean_sample
    emb.unpersist()


def test_ann_bruteforce_jvm_scorer_bit_identical(spark):
    """scorer='jvm' (whole-stage-codegen unrolled cosine + signum/floor
    half-away rounding) must be BIT-identical to the Arrow kernel — same
    accumulation order, same IEEE rounding ops — so the scorer choice moves
    cost only, never results (ADVICE r4)."""
    import pytest

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(150, 16)).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 8)

    arrow = K.ann_bruteforce(emb, queries, k=7).toPandas()
    jvm = K.ann_bruteforce(emb, queries, k=7, scorer="jvm", dim=16).toPandas()
    key = ["q_vec_id", "rank"]
    a = arrow.sort_values(key, ignore_index=True)
    j = jvm.sort_values(key, ignore_index=True)
    assert (a["vec_id"] == j["vec_id"]).all()
    # bit-identical similarities, not approximately-equal
    assert (
        a["sim"].to_numpy().tobytes() == j["sim"].to_numpy().tobytes()
    )
    with pytest.raises(ValueError, match="dim"):
        K.ann_bruteforce(emb, queries, k=7, scorer="jvm")
    with pytest.raises(ValueError, match="scorer"):
        K.ann_bruteforce(emb, queries, k=7, scorer="gpu")


def test_pip_jvm_scorer_bit_identical(spark):
    """point_in_polygons(scorer='jvm') — the whole-stage-codegen ray cast —
    must produce EXACTLY the Arrow kernel's hit set (same float64 edge
    arithmetic in the same order), including points landing exactly ON
    edges/vertices, so the scorer choice moves cost only, never results."""
    rng = np.random.default_rng(23)
    polys = polygons()
    # random interior points + exact boundary/vertex points of every polygon
    xs = rng.uniform(0, 1e6, 4000)
    ys = rng.uniform(0, 1e6, 4000)
    bx, by = [], []
    for _, v in polys:
        for i in range(len(v)):
            x1, y1 = v[i]
            x2, y2 = v[(i + 1) % len(v)]
            bx += [x1, (x1 + x2) / 2.0]
            by += [y1, (y1 + y2) / 2.0]
    xs = np.concatenate([xs, np.array(bx)])
    ys = np.concatenate([ys, np.array(by)])
    rows = [(i, float(xs[i]), float(ys[i])) for i in range(len(xs))]
    pts = spark.createDataFrame(rows, "pid long, x double, y double")
    key = ["pid", "poly_id"]
    arrow = (
        P.point_in_polygons(pts, polys)
        .select(*key).toPandas().sort_values(key, ignore_index=True)
    )
    jvm = (
        P.point_in_polygons(pts, polys, scorer="jvm")
        .select(*key).toPandas().sort_values(key, ignore_index=True)
    )
    assert arrow.equals(jvm)
    with pytest.raises(ValueError, match="scorer"):
        P.point_in_polygons(pts, polys, scorer="gpu")
