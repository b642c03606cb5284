"""kNN (J4, spatial) and ANN (embedding similarity search).

Spatial kNN
-----------
- ``knn_bruteforce``: broadcast queries × all points + window top-k — the
  exact baseline, O(Q·N) but embarrassingly parallel (never collect).
- ``knn_cells``: the scale path — candidates from the query's quadkey cell at
  a chosen depth plus an expanding neighbor ring, equi-joined against the
  cell-clustered points, then exact distance top-k. Exact whenever the kth
  neighbor lies within the ring guarantee radius (ring r at depth d covers
  distance ≥ r·extent/2^d from the query's cell); the result flags rows where
  that bound is not met so callers can escalate the ring.

Embedding ANN
-------------
- ``ann_bruteforce``: exact top-k cosine, JVM-side dot products
  (zip_with + aggregate — no Python in the scoring loop).
- ``ann_ivf``: IVF-style two-stage search: deterministic centroids
  (first n_centroids vectors), vectorized Arrow assignment, probe the
  ``n_probe`` nearest centroid buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from .. import MAX_DEPTH
from ..functions import cells as C
from ..functions.vectors import cosine_col
from .quadtree import ancestor_col


def _topk(joined: DataFrame, qid: str, k: int, dist_col, order_tiebreak: str) -> DataFrame:
    w = Window.partitionBy(qid).orderBy(dist_col.asc(), F.col(order_tiebreak).asc())
    return (
        joined.withColumn("dist2", dist_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def knn_bruteforce(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    qid: str = "qid",
    pid: str = "pid",
    max_collected_queries: int = 100_000,
) -> DataFrame:
    """Exact kNN by squared distance (float64); ties broken by pid.

    Two-phase top-k: the query set (small side, collected and closed over —
    the moral broadcast) is scored against each Arrow batch of points with
    one numpy distance matrix, and only the batch-local top-k per query
    survives. The global window then ranks Q·k·num_batches candidate rows —
    the N·Q cross product is never materialized, never shuffled, and the
    final sort is over a driver-trivial set. Parallelism = input partitions,
    not #queries (a Window.partitionBy(qid) over the raw cross join caps
    reducers at Q).

    The collect caps at ``max_collected_queries`` (the query set rides into
    every task closure, so Q is bounded by driver AND executor memory) —
    above the cap, fail fast and point at knn_cells, the scale path."""
    qrows = queries.select(qid, "x", "y").limit(max_collected_queries + 1).collect()
    if len(qrows) > max_collected_queries:
        raise ValueError(
            f"knn_bruteforce collected > {max_collected_queries} queries; "
            "use knn_cells (cell-pruned scale path) or raise max_collected_queries"
        )
    out_schema = f"{qid} long, {pid} long, x double, y double, dist2 double"
    if not qrows:
        return queries.sparkSession.createDataFrame([], out_schema).withColumn(
            "rank", F.lit(1).cast("int")
        ).select(qid, pid, "x", "y", "dist2", "rank")
    q_ids = np.array([r[qid] for r in qrows], dtype=np.int64)
    q_x = np.array([r["x"] for r in qrows], dtype=np.float64)
    q_y = np.array([r["y"] for r in qrows], dtype=np.float64)

    def partial_topk(batches):
        for b in batches:
            if not len(b):
                continue
            px = b["x"].to_numpy(np.float64)
            py = b["y"].to_numpy(np.float64)
            pids = b[pid].to_numpy(np.int64)
            d2 = (px[:, None] - q_x[None, :]) ** 2 + (py[:, None] - q_y[None, :]) ** 2
            kk = min(k, len(b))
            out = {qid: [], pid: [], "x": [], "y": [], "dist2": []}
            for j in range(len(q_ids)):
                order = np.lexsort((pids, d2[:, j]))[:kk]
                out[qid].append(np.full(kk, q_ids[j]))
                out[pid].append(pids[order])
                out["x"].append(px[order])
                out["y"].append(py[order])
                out["dist2"].append(d2[order, j])
            yield pd.DataFrame({c: np.concatenate(v) for c, v in out.items()})

    cand = points.select(pid, "x", "y").mapInPandas(partial_topk, out_schema)
    w = Window.partitionBy(qid).orderBy(F.col("dist2").asc(), F.col(pid).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, pid, "x", "y", "dist2", "rank")
    )


def knn_cells(
    queries: DataFrame,
    points_with_cell: DataFrame,
    k: int,
    depth: int,
    radius: int = 1,
    qid: str = "qid",
    pid: str = "pid",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Cell-pruned kNN: equi-join on depth-``depth`` cells from the query's
    (2·radius+1)² neighbor ring. Adds ``exact`` = kth distance is guaranteed
    exact (fits within the ring's covered radius)."""

    @F.pandas_udf(ArrayType(LongType()))
    def _ring(xs: pd.Series, ys: pd.Series) -> pd.Series:
        ids = C.encode_cell_ids(xs.to_numpy(), ys.to_numpy(), depth)
        ring = C.neighbor_ring(ids, depth, radius)
        return pd.Series([r[r >= 0] for r in ring])

    cand_cells = queries.select(
        qid,
        F.col("x").alias("_qx"),
        F.col("y").alias("_qy"),
        F.explode(_ring(F.col("x"), F.col("y"))).alias("_cell"),
    )
    pts = points_with_cell.withColumn(
        "_cell", ancestor_col(F.col("cell_id"), max_depth - depth)
    )
    joined = cand_cells.join(pts, on="_cell", how="inner")
    d2 = (F.col("x") - F.col("_qx")) * (F.col("x") - F.col("_qx")) + (
        F.col("y") - F.col("_qy")
    ) * (F.col("y") - F.col("_qy"))
    topk = _topk(joined, qid, k, d2, pid)
    # ring guarantee: every point within `guarantee` of the query is in some
    # candidate cell (the query sits inside its own cell; the ring extends
    # `radius` full cells beyond it on every side).
    cell_extent = 1_000_000.0 / (1 << depth)
    guarantee = (radius * cell_extent) ** 2
    counts = joined.groupBy(qid).agg(F.count(F.lit(1)).alias("_ncand"))
    return (
        topk.join(counts, on=qid)
        .withColumn(
            "exact",
            (F.col("_ncand") >= k) & (F.col("dist2") <= F.lit(guarantee)),
        )
        .select(qid, pid, "x", "y", F.col("dist2").cast("double"), "rank", "exact")
    )


def knn_cells_exact(
    queries: DataFrame,
    points_with_cell: DataFrame,
    k: int,
    depth: int,
    radius: int = 1,
    qid: str = "qid",
    pid: str = "pid",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """EXACT kNN via the cell-pruned scale path: run ``knn_cells`` and, for
    queries whose kth neighbor is not ring-guaranteed (``exact`` false or
    fewer than k candidates), re-run ONLY those queries with a doubled ring
    radius, until guaranteed. At radius ≥ 2^depth the ring covers the whole
    grid, so termination (and unconditional exactness) is structural.

    Equal to ``knn_bruteforce`` row-for-row (same distance, same pid
    tie-break) — the escalation is how the reference's nearest-structure
    search (cuda/kernels.cu:142-162) generalizes to guaranteed top-k without
    ever scoring the full N×Q product: each round is a candidate equi-join
    driven by the still-inexact queries only, and the per-round driver
    round-trip is O(#inexact queries), never O(points)."""
    grid = 1 << depth
    remaining = queries
    # The still-active qid set is tracked DRIVER-side: one collect of the
    # (bounded, by contract small) query ids up front, then each round's
    # single flags collect both classifies and reveals zero-candidate
    # queries (absent from flags entirely) by set difference — no extra
    # anti-join job per round.
    current_ids = {row[qid] for row in queries.select(qid).collect()}
    done: list[DataFrame] = []
    r = radius
    while True:
        # persist: each round's top-k is Q·k rows; without it the flags
        # collect AND the final union would recompute the candidate join.
        res = knn_cells(remaining, points_with_cell, k, depth, r, qid, pid, max_depth).persist()
        if r >= grid:
            done.append(res.drop("exact"))
            break
        flags = {
            row[qid]: (row["_all_exact"], row["_n"])
            for row in res.groupBy(qid)
            .agg(
                F.min(F.col("exact").cast("int")).alias("_all_exact"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        }
        settled = sorted(
            q for q, (ex, n) in flags.items() if ex == 1 and n >= k
        )
        done.append(
            res.where(F.col(qid).isin(settled)).select(qid, pid, "x", "y", "dist2", "rank")
        )
        inexact = sorted(current_ids - set(settled))
        if not inexact:
            break
        current_ids = set(inexact)
        remaining = remaining.where(F.col(qid).isin(inexact))
        r = min(r * 2, grid)
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------------------
# Embedding ANN
# ---------------------------------------------------------------------------


def ann_bruteforce(
    embeddings: DataFrame,
    query_vecs: DataFrame,
    k: int,
    vec_id: str = "vec_id",
    emb: str = "embedding",
    qid: str = "q_vec_id",
) -> DataFrame:
    """Exact top-k cosine: broadcast queries, JVM-side dot/norm, window top-k.
    Output sim is rounded to 6 dp; ranking uses the rounded value with vec_id
    tie-break so results are reproducible across engines."""
    q = F.broadcast(query_vecs.select(F.col(vec_id).alias(qid), F.col(emb).alias("_qv")))
    joined = embeddings.crossJoin(q).where(F.col(vec_id) != F.col(qid))
    sim = F.round(cosine_col(F.col(emb), F.col("_qv")), 6)
    w = Window.partitionBy(qid).orderBy(F.col("sim").desc(), F.col(vec_id).asc())
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, vec_id, "sim", "rank")
    )


def ann_ivf(
    embeddings: DataFrame,
    query_vecs: DataFrame,
    k: int,
    n_centroids: int | None = None,
    n_probe: int = 4,
    vec_id: str = "vec_id",
    emb: str = "embedding",
    qid: str = "q_vec_id",
) -> DataFrame:
    """IVF-bucketed ANN. Centroids are a DETERMINISTIC HASH SAMPLE of the
    corpus (ordered by xxhash64(id) — seeded, order-insensitive, so a sorted
    or clustered corpus cannot bias them the way head-of-table selection
    would); ``n_centroids`` defaults to ⌈√N⌉, the classic IVF sizing (bucket
    size ≈ √N, probe cost ≈ n_probe·√N). Assignment is one Arrow matmul per
    batch; the search probes only the ``n_probe`` closest buckets per query.
    Recall < 1 by construction — the recall@k ≥ 0.9 gate vs ann_bruteforce
    (with an n_probe sweep) lives in tests/test_pip_knn.py."""
    if n_centroids is None:
        n_centroids = max(4, int(np.ceil(np.sqrt(embeddings.count()))))
    cents = np.array(
        [
            r[emb]
            for r in embeddings.select(vec_id, emb)
            .orderBy(F.xxhash64(F.col(vec_id)), F.col(vec_id))
            .limit(n_centroids)
            .collect()
        ],
        dtype=np.float64,
    )
    cents_n = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def _bucket_udf(top: int):
        @F.pandas_udf(ArrayType(IntegerType()))
        def _assign(vs: pd.Series) -> pd.Series:
            m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cents_n.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, :top]
            return pd.Series([row.astype(np.int32) for row in order])

        return _assign

    tagged = embeddings.withColumn(
        "_bucket", F.element_at(_bucket_udf(1)(F.col(emb)), 1)
    )
    probes = query_vecs.select(
        F.col(vec_id).alias(qid),
        F.col(emb).alias("_qv"),
        F.explode(_bucket_udf(n_probe)(F.col(emb))).alias("_bucket"),
    )
    joined = tagged.join(probes, on="_bucket").where(F.col(vec_id) != F.col(qid))
    sim = F.round(cosine_col(F.col(emb), F.col("_qv")), 6)
    w = Window.partitionBy(qid).orderBy(F.col("sim").desc(), F.col(vec_id).asc())
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, vec_id, "sim", "rank")
    )
