"""Adaptive quadtree build as a level-synchronous DataFrame program.

The reference builds the tree by per-node recursion with a GPU kernel pair
per node (quadtree_grid, cuda/create_grid.cu:25-159) or a BFS wave loop
(cuda/create_grid_with_stream.cu:187-263). Neither shape survives 100 TB.
The engine exploits two structural facts instead:

1. The bbox subdivision is data-independent — only the STOP rule
   (count < MIN_POINTS or extent floor, create_grid.cu:31-35) is data-driven.
   So each point's full-depth quadkey is a pure function of (x, y): ONE
   Arrow kernel pass (float32-faithful descent + per-partition numpy count
   rollup over all levels) + ONE skinny shuffle of pre-reduced
   (cell_id, depth, count) partials replaces the entire recursion over
   points.

2. Subtree counts are monotone up the tree (parent = Σ children), and the
   extent rule is monotone in depth — so ``interior(parent)`` implies every
   ancestor is interior, and a cell exists in the tree iff its PARENT is
   interior. The tree-reality test is a single parent join on the cell-count
   relation: no iteration, no driver round-trips over data.

Result: the quadtree at any scale costs one kernel pass over the points plus
one cells-sized shuffle (≤ Σ_d occupied(d) pre-reduced rows per partition,
never points). Empty children of interior nodes are materialized as
zero-count leaves exactly like the reference's unconditional 4-way recursion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    FloatType,
    StructField,
    StructType,
)

from .. import DOMAIN, MAX_DEPTH, MIN_DISTANCE, MIN_POINTS
from ..functions import cells as C


def parent_col(cell_id: Column) -> Column:
    """(id-1) div 4 — exact for ids < 2^52."""
    return F.floor((cell_id - F.lit(1)) / F.lit(4)).cast("long")


def ancestor_col(cell_id: Column, levels_up: int) -> Column:
    """Ancestor ``levels_up`` levels up in ONE expression: iterating
    ``(id-1) div 4`` k times has the closed form
    ``floor((id - (4^k - 1)/3) / 4^k)`` — nested constant floor-divisions
    compose (``floor((floor(n/m)+p)/q) = floor((n+p·m)/(m·q))``, valid for
    all integer n), and the per-level ``-1`` offsets telescope to the base-4
    repunit. O(1) codegen per ancestor instead of O(k) nested floors; an
    ancestor-chain projection (search candidates, rollups, dyn chains)
    drops from O(depth²) to O(depth) expression terms, which shrinks its
    generated class and its Janino compile tax. Exact for ids < 2^52 (the
    double division by a power of 4 is exact below 2^53), matching
    ``parent_col``'s bound."""
    if levels_up <= 0:
        return cell_id
    c = (4 ** levels_up - 1) // 3
    return F.floor((cell_id - F.lit(c)) / F.lit(4 ** levels_up)).cast("long")


def ancestor_dyn_col(cell_id: Column, levels_up: Column, max_levels: int = MAX_DEPTH) -> Column:
    """Ancestor with a per-row (data-dependent) number of levels: index into
    the precomputed ancestor array (linear-size expression — a naive nested
    CASE WHEN doubles the expression tree per level and explodes the plan)."""
    chain = F.array(*[ancestor_col(cell_id, k) for k in range(max_levels + 1)])
    return F.element_at(chain, (levels_up + 1).cast("int"))


_BBOX_SCHEMA = StructType(
    [
        StructField("min_x", FloatType()),
        StructField("min_y", FloatType()),
        StructField("max_x", FloatType()),
        StructField("max_y", FloatType()),
        StructField("extent_ok", BooleanType()),
    ]
)


def bbox_struct_col(cell_id: Column, depth: Column, domain=DOMAIN, min_distance=MIN_DISTANCE) -> Column:
    """float32 bbox + interior-extent flag per cell (mixed depths per batch).

    extent_ok mirrors the negation of the reference's extent stop
    (create_grid.cu:31-35): interior requires |x1-x2| >= 5 OR |y1-y2| >= 5,
    evaluated in float32.
    """

    @F.pandas_udf(_BBOX_SCHEMA)
    def _bbox(ids: pd.Series, depths: pd.Series) -> pd.DataFrame:
        n = len(ids)
        out = {
            "min_x": np.zeros(n, np.float32),
            "min_y": np.zeros(n, np.float32),
            "max_x": np.zeros(n, np.float32),
            "max_y": np.zeros(n, np.float32),
            "extent_ok": np.zeros(n, bool),
        }
        ids_np = ids.to_numpy(np.int64)
        depths_np = depths.to_numpy(np.int64)
        for d in np.unique(depths_np):
            m = depths_np == d
            x1, y1, x2, y2 = C.cell_bbox(ids_np[m], int(d), domain)
            out["min_x"][m], out["min_y"][m] = x1, y1
            out["max_x"][m], out["max_y"][m] = x2, y2
            out["extent_ok"][m] = (np.abs(x1 - x2) >= np.float32(min_distance)) | (
                np.abs(y1 - y2) >= np.float32(min_distance)
            )
        return pd.DataFrame(out)

    return _bbox(cell_id, depth)


def with_cell_id(
    df: DataFrame,
    depth: int = MAX_DEPTH,
    x: str = "x",
    y: str = "y",
    out: str = "cell_id",
    domain=DOMAIN,
) -> DataFrame:
    """Attach the reference cell id at ``depth`` (float32-faithful kernel)."""
    return df.withColumn(out, C.cell_id_col(F.col(x), F.col(y), depth, domain))


def counts_from_points(
    points: DataFrame,
    x: str = "x",
    y: str = "y",
    domain=DOMAIN,
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """(cell_id, depth, count) for every OCCUPIED prefix cell at every depth.

    ONE exchange, independent of depth, carrying PRE-REDUCED rows: each input
    partition runs an Arrow kernel that encodes its points to finest cells
    (the float32-faithful reference descent) and rolls the counts up all
    ``max_depth + 1`` levels with numpy unique/bincount, yielding one partial
    (cell_id, depth, count) frame per partition. A single groupBy then merges
    the partials. The shuffle carries Σ_d min(partition_rows, occupied(d))
    rows per partition — the rollup collapses shallow depths at memory speed
    inside the kernel, where the equivalent relational shape (explode every
    finest cell into its ancestors, hash-aggregate (depth+1)·cells rows)
    pushes the whole expansion through the JVM hash tables: measured 3-4×
    slower at 5M points and the dominant term in the N→4N scaling bench.
    The per-level-groupBy CHAIN alternative is worse still — max_depth
    sequential exchanges of fixed stage latency no executor count removes.

    Trees the JVM can encode (max_depth <= 13 on the reference domain — the
    cell_id_col exact/hybrid codegen ceiling) take an all-JVM route
    instead: the codegen encode + one grouped count to finest cells, then
    the ancestor explode over the min(N, 4^max_depth) FINEST-CELL rows.
    This skips the JVM<->Python Arrow boundary entirely, whose round trip
    alone measured ~1.9 s on a 6M-point scan (guide §4.1) against ~0.3 s of
    kernel compute: the depth-8 contract build's counts pass dropped
    2.7 -> ~1 s and the depth-12 pass over 6M points 5.2 -> 2.2 s at 32
    cores. The 3-4x relational caveat above does not bite even in the
    worst case (occupied-finest ~ N): at 5M points / depth 12 / 4.3M
    occupied cells the explode+agg measured at PARITY with the kernel at 1
    and 4 pinned cores (23.2 vs 26.5 s, 6.3 vs 6.6 s) — the explode is
    over pre-reduced finest cells, never points, and partial aggregation
    bounds the shuffle. Deeper trees (no JVM encode) keep the kernel."""

    out_schema = "cell_id long, depth int, count long"

    if tuple(domain) == tuple(DOMAIN) and max_depth <= C._HYBRID_JVM_MAX_DEPTH:
        fin = (
            points.select(
                C.cell_id_col(F.col(x), F.col(y), max_depth, domain).alias("_fid")
            )
            .groupBy("_fid")
            .agg(F.count(F.lit(1)).alias("count"))
        )
        chain = F.array(*[ancestor_col(F.col("_fid"), k) for k in range(max_depth + 1)])
        return (
            fin.select(F.posexplode(chain).alias("k", "cell_id"), "count")
            .select(
                "cell_id",
                (F.lit(max_depth) - F.col("k")).cast("int").alias("depth"),
                "count",
            )
            .groupBy("cell_id", "depth")
            .agg(F.sum("count").alias("count"))
        )

    def rollup(batches):
        xs, ys = [], []
        for b in batches:
            xs.append(b[x].to_numpy(np.float64))
            ys.append(b[y].to_numpy(np.float64))
        if not xs:
            return
        ids = C.encode_cell_ids(np.concatenate(xs), np.concatenate(ys), max_depth, domain)
        cur_u, cur_c = np.unique(ids, return_counts=True)
        out_id, out_d, out_c = [cur_u], [np.full(cur_u.size, max_depth, np.int32)], [
            cur_c.astype(np.int64)
        ]
        for d in range(max_depth - 1, -1, -1):
            cur_u, inv = np.unique((cur_u - 1) // 4, return_inverse=True)
            cur_c = np.bincount(inv, weights=cur_c).astype(np.int64)
            out_id.append(cur_u)
            out_d.append(np.full(cur_u.size, d, np.int32))
            out_c.append(cur_c)
        yield pd.DataFrame(
            {
                "cell_id": np.concatenate(out_id),
                "depth": np.concatenate(out_d),
                "count": np.concatenate(out_c),
            }
        )

    partials = points.select(x, y).mapInPandas(rollup, out_schema)
    return partials.groupBy("cell_id", "depth").agg(F.sum("count").alias("count"))


def cells_from_counts(
    counts_all: DataFrame,
    min_points: int = MIN_POINTS,
    min_distance: float = MIN_DISTANCE,
    max_depth: int = MAX_DEPTH,
    domain=DOMAIN,
) -> DataFrame:
    """Derive the tree relation from prefix counts (cells-only work)."""
    # The count/depth predicates are cheap JVM filters and eliminate ~99% of
    # rows (only dense cells can be interior), so they run BEFORE the bbox
    # pandas UDF — the Arrow kernel then sees candidate-interior cells only,
    # not every occupied prefix cell.
    candidates = counts_all.where(
        (F.col("count") >= min_points) & (F.col("depth") < max_depth)
    )
    # The extent stop (|x1-x2| >= min_distance OR |y1-y2| >= min_distance,
    # float32) cannot bite while the widest axis of a depth-(max_depth-1)
    # cell is still ≥ 2·min_distance: the float32 descent halves each axis
    # within 1 ulp per level, so every candidate's extent test is TRUE and
    # the Arrow bbox stage here is a constant-true filter — skip it and
    # save one Python stage on the build's critical path. (The reference
    # defaults — 1e6 domain, min_distance 5 — keep the test provably
    # constant through depth 16; deeper trees evaluate it as before.)
    max_axis = max(abs(domain[2] - domain[0]), abs(domain[3] - domain[1]))
    if max_axis / (1 << max(max_depth - 1, 0)) >= 2.0 * min_distance:
        interior = candidates.select("cell_id", "depth", "count")
    else:
        interior = candidates.withColumn(
            "g", bbox_struct_col(F.col("cell_id"), F.col("depth"), domain, min_distance)
        ).where(F.col("g.extent_ok")).select("cell_id", "depth", "count")

    # Every interior cell spawns exactly 4 children (reference recursion is
    # unconditional: create_grid.cu:147-155) — empties become 0-count leaves.
    children = interior.select(
        F.explode(F.array(*[F.lit(k) for k in (1, 2, 3, 4)])).alias("k"),
        (F.col("cell_id") * 4 + F.col("k")).alias("child_id"),
        (F.col("depth") + 1).alias("depth"),
    ).select(F.col("child_id").alias("cell_id"), "depth")

    # Reality join: a non-root cell exists iff its parent is interior. Ids are
    # globally unique across depths, so cell_id alone is the key. Outer join
    # preserving the children side: the preserved side of an outer join can't
    # be the broadcast build side, and at full scale BOTH sides are O(cells)
    # anyway — the shuffled join (keys + one long each) is the scale shape;
    # AQE coalesces the tiny post-shuffle partitions at test scale.
    real = children.join(
        counts_all.select("cell_id", "count"), on="cell_id", how="left"
    ).select("cell_id", "depth", F.coalesce(F.col("count"), F.lit(0)).alias("count"))

    # The root row always exists; its count is the depth-0 rollup (0 if the
    # input is empty — the aggregate below is over ≤1 row, not the points).
    root = (
        counts_all.where(F.col("depth") == 0)
        .groupBy()
        .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("count"))
        .select(
            F.lit(0).cast("long").alias("cell_id"),
            F.lit(0).cast("int").alias("depth"),
            "count",
        )
    )

    cells = root.unionByName(real)
    # Output bboxes: pure-JVM twin whenever the depth/domain admits it (the
    # same gate as the all-JVM count rollup) — this removes the LAST Python
    # stage from the build; bit-identity with the numpy kernel is argued and
    # pytest-pinned at with_cell_bbox_jvm. Deeper trees keep the Arrow kernel.
    if tuple(domain) == tuple(DOMAIN) and max_depth <= C._HYBRID_JVM_MAX_DEPTH:
        cells = C.with_cell_bbox_jvm(cells, max_depth, domain, min_distance)
    else:
        cells = cells.withColumn(
            "g", bbox_struct_col(F.col("cell_id"), F.col("depth"), domain, min_distance)
        )
    cells = cells.select(
        "cell_id",
        "depth",
        F.col("g.min_x").alias("min_x"),
        F.col("g.min_y").alias("min_y"),
        F.col("g.max_x").alias("max_x"),
        F.col("g.max_y").alias("max_y"),
        "count",
        (
            ~(
                (F.col("count") >= min_points)
                & F.col("g.extent_ok")
                & (F.col("depth") < max_depth)
            )
        ).alias("is_leaf"),
    )
    return cells

def build_cells(
    points: DataFrame,
    x: str = "x",
    y: str = "y",
    domain=DOMAIN,
    min_points: int = MIN_POINTS,
    min_distance: float = MIN_DISTANCE,
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Build the quadtree as a relation.

    Returns ``(cell_id long, depth int, min_x/min_y/max_x/max_y float,
    count long, is_leaf boolean)`` — semantically identical to the relation
    prepare_boundaries emits (cuda/kernels.cu:517-537), including zero-count
    leaf children of interior nodes.
    """
    counts_all = counts_from_points(points, x, y, domain, max_depth).persist()
    cells = cells_from_counts(counts_all, min_points, min_distance, max_depth, domain)
    # the internal counts persist rides along so long-lived callers (the
    # entrypoints index cache) can release it with the cells relation —
    # otherwise every build leaks one persisted counts DataFrame
    cells._graft_persists = [counts_all]
    return cells


def validate_cells(
    points: DataFrame,
    cells: DataFrame,
    x: str = "x",
    y: str = "y",
    domain=DOMAIN,
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """The reference's validate_grid pass (inference.cu:95-102) as a
    relational operator: one row of invariant-violation counts, all zero
    iff the cells relation is a valid quadtree over ``points``.

    - ``n_points`` / ``leaf_count_sum``: leaf counts conserve the corpus;
    - ``n_unclaimed``: points whose ancestor chain hits NO leaf (P4 —
      out-of-bounds / hole check, cuda/kernels.cu boundary containment);
    - ``n_multi_claimed``: points claimed by >1 leaf (leaves must tile);
    - ``n_count_mismatch``: interior cells whose children's counts do not
      sum to theirs (A2 — count conservation at every split).

    Shape: points aggregate to their FINEST cell first (the chain of every
    point in a finest cell is identical, so claims are per finest cell ×
    its multiplicity — this is also what makes multi/unclaimed counting
    correct: a per-point id computed in the same projection as an explode
    would be re-evaluated per exploded row), then one ancestor explode over
    the ≤ occupied-finest-cells rows semi-joins the broadcast leaf set,
    plus one cells-sized self-join — no full re-sort, no driver loops."""
    leaves = cells.where(F.col("is_leaf")).select("cell_id", "count")
    finest = (
        with_cell_id(points.select(x, y), max_depth, x, y, "_fid", domain)
        .groupBy("_fid")
        .agg(F.count(F.lit(1)).alias("_npts"))
    )
    chain = F.array(*[ancestor_col(F.col("_fid"), k) for k in range(max_depth + 1)])
    claims = (
        finest.select("_fid", "_npts", F.explode(chain).alias("cell_id"))
        .join(F.broadcast(leaves.select("cell_id")), on="cell_id", how="inner")
        .groupBy("_fid", "_npts")
        .agg(F.count(F.lit(1)).alias("_n_leaves"))
    )
    pt_stats = claims.agg(
        F.sum("_npts").alias("_n_claimed"),
        F.sum(F.when(F.col("_n_leaves") > 1, F.col("_npts")).otherwise(F.lit(0))).alias(
            "n_multi_claimed"
        ),
    )
    kids = cells.select(
        ancestor_col(F.col("cell_id"), 1).alias("_parent"),
        F.col("count").alias("_child_count"),
    ).where(F.col("cell_id") > 0)
    mismatch = (
        cells.where(~F.col("is_leaf"))
        .select(F.col("cell_id").alias("_parent"), "count")
        .join(kids, on="_parent", how="left")
        .groupBy("_parent", "count")
        .agg(F.sum("_child_count").alias("_ksum"))
        .agg(
            F.sum(
                (F.coalesce(F.col("_ksum"), F.lit(-1)) != F.col("count")).cast("long")
            ).alias("n_count_mismatch")
        )
    )
    totals = points.agg(F.count(F.lit(1)).alias("n_points")).crossJoin(
        leaves.agg(F.sum("count").alias("leaf_count_sum"))
    )
    return (
        totals.crossJoin(pt_stats)
        .crossJoin(mismatch)
        .select(
            "n_points",
            F.coalesce(F.col("leaf_count_sum"), F.lit(0)).alias("leaf_count_sum"),
            # coalesce: zero claims (no leaves at all) sums to NULL, and
            # n_points - NULL would report the worst corruption as NULL
            (F.col("n_points") - F.coalesce(F.col("_n_claimed"), F.lit(0))).alias(
                "n_unclaimed"
            ),
            F.coalesce(F.col("n_multi_claimed"), F.lit(0)).alias("n_multi_claimed"),
            F.coalesce(F.col("n_count_mismatch"), F.lit(0)).alias("n_count_mismatch"),
        )
    )
