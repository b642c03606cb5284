"""Spatial clustering of the points/images table (R2's relational twin).

The reference's reorder_points counting-sort (cuda/kernels.cu:164-226)
physically groups each node's points into a contiguous ``(start_pos, count)``
slice — i.e., the table sorted/clustered by quadkey. In Spark that is a
range/hash repartition on a cell prefix + sortWithinPartitions: parquet
row-group min/max stats on the sorted cell_id then give the reference's O(1)
subtree slicing (X7) as ordinary partition/row-group pruning.

Skew: the reference's adaptive split bounds leaf size EXCEPT at the
MIN_DISTANCE floor, where dense cells simply stop splitting and the skew
remains (SURVEY §4). The engine salts such hot keys: the shuffle key becomes
(prefix, pmod(hash(tiebreak), n_salt)) so one hot cell spreads over n_salt
reducers while remaining mergeable by prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .quadtree import ancestor_col


def cluster_by_cell(
    df: DataFrame,
    prefix_depth: int,
    max_depth: int,
    num_partitions: int | None = None,
    order_cols: tuple[str, ...] = ("cell_id",),
    cell_col: str = "cell_id",
    salt_threshold: int | None = None,
    salt_buckets: int = 8,
    salt_tiebreak: str | None = None,
) -> DataFrame:
    """Cluster rows by the depth-``prefix_depth`` ancestor of ``cell_col``
    (which is at ``max_depth``), sorted by cell id within partitions.

    With ``salt_threshold`` set, prefixes whose row count exceeds it are
    salted across ``salt_buckets`` shuffle keys (AQE skew-join handles the
    join side; this handles the layout side).
    """
    out = df.withColumn(
        "cell_prefix", ancestor_col(F.col(cell_col), max_depth - prefix_depth)
    )
    keys = [F.col("cell_prefix")]
    if salt_threshold is not None:
        hot = (
            out.groupBy("cell_prefix")
            .count()
            .where(F.col("count") > salt_threshold)
            .select("cell_prefix", F.lit(True).alias("_hot"))
        )
        tb = F.col(salt_tiebreak) if salt_tiebreak else F.monotonically_increasing_id()
        out = out.join(F.broadcast(hot), on="cell_prefix", how="left").withColumn(
            "_salt",
            F.when(F.col("_hot"), F.pmod(F.hash(tb), F.lit(salt_buckets))).otherwise(
                F.lit(0)
            ),
        ).drop("_hot")
        keys.append(F.col("_salt"))
    if num_partitions:
        out = out.repartition(num_partitions, *keys)
    else:
        out = out.repartition(*keys)
    return out.sortWithinPartitions(*order_cols)


def write_clustered(
    df: DataFrame,
    path: str,
    prefix_depth: int,
    max_depth: int,
    num_partitions: int | None = None,
    order_cols: tuple[str, ...] = ("cell_id",),
) -> None:
    """Materialize the clustered layout: directory-partitioned by cell_prefix
    (Iceberg hidden-partition analogue), row-group-sorted by cell_id, so
    readers get partition pruning + min/max row-group pruning for free."""
    clustered = cluster_by_cell(df, prefix_depth, max_depth, num_partitions, order_cols)
    clustered.write.partitionBy("cell_prefix").mode("overwrite").parquet(path)
