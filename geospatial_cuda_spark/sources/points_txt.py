"""The reference's native point-file source.

The CUDA engine ingests whitespace-separated ``x y`` text lines, parses
them as float32, and SKIPS malformed lines with a warning
(/root/reference/cuda/inference.cu:31-44, the same loop in
create_grid.cu); generate_points.py emits that format. A user switching
from the reference can point this source at the same files.

Spark rendering: a distributed ``spark.read.text`` scan (parallel over
file splits — no driver-side parsing), regexp split + float cast, with
malformed lines dropped by the same "both fields parse as numbers" rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_points_txt(
    spark: SparkSession, path: str, with_pid: bool = True
) -> DataFrame:
    """(pid, x float, y float) from reference-format text file(s).

    Malformed lines (wrong field count, non-numeric fields) are skipped —
    the reference warns and continues (inference.cu:41-43); count the
    difference against ``spark.read.text(path).count()`` if an ingest
    audit is needed. Coordinates are float32, the reference's Point type.

    ``with_pid`` assigns line-ordered ids the way the reference's
    ``emplace_back`` order does, ranking by (input_file_name, scan order).
    Why both keys: monotonically_increasing_id embeds (partition,
    row-in-partition), but FileSourceScan packs splits sorted by size
    DESCENDING — so partition index alone does not follow concatenated line
    order across multiple files or unequal splits. WITHIN one file the scan
    order is still offset order (equal-size splits of a file keep their
    relative order under the stable size sort, and the smaller tail split
    sorts after them), so keying by file name first yields: exact file order
    for a single file (the reference's case), and per-file line order with
    files in NAME order for a directory/glob — documented, deterministic,
    but not byte-concatenation order if names are unsorted.
    The rank is a GLOBAL ordering pass (fine at reference input sizes; ids
    are not in the file format, so at corpus scale pass ``with_pid=False``
    for pure value semantics — the reference never persists ids either,
    its membership checks are by value — or derive ids from content)."""
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    # try_cast: a malformed field becomes NULL (then the row is dropped),
    # matching the reference's skip-with-warning — ANSI cast would abort
    # the whole scan on the first bad line.
    df = raw.select(
        parts.getItem(0).try_cast("float").alias("x"),
        parts.getItem(1).try_cast("float").alias("y"),
        F.size(parts).alias("_nf"),
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_ord"),
    ).where(
        (F.col("_nf") >= 2) & F.col("x").isNotNull() & F.col("y").isNotNull()
    )
    if not with_pid:
        return df.select("x", "y")
    from pyspark.sql import Window

    w = Window.orderBy("_file", "_ord")
    return df.select(
        (F.row_number().over(w) - 1).cast("long").alias("pid"), "x", "y"
    )
