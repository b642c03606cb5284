"""Iceberg-style snapshot commits with per-partition lineage + resume.

No Iceberg jars ship in this container, so this module implements the
Iceberg-layout SEMANTICS on plain parquet (documented swap-in for a real
catalog): an immutable data directory partitioned by a bucket column, plus an
atomic JSON commit log under ``_manifest/`` recording, per snapshot:
snapshot id, parent id, committed buckets with row counts (lineage), and
wall-clock/row throughput metrics.

Guarantees:
- ``commit`` writes ONLY buckets not yet committed (idempotent resume: a
  re-run after a crash re-writes any partially-written bucket via dynamic
  partition overwrite, then publishes the manifest — readers never see
  uncommitted buckets because ``read`` prunes to the committed set);
- manifest publication is atomic (temp file + rename);
- a no-op commit (everything already committed) re-publishes nothing.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.manifest_dir = os.path.join(path, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest -----------------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.manifest_dir, "CURRENT")

    def current(self) -> dict | None:
        cur = self._current_path()
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def committed_buckets(self) -> dict[str, int]:
        m = self.current()
        return dict(m["buckets"]) if m else {}

    def _publish(self, manifest: dict) -> None:
        name = f"v{manifest['version']}.json"
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.rename(tmp, os.path.join(self.manifest_dir, name))
        tmp2 = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(name)
        os.rename(tmp2, self._current_path())

    # -- write path ----------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        bucket_col: str,
        max_buckets_per_commit: int | None = None,
    ) -> dict:
        """Write all not-yet-committed buckets of ``df`` and publish one new
        snapshot. ``max_buckets_per_commit`` bounds the work per call (used by
        tests to simulate a kill between commits; a driver loop calling commit
        until it returns done=True gets checkpointed incremental progress)."""
        spark = df.sparkSession
        t0 = time.time()
        done_buckets = self.committed_buckets()

        # Materialize the input ONCE: the commit needs three consumers (bucket
        # discovery, the partitioned write, per-bucket lineage counts) and the
        # upstream plan may be expensive (e.g. the tile-slice decode kernel) —
        # without the persist each consumer would recompute it from the scan.
        df = df.persist()
        try:
            # One aggregation job yields BOTH the pending-bucket list and the
            # per-bucket lineage row counts (tiny result: one row per bucket).
            bucket_counts = {
                r["_b"]: r["n"]
                for r in df.groupBy(F.col(bucket_col).cast("string").alias("_b"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            all_pending = sorted(b for b in bucket_counts if b not in done_buckets)
            pending = all_pending
            if max_buckets_per_commit is not None:
                pending = pending[:max_buckets_per_commit]
            if not pending:
                return {"done": True, "written_buckets": 0, "snapshot": self.current()}

            batch = df.where(F.col(bucket_col).cast("string").isin(pending))
            old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                # Cluster rows by bucket before the partitioned write: each
                # task then feeds exactly one partition writer (no per-task
                # sort fan-out, no #tasks × #buckets small files). Callers
                # needing more writer parallelism per bucket pre-repartition
                # on (bucket, salt).
                batch.repartition(F.col(bucket_col)).write.partitionBy(
                    bucket_col
                ).mode("overwrite").parquet(self.data_dir)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

            rows = {b: bucket_counts[b] for b in pending}
        finally:
            df.unpersist()
        parent = self.current()
        wall = time.time() - t0
        manifest = {
            "version": (parent["version"] + 1) if parent else 1,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "bucket_col": bucket_col,
            "bucket_type": df.schema[bucket_col].dataType.simpleString(),
            "buckets": {**done_buckets, **rows},
            "metrics": {
                "wall_sec": round(wall, 3),
                "rows_written": int(sum(rows.values())),
                "rows_per_sec": round(sum(rows.values()) / max(wall, 1e-9), 1),
                "buckets_written": len(rows),
            },
        }
        self._publish(manifest)
        return {
            "done": len(pending) == len(all_pending),
            "written_buckets": len(rows),
            "snapshot": manifest,
        }

    # -- read path -----------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        """Committed data only: prune to manifest buckets (uncommitted crash
        residue in the data dir is never visible)."""
        m = self.current()
        if m is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        df = spark.read.parquet(self.data_dir)
        if "bucket_type" in m:
            # partition-dir values read back as inferred types; restore the
            # committed column type so read schema == written schema
            df = df.withColumn(
                m["bucket_col"], F.col(m["bucket_col"]).cast(m["bucket_type"])
            )
        return df.where(
            F.col(m["bucket_col"]).cast("string").isin(sorted(m["buckets"]))
        )
