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

    def _bucket_files(self, bucket_col: str) -> dict[str, set[str]]:
        """{bucket value: parquet file names} currently on disk (metadata-only
        directory listing, no data read)."""
        out: dict[str, set[str]] = {}
        prefix = f"{bucket_col}="
        if not os.path.isdir(self.data_dir):
            return out
        for d in os.listdir(self.data_dir):
            if d.startswith(prefix):
                bdir = os.path.join(self.data_dir, d)
                out[d[len(prefix):]] = {
                    f for f in os.listdir(bdir) if f.endswith(".parquet")
                }
        return out

    @staticmethod
    def _footer_rows(bdir: str, files: set[str]) -> int:
        """Row count of a bucket directory from parquet footers (metadata-only
        — no column data is read; at cluster scale this is the same footer
        metadata a catalog manifest records at write time)."""
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(os.path.join(bdir, f)).metadata.num_rows for f in files)

    def commit(
        self,
        df: DataFrame,
        bucket_col: str,
        max_buckets_per_commit: int | None = None,
    ) -> dict:
        """Write all not-yet-committed buckets of ``df`` and publish one new
        snapshot. ``max_buckets_per_commit`` bounds the work per call (used by
        tests to simulate a kill between commits; a driver loop calling commit
        until it returns done=True gets checkpointed incremental progress).

        The unbounded path is SINGLE-PASS over the input: the committed-bucket
        filter comes from the manifest (no scan), the partitioned write is the
        only job that computes the upstream plan, and the per-bucket lineage
        row counts come from the freshly written parquet footers
        (metadata-only). No persist/spill of the payload, no second
        computation of an expensive upstream (e.g. the tile-slice kernel)."""
        spark = df.sparkSession
        t0 = time.time()
        done_buckets = self.committed_buckets()
        bstr = F.col(bucket_col).cast("string")

        if max_buckets_per_commit is None:
            batch = df
            if done_buckets:
                batch = df.where(~bstr.isin(sorted(done_buckets)))
            before = self._bucket_files(bucket_col)
            self._write_dynamic(batch, bucket_col)
            after = self._bucket_files(bucket_col)
            # Touched buckets = changed/new file sets (writer file names are
            # job-unique, so an overwritten partition never aliases its old
            # files). Crash residue in OTHER uncommitted buckets stays
            # invisible: unchanged file set → not in this manifest either.
            rows = {
                b: self._footer_rows(
                    os.path.join(self.data_dir, f"{bucket_col}={b}"), files
                )
                for b, files in after.items()
                if b not in done_buckets and files != before.get(b)
            }
            if not rows:
                return {"done": True, "written_buckets": 0, "snapshot": self.current()}
            all_pending = pending = sorted(rows)
        else:
            # Bounded (checkpointed) commits need the pending-bucket list up
            # front — one aggregation pass; persist only if the caller hasn't
            # already (and release only what we acquired).
            we_persisted = df.storageLevel.useMemory is False and df.storageLevel.useDisk is False
            if we_persisted:
                df = df.persist()
            try:
                bucket_counts = {
                    r["_b"]: r["n"]
                    for r in df.groupBy(bstr.alias("_b"))
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                all_pending = sorted(b for b in bucket_counts if b not in done_buckets)
                pending = all_pending[:max_buckets_per_commit]
                if not pending:
                    return {"done": True, "written_buckets": 0, "snapshot": self.current()}
                self._write_dynamic(df.where(bstr.isin(pending)), bucket_col)
                rows = {b: bucket_counts[b] for b in pending}
            finally:
                if we_persisted:
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

    def overwrite_buckets(
        self, df: DataFrame, bucket_col: str, buckets: list[str]
    ) -> dict:
        """Upsert path: rewrite EXACTLY the given buckets and publish one new
        snapshot. ``df`` must hold all surviving rows of those buckets (rows
        of other buckets are filtered out defensively). A listed bucket that
        ends up with zero rows is dropped from the manifest (its stale files
        become invisible crash-residue; a later write of the same bucket
        rewrites the partition wholesale via dynamic overwrite).

        This is the micro-batch-scale write: I/O is O(touched buckets), never
        O(table) — the untouched buckets' files are not read, not rewritten,
        and keep their manifest lineage row counts."""
        t0 = time.time()
        done_buckets = self.committed_buckets()
        bset = sorted({str(b) for b in buckets})
        before = self._bucket_files(bucket_col)
        self._write_dynamic(
            df.where(F.col(bucket_col).cast("string").isin(bset)), bucket_col
        )
        after = self._bucket_files(bucket_col)
        rows = {
            b: self._footer_rows(
                os.path.join(self.data_dir, f"{bucket_col}={b}"), after[b]
            )
            for b in bset
            if b in after and after[b] != before.get(b)
        }
        new_buckets = {b: n for b, n in done_buckets.items() if b not in bset}
        new_buckets.update(rows)
        parent = self.current()
        wall = time.time() - t0
        manifest = {
            "version": (parent["version"] + 1) if parent else 1,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "bucket_col": bucket_col,
            "bucket_type": df.schema[bucket_col].dataType.simpleString(),
            "buckets": new_buckets,
            "metrics": {
                "wall_sec": round(wall, 3),
                "rows_written": int(sum(rows.values())),
                "rows_per_sec": round(sum(rows.values()) / max(wall, 1e-9), 1),
                "buckets_written": len(rows),
            },
        }
        self._publish(manifest)
        return {"done": True, "written_buckets": len(rows), "snapshot": manifest}

    def _write_dynamic(self, batch: DataFrame, bucket_col: str) -> None:
        """Dynamic-partition-overwrite parquet write, clustered by bucket:
        each task feeds exactly one partition writer (no per-task sort
        fan-out, no #tasks × #buckets small files). Callers needing more
        writer parallelism per bucket pre-repartition on (bucket, salt)."""
        spark = batch.sparkSession
        old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            batch.repartition(F.col(bucket_col)).write.partitionBy(
                bucket_col
            ).mode("overwrite").parquet(self.data_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

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
