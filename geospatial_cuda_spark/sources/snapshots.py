"""Iceberg-style snapshot commits with per-partition lineage + resume.

No Iceberg jars ship in this container, so this module implements the
Iceberg SEMANTICS on plain parquet (documented swap-in for a real catalog):
an append-only data directory partitioned by a bucket column, plus an atomic
JSON commit log under ``_manifest/`` recording, per snapshot: snapshot id,
parent id, committed buckets with row counts (lineage), the EXACT data-file
set per bucket (file-level manifests — the Iceberg read model), and
wall-clock/row throughput metrics.

Guarantees:
- ``commit`` writes ONLY buckets not yet committed (idempotent resume: a
  re-run after a crash appends the bucket's rows as fresh files and the new
  manifest references only those — readers never see uncommitted files
  because ``read`` loads exactly the manifest's file set);
- writes are append-only: no overwrite mode, no driver-side staging-rename
  loop; upserts repoint the touched buckets' file lists and leave prior
  snapshots' files on disk (snapshot isolation; ``vacuum`` collects);
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
        metadata a catalog manifest records at write time). Footer opens are
        I/O-latency-bound, so they run on a small thread pool — serially this
        is driver time that no executor count can parallelize."""
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        paths = [os.path.join(bdir, f) for f in files]
        if len(paths) <= 2:
            return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
        with ThreadPoolExecutor(min(16, len(paths))) as ex:
            return sum(ex.map(lambda p: pq.ParquetFile(p).metadata.num_rows, paths))

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
        filter comes from the manifest (no scan), the partitioned APPEND is
        the only job that computes the upstream plan, and the per-bucket
        lineage row counts come from the freshly written parquet footers
        (metadata-only). Writes never overwrite or move committed data: files
        land in place (task-side commit), the manifest records each bucket's
        exact file set, and readers see only manifest files — so there is no
        driver-side staging-rename loop in the commit path at all (that loop
        is serial time proportional to file count, the Amdahl term the
        N→4N scaling bench flagged in the dynamic-overwrite design)."""
        spark = df.sparkSession
        t0 = time.time()
        parent = self.current()
        done_buckets = dict(parent["buckets"]) if parent else {}
        done_files = dict(parent.get("files", {})) if parent else {}
        bstr = F.col(bucket_col).cast("string")

        before = self._bucket_files(bucket_col)
        if max_buckets_per_commit is None:
            batch = df
            if done_buckets:
                batch = df.where(~bstr.isin(sorted(done_buckets)))
            self._write_append(batch, bucket_col)
            after = self._bucket_files(bucket_col)
            # This job's output = new file names per bucket (writer names are
            # job-unique, so append never aliases existing files). Crash
            # residue from older uncommitted attempts is in `before`, hence
            # excluded — unreferenced by any manifest, it stays invisible.
            new_files = {
                b: sorted(files - before.get(b, set()))
                for b, files in after.items()
                if b not in done_buckets and files - before.get(b, set())
            }
            rows = {
                b: self._footer_rows(
                    os.path.join(self.data_dir, f"{bucket_col}={b}"), set(fs)
                )
                for b, fs in new_files.items()
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
                self._write_append(df.where(bstr.isin(pending)), bucket_col)
                after = self._bucket_files(bucket_col)
                new_files = {
                    b: sorted(after.get(b, set()) - before.get(b, set()))
                    for b in pending
                }
                rows = {b: bucket_counts[b] for b in pending}
            finally:
                if we_persisted:
                    df.unpersist()
        wall = time.time() - t0
        manifest = {
            "version": (parent["version"] + 1) if parent else 1,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "bucket_col": bucket_col,
            "bucket_type": df.schema[bucket_col].dataType.simpleString(),
            "buckets": {**done_buckets, **rows},
            "files": {**done_files, **new_files},
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
        """Upsert path: logically replace EXACTLY the given buckets and
        publish one new snapshot. ``df`` must hold all surviving rows of
        those buckets (rows of other buckets are filtered out defensively).
        Physically this APPENDS the survivors as new files and repoints the
        manifest's file set for the touched buckets — the previous snapshot's
        files stay on disk untouched (snapshot isolation / time travel; see
        ``vacuum``). A listed bucket that ends up with zero surviving rows is
        dropped from the manifest.

        This is the micro-batch-scale write: I/O is O(touched buckets), never
        O(table) — the untouched buckets' files are not read, not rewritten,
        and keep their manifest lineage row counts AND file lists."""
        t0 = time.time()
        parent = self.current()
        done_buckets = dict(parent["buckets"]) if parent else {}
        done_files = dict(parent.get("files", {})) if parent else {}
        bset = sorted({str(b) for b in buckets})
        before = self._bucket_files(bucket_col)
        self._write_append(
            df.where(F.col(bucket_col).cast("string").isin(bset)), bucket_col
        )
        after = self._bucket_files(bucket_col)
        new_files = {
            b: sorted(after.get(b, set()) - before.get(b, set())) for b in bset
        }
        rows = {
            b: self._footer_rows(
                os.path.join(self.data_dir, f"{bucket_col}={b}"), set(fs)
            )
            for b, fs in new_files.items()
            if fs
        }
        new_buckets = {b: n for b, n in done_buckets.items() if b not in bset}
        new_buckets.update(rows)
        kept_files = {b: fs for b, fs in done_files.items() if b not in bset}
        kept_files.update({b: fs for b, fs in new_files.items() if fs})
        wall = time.time() - t0
        manifest = {
            "version": (parent["version"] + 1) if parent else 1,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "bucket_col": bucket_col,
            "bucket_type": df.schema[bucket_col].dataType.simpleString(),
            "buckets": new_buckets,
            "files": kept_files,
            "metrics": {
                "wall_sec": round(wall, 3),
                "rows_written": int(sum(rows.values())),
                "rows_per_sec": round(sum(rows.values()) / max(wall, 1e-9), 1),
                "buckets_written": len(rows),
            },
        }
        self._publish(manifest)
        return {"done": True, "written_buckets": len(rows), "snapshot": manifest}

    def vacuum(self) -> int:
        """Delete data files not referenced by the CURRENT manifest (expired
        snapshots' files and crash residue). Returns #files removed. The
        Iceberg analogue is expire_snapshots + remove_orphan_files."""
        m = self.current()
        if m is None:
            return 0
        bucket_col = m["bucket_col"]
        live = {
            (b, f) for b, fs in m.get("files", {}).items() for f in fs
        }
        removed = 0
        for b, files in self._bucket_files(bucket_col).items():
            for f in files:
                if (b, f) not in live:
                    os.remove(os.path.join(self.data_dir, f"{bucket_col}={b}", f))
                    removed += 1
        return removed

    def _write_append(self, batch: DataFrame, bucket_col: str) -> None:
        """Append-only partitioned parquet write, shuffled on
        (bucket, source-partition-id): salting the clustering key with the
        map-side partition id splits every bucket across the reduce tasks in
        ~#input-partition-sized units, so reducer LOAD is balanced — a plain
        repartition(bucket) hashes whole buckets into reducers (balls-into-
        bins: with K reducers over B buckets the fullest reducer carries
        ~2× the mean payload, and the write stage's wall is the straggler's).
        Each reduce task then holds a handful of buckets; the writer's
        partition-sort handles the per-task fan-out. Files per bucket =
        O(reducers), bounded by shuffle.partitions, never #map-tasks.
        Visibility comes from the manifest (readers load exactly the
        manifest's file set), so append needs no overwrite mode and no
        driver-side staging renames."""
        batch.repartition(
            F.col(bucket_col), F.spark_partition_id()
        ).write.partitionBy(bucket_col).mode("append").parquet(self.data_dir)

    # -- read path -----------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        """Committed data only: load EXACTLY the current manifest's file set
        (crash residue and expired snapshots' files in the data dir are never
        visible — file-level manifests, the Iceberg read model)."""
        m = self.current()
        if m is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        bucket_col = m["bucket_col"]
        paths = [
            os.path.join(self.data_dir, f"{bucket_col}={b}", f)
            for b, fs in m.get("files", {}).items()
            for f in fs
        ]
        if paths:
            df = spark.read.option("basePath", self.data_dir).parquet(*paths)
        else:
            # legacy manifest without file lists: bucket-level pruning
            df = spark.read.parquet(self.data_dir).where(
                F.col(bucket_col).cast("string").isin(sorted(m["buckets"]))
            )
        if "bucket_type" in m:
            # partition-dir values read back as inferred types; restore the
            # committed column type so read schema == written schema
            df = df.withColumn(bucket_col, F.col(bucket_col).cast(m["bucket_type"]))
        return df
