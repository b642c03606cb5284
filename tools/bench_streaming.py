#!/usr/bin/env python
"""Streaming upsert write-amplification benchmark: merge-on-read vs
copy-on-write.

    python tools/bench_streaming.py [--rows 200000] [--batches 20] [--batch-size 100]

Builds a snapshot table whose hot bucket holds ``--rows`` points, then
applies ``--batches`` micro-batches of ``--batch-size`` mutations
(insert-if-missing + delete-by-value, all hitting the hot bucket) through
both write paths:

- MOR  — ``SnapshotTable.append_deltas`` (the PointTableStream path):
  per-batch bytes ∝ batch size; readers fold deltas; compaction amortized.
- CoW  — read-back + ``overwrite_buckets`` (the round-2 path): every batch
  rewrites the whole hot bucket.

Prints ONE JSON line and writes BENCH/STREAMING.md with per-batch wall,
bytes written per batch, and the end-state equivalence check (both paths
must converge to the identical point set)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--compact-threshold", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geospatial_cuda_spark.operators import mutations as M
    from geospatial_cuda_spark.session import get_spark
    from geospatial_cuda_spark.sources.snapshots import SnapshotTable

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("bench-streaming", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    root = "/tmp/geospark_bench/streaming"
    shutil.rmtree(root, ignore_errors=True)

    # base table: all rows in ONE hot bucket (the adversarial case for CoW)
    base = spark.range(args.rows).select(
        F.col("id").alias("pid"),
        (F.col("id") % 1000).cast("double").alias("x"),
        (F.col("id") / 1000).cast("double").alias("y"),
        F.lit("hot").alias("bucket"),
    )

    def mutation_batch(i: int):
        # one insert (new key) + deletes of existing keys per batch
        ins = [(10_000_000 + i * args.batch_size + j,
                float(2000 + i), float(3000 + i * args.batch_size + j), "hot", "i")
               for j in range(args.batch_size // 2)]
        dels = [(0, float((i * args.batch_size + j) % 1000),
                 float((i * args.batch_size + j) // 1000), "hot", "d")
                for j in range(args.batch_size - len(ins))]
        return spark.createDataFrame(
            ins + dels, "pid long, x double, y double, bucket string, _op string"
        )

    results = {}
    for mode in ("mor", "cow"):
        path = os.path.join(root, mode)
        snap = SnapshotTable(path)
        snap.commit(base, "bucket")
        base_bytes = dir_bytes(path)
        walls, batch_bytes = [], []
        for i in range(args.batches):
            b = mutation_batch(i)
            before = dir_bytes(path)
            t0 = time.time()
            if mode == "mor":
                snap.append_deltas(
                    b, "bucket", ["hot"], key_cols=["x", "y"],
                    compact_threshold=args.compact_threshold,
                )
            else:
                cur = snap.read(spark).select("pid", "x", "y", "bucket")
                ins = b.where(F.col("_op") == "i").select("pid", "x", "y", "bucket")
                dels = b.where(F.col("_op") == "d").select("x", "y")
                updated = M.delete_points(M.insert_points(cur, ins), dels)
                snap.overwrite_buckets(updated, "bucket", ["hot"])
            walls.append(time.time() - t0)
            batch_bytes.append(dir_bytes(path) - before)
        n_final = snap.read(spark).count()
        state_hash = (
            snap.read(spark)
            .agg(F.sum(F.hash("pid", "x", "y").cast("long")).alias("h"))
            .first()["h"]
        )
        results[mode] = {
            "base_bytes": base_bytes,
            "mean_batch_sec": round(sum(walls) / len(walls), 3),
            "mean_batch_bytes": int(sum(batch_bytes) / len(batch_bytes)),
            "max_batch_bytes": max(batch_bytes),
            "rows_final": n_final,
            "state_hash": int(state_hash),
        }

    assert results["mor"]["rows_final"] == results["cow"]["rows_final"]
    assert results["mor"]["state_hash"] == results["cow"]["state_hash"], (
        "merge-on-read and copy-on-write diverged"
    )
    amp = results["cow"]["mean_batch_bytes"] / max(results["mor"]["mean_batch_bytes"], 1)
    speed = results["cow"]["mean_batch_sec"] / max(results["mor"]["mean_batch_sec"], 1e-9)
    out = {
        "rows": args.rows,
        "batches": args.batches,
        "batch_size": args.batch_size,
        "mor": results["mor"],
        "cow": results["cow"],
        "write_amplification_cow_over_mor": round(amp, 1),
        "batch_speedup_mor_over_cow": round(speed, 2),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/STREAMING.md", "w") as f:
        f.write(f"""# BENCH/STREAMING — upsert write amplification (MOR vs CoW)

{args.batches} micro-batches of {args.batch_size} mutations
(insert-if-missing + delete-by-value) against a {args.rows:,}-row hot
bucket, identical inputs per path; end states verified identical
(row count + content hash).

| path | mean batch sec | mean bytes/batch | max bytes/batch |
|---|---|---|---|
| merge-on-read (`append_deltas`, compaction every {args.compact_threshold}) | {results['mor']['mean_batch_sec']} | {results['mor']['mean_batch_bytes']:,} | {results['mor']['max_batch_bytes']:,} |
| copy-on-write (read-back + `overwrite_buckets`, the round-2 path) | {results['cow']['mean_batch_sec']} | {results['cow']['mean_batch_bytes']:,} | {results['cow']['max_batch_bytes']:,} |

**Write amplification CoW/MOR: {amp:.1f}×** on bytes;
**{speed:.2f}×** on per-batch wall. The MOR mean includes its periodic
compaction batches (that is the amortized cost the design pays for bounded
read fan-in); CoW's per-batch bytes are ∝ BUCKET size and grow with the
table, MOR's are ∝ batch size and do not — at cluster scale (hot bucket ≫
memory) CoW's rewrite becomes the stream's wall, which is why the
PointTableStream default is merge-on-read.
""")
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
