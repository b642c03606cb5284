#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "queries": {...}, "sf": ...}

The headline metric is the north-rule one: end-to-end spatial-join +
tile-assignment throughput over the image+caption table (images/sec),
including the snapshot (checkpoint) commit. Per-query wall-clock seconds for
the other operators are reported under "queries".

--scaling mode: run the identical image pipeline at local[8] and local[32]
(same input, shuffle partitions scaled proportionally) in fresh subprocesses
and write BENCH/BASELINE.md with both throughputs and the N→4N scaling
efficiency (sandbox evidence protocol per BASELINE.md — no real cluster).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_ROOT = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/geospark_bench")

N_IMAGES = {
    "sf0.001": 2_000,
    "sf0.01": 20_000,
    "sf0.1": 200_000,
}


def sf_name() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


def get_session():
    from geospatial_cuda_spark.session import get_spark

    spark = get_spark(
        "bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_images(spark, n: int) -> str:
    """Synthesize the image+caption input table once per scale (not timed as
    engine work — it stands in for the pre-existing Iceberg table)."""
    path = os.path.join(CACHE_ROOT, f"images_{sf_name()}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from geospatial_cuda_spark.datagen import images_table

        images_table(spark, n, num_partitions=max(CPUS * 2, 16)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_images_pipeline(spark, images_path: str, out_dir: str) -> dict:
    """The flagship north-rule pipeline: scan → geotag → cell-encode →
    quadtree → quadrant-search join → tile slice → snapshot commit."""
    from pyspark.sql import functions as F

    from geospatial_cuda_spark.datagen import with_geotag
    from geospatial_cuda_spark.operators import quadtree as QT, search as S, tiles as T
    from geospatial_cuda_spark.sources.snapshots import SnapshotTable

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    images = with_geotag(spark.read.parquet(images_path))
    n_images = images.count()

    # index build over the image geotags
    cells = QT.build_cells(images, max_depth=12).persist()
    cells.count()

    # containing-quadrant join for a deterministic query sample
    queries = images.where(F.col("phash") % 97 == 0).select(
        F.col("phash").alias("qid"), "x", "y"
    )
    found = S.quadrant_search_prefix(queries, cells, max_depth=12)
    n_located = found.where(F.col(S.RESULT_COL) >= 0).count()

    # raster→vector tile slicing + checkpointed snapshot commit
    slices = T.slice_tiles(images, zoom=8).withColumn(
        "bucket", F.pmod(F.col("tile_x"), F.lit(32))
    )
    snap = SnapshotTable(out_dir)
    result = snap.commit(slices, "bucket")
    wall = time.time() - t0
    rows = result["snapshot"]["metrics"]["rows_written"]
    return {
        "n_images": n_images,
        "n_located": n_located,
        "slice_rows": rows,
        "wall_sec": round(wall, 3),
        "images_per_sec": round(n_images / wall, 1),
    }


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as E

    names = [
        "quadtree_cells",
        "quadrant_search",
        "quadrant_search_broadcast",
        "knn",
        "knn_cells",
        "tile_assign",
        "pip_rects",
        "pip_convex",
        "exact_dedup",
        "minhash_buckets",
        "simhash",
        "ann_topk",
        "ann_ivf",
        "token_counts",
        "quality_scores",
    ]
    qs = E.queries()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def main_single() -> None:
    spark = get_session()
    images_path = ensure_images(spark, N_IMAGES.get(sf_name(), 20_000))
    pipe = run_images_pipeline(
        spark, images_path, os.path.join(CACHE_ROOT, f"out_{sf_name()}_{CPUS}")
    )
    queries = run_queries(spark)
    queries["images_pipeline"] = pipe["wall_sec"]
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment throughput (images/sec)",
                "value": pipe["images_per_sec"],
                "unit": "images/sec",
                "queries": queries,
                "sf": sf_name(),
                "detail": {
                    "cpus": CPUS,
                    "n_images": pipe["n_images"],
                    "slice_rows": pipe["slice_rows"],
                    "n_located": pipe["n_located"],
                },
            }
        )
    )
    spark.stop()


def main_scaling() -> None:
    """N vs 4N evidence: identical job at local[8] and local[32]."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, __file__, "--pipeline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["value"], results[32]["value"]
    eff = t32 / (4 * t8)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling evidence (sandbox protocol)

No real cluster is available; per BASELINE.md the two-cluster-size criterion
is evidenced by the identical spark-submit job at two parallelism levels on
the same input ({sf_name()}, {results[32]['detail']['n_images']} images,
deterministic seed).

Pipeline measured end-to-end (scan -> geotag -> cell-encode -> adaptive
quadtree -> quadrant-search join -> tile slicing -> snapshot commit with
per-partition lineage).

| config | images/sec | wall sec |
|---|---|---|
| local[8]  (N)  | {t8} | {results[8]['queries']['images_pipeline']} |
| local[32] (4N) | {t32} | {results[32]['queries']['images_pipeline']} |

**Scaling efficiency T(4N)/(4*T(N)) = {eff:.3f}** (target >= 0.8).
"""
        )
    print(json.dumps({"local8": t8, "local32": t32, "efficiency": round(eff, 3)}))


def main_pipeline_only() -> None:
    spark = get_session()
    images_path = ensure_images(spark, N_IMAGES.get(sf_name(), 20_000))
    pipe = run_images_pipeline(
        spark, images_path, os.path.join(CACHE_ROOT, f"out_{sf_name()}_{CPUS}")
    )
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment throughput (images/sec)",
                "value": pipe["images_per_sec"],
                "unit": "images/sec",
                "queries": {"images_pipeline": pipe["wall_sec"]},
                "sf": sf_name(),
                "detail": {"cpus": CPUS, "n_images": pipe["n_images"],
                           "slice_rows": pipe["slice_rows"],
                           "n_located": pipe["n_located"]},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--pipeline-only" in sys.argv:
        main_pipeline_only()
    else:
        main_single()
