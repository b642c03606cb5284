"""SparkSession factory with scale-oriented defaults.

The configs below are the knobs SURVEY.md §4 calls out as "configure, not
write": AQE (runtime re-plan, skew-join splitting, partition coalescing),
Arrow execution for the pandas-UDF kernel layer, and shuffle-partition
sizing. On a real cluster the same factory is used by the spark-submit
entrypoint; here it defaults to local[*].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geospatial_cuda_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
        shuffle_partitions = max(cpus, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: partition coalescing, skew-join splitting —
        # the engine's answer to the reference's adaptive splitting + manual
        # occupancy tuning (SURVEY §4).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for the pandas-UDF kernel layer. Batch size is a
        # BYTE budget expressed in rows: image rows here carry ~1-2 KB
        # payloads, so 16384 rows ≈ 20-30 MB per in-flight batch per worker —
        # large enough that the per-batch Python sync cost is amortized
        # (measured: at 32 oversubscribed workers, 4096-row batches more
        # than DOUBLED the tile-slice stage wall vs 16384 — each batch
        # boundary is a JVM↔Python roundtrip that context-switches the
        # worker), small enough to bound executor memory. Tables with ~MB
        # payloads should scale this down via SPARK_GRAFT_ARROW_BATCH.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "16384"),
        )
        # The generated-class cache (STATIC conf — set before the session
        # exists) defaults to 100 entries; a session serving the full
        # contract surface (~50 query shapes, several codegen'd methods
        # each) cycles past that, so hot queries pay a fresh ~0.1-1.5 s
        # Janino compile on every re-plan. Measured ~10% off simhash /
        # embedding_neardup_lsh walls under the 20-query bench interleave.
        # 1024 entries ≈ tens of MB of class metadata — cheap insurance for
        # a long-lived serving session.
        .config("spark.sql.codegen.cache.maxEntries", "1024")
        # Whole-stage codegen can emit single filter/project methods past
        # HotSpot's DontCompileHugeMethods threshold (8000 bytecode bytes);
        # the JVM then refuses to JIT them and the hot loop runs in the
        # bytecode INTERPRETER — measured 0.8 s → 18 s on a 6-edge ray-cast
        # filter the moment the method crossed the limit (a cliff, not a
        # slope). Let the JIT compile huge generated methods; Spark keeps
        # its own 64 KB fallback (spark.sql.codegen.hugeMethodLimit) for
        # genuinely pathological plans.
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        # Keep timestamps deterministic.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Task-side output commit (v2): renames happen in parallel at task
        # commit, not in a serial driver loop at job commit — safe here
        # because snapshot visibility comes from the manifest file set, and
        # v2 is the standard choice for object-store-style committers.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
