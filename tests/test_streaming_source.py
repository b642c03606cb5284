"""`snapshot_changes` streaming source: initial load + version tailing,
starting_version=latest, exactly-once across a checkpoint restart, and the
refuse-never-approximate paths (overwrite mid-range, pending deltas at
initial load)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_cuda_spark.sources.snapshots import SnapshotTable
from geospatial_cuda_spark.streaming.source import register_snapshot_changes

_QN = 0


def _gen(spark, lo, hi, bucket_base=0, tag=None):
    df = spark.range(lo, hi).select(
        F.col("id").alias("pid"),
        (F.col("id") % 4 + bucket_base).cast("string").alias("bucket"),
        (F.col("id") * 3).alias("val"),
    )
    return df.withColumn("tag", F.lit(tag)) if tag is not None else df


def _start(spark, root, name, **opts):
    register_snapshot_changes(spark)
    rd = spark.readStream.format("snapshot_changes").option("path", root)
    for k, v in opts.items():
        rd = rd.option(k, v)
    return (
        rd.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", root + f"_ck_{name}")
        .start()
    )


def _fresh(prefix):
    global _QN
    _QN += 1
    return f"{prefix}{_QN}"


def test_initial_load_then_tail(spark, tmp_path):
    root = str(tmp_path / "t")
    snap = SnapshotTable(root)
    snap.commit(_gen(spark, 0, 100), "bucket")
    name = _fresh("tail")
    q = _start(spark, root, name)
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 100
        snap.commit(_gen(spark, 100, 150, bucket_base=4), "bucket")
        q.processAllAvailable()
        got = spark.table(name)
        assert got.count() == 150
        # value integrity across both batches
        assert got.agg(F.sum("val")).collect()[0][0] == sum(i * 3 for i in range(150))
        # no duplicates
        assert got.select("pid").distinct().count() == 150
    finally:
        q.stop()


def test_starting_version_latest_skips_history(spark, tmp_path):
    root = str(tmp_path / "t")
    snap = SnapshotTable(root)
    snap.commit(_gen(spark, 0, 100), "bucket")
    name = _fresh("latest")
    q = _start(spark, root, name, starting_version="latest")
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 0
        snap.commit(_gen(spark, 100, 120, bucket_base=4), "bucket")
        q.processAllAvailable()
        assert spark.table(name).count() == 20
    finally:
        q.stop()


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Offsets resume from the checkpoint across a stream restart: rows
    committed while the stream was DOWN arrive exactly once (a durable
    parquet sink — the memory sink cannot recover from a checkpoint)."""
    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    snap = SnapshotTable(root)
    snap.commit(_gen(spark, 0, 50), "bucket")
    register_snapshot_changes(spark)

    def run():
        return (
            spark.readStream.format("snapshot_changes")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )

    q = run()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # table grows while the stream is DOWN
    snap.commit(_gen(spark, 50, 80, bucket_base=4), "bucket")
    q2 = run()
    try:
        q2.processAllAvailable()
        got = spark.read.parquet(out)
        assert got.count() == 80
        assert got.select("pid").distinct().count() == 80  # no replay
        assert got.agg(F.sum("val")).collect()[0][0] == sum(i * 3 for i in range(80))
    finally:
        q2.stop()


def test_overwrite_mid_stream_refuses(spark, tmp_path):
    root = str(tmp_path / "t")
    snap = SnapshotTable(root)
    snap.commit(_gen(spark, 0, 40), "bucket")
    name = _fresh("ow")
    q = _start(spark, root, name)
    try:
        q.processAllAvailable()
        snap.overwrite_buckets(
            _gen(spark, 0, 10).where(F.col("bucket") == "1"), "bucket", ["1"]
        )
        with pytest.raises(Exception, match="not an append-only step"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_pending_deltas_refuse_initial_load(spark, tmp_path):
    root = str(tmp_path / "t")
    snap = SnapshotTable(root)
    snap.commit(_gen(spark, 0, 40), "bucket")
    d = spark.createDataFrame(
        [(1000, "0", 5, "i")], "pid long, bucket string, val long, _op string"
    )
    snap.append_deltas(d, "bucket", ["0"], key_cols=["pid"])
    name = _fresh("mor")
    q = _start(spark, root, name)
    try:
        with pytest.raises(Exception, match="pending merge-on-read deltas"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_evolved_table_null_fills_old_files_on_fresh_stream(spark, tmp_path):
    root = str(tmp_path / "t")
    snap = SnapshotTable(root)
    snap.commit(_gen(spark, 0, 40), "bucket")
    snap.commit(_gen(spark, 40, 60, bucket_base=4, tag="x"), "bucket")
    name = _fresh("evo")
    q = _start(spark, root, name)
    try:
        q.processAllAvailable()
        got = spark.table(name)
        assert set(got.columns) == {"pid", "bucket", "val", "tag"}
        assert got.where(F.col("tag").isNull()).count() == 40
        assert got.where(F.col("tag") == "x").count() == 20
    finally:
        q.stop()


def test_source_composes_with_watermarked_window_agg(spark, tmp_path):
    """End-to-end §2.9 composition: snapshot_changes SOURCE → watermarked
    tumbling-window tile counts → sink. The windowed aggregate over the
    stream (initial load + a live tail commit) must equal the same
    aggregation run in batch over the final table — the source is a real
    streaming relation, not just a row feed (state store, watermark and
    append-mode window emission all engage)."""
    from geospatial_cuda_spark.sources.snapshots import SnapshotTable
    from geospatial_cuda_spark.streaming.windows import tile_window_counts

    root = str(tmp_path / "t")
    snap = SnapshotTable(root)

    def events(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            (F.col("id") * 7919 % 1_000_000).cast("double").alias("x"),
            (F.col("id") * 104729 % 1_000_000).cast("double").alias("y"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60).alias("event_time"),
            (F.col("id") % 4).cast("string").alias("bucket"),
        )

    snap.commit(events(0, 200), "bucket")
    register_snapshot_changes(spark)
    name = _fresh("win")
    stream = (
        spark.readStream.format("snapshot_changes").option("path", root).load()
    )
    agg = tile_window_counts(stream, zoom=3, window="10 minutes", watermark="20 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", root + f"_ck_{name}")
        .start()
    )
    try:
        q.processAllAvailable()
        snap.commit(events(200, 400), "bucket")  # tail while live
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name)
    # batch twin over the final table; append mode only emits windows the
    # watermark has CLOSED, so compare on that subset
    batch = tile_window_counts(snap.read(spark), zoom=3).withColumnRenamed(
        "n_events", "n_batch"
    )
    max_t = snap.read(spark).agg(F.max("event_time")).collect()[0][0]
    import datetime

    cutoff = F.lit(max_t - datetime.timedelta(minutes=20))
    closed = got.where(F.col("win.end") <= cutoff)
    batch_closed = batch.where(F.col("win.end") <= cutoff)
    j = closed.join(batch_closed, on=["win", "tile_x", "tile_y"], how="full")
    bad = j.where(
        F.col("n_events").isNull()  # batch has a closed window the stream missed
        | F.col("n_batch").isNull()  # stream emitted a window batch does not have
        | (F.col("n_events") != F.col("n_batch"))
    )
    assert closed.count() > 0, "no windows closed — fixture too short"
    assert bad.count() == 0


def test_vanished_file_raises_actionable_error(spark, tmp_path):
    """A data file deleted between batch planning and read (vacuum racing a
    lagging stream, or external tampering) must fail with an error naming
    the cause and the fix, not a bare executor IOError."""
    import os

    root = str(tmp_path / "t")
    snap = SnapshotTable(root)
    snap.commit(_gen(spark, 0, 40), "bucket")
    name = _fresh("gone")
    q = _start(spark, root, name)
    try:
        q.processAllAvailable()
        snap.commit(_gen(spark, 40, 80, bucket_base=4), "bucket")
        # simulate the race: one of the v2 increment's files vanishes
        _, added = snap.added_files(1, 2)
        b, f = added[0]
        os.remove(os.path.join(root, "data", f"bucket={b}", f))
        with pytest.raises(Exception, match="vacuumed past this stream's offset"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_stream_dedup_emits_first_arrival_once(spark, tmp_path):
    """dedup_stream over the snapshot_changes source: duplicate keys inside
    one microbatch AND across later commits (within the watermark horizon)
    are emitted exactly once; distinct keys all survive; restart from the
    checkpoint does not re-emit."""
    from geospatial_cuda_spark.sources.snapshots import SnapshotTable
    from geospatial_cuda_spark.streaming.dedup import dedup_stream

    root = str(tmp_path / "t")
    snap = SnapshotTable(root)

    def batch(keys, gen):
        return (
            spark.createDataFrame([(int(k),) for k in keys], "dkey long")
            .select(
                "dkey",
                (F.col("dkey") * 7).alias("pay"),
                (F.lit(1_700_000_000) + F.col("dkey")).alias("ts_sec"),
                F.lit(str(gen)).alias("bucket"),
            )
        )

    snap.commit(batch([1, 2, 2, 3, 3, 3], 0), "bucket")  # in-batch dups
    register_snapshot_changes(spark)
    name = _fresh("sd")
    out = str(tmp_path / "out")
    ck = root + f"_ck_{name}"

    def start():
        stream = (
            spark.readStream.format("snapshot_changes").option("path", root).load()
            .withColumn("event_time", F.timestamp_seconds(F.col("ts_sec")))
        )
        return (
            dedup_stream(stream, ["dkey"], watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
        snap.commit(batch([2, 3, 4], 1), "bucket")  # cross-batch dups + a new key
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert sorted(r["dkey"] for r in got.collect()) == [1, 2, 3, 4]
    # restart on the same checkpoint: a replayed/new commit with only dup
    # keys must add nothing
    snap.commit(batch([1, 4], 2), "bucket")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r["dkey"] for r in spark.read.parquet(out).collect()) == [1, 2, 3, 4]


def test_stream_dedup_documents_fingerprint_matches_batch_identity(spark, tmp_path):
    """dedup_documents_stream keys on the SAME normalized fingerprint as
    batch exact_dedup: whitespace/case variants of one text are one
    duplicate group in the stream too."""
    from geospatial_cuda_spark.operators.dedup import exact_dedup_groups
    from geospatial_cuda_spark.sources.snapshots import SnapshotTable
    from geospatial_cuda_spark.streaming.dedup import dedup_documents_stream

    rows = [
        (0, "the quick brown fox"),
        (1, "  THE  quick   brown FOX "),  # normalized-equal to 0
        (2, "a different document"),
        (3, "the quick brown fox"),        # exact dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text",
        (F.lit(1_700_000_000) + F.col("doc_id")).alias("ts_sec"),
        (F.col("doc_id") % 2).cast("string").alias("bucket"),
    )
    root = str(tmp_path / "t")
    SnapshotTable(root).commit(docs, "bucket")
    register_snapshot_changes(spark)
    name = _fresh("fp")
    stream = (
        spark.readStream.format("snapshot_changes").option("path", root).load()
        .withColumn("event_time", F.timestamp_seconds(F.col("ts_sec")))
    )
    q = (
        dedup_documents_stream(stream, watermark="1 hour")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", root + f"_ck_{name}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name)
    assert got.count() == 2  # one per identity group
    n_batch_groups = exact_dedup_groups(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).count()
    assert got.select("fingerprint").distinct().count() == n_batch_groups == 2


def test_int_bucket_column_streams(spark, tmp_path):
    """Non-string bucket column through the stream (ADVICE r5): the
    partition value arrives as a directory-name STRING and must be cast
    into the schema's type when injected — pa.scalar('5', type=int64)
    raised ArrowInvalid and crashed every microbatch. The batch reader
    already cast back via the manifest's bucket_type; this pins the
    streaming twin, including values and type through a tailed commit."""
    root = str(tmp_path / "tint")
    snap = SnapshotTable(root)

    def gen(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("pid"),
            (F.col("id") % 4).cast("int").alias("bucket"),  # INT bucket
            (F.col("id") * 3).alias("val"),
        )

    snap.commit(gen(0, 100), "bucket")
    name = _fresh("intb")
    q = _start(spark, root, name)
    try:
        q.processAllAvailable()
        got = spark.table(name)
        assert dict(got.dtypes)["bucket"] == "int"
        assert got.count() == 100
        snap.commit(
            gen(100, 150).withColumn("bucket", F.col("bucket") + 4), "bucket"
        )
        q.processAllAvailable()
        got = spark.table(name)
        assert got.count() == 150
        # bucket values round-tripped through the directory-name string
        assert (
            got.agg(F.sum("bucket")).collect()[0][0]
            == sum(i % 4 for i in range(100)) + sum(i % 4 + 4 for i in range(100, 150))
        )
    finally:
        q.stop()
