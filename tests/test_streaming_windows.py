"""Structured-Streaming event-time surface: watermarked windowed tile counts
and the applyInPandasWithState running cell-count operator (SURVEY §2.9
extensions beyond the reference's batch-only Query stream)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from geospatial_cuda_spark.streaming.windows import (
    EVENT_SCHEMA,
    stateful_cell_counts,
    tile_window_counts,
)


def _write_batch(src_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    tmp = os.path.join(src_dir, f".{name}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(src_dir, name))


def _events(ts_minute: int, eid: int, x: float, y: float) -> dict:
    return {
        "event_id": eid,
        "x": x,
        "y": y,
        "event_time": f"2026-01-01T00:{ts_minute:02d}:00Z",
    }


def test_tile_window_counts_stream_matches_batch(spark, tmp_path):
    """availableNow streaming run == the same aggregation on the batch read
    (the oracle), for in-watermark data."""
    src = str(tmp_path / "src")
    rows = [
        _events(1, 1, 100_000, 100_000),
        _events(2, 2, 100_100, 100_100),   # same tile, same 10-min window
        _events(12, 3, 100_000, 100_000),  # same tile, next window
        _events(3, 4, 900_000, 900_000),   # other tile
    ]
    _write_batch(src, "b0.json", rows)

    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    agg = tile_window_counts(stream, zoom=4, window="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["win"].start.minute, r["tile_x"], r["tile_y"], r["n_events"])
        for r in spark.sql("SELECT * FROM tile_counts").collect()
    )

    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    want = sorted(
        (r["win"].start.minute, r["tile_x"], r["tile_y"], r["n_events"])
        for r in tile_window_counts(batch, zoom=4, window="10 minutes").collect()
    )
    assert got == want
    assert len(got) == 3 and sum(g[-1] for g in got) == 4


def test_stateful_cell_counts_accumulate_across_batches(spark, tmp_path):
    """The applyInPandasWithState operator keeps per-cell running counts in
    the state store: counts accumulate across micro-batches AND across
    restarts (checkpoint restores state)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_available() -> dict[int, int]:
        stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
        counts = stateful_cell_counts(stream, depth=2)

        def sink(batch, batch_id):  # foreachBatch supports checkpoint recovery
            batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                out_dir
            )

        q = (
            counts.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # update stream: the row with the highest batch_id per key is current
        rows = (
            spark.read.parquet(out_dir)
            .orderBy("batch_id")
            .collect()
        )
        out: dict[int, int] = {}
        for r in rows:
            out[r["cell_id"]] = r["n_points"]
        return out

    # batch 0: 3 events in the BL quadrant area, 1 in TR
    _write_batch(
        src,
        "b0.json",
        [
            _events(1, 1, 10.0, 10.0),
            _events(1, 2, 20.0, 20.0),
            _events(1, 3, 30.0, 30.0),
            _events(1, 4, 900_000.0, 900_000.0),
        ],
    )
    got0 = run_available()
    assert sum(got0.values()) == 4 and len(got0) == 2

    # batch 1 (new file, same checkpoint): counts must ACCUMULATE
    _write_batch(src, "b1.json", [_events(2, 5, 11.0, 11.0), _events(2, 6, 12.0, 12.0)])
    got1 = run_available()
    bl_cell = min(got0)  # BL cell id < TR cell id at any depth
    assert got1[bl_cell] == got0[bl_cell] + 2


def test_windowed_append_drops_late_beyond_watermark(spark, tmp_path):
    """Watermark semantics pinned end-to-end: once the watermark passes a
    window, a late row targeting it is DROPPED — the finalized window emits
    exactly the in-watermark count, and state stays bounded."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run() -> None:
        stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
        agg = tile_window_counts(stream, zoom=4, window="10 minutes", watermark="30 minutes")

        def sink(batch, batch_id):
            batch.write.mode("append").parquet(out_dir)

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: two events in window [0, 10) — watermark still behind, no emit
    _write_batch(src, "b0.json", [_events(1, 1, 100_000, 100_000),
                                  _events(2, 2, 100_100, 100_100)])
    run()
    # run 2: minute-50 event advances the watermark to 20 after the batch
    _write_batch(src, "b1.json", [_events(50, 3, 100_000, 100_000)])
    run()
    # run 3: a LATE row for the now-finalized [0, 10) window (minute 3 <
    # watermark 20) must be dropped; window [0, 10) emits with count 2
    _write_batch(src, "b2.json", [_events(3, 99, 100_000, 100_000),
                                  _events(55, 4, 100_000, 100_000)])
    run()
    rows = spark.read.parquet(out_dir).collect()
    w0 = [r for r in rows if r["win"].start.minute == 0]
    assert len(w0) == 1, rows
    assert w0[0]["n_events"] == 2  # the late event_id=99 did NOT count
