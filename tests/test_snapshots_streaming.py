"""M7 surface: snapshot commit log (Iceberg-layout semantics) + streaming
upserts. Formalizes the reference's implicit durability story — the CUDA
engine rebuilds from the text file every run (cuda/inference.cu:24-49); our
engine's equivalent of "the index survives" is the committed snapshot +
checkpointed mutation stream, with kill/resume idempotence (SURVEY §7 M7).
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from geospatial_cuda_spark.sources.snapshots import SnapshotTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def bucketed_df(spark):
    return spark.range(0, 400).select(
        F.col("id").alias("pid"),
        (F.col("id") % 7).cast("string").alias("bucket"),
        (F.col("id") * 31 % 1000).alias("val"),
    )


def test_snapshot_commit_read_roundtrip(spark, bucketed_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    res = snap.commit(bucketed_df, "bucket")
    assert res["done"] is True
    assert res["snapshot"]["metrics"]["rows_written"] == 400
    got = snap.read(spark).select("pid", "bucket", "val")
    assert _rows(got) == _rows(bucketed_df)
    # lineage: every bucket recorded with its exact row count
    m = snap.current()
    assert sum(m["buckets"].values()) == 400
    assert m["parent_id"] is None


def test_snapshot_incremental_resume_and_noop(spark, bucketed_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    commits = 0
    while True:
        res = snap.commit(bucketed_df, "bucket", max_buckets_per_commit=2)
        commits += 1
        if res["done"]:
            break
    assert commits == 4  # ceil(7 buckets / 2)
    assert _rows(snap.read(spark).select("pid", "bucket", "val")) == _rows(bucketed_df)
    # snapshot chain: each commit's parent is the previous snapshot
    m = snap.current()
    assert m["version"] == 4
    assert m["parent_id"] is not None
    # re-run is a pure no-op: nothing written, same snapshot
    res = snap.commit(bucketed_df, "bucket")
    assert res["done"] is True and res["written_buckets"] == 0
    assert snap.current()["version"] == 4


def test_snapshot_partial_commit_reads_only_committed(spark, bucketed_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(bucketed_df, "bucket", max_buckets_per_commit=3)
    visible = snap.read(spark)
    buckets = {r["bucket"] for r in visible.select("bucket").distinct().collect()}
    assert len(buckets) == 3
    expected = _rows(bucketed_df.where(F.col("bucket").isin(*buckets)))
    assert _rows(visible.select("pid", "bucket", "val")) == expected


def test_snapshot_crash_residue_invisible_then_healed(spark, bucketed_df, tmp_path):
    """A bucket written to the data dir WITHOUT a manifest publish (crash
    between write and publish) is never visible; the resumed commit rewrites
    it via dynamic partition overwrite and only then exposes it."""
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(bucketed_df.where(F.col("bucket") < "4"), "bucket")
    committed_version = snap.current()["version"]

    # simulate crash residue: bucket 5 lands in the data dir, manifest not
    # published — and worse, it's a HALF write (one row missing)
    residue = bucketed_df.where(F.col("bucket") == "5").where(F.col("pid") != 5)
    residue.write.partitionBy("bucket").mode("append").parquet(snap.data_dir)

    assert "5" not in {
        r["bucket"] for r in snap.read(spark).select("bucket").distinct().collect()
    }

    # resume: commit the full df — bucket 5 must be rewritten completely
    res = snap.commit(bucketed_df, "bucket")
    assert res["done"] is True
    assert snap.current()["version"] == committed_version + 1
    got = snap.read(spark).select("pid", "bucket", "val")
    assert _rows(got) == _rows(bucketed_df)  # the half-written row is back


def test_snapshot_upsert_isolation_and_vacuum(spark, bucketed_df, tmp_path):
    """Upserts append + repoint the manifest: prior files stay on disk
    (snapshot isolation) but are invisible to readers; vacuum removes exactly
    the unreferenced ones and the table reads identically afterwards."""
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(bucketed_df, "bucket")
    survivors = bucketed_df.where((F.col("bucket") != "3") | (F.col("pid") % 2 == 0))
    snap.overwrite_buckets(survivors.where(F.col("bucket") == "3"), "bucket", ["3"])
    expected = _rows(survivors.select("pid", "bucket", "val"))
    assert _rows(snap.read(spark).select("pid", "bucket", "val")) == expected
    # old bucket-3 files still on disk (isolation), hence vacuum finds them
    removed = snap.vacuum()
    assert removed >= 1
    assert _rows(snap.read(spark).select("pid", "bucket", "val")) == expected
    assert snap.vacuum() == 0  # idempotent


def test_snapshot_manifest_files_are_json_and_atomic(spark, bucketed_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(bucketed_df, "bucket", max_buckets_per_commit=4)
    snap.commit(bucketed_df, "bucket")
    names = sorted(os.path.basename(p) for p in glob.glob(f"{snap.manifest_dir}/v*.json"))
    assert names == ["v1.json", "v2.json"]
    for p in glob.glob(f"{snap.manifest_dir}/v*.json"):
        with open(p) as f:
            m = json.load(f)
        assert {"version", "snapshot_id", "parent_id", "buckets", "metrics"} <= set(m)
    assert not glob.glob(f"{snap.manifest_dir}/.tmp-*")  # temp files all renamed


# ---------------------------------------------------------------------------
# streaming upserts (M1/M2 as a checkpointed micro-batch stream)
# ---------------------------------------------------------------------------


def _write_batch(src_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    tmp = os.path.join(src_dir, f".{name}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(src_dir, name))


def test_streaming_upserts_apply_and_resume(spark, tmp_path):
    from geospatial_cuda_spark.streaming.upserts import PointTableStream

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    stream = PointTableStream(spark, state, max_depth=6)

    _write_batch(
        src,
        "b0.json",
        [
            {"qtype": "i", "pid": 1, "x": 10.0, "y": 10.0},
            {"qtype": "i", "pid": 2, "x": 20.0, "y": 20.0},
            {"qtype": "i", "pid": 3, "x": 30.0, "y": 30.0},
        ],
    )
    stream.start(src).awaitTermination()
    pts = stream.read_points()
    assert _rows(pts.select("pid")) == [(1,), (2,), (3,)]

    # second batch: delete one, insert one new, re-insert an existing (x,y)
    # (insert-if-missing: the duplicate must NOT appear — inference.cu:146-150)
    _write_batch(
        src,
        "b1.json",
        [
            {"qtype": "d", "pid": 0, "x": 20.0, "y": 20.0},
            {"qtype": "i", "pid": 4, "x": 40.0, "y": 40.0},
            {"qtype": "i", "pid": 5, "x": 10.0, "y": 10.0},
        ],
    )
    stream.start(src).awaitTermination()
    pts = stream.read_points()
    assert _rows(pts.select("pid")) == [(1,), (3,), (4,)]

    # restart with no new data: checkpoint makes it a no-op (exactly-once)
    stream.start(src).awaitTermination()
    pts = stream.read_points()
    assert _rows(pts.select("pid")) == [(1,), (3,), (4,)]

    # the maintained index reflects the mutated point set
    cells = stream.cells()
    root = cells.where(F.col("depth") == 0).collect()[0]
    assert root["count"] == 3


def _bucket_state(data_dir: str) -> dict[str, dict[str, float]]:
    """{partition dir: {file: mtime}} for every bucket partition on disk."""
    out = {}
    for d in os.listdir(data_dir):
        p = os.path.join(data_dir, d)
        if d.startswith("_bucket=") and os.path.isdir(p):
            out[d] = {f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)}
    return out


def test_streaming_upserts_touch_only_mutated_buckets(spark, tmp_path):
    """Scale invariant: a micro-batch's I/O is O(touched buckets). Points in
    a far-away quadkey bucket must keep byte-identical files (same names,
    same mtimes) across a batch that doesn't mutate their bucket."""
    from geospatial_cuda_spark.streaming.upserts import PointTableStream

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    stream = PointTableStream(spark, state, max_depth=6)

    # batch 0: two distant regions → two distinct depth-3 buckets
    _write_batch(
        src,
        "b0.json",
        [
            {"qtype": "i", "pid": 1, "x": 10.0, "y": 10.0},
            {"qtype": "i", "pid": 2, "x": 900000.0, "y": 900000.0},
        ],
    )
    stream.start(src).awaitTermination()
    before = _bucket_state(stream.table.data_dir)
    assert len(before) == 2
    v1 = stream.table.current()["version"]

    # batch 1: mutate ONLY the low-corner region
    _write_batch(
        src,
        "b1.json",
        [
            {"qtype": "i", "pid": 3, "x": 11.0, "y": 11.0},
            {"qtype": "d", "pid": 0, "x": 10.0, "y": 10.0},
        ],
    )
    stream.start(src).awaitTermination()
    after = _bucket_state(stream.table.data_dir)

    touched = [d for d in before if before[d] != after.get(d)]
    untouched = [d for d in before if before[d] == after.get(d)]
    assert len(touched) == 1 and len(untouched) == 1  # far bucket untouched
    assert stream.table.current()["version"] == v1 + 1
    assert _rows(stream.read_points().select("pid")) == [(2,), (3,)]
    # lineage counts reflect the per-bucket reality
    assert sorted(stream.table.current()["buckets"].values()) == [1, 1]
