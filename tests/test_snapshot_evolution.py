"""Schema evolution on snapshot tables: union-by-name add-column (the
Iceberg model) — old files read back null for later columns, a write may
omit committed columns, a type change is refused, and time travel reads
each version under ITS schema. The explicit manifest schema is what makes
this deterministic: without it Spark samples one parquet footer and the
result depends on which file it picks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_cuda_spark.sources.snapshots import (
    SnapshotSchemaError,
    SnapshotTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def v1_df(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("pid"),
        (F.col("id") % 4).cast("string").alias("bucket"),
        (F.col("id") * 31 % 1000).alias("val"),
    )


@pytest.fixture()
def v2_df(spark):
    # disjoint buckets, one NEW column
    return spark.range(100, 200).select(
        F.col("id").alias("pid"),
        (F.col("id") % 4 + 4).cast("string").alias("bucket"),
        (F.col("id") * 31 % 1000).alias("val"),
        F.concat(F.lit("tag-"), F.col("id")).alias("tag"),
    )


def test_add_column_null_fills_old_files(spark, v1_df, v2_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(v1_df, "bucket")
    snap.commit(v2_df, "bucket")
    got = snap.read(spark)
    assert set(got.columns) == {"pid", "bucket", "val", "tag"}
    want = _rows(
        v1_df.withColumn("tag", F.lit(None).cast("string")).unionByName(v2_df)
    )
    assert _rows(got.select("pid", "bucket", "val", "tag")) == want
    # manifest records the evolved schema; committed fields keep position
    names = [f["name"] for f in snap.current()["schema"]]
    assert names == ["pid", "bucket", "val", "tag"]


def test_time_travel_reads_each_version_under_its_schema(spark, v1_df, v2_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(v1_df, "bucket")
    snap.commit(v2_df, "bucket")
    old = snap.read(spark, version=1)
    assert set(old.columns) == {"pid", "bucket", "val"}
    assert _rows(old.select("pid", "bucket", "val")) == _rows(v1_df)


def test_write_may_omit_committed_columns(spark, v1_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(v1_df, "bucket")
    narrower = spark.range(200, 250).select(
        F.col("id").alias("pid"), F.lit("9").alias("bucket")
    )
    snap.commit(narrower, "bucket")
    got = snap.read(spark).where(F.col("bucket") == "9")
    assert set(got.columns) == {"pid", "bucket", "val"}
    assert got.where(F.col("val").isNull()).count() == 50


def test_type_change_is_refused(spark, v1_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(v1_df, "bucket")
    retyped = spark.range(300, 310).select(
        F.col("id").alias("pid"),
        F.lit("8").alias("bucket"),
        F.col("id").cast("string").alias("val"),  # long -> string
    )
    with pytest.raises(SnapshotSchemaError, match="val"):
        snap.commit(retyped, "bucket")
    # the refused write published nothing
    assert snap.current()["version"] == 1


def test_read_changes_under_evolved_schema(spark, v1_df, v2_df, tmp_path):
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(v1_df, "bucket")
    snap.commit(v2_df, "bucket")
    inc = snap.read_changes(spark, 1)
    assert set(inc.columns) == {"pid", "bucket", "val", "tag"}
    assert _rows(inc.select("pid", "bucket", "val", "tag")) == _rows(v2_df)
    # union invariant still holds column-wise under the TO-schema
    v1_wide = snap.read(spark, version=1).withColumn(
        "tag", F.lit(None).cast("string")
    )
    assert _rows(v1_wide.unionByName(inc)) == _rows(
        snap.read(spark).select("pid", "bucket", "val", "tag")
    )


def test_merge_on_read_deltas_across_evolution(spark, v1_df, tmp_path):
    """Delta batches written BEFORE an evolution null-fill the later column;
    batches after it carry values — both merge under the table schema."""
    snap = SnapshotTable(str(tmp_path / "t"))
    snap.commit(v1_df, "bucket")
    # pre-evolution delta: delete pid 0, insert pid 1000 (no tag column)
    d1 = spark.createDataFrame(
        [(0, "0", 0, "d"), (1000, "0", 77, "i")],
        "pid long, bucket string, val long, _op string",
    )
    snap.append_deltas(d1, "bucket", ["0"], key_cols=["pid"])
    # evolving delta: insert pid 2000 WITH a tag
    d2 = spark.createDataFrame(
        [(2000, "1", 88, "x", "i")],
        "pid long, bucket string, val long, tag string, _op string",
    )
    snap.append_deltas(d2, "bucket", ["1"], key_cols=["pid"])
    got = snap.read(spark)
    assert set(got.columns) == {"pid", "bucket", "val", "tag"}
    pdf = got.toPandas().set_index("pid")
    assert 0 not in pdf.index and 1000 in pdf.index and 2000 in pdf.index
    assert pdf.loc[2000, "tag"] == "x"
    assert pdf.loc[1000, "tag"] is None or pdf.loc[1000, "tag"] != pdf.loc[1000, "tag"] or pdf.loc[1000, "tag"] is None  # null
    assert pdf["tag"].notna().sum() == 1  # only the evolved insert carries tag


def test_stats_pruning_safe_across_evolution(spark, v1_df, tmp_path):
    """A file predating the stat column has no stats for it — read_where
    must KEEP it (absent stats never prune) and let the row filter decide."""
    snap = SnapshotTable(str(tmp_path / "t"), stat_cols=["extra"])
    snap.commit(v1_df, "bucket")  # no 'extra' column at all
    widened = spark.range(500, 520).select(
        F.col("id").alias("pid"),
        F.lit("7").alias("bucket"),
        F.lit(0).cast("long").alias("val"),
        (F.col("id") * 2).alias("extra"),
    )
    snap.commit(widened, "bucket")
    got = snap.read_where(spark, {"extra": (1000, 1040)})
    # rows from v1 files have extra=null -> dropped by the row filter;
    # widened rows in range survive. Equality with plain read().where():
    want = snap.read(spark).where(F.col("extra").between(1000, 1040))
    assert _rows(got.select(*sorted(got.columns))) == _rows(
        want.select(*sorted(want.columns))
    )
    assert got.count() == 20


def test_rollback_restores_content_history_moves_forward(spark, v1_df, v2_df, tmp_path):
    """rollback publishes a NEW version with exactly the target's content:
    reads equal the target bit for bit, history keeps the bad versions
    inspectable via time travel, incremental readers refuse across the
    rollback step, a further append on top works, and a vacuumed target
    refuses with SnapshotVacuumedError."""
    from geospatial_cuda_spark.sources.snapshots import (
        SnapshotIncrementalError,
        SnapshotVacuumedError,
    )

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(v1_df, "bucket")                                   # v1
    t.commit(v2_df, "bucket")                                   # v2 (new buckets)
    m = t.rollback(1)                                           # v3 == v1
    assert m["version"] == 3 and m["metrics"]["rolled_back_to"] == 1
    assert _rows(t.read(spark)) == _rows(t.read(spark, version=1))
    assert _rows(t.read(spark, version=2)) != _rows(t.read(spark, version=1))
    # incremental readers must refuse across the non-append step v2→v3
    with pytest.raises(SnapshotIncrementalError):
        t.read_changes(spark, 1)
    # life goes on: append after the rollback, content = v1 + new buckets
    extra = v2_df.withColumn("bucket", F.concat(F.lit("x"), F.col("bucket")))
    t.commit(extra, "bucket")                                   # v4
    assert t.current()["version"] == 4
    # v4 reads under the evolved 4-column schema: v1-era rows null-fill tag
    assert _rows(t.read(spark)) == sorted(
        [r + (None,) for r in _rows(t.read(spark, version=1))] + _rows(extra)
    )
    # vacuum drops v2's (now unreferenced) files → rollback to v2 refuses
    assert t.vacuum(stage_grace_sec=0) > 0
    with pytest.raises(SnapshotVacuumedError, match="vacuumed"):
        t.rollback(2)
    # but re-rolling back to still-live content stays possible
    t.rollback(1)
    assert _rows(t.read(spark)) == _rows(t.read(spark, version=1))


def test_rollback_guards_delta_files_and_carries_delta_op(spark, v1_df, tmp_path):
    """The vacuum guard covers merge-on-read DELTA files too (a rollback to
    a delta-bearing version whose delta files were vacuumed must refuse,
    not publish an unreadable CURRENT), and a successful rollback restores
    delta content exactly — including a non-default op column."""
    from geospatial_cuda_spark.sources.snapshots import SnapshotVacuumedError

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(v1_df, "bucket")                                   # v1
    d = spark.createDataFrame(
        [(1000, "0", 5, "i"), (0, "0", 0, "d")],
        "pid long, bucket string, val long, myop string",
    )
    t.append_deltas(d, "bucket", ["0"], key_cols=["pid"], op_col="myop")  # v2
    v2_rows = _rows(t.read(spark))
    assert (1000, "0", 5) in v2_rows and all(r[0] != 0 for r in v2_rows)
    t.rollback(1)                                               # v3 == v1
    t.rollback(2)                                               # v4 == v2 (deltas + op col restored)
    assert _rows(t.read(spark)) == v2_rows
    # roll forward to plain v1 content, vacuum the now-orphaned delta files,
    # then a rollback to the delta-bearing v2 must refuse
    t.rollback(1)                                               # v5 == v1
    assert t.vacuum(stage_grace_sec=0) > 0
    with pytest.raises(SnapshotVacuumedError, match="delta"):
        t.rollback(2)
    # CURRENT stayed readable throughout
    assert _rows(t.read(spark)) == _rows(t.read(spark, version=1))
