"""Streaming ingest deduplication — exact dedup as data ARRIVES.

A training-data pipeline dedups on ingest so duplicates never reach the
corpus store (the batch `operators/dedup.py` family then only handles
NEAR-duplicates). The Structured-Streaming shape is
``dropDuplicatesWithinWatermark``: per-key state lives in the state store
only until the event-time watermark passes the key's last-seen time, so
state is BOUNDED by the watermark horizon — the standard trade: a
duplicate arriving later than the horizon is re-emitted (downstream batch
dedup catches it; an unbounded-state exact guarantee cannot exist in a
stream).

Reference scope: the reference engine has no streaming layer at all
(SURVEY §2.9); this completes the ingest half of the pipeline story
(`snapshot_changes` source → dedup → windowed aggregation → snapshot
sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint_col


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    time_col: str = "event_time",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Emit the FIRST arrival of each ``key_cols`` combination; duplicates
    arriving within ``watermark`` of it are dropped exactly (state-store
    backed, survives restarts through the checkpoint). State per key is
    evicted once the watermark passes — bounded memory, the documented
    re-emission risk beyond the horizon."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_documents_stream(
    docs: DataFrame,
    text: str = "text",
    time_col: str = "event_time",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Content-addressed streaming dedup for a document feed: the key is
    the whitespace-normalized md5 fingerprint (the same function as the
    batch ``exact_dedup`` path, so stream and batch agree on what counts
    as a duplicate). Adds the ``fingerprint`` column to the output."""
    with_fp = docs.withColumn("fingerprint", fingerprint_col(F.col(text)))
    return dedup_stream(with_fp, ["fingerprint"], time_col, watermark)
