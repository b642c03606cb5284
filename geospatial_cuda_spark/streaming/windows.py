"""Event-time streaming aggregations over the spatial stream.

The reference has no streaming layer (SURVEY §2.9) — its closest analogue is
the sequential Query batch (cuda/inference.cu:109-170), covered by
upserts.PointTableStream. This module supplies the two Structured-Streaming
shapes a production spatial feed needs on top of that:

- ``tile_window_counts``: watermarked event-time tumbling-window counts per
  web-mercator tile — late rows beyond the watermark are dropped by the
  engine, state is bounded, and the aggregation is fully built-in (windowed
  groupBy; partial aggregation + state store, no Python).
- ``stateful_cell_counts``: a custom stateful operator via
  ``applyInPandasWithState`` — per-cell running point counts maintained in
  the state store across micro-batches (the streaming twin of the cells
  relation's count column; survives restart through the checkpoint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.geo import tile_xy_cols
from ..operators.quadtree import with_cell_id

EVENT_SCHEMA = "event_id long, x double, y double, event_time timestamp"


def tile_window_counts(
    events: DataFrame,
    zoom: int,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """(window, tile_x, tile_y, n_events) with bounded state: rows later than
    ``watermark`` behind the max seen event time are discarded, completed
    windows age out of the store. Works identically on batch DataFrames
    (watermark is a no-op there) — used by the tests' oracle comparison."""
    tx, ty = tile_xy_cols(F.col("x"), F.col("y"), zoom)
    tagged = events.withColumn("tile_x", tx).withColumn("tile_y", ty)
    if tagged.isStreaming:
        tagged = tagged.withWatermark(time_col, watermark)
    return tagged.groupBy(
        F.window(F.col(time_col), window).alias("win"), "tile_x", "tile_y"
    ).agg(F.count(F.lit(1)).alias("n_events"))


_STATE_SCHEMA = StructType([StructField("n", LongType())])
_OUT_SCHEMA = "cell_id long, n_points long"


def _update_cell_count(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_new = sum(len(pdf) for pdf in pdfs)
    (n_old,) = state.get if state.exists else (0,)
    total = int(n_old) + int(n_new)
    state.update((total,))
    yield pd.DataFrame({"cell_id": [key[0]], "n_points": [total]})


def stateful_cell_counts(
    events: DataFrame, depth: int, x: str = "x", y: str = "y"
) -> DataFrame:
    """Running per-cell event counts as a custom stateful streaming operator:
    one state-store entry per occupied depth-``depth`` cell, updated per
    micro-batch, emitted in update mode. State size is O(occupied cells) —
    the same bound the batch cells relation enjoys."""
    tagged = with_cell_id(events, depth, x=x, y=y)
    return tagged.groupBy("cell_id").applyInPandasWithState(
        _update_cell_count,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
