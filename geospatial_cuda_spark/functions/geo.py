"""Geometric scalar kernels: web-mercator tile math and point-in-polygon.

Tile grid (engine-defined; the reference has no raster layer — north-rule
extension): zoom z splits the domain into 2^z × 2^z half-open tiles of size
s = extent/2^z; ``tile_x = floor(x/s)`` (clamped), ``tile_y = 2^z − 1 −
floor(y/s)`` (web-mercator row order, row 0 at the top). Pure integer
arithmetic — exact in Spark, DuckDB, and numpy alike.

PIP: even-odd ray cast, boundary-INCLUSIVE (a point on any edge is inside),
so axis-aligned rectangle polygons agree exactly with the reference's
inclusive bbox containment (cuda/kernels.cu:152-155).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

EXTENT = 1_000_000


def tile_xy_cols(x: Column, y: Column, zoom: int, extent: int = EXTENT) -> tuple[Column, Column]:
    """Built-in Column arithmetic (JVM-side, codegen-friendly)."""
    n = 1 << zoom
    tx = F.least(
        F.greatest(F.floor(x.cast("double") * n / extent).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    ty_raw = F.least(
        F.greatest(F.floor(y.cast("double") * n / extent).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    return tx.cast("int"), (F.lit(n - 1) - ty_raw).cast("int")


def tile_x_sql(xcol: str, zoom: int, extent: int = EXTENT) -> str:
    n = 1 << zoom
    return (
        f"CAST(LEAST(GREATEST(CAST(FLOOR(CAST({xcol} AS DOUBLE) * {n} / {extent}) "
        f"AS BIGINT), 0), {n - 1}) AS INT)"
    )


def tile_y_sql(ycol: str, zoom: int, extent: int = EXTENT) -> str:
    n = 1 << zoom
    return (
        f"CAST({n - 1} - LEAST(GREATEST(CAST(FLOOR(CAST({ycol} AS DOUBLE) * {n} / {extent}) "
        f"AS BIGINT), 0), {n - 1}) AS INT)"
    )


def tile_xy_np(x: np.ndarray, y: np.ndarray, zoom: int, extent: int = EXTENT):
    n = 1 << zoom
    tx = np.clip(np.floor(x.astype(np.float64) * n / extent).astype(np.int64), 0, n - 1)
    ty = n - 1 - np.clip(np.floor(y.astype(np.float64) * n / extent).astype(np.int64), 0, n - 1)
    return tx.astype(np.int32), ty.astype(np.int32)


def pip_mask(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized boundary-inclusive even-odd ray cast of one polygon over a
    point batch. poly: (k, 2) float64. The CUDA-kernel replacement: one numpy
    pass per edge over the whole Arrow batch."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    onedge = np.zeros(px.shape[0], dtype=bool)
    k = poly.shape[0]
    for i in range(k):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % k]
        # exact on-segment test (collinear + within segment bbox)
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        within = (
            (px >= min(x1, x2)) & (px <= max(x1, x2))
            & (py >= min(y1, y2)) & (py <= max(y1, y2))
        )
        onedge |= (cross == 0.0) & within
        crosses = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (px < xint)
    return inside | onedge
