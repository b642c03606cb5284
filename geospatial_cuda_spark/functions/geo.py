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


def pip_mask_rings(
    px: np.ndarray,
    py: np.ndarray,
    rings: list[np.ndarray],
    rule: str = "evenodd",
) -> np.ndarray:
    """Vectorized boundary-inclusive point-in-polygon over a MULTI-RING
    polygon (outer boundary + holes, or several disjoint outers — any
    admin-boundary-with-enclave shape). ``rings``: list of (k, 2) float64
    vertex arrays; one numpy pass per edge over the whole Arrow batch.

    Fill rules (the two standard ones, VERDICT r4 item 6):
    - ``evenodd``: crossing-parity of a +x ray over ALL rings' edges — a
      hole is a hole regardless of its winding direction;
    - ``nonzero`` (winding number): signed crossing sum (upward edge left
      of the point = +1, downward = −1); a ring wound the SAME way as the
      outer does NOT punch a hole, and a self-overlapping ring's
      double-wound core stays inside (where even-odd excludes it —
      pytest-pinned against a naive per-point oracle).

    Both rules share one crossing test and intersection arithmetic, so for
    a single ring ``evenodd`` is bit-identical to the historical
    ``pip_mask`` (the signed count's parity equals the hit-count's parity).
    A point ON any ring edge is inside under both rules (boundary-inclusive
    — axis-aligned rect rings thus agree exactly with the reference's
    inclusive bbox containment, cuda/kernels.cu:152-155)."""
    if rule not in ("evenodd", "nonzero"):
        raise ValueError(f"unknown fill rule {rule!r} (evenodd|nonzero)")
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    wn = np.zeros(px.shape[0], dtype=np.int64)
    onedge = np.zeros(px.shape[0], dtype=bool)
    for poly in rings:
        poly = np.asarray(poly, dtype=np.float64)
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
            hit = crosses & (px < xint)
            # upward edge (y2 > y1) contributes +1, downward −1; horizontal
            # edges never satisfy `crosses`
            wn += np.where(hit, np.where(y2 > y1, 1, -1), 0)
    inside = (wn & 1).astype(bool) if rule == "evenodd" else wn != 0
    return inside | onedge


def pip_mask(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Single-ring boundary-inclusive even-odd ray cast (the historical
    kernel surface) — delegates to ``pip_mask_rings``; same crossing test
    and intersection arithmetic, so results are bit-identical."""
    return pip_mask_rings(px, py, [poly], "evenodd")
