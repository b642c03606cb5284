"""Point-in-polygon join (J3 — north-rule extension; the reference supports
only axis-aligned rect containment, cuda/kernels.cu:152-155).

Shape: polygons are the SMALL side — their vertex arrays ship to every task
inside the Arrow-kernel closure (the DataFrame-level equivalent of a
broadcast join against an opaque geometry set), and each Arrow batch of
points is tested against all polygons in vectorized numpy. A cell-bbox
prefilter (optional) prunes points that cannot hit any polygon before the
kernel runs, reusing the J1 machinery's bbox arithmetic JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType

from ..functions.geo import pip_mask


def point_in_polygons(
    points: DataFrame,
    polygons: list[tuple[int, np.ndarray]],
    x: str = "x",
    y: str = "y",
    out: str = "poly_id",
    prefilter: bool = True,
) -> DataFrame:
    """Rows of ``points`` × ids of containing polygons (inner semantics: rows
    hitting no polygon are dropped; use ``containing_polys_col`` for the
    array-valued projection instead)."""
    df = points.withColumn("_polys", containing_polys_col(polygons, F.col(x), F.col(y), prefilter))
    return df.select("*", F.explode("_polys").alias(out)).drop("_polys")


def containing_polys_col(polygons: list[tuple[int, np.ndarray]], x, y, prefilter: bool = True):
    polys = [(int(pid), np.asarray(v, dtype=np.float64)) for pid, v in polygons]
    bboxes = np.array(
        [[v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max()] for _, v in polys]
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def _pip(xs: pd.Series, ys: pd.Series) -> pd.Series:
        px = xs.to_numpy(np.float64)
        py = ys.to_numpy(np.float64)
        hit_lists: list[list[int]] = [[] for _ in range(px.shape[0])]
        for (pid, verts), bb in zip(polys, bboxes):
            cand = (
                (px >= bb[0]) & (px <= bb[2]) & (py >= bb[1]) & (py <= bb[3])
                if prefilter
                else np.ones(px.shape[0], dtype=bool)
            )
            if not cand.any():
                continue
            m = pip_mask(px[cand], py[cand], verts)
            for j in np.flatnonzero(cand)[m]:
                hit_lists[j].append(pid)
        return pd.Series(hit_lists)

    return _pip(x, y)
