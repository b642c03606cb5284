from __future__ import annotations

import numpy as np
import pytest

from geospatial_cuda_spark.session import get_spark
from geospatial_cuda_spark.util import hash2


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_points() -> tuple[np.ndarray, np.ndarray]:
    """1,000 deterministic integer-valued points in [0,1e6)² (seed=42) plus
    the F2 edge pack, as numpy — shared by oracle and Spark fixtures."""
    n = 1000
    pid = np.arange(n, dtype=np.uint64)
    x = (hash2(pid, np.full_like(pid, 84)) % np.uint64(1_000_000)).astype(np.float32)
    y = (hash2(pid, np.full_like(pid, 85)) % np.uint64(1_000_000)).astype(np.float32)
    ex = np.array(
        [500000, 500000, 654321, 250000, 0, 999999, 42, 42]
        + [777777 + (k % 2) for k in range(24)],
        dtype=np.float32,
    )
    ey = np.array(
        [500000, 123456, 500000, 750000, 0, 999999, 42, 42]
        + [333333 + (k // 2) % 2 for k in range(24)],
        dtype=np.float32,
    )
    return np.concatenate([x, ex]), np.concatenate([y, ey])


@pytest.fixture(scope="session")
def small_points_df(spark, small_points):
    import pandas as pd
    from pyspark.sql import functions as F

    x, y = small_points
    pdf = pd.DataFrame({"pid": np.arange(x.shape[0], dtype=np.int64), "x": x, "y": y})
    return spark.createDataFrame(pdf).select(
        "pid", F.col("x").cast("float").alias("x"), F.col("y").cast("float").alias("y")
    )
