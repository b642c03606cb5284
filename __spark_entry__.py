"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over geospatial_cuda_spark.entrypoints: ``entry`` runs the
flagship spatial-join + tile pipeline on sf0.001; ``queries`` exposes one
callable per implemented operator from SURVEY.md §2 (plus the training-data
pipeline ops); ``oracle_sql`` returns the DuckDB-dialect equivalent for
EVERY query — since round 3 no entry is rows-only: deterministic
approximations (IVF ANN, LSH near-dup) are re-derived exactly in SQL
(seeded planes / md5-sampled centroids + rounded-cosine ranking), and
kernel outputs (image/audio features, tile/video geometry) are re-derived
as pure splitmix64 integer arithmetic. Recall/exactness of the approximate
paths is additionally pytest-gated against in-repo brute-force baselines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geospatial_cuda_spark import entrypoints as _ep


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ep.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_ep.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ep.ORACLES)
