"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over geospatial_cuda_spark.entrypoints: ``entry`` runs the
flagship spatial-join + tile pipeline on sf0.001; ``queries`` exposes one
callable per implemented operator from SURVEY.md §2 (plus the training-data
pipeline ops); ``oracle_sql`` returns the DuckDB-dialect equivalent for every
SQL-expressible operator. Non-SQL-expressible entries (cell-pruned kNN, IVF
ANN — approximate/physical-path variants) intentionally have no oracle and
get the driver's rows-only check; their exactness/recall is asserted against
in-repo baselines by pytest instead.
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
