"""Vector math over array<float> columns — JVM-side (zip_with/aggregate
inside whole-stage codegen), no Python in the scoring path."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


DOT_SQL = (
    "list_dot_product({a}, {b})"  # DuckDB spelling, kept here for reference
)
