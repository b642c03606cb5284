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


def dot_col_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product UNROLLED to ``dim`` element_at terms. Semantically equal to
    ``dot_col`` (same left-to-right double summation order), but the unrolled
    form is plain arithmetic inside whole-stage codegen, where the
    higher-order aggregate/zip_with form is interpreted per element (a
    closure eval per array slot — measured ~10× slower on a 64-dim
    candidate-pair scoring join). Use when the embedding dim is statically
    known; fall back to ``dot_col`` otherwise."""
    out = None
    for i in range(1, dim + 1):
        term = F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        out = term if out is None else out + term
    return out


def norm_col_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(dot_col_fixed(a, a, dim))


def cosine_col_fixed(a: Column, b: Column, dim: int) -> Column:
    return dot_col_fixed(a, b, dim) / (norm_col_fixed(a, dim) * norm_col_fixed(b, dim))


DOT_SQL = (
    "list_dot_product({a}, {b})"  # DuckDB spelling, kept here for reference
)
