"""exact_quantiles: sort-free order statistics vs numpy on adversarial
shapes — ties, edge quantiles, out-of-range clamping, skew — plus the
no-global-sort plan invariant."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatial_cuda_spark.operators.quantiles import exact_quantiles


def _want(vals: np.ndarray, qs: list[float]) -> dict[float, float]:
    s = np.sort(vals)
    return {q: float(s[math.floor(q * (len(s) - 1))]) for q in qs}


@pytest.mark.parametrize(
    "vals",
    [
        np.random.default_rng(3).uniform(0, 1, 2000),          # smooth
        np.repeat([0.25, 0.5, 0.5, 0.75], 300),                # heavy ties
        np.concatenate([np.zeros(900), np.ones(7)]),           # extreme skew
        np.array([0.42]),                                      # single row
        np.linspace(-0.5, 1.5, 400),                           # out of [0,1] → clamped bins
    ],
    ids=["smooth", "ties", "skew", "single", "clamped"],
)
def test_exact_quantiles_matches_numpy(spark, vals):
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", qs, bins=101).collect()}
    want = _want(np.asarray(vals, dtype=np.float64), qs)
    assert got.keys() == want.keys()
    for q in qs:
        assert got[q] == pytest.approx(want[q], abs=0, rel=0), q


def test_exact_quantiles_never_sorts_the_relation(spark):
    df = spark.range(0, 10_000).select((F.col("id") % 997 / 997.0).alias("v"))
    plan = exact_quantiles(df, "v", [0.5])._jdf.queryExecution().executedPlan().toString()
    # the only Sort allowed is the boundary-bin window's within-partition
    # sort; a global sort would show as an Exchange rangepartitioning
    assert "rangepartitioning" not in plan


def test_exact_quantiles_input_validation(spark):
    df = spark.createDataFrame([(0.5,)], "v double")
    with pytest.raises(ValueError, match="quantiles must be in"):
        exact_quantiles(df, "v", [1.5])
    with pytest.raises(ValueError, match="empty value range"):
        exact_quantiles(df, "v", [0.5], vmin=1.0, vmax=1.0)
    with pytest.raises(ValueError, match="empty relation"):
        exact_quantiles(df.where(F.col("v") > 9), "v", [0.5])


def test_exact_quantiles_excludes_null_and_nan(spark):
    """NULL/NaN rows are excluded from ranking (numpy/SQL percentile
    convention) — they must shift no rank and never surface as a value."""
    rows = [(0.1,), (0.2,), (None,), (0.3,), (float("nan"),), (0.4,), (0.5,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["q"]: r["value"] for r in
           exact_quantiles(df, "v", [0.0, 0.5, 1.0], bins=11).collect()}
    assert got == {0.0: 0.1, 0.5: 0.3, 1.0: 0.5}
