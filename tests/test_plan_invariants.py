"""CI gate for the physical-plan invariants PLANS.md documents.

tools/dump_plans.py audits and records the full plans at sf0.1 manually;
this test greps the same forbidden markers on every LAZY contract query at
sf0.001 on each pytest run, so a regression that sneaks a row-at-a-time
Python UDF, an accidental cartesian product, or an unintended
BroadcastNestedLoopJoin into a plan fails CI — not just the next manual
audit. Queries that execute driver-side work at construction time
(escalating kNN, IVF centroid sampling, brute-force query collect) are
exercised by the oracle gate instead and skipped here.
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"

# construction already runs jobs (collect/checkpoint/commit) — not explain-only
EAGER = {
    "knn",
    "knn_cells",
    "ann_ivf",
    "ann_topk",
    "doc_clusters",
    "corpus_mix",
    "embedding_neardup_lsh",
    "snapshot_lineage",
    "snapshot_prune",
    "snapshot_incremental",
    "snapshot_evolution",
    "snapshot_stream",
    "snapshot_rollback",
    "quality_quantiles",  # histogram pass collects the bounded bin counts
    "stream_dedup",
    "image_neardup_phash",  # hamming_pairs eager-localCheckpoints the hashes
    "neardup_components",
    "corpus_select_neardup",
}
# the intentional broadcast range/θ-joins (see tools/dump_plans.py), plus:
# ngram_jaccard_topk builds the bounded (<80 docs) all-pairs slice its exact-
# Jaccard demo is defined over, and validate_cells cross-combines three
# SINGLE-ROW aggregates into its one result row — both nested loops are over
# trivially bounded sides by construction.
BNLJ_ALLOWED = {
    "quadrant_search_broadcast",
    "cells_bbox_join",
    "ann_topk",
    "ngram_jaccard_topk",
    "validate_cells",
    "cell_cardinality_kmv",  # two single-row aggregates cross-combined
}
FORBIDDEN = [
    ("BatchEvalPython", "row-at-a-time Python UDF"),
    ("CartesianProduct", "unintentional cartesian product"),
]


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_forbidden_plan_nodes_in_any_lazy_query(spark):
    import __spark_entry__ as E

    problems = []
    for name, fn in E.queries().items():
        if name in EAGER:
            continue
        plan = _plan(fn(spark, SF))
        for marker, why in FORBIDDEN:
            if marker in plan:
                problems.append(f"{name}: {why} ({marker})")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            problems.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    assert not problems, problems


def test_scan_pruning_reaches_parquet(spark):
    """Column pruning must reach the scan: the quadrant-counts plan reads
    only the 4 lineitem key columns its point derivation uses, and the
    token-counts plan only (doc_id, text)."""
    import __spark_entry__ as E

    qs = E.queries()
    plan = _plan(qs["quadrant_counts"](spark, SF))
    scan = [l for l in plan.splitlines() if "ReadSchema" in l and "lineitem" not in l]
    assert scan, plan
    line = scan[0]
    assert "l_orderkey" in line and "l_partkey" in line
    assert "l_comment" not in line and "l_extendedprice" not in line
    plan = _plan(qs["token_counts"](spark, SF))
    line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in line and "text" in line and "lang" not in line
