"""Physical-plan shape regression guards.

Round 4 removed every replayed-subtree plan from the catalog (aliased
self-joins and multi-consumer frames defeat ReusedExchange; the fix is a
localCheckpoint cut — see the verify skill notes). These tests pin the
worst offenders' parquet-scan counts so a refactor that drops a cut
fails here with a plan diff, not as a silent 5-10x cost regression:
q_outlier_mad once compiled to a 36-scan plan, q_rfm to 28, and
q_spearman_corr to 15.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from dataengineering_londonhousingmap_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# name -> max allowed "(n) Scan parquet" operators in the formatted plan
BOUNDS = {
    "q_outlier_mad": 4,      # was 36 before the percentile-operator cuts
    "q_rfm": 2,              # was 28 before the per_cust / value-table cuts
    "q_spearman_corr": 8,    # was 15 before the stats-row cut
    "q_winsorize": 4,
    "q_percentiles": 4,
    "q_funnel": 4,           # one scan per stage, not per consumer
    "q_tfidf": 2,
    "q_text_search": 3,
    "q_corpus_stats_score": 3,
    "q_copurchase": 2,
    "q_runtime_filter": 3,   # bucket build + ONE fused candidate pass
}


def _parquet_scans(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(re.findall(r"\(\d+\)\s+Scan parquet", buf.getvalue()))


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_plan_scan_count_stays_bounded(name, spark):
    df = QUERIES[name](spark, SF)
    scans = _parquet_scans(df)
    assert scans <= BOUNDS[name], (
        f"{name}: {scans} parquet scans (bound {BOUNDS[name]}) — a shared "
        f"subtree lost its localCheckpoint cut and is being replayed"
    )


NO_SHINGLE_BROADCAST = [
    "q_ngram_jaccard",
    "q_containment",
    "q_dedup_agreement",
    "q_dedup_incremental",
]


def _broadcast_output_cols(df) -> list[list[str]]:
    """Column names output by every BroadcastExchange in the executed plan
    (pre-execution AQE initial plan — exactly what the static planner
    chose, which is where the misestimate lived)."""
    out: list[list[str]] = []

    def walk(node):
        if "BroadcastExchange" in node.nodeName():
            seq = node.output()
            out.append([seq.apply(i).name() for i in range(seq.size())])
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


@pytest.mark.parametrize("name", NO_SHINGLE_BROADCAST)
def test_candidate_verify_never_broadcasts_shingles(name, spark):
    """The 10x-vintage probe caught the static planner broadcasting the
    pruned shingle table (LogicalRDD stats underestimate through the
    candidate semi-join) — a driver OOM at scale. The verify core pins
    corpus-proportional joins to sort-merge; this guards that no refactor
    reintroduces a shingle-carrying broadcast build side."""
    df = QUERIES[name](spark, SF)
    offenders = [
        cols for cols in _broadcast_output_cols(df)
        if any("shingle" in c for c in cols)
    ]
    assert not offenders, (
        f"{name}: BroadcastExchange over a shingle-carrying frame "
        f"{offenders} — corpus-proportional; must be sort-merge"
    )


def test_no_rowwise_python_anywhere_in_catalog(spark):
    """Catalog-wide sweep: no query may plan a row-at-a-time Python eval
    (BatchEvalPython) — every Python boundary must be Arrow-batched
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas). Streaming
    harness queries are skipped (building them executes the stream); their
    stateful exec is Arrow-based by construction."""
    offenders = []
    for name in sorted(QUERIES):
        if name.startswith("q_stream"):
            continue
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        if "BatchEvalPython" in buf.getvalue():
            offenders.append(name)
    assert not offenders, f"row-wise Python eval in: {offenders}"
