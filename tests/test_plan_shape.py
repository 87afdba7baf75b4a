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


# query -> column-name markers that identify a CORPUS-PROPORTIONAL frame;
# none may appear in any BroadcastExchange output. q_lsh_recall is exempt
# by design (it runs on a bounded 1000-doc subset, so its shingle/band
# broadcasts are genuinely small).
NO_CORPUS_BROADCAST = {
    "q_ngram_jaccard": ("shingle", "band_hash"),
    "q_containment": ("shingle", "band_hash"),
    "q_dedup_agreement": ("shingle", "band_hash"),
    "q_dedup_incremental": ("shingle", "band_hash"),
    "q_dedup_minhash": ("shingle", "band_hash"),
    "q_decontaminate": ("shingle",),
    # r11 substring family: the selected-window tables are corpus-
    # proportional (1/16 of all 64-char windows) behind a checkpoint
    "q_dedup_substring": ("win",),
    "q_decontaminate_spans": ("win",),
    # r12: the incremental window join's BOTH sides are corpus-
    # proportional kept-window tables behind checkpoints
    "q_substring_incremental": ("win",),
    # r12: the encode/tokenize joins' corpus side is the checkpointed
    # token table (doc_id, word); the vocab side is merge-pinned —
    # nothing carrying doc_id may broadcast
    "q_bpe_encode": ("doc_id",),
    "q_bpe_tokenize": ("doc_id",),
}


def _broadcast_output_cols(df) -> list[list[str]]:
    """Column names output by every BroadcastExchange in the pre-execution
    physical plan — exactly what the static planner chose, which is where
    the misestimate lived. Under AQE (this session's default) executedPlan
    is an AdaptiveSparkPlan LEAF (children() is empty — verified live), so
    the walk must descend through its initialPlan; a walk that only follows
    children() silently returns [] and the guard is vacuous."""
    out: list[list[str]] = []

    def walk(node):
        if "BroadcastExchange" in node.nodeName():
            seq = node.output()
            out.append([seq.apply(i).name() for i in range(seq.size())])
        if node.nodeName() == "AdaptiveSparkPlan":
            walk(node.initialPlan())
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_broadcast_walk_is_not_vacuous(spark):
    """Self-check for the guard below: a query that provably plans a
    broadcast join must yield a non-empty BroadcastExchange list — if the
    AQE wrapper ever hides the tree again, THIS fails rather than the
    shingle guard silently passing forever."""
    small = spark.range(10).withColumnRenamed("id", "k")
    big = spark.range(100000).withColumnRenamed("id", "k")
    df = big.join(small.hint("broadcast"), "k")
    assert _broadcast_output_cols(df), "walk found no BroadcastExchange in a broadcast join"


@pytest.mark.parametrize("name", sorted(NO_CORPUS_BROADCAST))
def test_candidate_verify_never_broadcasts_corpus_frames(name, spark):
    """The 10x-vintage probe caught the static planner broadcasting
    corpus-proportional frames (pruned shingle table, banded signature
    table, bench-side shingles) — LogicalRDD stats underestimate through
    semi-joins/filters, and a misestimated broadcast build is a driver
    OOM at scale. The dedup core pins those joins to sort-merge; this
    guards that no refactor reintroduces one."""
    markers = NO_CORPUS_BROADCAST[name]
    df = QUERIES[name](spark, SF)
    offenders = [
        cols for cols in _broadcast_output_cols(df)
        if any(m in c for c in cols for m in markers)
    ]
    assert not offenders, (
        f"{name}: BroadcastExchange over a corpus-proportional frame "
        f"{offenders} — must be sort-merge"
    )


def test_gridded_nn_joinback_broadcasts_small_winner_table(spark):
    """Hot-cell hardening contract, small side: when the distinct-
    coordinate winner table is small (exact count ≤ _COORD_BROADCAST_ROWS)
    the fan-out join must BROADCAST it — the big left side is then never
    shuffled, so a hot coordinate cannot straggle a task. Pin: a
    BroadcastExchange whose output carries the renamed __w0 key."""
    from dataengineering_londonhousingmap_spark.operators.joins import nearest_join_gridded

    left = spark.createDataFrame(
        [(i, float(i % 5), float(i % 5)) for i in range(100)],
        "id long, latitude double, longitude double",
    )
    right = spark.createDataFrame(
        [(j, float(j), float(j)) for j in range(5)],
        "rid long, r_latitude double, r_longitude double",
    )
    df = nearest_join_gridded(left, right, left_key="id", cell_deg=1.0, tiebreak=["rid"])
    hits = [cols for cols in _broadcast_output_cols(df) if "__w0" in cols]
    assert hits, "winner-table fan-out join is not broadcast despite a tiny winner set"


def test_gridded_nn_joinback_merge_pinned_when_winner_table_large(spark, monkeypatch):
    """Hot-cell hardening contract, large side: above the row threshold
    the fan-out join must be pinned to sort-merge regardless of what
    Catalyst stats claim (checkpoint-derived frames underestimate; a
    misestimated broadcast of a corpus-proportional winner table is a
    driver OOM at scale). Threshold monkeypatched to 0 so the same tiny
    fixture exercises the big-table branch."""
    from dataengineering_londonhousingmap_spark.operators import joins

    monkeypatch.setattr(joins, "_COORD_BROADCAST_ROWS", 0)
    left = spark.createDataFrame(
        [(i, float(i % 5), float(i % 5)) for i in range(100)],
        "id long, latitude double, longitude double",
    )
    right = spark.createDataFrame(
        [(j, float(j), float(j)) for j in range(5)],
        "rid long, r_latitude double, r_longitude double",
    )
    df = joins.nearest_join_gridded(left, right, left_key="id", cell_deg=1.0, tiebreak=["rid"])
    hits = [cols for cols in _broadcast_output_cols(df) if "__w0" in cols]
    assert not hits, (
        "winner-table fan-out join was broadcast above the threshold — "
        "the merge pin is gone and stats misestimates can OOM the driver"
    )


def test_winner_joinback_byte_bound_pins_merge_for_wide_payloads(spark, monkeypatch):
    """Hot-cell hardening contract, byte bound: a winner table UNDER the
    row threshold but whose schema-weighted byte estimate exceeds
    _WINNER_BROADCAST_BYTES must still pin to sort-merge — the round-6
    advisor's hole was a flat per-column cost letting long-string payload
    columns ride a row count calibrated for narrow numeric tables.
    Byte threshold monkeypatched down so the tiny fixture (rows well
    under _COORD_BROADCAST_ROWS, one string payload column at 128
    estimated bytes) trips the byte bound alone."""
    from dataengineering_londonhousingmap_spark.operators import joins

    # 100 winner rows x (~128 string + 3x16 scalar) ≈ 17.6KB estimated;
    # threshold of 1KB forces the byte branch while rows stay tiny
    monkeypatch.setattr(joins, "_WINNER_BROADCAST_BYTES", 1 << 10)
    left = spark.createDataFrame(
        [(i, float(i % 5), float(i % 5)) for i in range(100)],
        "id long, latitude double, longitude double",
    )
    right = spark.createDataFrame(
        [(j, float(j), float(j), "payload-" * 40) for j in range(5)],
        "rid long, r_latitude double, r_longitude double, blob string",
    )
    df = joins.nearest_join_gridded(left, right, left_key="id", cell_deg=1.0, tiebreak=["rid"])
    hits = [cols for cols in _broadcast_output_cols(df) if "__w0" in cols]
    assert not hits, (
        "wide-payload winner table was broadcast despite exceeding the "
        "byte estimate — the schema-weighted byte guard is gone"
    )
    # and the estimate itself must weight variable-width types above scalars
    from pyspark.sql import functions as F

    narrow = spark.range(1).select(F.col("id"), F.col("id").cast("double"))
    wide = spark.range(1).select(F.col("id"), F.col("id").cast("string"))
    assert joins._est_row_bytes(wide) > joins._est_row_bytes(narrow)


@pytest.mark.parametrize("name", ["q_join_nn", "q_join_nn_topk", "q_join_nn_gridded"])
def test_catalog_nn_queries_use_winner_rejoin(name, spark):
    """The catalog NN queries must run through the reduce-then-min shell
    (distinct metric values → winner per value → fan-out rejoin): dropping
    left_metric_cols / dedup_coords from a call site silently reverts to
    the |left|×|right| plan that ran 60-105x on the 10x probe. Pin: the
    rejoin's renamed __w0 key appears in the executed plan's broadcast
    (tiny winner tables at this SF always broadcast)."""
    df = QUERIES[name](spark, SF)
    hits = [cols for cols in _broadcast_output_cols(df) if "__w0" in cols]
    assert hits, f"{name}: no winner-table rejoin in the plan — metric dedup lost"


def test_aqe_skew_join_split_fires_under_engine_session(spark):
    """Direct evidence that the engine's session config keeps AQE's
    skew-join split live: a hot-key sort-merge join (75% of 1M rows on one
    key) must finalize as SortMergeJoin(skew=true) with an AQEShuffleRead
    marked 'skewed'. Thresholds are lowered (and restored) so the unit-
    scale fixture crosses the skew classifier the way a hot cell at 100 TB
    crosses the 256MB default — the mechanism under test is identical."""
    from pyspark.sql import functions as F

    scoped = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in scoped}
    for k, v in scoped.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(1000000).select(
            F.when(F.col("id") % 4 != 3, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 128), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(2000).select(F.col("id").alias("k"), F.lit("r").alias("rv"))
        j = left.join(right, "k")
        j.foreach(lambda r: None)  # finalize THIS DataFrame's adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed join"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# catalog-wide parquet-scan ceiling: the widest legitimate plan is the
# star join (6 distinct tables, audited r06). A plan exceeding this has
# almost certainly lost a checkpoint cut and is replaying a shared
# subtree per consumer (q_outlier_mad once compiled to 36 scans).
_MAX_SCANS_ANY_PLAN = 8


def test_no_rowwise_python_anywhere_in_catalog(spark):
    """Catalog-wide sweep, one plan build per query: (a) no row-at-a-time
    Python eval (BatchEvalPython) — every Python boundary must be
    Arrow-batched (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas);
    (b) no plan may exceed the global parquet-scan ceiling — a replayed
    shared subtree shows up as scans >> tables referenced. Streaming
    harness queries are skipped (building them executes the stream); their
    stateful exec is Arrow-based by construction."""
    offenders = []
    replayers = []
    for name in sorted(QUERIES):
        if name.startswith("q_stream"):
            continue
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if "BatchEvalPython" in plan:
            offenders.append(name)
        scans = len(re.findall(r"\(\d+\)\s+Scan parquet", plan))
        if scans > _MAX_SCANS_ANY_PLAN:
            replayers.append((name, scans))
    assert not offenders, f"row-wise Python eval in: {offenders}"
    assert not replayers, (
        f"plans over the {_MAX_SCANS_ANY_PLAN}-scan ceiling (lost checkpoint "
        f"cut, subtree replayed per consumer): {replayers}"
    )


@pytest.mark.parametrize(
    "name,expr_marker,max_evals",
    [
        # both_orientations (operators/dedup.py) must explode, never union
        # with a swapped projection: the union shape makes the expensive
        # upstream (block join + Levenshtein DP, all-pairs cosine fold) a
        # two-consumer subtree that Spark replays once per orientation —
        # measured r09 at the 10x adversarial probe, the replay roughly
        # doubled q_fuzzy_join. One expression instance in the optimized
        # plan = the computation runs once.
        # one block self-join (the __ba = __bb equi-condition); the DP it
        # carries therefore runs over the blocked pairs exactly once.
        # (counting 'levenshtein' itself is wrong: Catalyst pushes the
        # dist<=1 filter into the SAME join's condition, so the expression
        # legitimately prints twice inside one join.)
        ("q_fuzzy_join", r"Join Inner,[^\n]*__ba#\d+ = __bb#\d+", 1),
    ],
)
def test_orientation_expansion_computes_metric_once(name, expr_marker, max_evals, spark):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    found = len(re.findall(expr_marker, plan))
    assert 0 < found <= max_evals, (
        f"{name}: expected <= {max_evals} match(es) of /{expr_marker}/ in the "
        f"optimized plan, found {found} — the orientation expansion is "
        "replaying its upstream per branch (use both_orientations' explode)"
    )


def test_scoring_exprs_single_split_in_filter_position(spark):
    """r10: Catalyst pushes the curation gate (quality >= t AND lang = en)
    through the scoring Project into a Filter, where there is no
    whole-stage codegen for HOFs and no subexpression elimination — the
    r09 expression shapes re-evaluated the token split up to 8x per row
    there (measured 9.3x wall on the 10x lane for lang_id_scores alone).
    quality_score/lang_id_scores are let-bound (functions/text.py:_let)
    so each contributes exactly ONE split() to the pushed condition;
    reverting the binding multiplies them."""
    from pyspark.sql import functions as F

    from dataengineering_londonhousingmap_spark.functions.text import lang_id_scores, quality_score

    docs = spark.createDataFrame(
        [(1, "the quick brown fox is with the others")], "doc_id long, text string"
    )
    kept = (
        docs.select(
            "doc_id",
            F.round(quality_score("text"), 6).alias("q"),
            lang_id_scores("text").alias("l"),
        )
        .filter((F.col("q") >= 0.6) & (F.col("l") == "en"))
        .select("doc_id")
    )
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    n_split = plan.count("split(")
    # positive control: the scoring really was pushed into this plan
    assert n_split >= 1, "scoring expressions vanished from the plan"
    assert n_split <= 2, (
        f"{n_split} split() occurrences in the pushed filter condition — "
        "a scoring expression lost its let-binding (functions/text.py:_let) "
        "and re-evaluates the token split per reference in FilterExec"
    )
