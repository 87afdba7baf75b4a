"""Standing sweep for the r04 window-NULL-ordering divergence class.

A window that orders a column NULL can actually reach is a latent
cross-engine wrong answer: Spark's default ascending sort is NULLS FIRST,
DuckDB's is NULLS LAST, so the moment a NULL reaches the window input,
first_value / row_number / lag land on different rows per engine — and the
failure is invisible until a data vintage delivers the NULL (exactly how
the r04 q_ewma/q_window_median divergence appeared). Round 4 audited the
catalog by hand ("no catalog window orders a nullable column"); this test
re-derives that invariant automatically every run.

Which columns can be NULL is DATA-DRIVEN, not schema-driven: parquet
marks every column nullable, so the sweep instead scans the benign
sf0.001 vintage AND the adversarial .advdata vintage (regenerated if
absent — deterministic, <2s) for columns that actually carry NULLs.
That keeps the check self-maintaining: a future vintage that starts
producing NULLs in a new column automatically puts every window ordering
it under scrutiny.

Rule: for every `Window` node in every catalog query's analyzed plan,
every `orderSpec` expression that references a NULL-bearing column must
satisfy one of
  (a) a `Filter` BELOW the window references one of the expression's
      attributes — the engine's guard idiom (`isNotNull()` / bracket
      predicates are null-rejecting), which is how every legitimate
      value-ordered window in the catalog is written; or
  (b) an entry in ALLOWED naming (query, column) with a justification —
      the conscious escape hatch for a window whose NULL ordering is
      pinned identically on both engines.

Known limitations, accepted for a zero-noise standing check: an alias
that renames a NULL-bearing column before the window escapes the name
match, and NULLs manufactured from non-null inputs (`when()` without
`otherwise`, `try_cast`) are out of scope — those classes are covered by
the oracle gate itself when they bite.

Streaming-harness queries are skipped (building them executes the
stream); their windows order watermarked event-time columns the feed
stager casts non-null.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

from dataengineering_londonhousingmap_spark.queries import QUERIES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
ADV = os.path.join(ROOT, ".advdata")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# (query, order-column-name) -> why ordering a NULL-bearing column is safe.
# Add entries ONLY with a justification that covers BOTH engines.
ALLOWED: dict[tuple[str, str], str] = {}


@pytest.fixture(scope="module")
def null_bearing_columns() -> set[str]:
    if not os.path.exists(os.path.join(ADV, "events.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_advdata.py")],
            check=True,
            capture_output=True,
            timeout=120,
        )
    con = duckdb.connect()
    out: set[str] = set()
    for vintage in (SF, ADV):
        for t in TABLES:
            path = os.path.join(vintage, f"{t}.parquet")
            cols = [
                r[0]
                for r in con.sql(
                    f"describe select * from '{path}'"
                ).fetchall()
            ]
            counts = con.sql(
                "select "
                + ", ".join(
                    f'count(*) - count("{c}") as "{c}"' for c in cols
                )
                + f" from '{path}'"
            ).fetchone()
            out |= {c for c, n in zip(cols, counts) if n > 0}
    return out


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _refs(expr) -> list:
    seq = expr.references().toSeq()
    return [seq.apply(i) for i in range(seq.size())]


def _unguarded_null_bearing_orders(df, nullable_names: set[str]) -> list[str]:
    """Names of window-order expressions referencing a NULL-bearing column
    with no Filter referencing those attributes anywhere below the Window."""
    plan = df._jdf.queryExecution().analyzed()
    out: list[str] = []
    for node in _walk(plan):
        if node.getClass().getSimpleName() != "Window":
            continue
        order_spec = node.orderSpec()
        guarded_ids: set[int] = set()
        subtree = node.children().apply(0)
        for sub in _walk(subtree):
            if sub.getClass().getSimpleName() == "Filter":
                guarded_ids |= {
                    a.exprId().id() for a in _refs(sub.condition())
                }
        for i in range(order_spec.size()):
            child = order_spec.apply(i).child()
            refs = _refs(child)
            hot = [a for a in refs if a.name() in nullable_names]
            if not hot:
                continue
            if {a.exprId().id() for a in refs} & guarded_ids:
                continue
            out.extend(a.name() for a in hot)
    return out


def test_no_catalog_window_orders_an_unguarded_null_bearing_column(
    spark, null_bearing_columns
):
    violations: list[tuple[str, str]] = []
    for name in sorted(QUERIES):
        if name.startswith("q_stream"):
            continue
        df = QUERIES[name](spark, SF)
        for col in _unguarded_null_bearing_orders(df, null_bearing_columns):
            if (name, col) not in ALLOWED:
                violations.append((name, col))
    assert not violations, (
        "windows ordering a NULL-bearing column with no null-rejecting "
        "filter below — Spark NULLS FIRST vs DuckDB NULLS LAST diverges "
        "the moment a NULL arrives; guard the input or pin NULL ordering "
        f"on BOTH sides and allowlist with a justification: {violations}"
    )


def test_sweep_detects_an_unguarded_null_bearing_order(
    spark, null_bearing_columns
):
    """Non-vacuity control: events.value carries NULLs in the adversarial
    vintage, so a window ordering it bare (the q_ewma-shaped regression)
    must be flagged — and the engine's guard idiom must clear it."""
    from pyspark.sql import Window, functions as F

    assert "value" in null_bearing_columns
    df = spark.read.parquet(f"{SF}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("value")
    bad = df.withColumn("rn", F.row_number().over(w))
    assert _unguarded_null_bearing_orders(bad, null_bearing_columns), (
        "the sweep failed to flag a window ordering an unguarded "
        "NULL-bearing column — the detector regressed"
    )
    good = (
        df.filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
    )
    assert not _unguarded_null_bearing_orders(good, null_bearing_columns)
