"""Every catalog query vs its DuckDB oracle at sf0.001 — the local twin of
the driver's correctness gate. One parametrized test per query so failures
localize."""

from __future__ import annotations

import pytest

from dataengineering_londonhousingmap_spark.oracles import ORACLES
from dataengineering_londonhousingmap_spark.queries import QUERIES

from .oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


def test_every_query_has_callable():
    assert QUERIES, "query catalog is empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_every_query_has_oracle():
    """The driver scores a missing oracle_sql() entry as err:no_oracle —
    a red row, not a rows-only check (VERDICT r02). No catalog entry may
    ship without an oracle twin."""
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without oracles (driver-red): {sorted(missing)}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF)
    ok, msg = compare(df, duck, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert df.schema is not None


def test_bench_and_scaleup_sets_reference_real_queries():
    """Guards the harness lists against renames: every bench headline and
    scale-up entry must be a catalog key, or bench.py / gen_scaleup.py
    would crash in the driver's per-round run."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def names_from(path, attr):
        spec = importlib.util.spec_from_file_location("m_" + attr, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return getattr(mod, attr)

    headline = names_from(os.path.join(root, "bench.py"), "HEADLINE")
    scaleup = names_from(os.path.join(root, "tools", "gen_scaleup.py"), "SCALEUP_SET")
    assert set(headline) <= set(QUERIES), sorted(set(headline) - set(QUERIES))
    assert set(scaleup) <= set(QUERIES), sorted(set(scaleup) - set(QUERIES))


# Oracles whose SQL reads files the matching query stages first (footer-
# verification family). The driver evaluates query-then-oracle in one
# process, so the staged files exist by oracle time; standalone DESCRIBE
# needs the staging run explicitly.
STAGE_DEPENDENT = ("q_compact_plan", "q_manifest", "q_prune_report")

# DuckDB result types whose pandas rendering can coincide with Spark's
# int64/float64 while the driver's type-sensitive value hash differs.
# sum(BIGINT) OVER (...) promotes to HUGEINT — exactly how q_pack_sequences
# stayed locally green but driver-red in r02+r03.
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def test_no_oracle_emits_hugeint_or_decimal(spark, duck):
    """Static sweep: DESCRIBE every oracle; no output column may have a
    DuckDB type the driver hashes differently from Spark's int64/float64."""
    for name in STAGE_DEPENDENT:
        QUERIES[name](spark, SF).count()  # materialize staged inputs
    bad = {}
    for name, sql in sorted(ORACLES.items()):
        rel = duck.sql(sql)
        hits = [
            f"{c}: {t}"
            for c, t in zip(rel.columns, rel.types)
            if any(str(t).upper().startswith(b) for b in _BANNED_DUCK_TYPES)
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"oracles emitting driver-hash-hostile types: {bad}"
