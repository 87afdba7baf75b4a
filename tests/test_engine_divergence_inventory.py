"""Cross-engine divergence canary (round-8 judge stretch item).

The oracle discipline rests on a PINNED inventory of Spark-vs-DuckDB
behavioral divergences discovered rounds 1-7 (rounding mode, -0.0,
HUGEINT promotion, regex `$`, unicode case/length, cast truncation,
NULL ordering, collect_list NULLs, base64 chunking). Every oracle in
oracles.py routes around them with a documented guard.

This test asserts each divergence STILL BEHAVES AS DOCUMENTED on the
installed engine versions — so a Spark or DuckDB upgrade that shifts one
of them fails HERE, by name, instead of as fifty opaque value-hash
mismatches in the next driver round. If an assertion fires after an
upgrade: the divergence changed, go fix/simplify the oracles that guard
against it (grep oracles.py for the guard named in the message), then
re-pin the new behavior here.
"""

from __future__ import annotations

import duckdb


def _duck(sql: str):
    return duckdb.sql(sql).fetchone()[0]


def _spark1(spark, expr_sql: str):
    return spark.sql(f"SELECT {expr_sql}").collect()[0][0]


def test_negative_zero_round_asymmetry(spark):
    """Spark round() goes through BigDecimal and emits +0.0 for tiny
    negatives; DuckDB round() keeps IEEE -0.0. Guard in oracles: append
    `+ 0e0` to signed DuckDB round() columns (r04 note)."""
    s = _spark1(spark, "round(-1e-9, 6)")
    d = _duck("SELECT round(-1e-9, 6)")
    assert str(s) == "0.0", f"Spark now keeps -0.0 from round(): {s!r}"
    assert str(d) == "-0.0", f"DuckDB round() no longer emits -0.0: {d!r}"
    assert str(_duck("SELECT round(-1e-9, 6) + 0e0")) == "0.0", \
        "the `+ 0e0` guard stopped normalizing -0.0"


def test_floor_form_rounding_is_engine_identical(spark):
    """floor(x*1e6 + 0.5)/1e6 is the sanctioned cross-engine rounding for
    derived doubles (pure IEEE ops, bit-identical both sides) — including
    a repeating-decimal tie where round(x, 6) is allowed to diverge."""
    for x in ("0.1234565", "2.9999995", "0.3333335"):
        s = _spark1(spark, f"floor({x}e0 * 1e6 + 0.5) / 1e6")
        d = _duck(f"SELECT floor({x}e0 * 1e6 + 0.5) / 1e6")
        assert s == d, f"floor-form rounding diverged on {x}: {s} vs {d}"


def test_duckdb_integer_sums_promote_to_hugeint():
    """DuckDB sum(BIGINT) — plain and windowed — promotes to HUGEINT,
    which the driver's type-sensitive hash reds against Spark's BIGINT.
    Guard: CAST(sum(...) AS BIGINT) in every oracle (r04 note; enforced
    statically by test_no_oracle_emits_hugeint_or_decimal)."""
    rel = duckdb.sql("SELECT sum(x) FROM (SELECT CAST(1 AS BIGINT) x)")
    assert rel.types[0].id == "hugeint", f"plain sum now {rel.types[0]}"
    relw = duckdb.sql(
        "SELECT sum(x) OVER () FROM (SELECT CAST(1 AS BIGINT) x)"
    )
    assert relw.types[0].id == "hugeint", f"windowed sum now {relw.types[0]}"
    relc = duckdb.sql(
        "SELECT CAST(sum(x) AS BIGINT) FROM (SELECT CAST(1 AS BIGINT) x)"
    )
    assert relc.types[0].id == "bigint"


def test_regex_dollar_anchor_trailing_newline(spark):
    """Java regex (Spark) matches `$` before a trailing newline; RE2
    (DuckDB) does not. Guard: never $-anchor free text in an oracle pair
    (r04 audit rule; advdata carries trailing-newline docs since r06)."""
    s = _spark1(spark, r"'abc' || chr(10) rlike 'c$'")
    d = _duck(r"SELECT regexp_matches('abc' || chr(10), 'c$')")
    assert s is True, "Spark $ no longer matches before trailing newline"
    assert d is False, "DuckDB $ now matches before trailing newline"


def test_unicode_full_case_mapping_divergence(spark):
    """Spark applies full Unicode case mapping (upper('ß')='SS',
    lower('İ') gains a combining dot); DuckDB maps 1:1. Guard: oracle
    pairs never case-map text containing these classes (r04 audit,
    pinned vintage invariant)."""
    assert _spark1(spark, "upper('ß')") == "SS"  # full mapping: 1 char -> 2
    assert _duck("SELECT upper('ß')") == "ẞ"  # simple 1:1 (U+1E9E)
    assert len(_spark1(spark, "lower('İ')")) == 2  # i + combining dot
    assert len(_duck("SELECT lower('İ')")) == 1


def test_length_codepoints_agree_graphemes_exist(spark):
    """Plain length() counts CODE POINTS on both engines (probed r08 —
    combining-mark 'e' + U+0301 is 2 on both; the r04 note's grapheme
    claim applies to DuckDB's length_grapheme(), not length()). Pin the
    agreement: an engine switching length() to grapheme clusters reds
    every length-derived oracle, and this fails first, by name."""
    s = _spark1(spark, "length('e' || chr(769))")
    d = _duck("SELECT length('e' || chr(769))")
    assert s == 2, f"Spark length() no longer counts code points: {s}"
    assert d == 2, f"DuckDB length() no longer counts code points: {d}"
    assert _duck("SELECT length_grapheme('e' || chr(769))") == 1


def test_double_to_bigint_cast_truncates_vs_rounds(spark):
    """Spark CAST(double AS BIGINT) truncates toward zero; DuckDB rounds.
    Guard: floor() before casting in oracle-mirrored expressions (r01)."""
    assert _spark1(spark, "cast(2.7e0 as bigint)") == 2
    assert _duck("SELECT CAST(2.7e0 AS BIGINT)") == 3
    assert _spark1(spark, "cast(floor(2.7e0) as bigint)") == 2
    assert _duck("SELECT CAST(floor(2.7e0) AS BIGINT)") == 2


def test_spark_decimal_literal_parsing(spark):
    """Spark SQL parses `100.0` as DECIMAL (DuckDB too, but Spark's
    DecimalType then infects arithmetic and hash-mismatches): shared SQL
    strings must spell float literals as `100e0` (r01 note)."""
    assert _spark1(spark, "typeof(100.0)").startswith("decimal")
    assert _spark1(spark, "typeof(100e0)") == "double"


def test_window_null_ordering_defaults(spark):
    """ASC window/order defaults: Spark = NULLS FIRST, DuckDB = NULLS
    LAST. Guard: no catalog window orders a nullable column (r04 audit);
    pin NULLS FIRST/LAST explicitly on both sides otherwise."""
    s = spark.sql(
        "SELECT x FROM VALUES (1), (NULL), (2) t(x) ORDER BY x"
    ).collect()
    assert s[0][0] is None, "Spark ASC no longer sorts NULLS FIRST"
    d = duckdb.sql(
        "SELECT x FROM (VALUES (1), (NULL), (2)) t(x) ORDER BY x"
    ).fetchall()
    assert d[-1][0] is None, "DuckDB ASC no longer sorts NULLS LAST"


def test_collect_list_drops_nulls_duckdb_list_keeps(spark):
    """Spark collect_list drops NULL elements; DuckDB list() keeps them.
    Guard: `value IS NOT NULL` on BOTH sides of any collected-list pair
    (r04 advdata fix, q_ewma / q_window_median)."""
    s = _spark1(spark, "size(collect_list(x)) FROM VALUES (1), (CAST(NULL AS INT)) t(x)")
    assert s == 1, f"Spark collect_list now keeps NULLs: size={s}"
    d = _duck("SELECT len(list(x)) FROM (VALUES (1), (NULL)) t(x)")
    assert d == 2, f"DuckDB list() now drops NULLs: len={d}"


def test_base64_mime_chunking(spark):
    """Spark base64() emits MIME-chunked output (newline every 76 chars);
    DuckDB to_base64 emits one line. Guard: fingerprint file bytes with
    hex(), never base64, in oracle pairs (r05 file-ingest note)."""
    s = _spark1(spark, f"base64(cast('{'a' * 100}' as binary))")
    d = _duck(f"SELECT to_base64(encode('{'a' * 100}'))")
    assert "\r\n" in s, "Spark base64 no longer MIME-chunks (oracles could simplify)"
    assert "\n" not in d
    assert s.replace("\r\n", "") == d  # same encoding modulo chunking


def test_nonansi_division_by_zero_is_null_on_both(spark):
    """Double division by zero: NULL on both engines (Spark non-ANSI `/`
    matches DuckDB) — the r05 empty-text probe's covered class. The
    driver runs ANSI-ON where x/0 THROWS; engine code therefore never
    divides without a zero guard, and this pins the tuned-session
    behavior tests rely on."""
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert _spark1(spark, "1e0 / 0e0") is None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)
    assert _duck("SELECT 1e0 / 0e0") is None


def test_integer_div_operator_parity(spark):
    """Spark `div` ≡ DuckDB `//` on integers (the sanctioned shared
    integer division); floor(a/b) on doubles is NOT sanctioned (r02)."""
    for a, b in ((7, 2), (-7, 2), (7, -2), (-7, -2)):
        s = _spark1(spark, f"{a} div {b}")
        d = _duck(f"SELECT {a} // {b}")
        assert s == d, f"{a} div {b}: Spark {s} vs DuckDB {d}"
