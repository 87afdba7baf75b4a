"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, compares row count,
column names/types, and order-insensitive values — the same gate the driver
applies at sf0.01, runnable at sf0.001 for fast iteration.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(lambda v: "NaN" if v is None or (isinstance(v, float) and math.isnan(v)) else f"{v:.9g}")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _duck_type_family(t: str) -> str:
    """Map a DuckDB result type to a comparison family.

    HUGEINT/UHUGEINT/DECIMAL are kept as their own families: the driver's
    value hash is type-sensitive, and a DuckDB window-sum that promotes to
    HUGEINT will red a row even when values equal Spark's BIGINT output
    (the r02/r03 q_pack_sequences failure class).
    """
    t = t.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    # Integer WIDTHS are distinct families: the driver's hash is
    # type-sensitive, so an oracle emitting INTEGER where Spark emits
    # BIGINT is the same latent failure class as the HUGEINT r02/r03 red,
    # one tier down. Unsigned widths are their own families too (pandas
    # renders them as uint dtypes, Spark has no unsigned type at all).
    if t in ("TINYINT", "UTINYINT"):
        return "int8" if t == "TINYINT" else "uint8"
    if t in ("SMALLINT", "USMALLINT"):
        return "int16" if t == "SMALLINT" else "uint16"
    if t in ("INTEGER", "UINTEGER"):
        return "int32" if t == "INTEGER" else "uint32"
    if t in ("BIGINT", "UBIGINT"):
        return "int64" if t == "BIGINT" else "uint64"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "datetime"
    if t == "BLOB":
        return "binary"
    return "complex"


def _spark_type_family(t: str) -> str:
    t = t.lower()
    if t == "tinyint":
        return "int8"
    if t == "smallint":
        return "int16"
    if t == "int":
        return "int32"
    if t in ("bigint", "long"):
        return "int64"
    if t in ("float", "double"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t.startswith("timestamp") or t == "date":
        return "datetime"
    if t == "binary":
        return "binary"
    if t.startswith("decimal"):
        return "decimal"
    return "complex"


def type_strict_check(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    """Fail on type-FAMILY mismatches between the oracle and the Spark result.

    Stricter than value canonicalization: catches HUGEINT/DECIMAL oracle
    columns that fetchdf() silently renders identically to Spark's int64.
    """
    rel = con.sql(sql)
    duck = {c: _duck_type_family(str(t)) for c, t in zip(rel.columns, rel.types)}
    spark = {c: _spark_type_family(t) for c, t in spark_df.dtypes}
    bad = []
    for c in sorted(set(duck) & set(spark)):
        if duck[c] != spark[c]:
            bad.append(f"{c}: duck={duck[c]} spark={spark[c]}")
    if bad:
        return False, "type-family mismatch: " + "; ".join(bad)
    return True, "ok"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns differ: spark={sorted(got.columns)} duck={sorted(want.columns)}"
    ok, msg = type_strict_check(spark_df, con, sql)
    if not ok:
        return False, msg
    if len(got) != len(want):
        return False, f"row count differs: spark={len(got)} duck={len(want)}"
    g, w = _canon(got), _canon(want)
    if not g.equals(w):
        diff_mask = (g != w).any(axis=1)
        sample = pd.concat(
            [g[diff_mask].head(3).add_prefix("spark_"), w[diff_mask].head(3).add_prefix("duck_")],
            axis=1,
        )
        return False, f"values differ on {int(diff_mask.sum())} rows; sample:\n{sample}"
    return True, "ok"
