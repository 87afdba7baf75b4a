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


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns differ: spark={sorted(got.columns)} duck={sorted(want.columns)}"
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
