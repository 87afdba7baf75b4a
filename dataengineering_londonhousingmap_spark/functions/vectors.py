"""Vector math over ``array<float>`` embedding columns — pure higher-order
Catalyst expressions (``zip_with``/``aggregate``), no UDF, no Python.

Used by the similarity-search operators. At 100 TB these expressions run
inside whole-stage codegen against the Parquet-scanned arrays; the pandas-UDF
variant in ``operators/similarity.py`` exists only as the batched fallback
for when a real BLAS matmul wins (very high dimensionality × high k).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold (deterministic accumulation order —
    required for oracle-exact float comparison)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) with zero-vector guard (NULL, matching DuckDB's NaN-avoid)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
