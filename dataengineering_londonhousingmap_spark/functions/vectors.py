"""Vector math over ``array<float>`` embedding columns — pure higher-order
Catalyst expressions (``zip_with``/``aggregate``), no UDF, no Python.

Used by the similarity-search operators. At 100 TB these expressions run
inside whole-stage codegen against the Parquet-scanned arrays; the pandas-UDF
variant in ``operators/similarity.py`` exists only as the batched fallback
for when a real BLAS matmul wins (very high dimensionality × high k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def cosine_similarity_batched(a: Column, b: Column) -> Column:
    """Vectorized cosine via an Arrow-batched pandas UDF — one numpy matmul
    per batch instead of 3×dim interpreted lambda evals per row.

    Use on the hot approximate paths (candidate verify, ANN rerank) where
    millions of pairs flow through. numpy's pairwise summation differs from
    the sequential fold in the last ulps, so oracle-exact queries keep
    :func:`cosine_similarity`; everything else should prefer this.
    """
    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", A, B)
        denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        out = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), np.nan)
        return pd.Series(out)

    return _cos(a, b)
