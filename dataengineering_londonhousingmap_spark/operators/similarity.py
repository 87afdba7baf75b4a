"""Similarity search over embedding columns (``array<float>``).

Two physical shapes:

* :func:`ann_topk_bruteforce` — exact top-k by cosine: corpus ⨯ broadcast
  query set, higher-order-function dot products (all JVM-side), per-query
  window rank. Exact; scan cost O(corpus × queries). The correctness
  baseline, and the right plan whenever queries are few (the broadcast side)
  — at 100 TB the corpus scan is embarrassingly parallel and never shuffles
  the big side.
* :func:`ann_topk_lsh` — multi-table random-hyperplane LSH: L independent
  tables of k sign bits each; candidates = union over tables of same-bucket
  pairs (OR-amplification: recall ≈ 1-(1-p^k)^L where p is the per-plane
  collision probability); exact rerank over candidates. Turns the all-pairs
  scan into an equi-join on (table, bucket). Approximate: recall < 1 by
  design (the driver records rows-only checks for it; the bruteforce
  variant is the oracle-exact one). k trades candidate volume against
  recall; L buys recall back at linear cost — at 100 TB you tune k to the
  corpus's angular clustering and keep L modest.

Projection vectors for LSH are derived deterministically from md5 bytes — no
RNG, reproducible across engines and runs.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from .util import fan_out


def _query_frame(spark_df: DataFrame, queries: DataFrame, query_id: str, query_vec: str) -> DataFrame:
    return queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qvec")
    )


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Returns
    (query_id, match_id, cosine, rank); ties broken by match_id ascending
    (deterministic — required for oracle-exact comparison)."""
    q = F.broadcast(_query_frame(corpus, queries, query_id, query_vec))
    # |corpus|×|queries| dot products happen before the first shuffle —
    # spread a narrow corpus scan across cores first
    joined = fan_out(corpus).crossJoin(q).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        F.col("query_id"),
        F.col(id_col).alias("match_id"),
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from md5 bytes."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane{plane}|{i}".encode()).digest()
        for off in range(0, 16, 2):
            u = int.from_bytes(h[off : off + 2], "big") / 65535.0  # [0,1]
            vals.append(2.0 * u - 1.0)
            if len(vals) == dim:
                break
        i += 1
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-bit sketch of a vector column against fixed hyperplanes, as a
    single long — pure expressions, evaluated in codegen."""
    bits = []
    for j, p in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _table_buckets(vec_col: str, num_tables: int, planes_per_table: int, dim: int):
    """Array of (table_id, bucket) structs — one sketch per hash table,
    planes seeded independently per table."""
    entries = []
    for t in range(num_tables):
        planes = [
            _hyperplane(t * 1000 + j, dim) for j in range(planes_per_table)
        ]
        entries.append(
            F.struct(
                F.lit(t).alias("t"), _bucket_expr(vec_col, planes).alias("b")
            )
        )
    return F.array(*entries)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 8,
    planes_per_table: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: explode both sides into per-table buckets,
    equi-join on (table, bucket), exact rerank over the deduped candidate
    union. Expected recall for per-plane collision prob p:
    1 - (1 - p^planes_per_table)^num_tables.
    """
    tb = _table_buckets(vec_col, num_tables, planes_per_table, dim)
    c = (
        # the sketch evaluates num_tables×planes dot products per row
        # before the bucket join shuffles — parallelize a narrow scan first
        fan_out(corpus).select(F.col(id_col), F.col(vec_col))
        .select(F.col(id_col), F.col(vec_col), F.explode(tb).alias("__tb"))
    )
    qtb = _table_buckets("__qvec", num_tables, planes_per_table, dim)
    q = (
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qvec"))
        .select("query_id", "__qvec", F.explode(qtb).alias("__tb"))
    )
    joined = c.join(q, "__tb").filter(F.col(id_col) != F.col("query_id"))
    scored = (
        joined.select("query_id", F.col(id_col).alias("match_id"), "__qvec", F.col(vec_col))
        .dropDuplicates(["query_id", "match_id"])
        .select(
            "query_id",
            "match_id",
            cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
