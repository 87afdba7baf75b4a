"""Similarity search over embedding columns (``array<float>``).

Two physical shapes:

* :func:`ann_topk_bruteforce` — exact top-k by cosine: corpus ⨯ broadcast
  query set, higher-order-function dot products (all JVM-side), per-query
  window rank. Exact; scan cost O(corpus × queries). The correctness
  baseline, and the right plan whenever queries are few (the broadcast side)
  — at 100 TB the corpus scan is embarrassingly parallel and never shuffles
  the big side.
* :func:`ann_topk_lsh` — random-hyperplane LSH: corpus and queries bucketed
  by a sign-bit sketch; candidates limited to same-bucket (with multi-probe
  by flipping each bit); exact rerank inside buckets. Turns the all-pairs
  scan into an equi-join on bucket id. Approximate: recall < 1 by design
  (the driver records rows-only checks for it; the bruteforce variant is the
  oracle-exact one).

Projection vectors for LSH are derived deterministically from md5 bytes — no
RNG, reproducible across engines and runs.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


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
    joined = corpus.crossJoin(q).filter(F.col(id_col) != F.col("query_id"))
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


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: equi-join corpus and queries on the
    hyperplane-sign bucket, exact rerank within candidates.

    ``multiprobe`` also probes the ``num_planes`` buckets at Hamming
    distance 1 from the query's bucket (recall boost with bounded fanout —
    the standard trade at scale; candidate volume ≈ (1+P)/2^P of corpus).
    """
    planes = [_hyperplane(j, dim) for j in range(num_planes)]
    bucket = _bucket_expr(vec_col, planes)
    c = corpus.select(F.col(id_col), F.col(vec_col)).withColumn("__bucket", bucket)

    qbase = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qvec")
    ).withColumn("__qb", _bucket_expr("__qvec", planes))
    if multiprobe:
        probes = F.array(
            F.col("__qb"),
            *[
                F.col("__qb").bitwiseXOR(F.lit(2**j).cast("long"))
                for j in range(num_planes)
            ],
        )
        q = qbase.select("query_id", "__qvec", F.explode(probes).alias("__bucket"))
    else:
        q = qbase.withColumnRenamed("__qb", "__bucket")

    joined = c.join(q, "__bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("match_id"),
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    ).dropDuplicates(["query_id", "match_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
