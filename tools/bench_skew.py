#!/usr/bin/env python
"""Skew-vintage bench lane (VERDICT r05 item 6).

The headline bench runs on uniform TPC-H-ish data, so AQE skew handling
has no committed numbers. This lane stages a HOT-KEY copy of sf0.1 into
`.skewbench/` and times the 6 skew-sensitive queries on both vintages:

* lineitem: every third row's l_suppkey collapses onto the minimum
  supplier key (hot join/aggregate key for q_join_salted, q_skew_report).
* documents.source: 80% of documents collapse onto the lexicographically
  first source (mega-domain for q_domain_cap, q_heavy_hitters).
* documents.text: doc_id % 11 == 7 copies the text of doc_id - 7
  (duplicate stacks -> hot minhash band-hash keys for q_dedup_minhash).
* customer passes through: q_join_nn_gridded's coordinates derive from
  c_custkey % 100, so deep identical-coordinate stacks exist on BOTH
  vintages by construction — its ratio isolates the non-coordinate cost.

Row counts and FK closure are unchanged (hot values are existing keys),
so plans shift (AQE splits, broadcast decisions, salting spread) while
workloads stay comparable. Values are known-correct under skew — the
full catalog is driver_sim-green on .advdata_skew — this lane commits
the TIMINGS.

Usage:  python tools/bench_skew.py          # writes BENCH_SKEW.json
        python tools/bench_skew.py --regen  # re-stage .skewbench/ first

Run on a quiet host (no concurrent pytest/driver_sim) — shared-host
timing noise is +-50% per the verify notes; best-of-2 with a third rep
on >30% disagreement, same methodology as bench.py.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(ROOT, ".skewbench")

SKEW_QUERIES = [
    "q_join_salted",
    "q_domain_cap",
    "q_skew_report",
    "q_join_nn_gridded",
    "q_dedup_minhash",
    "q_heavy_hitters",
]

PASSTHROUGH = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "events", "embeddings",
]


def stage() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN l_orderkey % 3 = 0
                     THEN (SELECT min(s_suppkey) FROM '{SRC}/supplier.parquet')
                     ELSE l_suppkey END AS l_suppkey
            )
            FROM '{SRC}/lineitem.parquet'
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT d.* REPLACE (
                CASE WHEN d.doc_id % 5 > 0
                     THEN (SELECT min(source) FROM '{SRC}/documents.parquet')
                     ELSE d.source END AS source,
                coalesce(dup.text, d.text) AS text,
                coalesce(dup.n_chars, d.n_chars) AS n_chars
            )
            FROM '{SRC}/documents.parquet' d
            LEFT JOIN '{SRC}/documents.parquet' dup
              ON d.doc_id % 11 = 7 AND dup.doc_id = d.doc_id - 7
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    marker = os.path.join(DST, "_STAGED")
    with open(marker, "w") as f:
        f.write("ok")


def _time_query(qfn, spark, sf_dir: str) -> float:
    runs: list[float] = []
    for _ in range(2):
        t0 = time.time()
        qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    if min(runs) > 0.3 and max(runs) > 1.3 * min(runs):
        t0 = time.time()
        qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    gc.collect()
    return round(min(runs), 3)


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(os.path.join(DST, "_STAGED")):
        stage()

    from dataengineering_londonhousingmap_spark.queries import QUERIES
    from dataengineering_londonhousingmap_spark.session import get_session

    spark = get_session("dataengineering_londonhousingmap-bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_scan_parquet"](spark, SRC).write.format("noop").mode("overwrite").save()

    uniform: dict[str, float] = {}
    skewed: dict[str, float] = {}
    for name in SKEW_QUERIES:
        uniform[name] = _time_query(QUERIES[name], spark, SRC)
        skewed[name] = _time_query(QUERIES[name], spark, DST)

    out = {
        "metric": "skew_vintage_vs_uniform",
        "unit": "sec",
        "sf": 0.1,
        "uniform": uniform,
        "skewed": skewed,
        "ratio": {
            n: round(skewed[n] / uniform[n], 2) if uniform[n] else None
            for n in SKEW_QUERIES
        },
        "methodology": (
            "best-of-2 warm (3rd rep when runs disagree >30%), noop sink, "
            "shared session, per-query gc (untimed); .skewbench = sf0.1 with "
            "hot l_suppkey (1/3 of lineitem), mega-domain source (80% of "
            "documents), duplicate-text stacks (doc_id%11==7); values "
            "under skew are driver_sim-verified on .advdata_skew"
        ),
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(ROOT, "BENCH_SKEW.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
