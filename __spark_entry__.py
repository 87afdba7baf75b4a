"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dataengineering_londonhousingmap_spark/`` (queries.py holds the
catalog, oracles.py the DuckDB twins); this module is just the wiring.

Ordering contract: three oracles (``q_manifest``, ``q_compact_plan``,
``q_prune_report``) verify Parquet *footer* statistics, so their SQL reads
the very files the matching query stages under ``.stage/p<pid>/`` — run the
Spark query before its oracle (the driver's query-then-oracle evaluation
already satisfies this). All other oracles are standalone against the
sf-dir parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1): the serving metric — average price
    per dimension key with counts — as the star join over sf0.001.

    Isomorphic to the reference's README.md:4 query ("average housing price
    of properties within 1 km of a station"): fact → broadcast dims →
    groupBy → avg/count.
    """
    sf_dir = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("n_listings"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Query catalog — one entry per implemented SURVEY.md §2 operator."""
    from dataengineering_londonhousingmap_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omissions = rows-only checks for
    genuinely non-SQL-expressible or approximate operators)."""
    from dataengineering_londonhousingmap_spark.oracles import ORACLES

    return dict(ORACLES)
