"""JDBC scan/sink (S10/S11) exercised for real against embedded Derby.

The reference's serving store is RDS Postgres (PGWrapper scan
query_testing.ipynb:51-95; per-row executemany load pipeline .py:870-885).
No Postgres exists in this container, but Spark ships Derby for the Hive
metastore — an embedded in-memory Derby database gives the JDBC code path a
real round trip: Spark's batched writer replaces the reference's row loop,
and the partitioned read replaces its single-cursor scan. local[*] is one
JVM, so every executor thread sees the same in-memory database.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineering_londonhousingmap_spark.sources.io import read_jdbc, write_jdbc

URL = "jdbc:derby:memory:graftdb;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def region(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def test_jdbc_roundtrip(spark, region):
    """write_jdbc (batched INSERT, the executemany replacement) then
    read_jdbc returns the same rows."""
    write_jdbc(region, URL, "region_rt", mode="overwrite", properties=PROPS)
    back = read_jdbc(spark, URL, "region_rt", properties=PROPS)
    assert sorted(back.columns) == sorted(region.columns)
    got = {(r.r_regionkey, r.r_name) for r in back.collect()}
    want = {(r.r_regionkey, r.r_name) for r in region.collect()}
    assert got == want


def test_jdbc_partitioned_read(spark, sf_dir):
    """S11's scale feature: numPartitions parallel range scans instead of
    the reference's single cursor — row-identical to the plain read."""
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_totalprice")
    )
    write_jdbc(orders, URL, "orders_part", mode="overwrite", properties=PROPS)
    plain = read_jdbc(spark, URL, "orders_part", properties=PROPS)
    parted = read_jdbc(
        spark,
        URL,
        "orders_part",
        properties=PROPS,
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=500,
        num_partitions=4,
    )
    assert parted.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, parted.collect())) == sorted(map(tuple, plain.collect()))


def test_jdbc_append_accumulates(spark, region):
    """mode='append' adds rows (the reference's monthly reload semantics
    use overwrite; append is the incremental path)."""
    write_jdbc(region, URL, "region_app", mode="overwrite", properties=PROPS)
    write_jdbc(region, URL, "region_app", mode="append", properties=PROPS)
    n = read_jdbc(spark, URL, "region_app", properties=PROPS).count()
    assert n == 2 * region.count()
