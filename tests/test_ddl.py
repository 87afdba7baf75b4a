"""S9 catalog DDL bootstrap: reference database_schema.sql:2-66 semantics —
facts drop-and-reload, dims survive, partitioned air_quality prunes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineering_londonhousingmap_spark.sources.ddl import (
    DIM_TABLES,
    FACT_TABLES,
    bootstrap_schema,
    load_fact,
)

DB = "test_schema_housing"


@pytest.fixture()
def db(spark):
    yield DB
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def test_bootstrap_creates_all_six_tables(spark, db):
    bootstrap_schema(spark, database=db)
    # listTables also returns session temp views (e.g. memory-sink tables
    # leaked by streaming tests in the shared session) — filter to managed
    tables = {
        t.name for t in spark.catalog.listTables(db) if t.tableType != "TEMPORARY"
    }
    assert tables == set(FACT_TABLES) | set(DIM_TABLES)


def test_bootstrap_is_idempotent_facts_reset_dims_survive(spark, db):
    bootstrap_schema(spark, database=db)
    # a dim row survives re-bootstrap (CREATE IF NOT EXISTS, .py:88)
    spark.sql(
        f"INSERT INTO {db}.tube_site_mapping VALUES ('Angel', 'IS2')"
    )
    # a fact row does NOT (DROP + CREATE = truncate-and-reload, .py:59)
    spark.sql(
        f"INSERT INTO {db}.air_quality VALUES "
        "('IS2', TIMESTAMP '2024-03-01 10:00:00', 'NO2', 41.5, DATE '2024-03-01')"
    )
    bootstrap_schema(spark, database=db)
    assert spark.table(f"{db}.tube_site_mapping").count() == 1
    assert spark.table(f"{db}.air_quality").count() == 0


def test_load_fact_partitions_and_prunes(spark, db):
    bootstrap_schema(spark, database=db)
    rows = spark.createDataFrame(
        [
            ("IS2", "2024-03-01 10:00:00", "NO2", 41.5),
            ("IS2", "2024-03-02 11:00:00", "NO2", 39.0),
            ("CT3", "2024-03-02 12:00:00", "PM25", 11.0),
        ],
        "site_code string, measurement_date_gmt string, species_code string, value double",
    ).withColumn("measurement_date_gmt", F.to_timestamp("measurement_date_gmt"))
    load_fact(rows, "air_quality", database=db)
    tbl = spark.table(f"{db}.air_quality")
    assert tbl.count() == 3
    # date-bounded read prunes partitions (PartitionFilters in the plan)
    import contextlib
    import io

    pruned = tbl.filter(F.col("measurement_date") == "2024-03-02")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert "measurement_date" in buf.getvalue()
    assert pruned.count() == 2


def test_load_fact_dynamic_overwrite_keeps_other_days(spark, db):
    """Re-loading one day replaces that day only — strictly better than the
    reference's whole-table reload."""
    bootstrap_schema(spark, database=db)
    day1 = spark.createDataFrame(
        [("IS2", "2024-03-01 10:00:00", "NO2", 41.5)],
        "site_code string, measurement_date_gmt string, species_code string, value double",
    ).withColumn("measurement_date_gmt", F.to_timestamp("measurement_date_gmt"))
    day2 = spark.createDataFrame(
        [("IS2", "2024-03-02 10:00:00", "NO2", 50.0)],
        "site_code string, measurement_date_gmt string, species_code string, value double",
    ).withColumn("measurement_date_gmt", F.to_timestamp("measurement_date_gmt"))
    load_fact(day1, "air_quality", database=db)
    load_fact(day2, "air_quality", database=db)
    got = {
        (r.site_code, str(r.measurement_date), r.value)
        for r in spark.table(f"{db}.air_quality").collect()
    }
    assert got == {
        ("IS2", "2024-03-01", 41.5),
        ("IS2", "2024-03-02", 50.0),
    }
