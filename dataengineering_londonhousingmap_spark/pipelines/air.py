"""Air-quality pipeline — LondonAir ingest, rollup, and the station↔sensor
nearest-neighbour mapping.

Reference: nested-JSON pull + flatten (pipeline .py:712-765), hourly rows
into ``air_quality`` (database_schema.sql:45-51), offline NN mapping
notebook (MAP:46-79). The batch path here is the backfill; the streaming
path (streaming/incremental.py) is the continuous form of the same rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import nearest_join
from ..operators.util import exact_avg_cents
from ..operators.reshape import flatten_londonair_payload


def ingest_air_payloads(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """S3/R4: raw API payload strings → typed hourly air_quality rows
    (empty measurement values coerced to 0, .py:747)."""
    return flatten_londonair_payload(payloads, json_col)


def hourly_air_rollup(air: DataFrame) -> DataFrame:
    """A4: per site/species hourly mean. Partition-pruning layout note: the
    air_quality table is written partitioned by measurement date, so a
    day-window serving query scans one partition, not the history."""
    return (
        air.groupBy(
            "site_code",
            "species_code",
            F.date_trunc("hour", "measurement_date_gmt").alias("hour"),
        )
        # exact average over the ''→0-coerced 2-decimal measures
        .agg(exact_avg_cents("value").alias("avg_value"), F.count("*").alias("n"))
    )


def map_stations_to_sites(stations: DataFrame, sites: DataFrame) -> DataFrame:
    """J3: the tube_site_mapping build — for each station the L1-nearest
    sensor site (MAP:46-79), as broadcast-cross + window (≈650×≈100 rows;
    the gridded variant in operators.joins is the scale path)."""
    sites_r = sites.select(
        F.col("site_code"),
        F.col("latitude").alias("site_lat"),
        F.col("longitude").alias("site_lon"),
    )
    out = nearest_join(
        stations,
        sites_r,
        distance=lambda l, r: F.abs(l["latitude"] - r["site_lat"])
        + F.abs(l["longitude"] - r["site_lon"]),
        left_key="subway_station",
        tiebreak=["site_code"],
    )
    return out.select("subway_station", "site_code")
