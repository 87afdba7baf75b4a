"""Incremental ingest via Structured Streaming (SURVEY.md §2.9).

The reference has no streaming: its air-quality pipeline re-extracts a
sliding 1-day window on an @monthly DAG and drop-and-reloads the fact table
(pipeline .py:773-779, .py:59). This module is the engine's upgrade — the
same logical capability (a continuously maintained hourly pollution rollup)
as an actual incremental pipeline:

* event-time **watermark** bounds late sensor data (the reference's only
  late-data story was coercing empty values to 0, .py:747);
* **windowed aggregation** mirrors the A4 rollup (per site/species hourly
  mean);
* **dropDuplicatesWithinWatermark** gives rerun idempotence the reference
  lacks (its loads double-insert on retry).

At scale this runs against a file/Kafka source with checkpointing; state
store size is bounded by the watermark horizon × key cardinality — both
knobs explicit below. Tests drive finite parquet data through the real
streaming engine with a memory sink (processAllAvailable = synchronous
completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet carries nanosecond timestamps (unreadable as TimestampType
# by Spark's parquet reader) — stream reads them as long and rebuilds µs
EVENTS_RAW_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns since epoch
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one file = one micro-batch
    locally; a directory of arriving files / Kafka topic in production)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_NANOS)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """A4 as a stream: tumbling 1-hour windows per event_type with a
    watermark bounding state (§2.9: the air_quality hourly rollup shape,
    keyed by (site_code, species_code) in the domain pipeline)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"), F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "avg_value", "n")
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful dedup on event id within the watermark horizon — the rerun-
    idempotence operator (replaces the reference's double-insert-on-retry).
    State is dropped once the watermark passes (bounded memory)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str,
) -> DataFrame:
    """Drive a finite streaming DataFrame to completion against a memory
    sink and return the materialized result (test/driver harness — a real
    deployment writes to a partitioned Parquet/Delta sink with a
    checkpointLocation instead)."""
    spark = df.sparkSession
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.table(name)
