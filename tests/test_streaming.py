"""Structured Streaming behavior tests beyond the oracle gate: late-data
watermark semantics and stateful dedup, driven through the real streaming
engine with rate-limited file micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dataengineering_londonhousingmap_spark.queries import STAGE_DIR
from dataengineering_londonhousingmap_spark.streaming.incremental import (
    dedup_stream,
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
)

SF = "/root/testdata/sf0.001"


def test_hourly_rollup_matches_batch(spark):
    stream_out = run_stream_to_memory(
        hourly_rollup_stream(read_events_stream(spark, SF)),
        "t_hourly", "complete",
    ).orderBy("hour", "event_type")
    from dataengineering_londonhousingmap_spark.sources.io import read_testdata

    batch = (
        read_testdata(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"), F.count("*").alias("n"))
        .orderBy("hour", "event_type")
    )
    assert [r.asDict() for r in stream_out.collect()] == [r.asDict() for r in batch.collect()]


def test_dedup_stream_drops_within_watermark_duplicates(spark, tmp_path):
    """Feed two micro-batch files where the second re-delivers half of the
    first (the reference's retry double-insert scenario) — the stateful
    dedup must emit each event_id once."""
    src = os.path.join(STAGE_DIR, "stream_dedup_src")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)

    base = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.lit(1704067200000000) + F.col("id") * 60_000_000).alias("ts_us"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
        F.lit("{}").alias("props"),
    )
    batch1 = base.filter("event_id < 60")
    redelivery = base.filter("event_id >= 30")  # 30-59 are duplicates
    batch1.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    redelivery.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )
    out = run_stream_to_memory(
        dedup_stream(stream, watermark="10 hours").select("event_id"),
        "t_dedup", "append",
    )
    ids = [r.event_id for r in out.collect()]
    assert sorted(ids) == list(range(100)), "each event_id exactly once"


def test_rollup_is_incremental_not_recompute(spark):
    """Append mode + watermark: windows older than the watermark horizon
    finalize and their state is dropped — verify the stream runs in append
    mode at all (guards against accidental complete-mode-only operators)."""
    events = read_events_stream(spark, SF)
    q = (
        hourly_rollup_stream(events, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("t_append_ok")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # finite input: all-but-last windows are final under append semantics;
    # memory table exists and the query ran without AnalysisException
    assert spark.table("t_append_ok").columns == ["hour", "event_type", "avg_value", "n"]
