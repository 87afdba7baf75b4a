"""SparkSession builders tuned for this engine.

Two profiles:

* :func:`get_session` — local[N] test/bench profile. Shuffle partitions sized
  to cores (the default 200 over-parallelizes small local runs), AQE on so
  runtime statistics re-plan joins/partitions, Arrow on for any pandas-UDF
  escape hatches.
* :func:`cluster_conf` — the conf dict a 1000-executor deployment would use;
  documented here so the scale story is explicit even though tests run local.

Design notes for 100 TB (SURVEY.md §4.3):
  - AQE handles skew-join splitting and post-shuffle coalescing at runtime;
    we declare plans and let it re-plan with real sizes.
  - ``spark.sql.files.maxPartitionBytes`` at 128 MiB gives ~800k input splits
    for 100 TB — fine for 1000 executors × 5 cores.
  - Broadcast threshold stays conservative (64 MiB): dimension tables in this
    workload (stations/sites/name-mappings ≈ thousands of rows) are all far
    below it, while fact-fact joins fall through to sort-merge + AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Respect the driver's CPU budget; local[32] with 32 shuffle partitions keeps
# one post-shuffle task per core with no scheduling waves on test data.
_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(app_name: str = "dataengineering_londonhousingmap_spark", cpus: str | int | None = None) -> SparkSession:
    """Local test/bench session. Idempotent (getOrCreate)."""
    cpus = str(cpus or _CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # one post-shuffle partition per core locally; AQE coalesces further
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the pandas-UDF escape hatches (similarity, multimodal)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # oracle comparisons (DuckDB is UTC-naive) require a pinned zone
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI off to match the reference's lenient arithmetic; the cleaning
        # library itself is try_cast-based so malformed→NULL semantics hold
        # under EITHER mode (the driver's vanilla session runs Spark 4's
        # ANSI-on default — verified by the test suite's ANSI session)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # PySpark 4's DataFrame-debugging hook wraps EVERY DataFrame/Column
        # API call with a conf-get RPC plus origin set/clear RPCs plus a
        # Python stack walk (pyspark/errors/utils.py:_with_origin) — ~3
        # extra py4j round-trips per call, only to enrich error messages
        # with Python call sites. On expression-dense plans that is the
        # dominant CONSTRUCTION cost (q_dedup_simhash builds ~192 Columns:
        # plan wall 2.04 → 0.61 s with the hook off, r12 opt measurement).
        # Driver-side overhead, scale-independent — off in every profile.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    return builder.getOrCreate()


def cluster_conf(executors: int = 1000, cores_per_executor: int = 5) -> dict[str, str]:
    """The conf a large-cluster deployment of this engine would ship.

    Not applied in tests (no cluster here); kept as the single source of
    truth for the scale design point and exercised by unit test only for
    internal consistency.
    """
    total_cores = executors * cores_per_executor
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # ~3 waves of post-shuffle tasks; AQE coalesces small ones anyway
        "spark.sql.shuffle.partitions": str(total_cores * 3),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.ansi.enabled": "false",
        # disable the PySpark call-site-capture hook (3 py4j RPCs per
        # DataFrame/Column API call, error-message enrichment only) — pure
        # driver overhead at any scale; see get_session
        "spark.python.sql.dataFrameDebugging.enabled": "false",
        # with dynamic allocation / spot executors, executor-local
        # localCheckpoint blocks don't survive executor loss — flip every
        # materialize() call site to reliable checkpoints (requires
        # sc.setCheckpointDir on a cluster-visible FS; see
        # operators/util.materialize)
        "spark.dataengineering_londonhousingmap_spark.reliableCheckpoint": "true",
        # ---- streaming state posture (r10) --------------------------------
        # RocksDB state store: keyed stream state (sessionization, stateful
        # dedup, CDC apply) lives off-heap and spills to local disk instead
        # of executor heap — the HDFSBackedStateStore default keeps every
        # version in memory and is the OOM shape at production key
        # cardinality. Changelog checkpointing uploads per-batch deltas
        # rather than full RocksDB snapshots.
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # The local[32] harness NARROWS shuffle partitions around
        # writeStream.start() (streaming/incremental.py:_few_state_partitions
        # — 8-16 state stores beat 200 for KB-sized test state). That tuning
        # must not ship: "session" disables the narrowing so stream state
        # parallelism follows the session's shuffle partitions; a positive
        # integer pins it to a deliberate key-cardinality-sized value.
        # NOTE: a stream's state partitioning is frozen by its FIRST
        # checkpoint — set this before the stream ever starts, not on
        # restart.
        "spark.dataengineering_londonhousingmap_spark.streaming.statePartitions": "session",
    }
