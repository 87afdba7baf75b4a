"""Physical-plan helpers shared by the composite operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input before CPU-heavy row expansion
    (cross join against a broadcast side, shingle/token explode, per-row
    hashing) — but only when it is under-partitioned.

    Why: a small dimension scan is often one input split, so everything
    downstream of it until the first shuffle runs as ONE task no matter how
    many cores the cluster has. That is invisible at 60k rows and fatal when
    the expansion is ×|broadcast side|. At 100 TB the big fact side already
    has thousands of splits and this is a no-op (the partition-count check
    keeps us from inserting a pointless full shuffle into wide inputs).
    """
    sess = df.sparkSession
    target = min_partitions or sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
