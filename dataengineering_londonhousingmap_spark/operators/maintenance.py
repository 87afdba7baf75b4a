"""Table maintenance — the small-files problem.

Incremental loads (streaming micro-batches, per-day partition appends, the
availableNow pattern in streaming/incremental.py) accrete many small files;
at scale that murders scan throughput (one task + one footer-read per tiny
file) long before capacity is an issue. ``compact`` rewrites a Parquet
directory into ~target-sized files — the maintenance job every accreting
table needs on a schedule.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def dir_bytes(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Total bytes of data files directly under ``path``, via the Hadoop
    FileSystem API (works for any scheme — local, HDFS, s3a)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return sum(
        f.getLen()
        for f in fs.listStatus(jpath)
        if f.isFile() and f.getPath().getName().endswith(suffix)
    )


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src_dir``'s Parquet files into ``dst_dir`` at
    ~``target_file_mb`` per file; returns the file count written.

    Writes to a NEW directory (atomic swap is the caller's move/rename) —
    compacting in place while reading the same files is a data-loss
    footgun. Round-robin repartition: compaction must balance file sizes,
    not preserve any keying (a keyed layout belongs to the bucketed-table
    path instead).
    """
    total = dir_bytes(spark, src_dir)
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src_dir).repartition(n).write.mode("overwrite").parquet(dst_dir)
    return n
