"""Small-files compaction semantics."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dataengineering_londonhousingmap_spark.operators.maintenance import compact, dir_bytes


def test_compact_collapses_small_files(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    # 40 tiny files (the accreted micro-batch shape)
    spark.range(4000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id").cast("string")).alias("s")
    ).repartition(40).write.mode("overwrite").parquet(src)
    n_src = len(glob.glob(f"{src}/*.parquet"))
    assert n_src == 40

    n_target = compact(spark, src, dst, target_file_mb=64)
    n_dst = len(glob.glob(f"{dst}/*.parquet"))
    assert n_target == 1 and n_dst == 1          # tiny table → one file

    # content identical
    a = {(r.id, r.s) for r in spark.read.parquet(src).collect()}
    b = {(r.id, r.s) for r in spark.read.parquet(dst).collect()}
    assert a == b
    assert dir_bytes(spark, dst) > 0
