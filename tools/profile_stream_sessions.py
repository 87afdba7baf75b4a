#!/usr/bin/env python
"""Profile q_stream_sessions at 10x (.bigdata) — r10 verdict task 3.

q_stream_sessions posts the catalog's max 10x ratio (~21 s at 10x vs
~3.4 s at sf0.1, both lanes). This tool splits that wall into its real
components so the PLANS addendum can name the dominant one:

  - harness: stream start (plan + checkpoint bootstrap), stop/await,
    memory-sink table read — everything that is NOT micro-batch work
  - micro-batch execution, further split by the engine's own
    StreamingQueryProgress durationMs (addBatch = the stateful Python
    exchange + state commit; the rest is offset/WAL bookkeeping)
  - state-operator metrics (rows, state rows, commit times)

and A/Bs the two knobs the verdict named:
  - state partitions: 8 / 16 / 32 (q_stream_sessions pins 16 locally)
  - Arrow batch size: spark.sql.execution.arrow.maxRecordsPerBatch
    10000 (default) vs 100000 — applyInPandasWithState ships each key
    group through Arrow; bigger batches = fewer Python round-trips

Run from the repo root after tools/gen_bigdata.py:
  python tools/profile_stream_sessions.py [--sf-dir .bigdata]
Prints one JSON block per variant plus a summary matrix.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dataengineering_londonhousingmap_spark.session import get_session  # noqa: E402
from dataengineering_londonhousingmap_spark.streaming.incremental import (  # noqa: E402
    _few_state_partitions,
    read_events_stream,
    sessionize_stream,
)

SF_DIR = ".bigdata"
for i, a in enumerate(sys.argv):
    if a == "--sf-dir" and i + 1 < len(sys.argv):
        SF_DIR = sys.argv[i + 1]
SF_DIR = os.path.abspath(SF_DIR)
REPS = 3


def run_once(spark, state_partitions: int, arrow_batch: int, tag: str) -> dict:
    gc.collect()
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
    name = f"profile_sessions_{tag}"
    spark.catalog.dropTempView(name)
    t0 = time.time()
    events = read_events_stream(spark, SF_DIR).select("user_id", "ts", "value")
    sessions = sessionize_stream(events, gap_minutes=30)
    t_plan = time.time()
    with _few_state_partitions(spark, n=state_partitions):
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
    t_start = time.time()
    q.processAllAvailable()
    t_process = time.time()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    q.awaitTermination(30)
    t_stop = time.time()
    n = spark.table(name).count()
    t_read = time.time()

    batches = []
    for p in progress:
        if p.get("numInputRows", 0) == 0 and not batches:
            continue  # skip leading no-data ticks
        d = p.get("durationMs", {})
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batchId": p.get("batchId"),
                "inputRows": p.get("numInputRows"),
                "triggerMs": d.get("triggerExecution"),
                "addBatchMs": d.get("addBatch"),
                "getBatchMs": d.get("getBatch"),
                "planMs": d.get("queryPlanning"),
                "walMs": (d.get("walCommit") or 0) + (d.get("commitOffsets") or 0)
                + (d.get("latestOffset") or 0),
                "stateRows": so.get("numRowsTotal"),
                "stateCommitMs": so.get("commitTimeMs"),
            }
        )
    return {
        "variant": tag,
        "statePartitions": state_partitions,
        "arrowBatch": arrow_batch,
        "wall_s": round(t_stop - t0, 2),
        "split_s": {
            "plan_build": round(t_plan - t0, 2),
            "start": round(t_start - t_plan, 2),
            "process": round(t_process - t_start, 2),
            "stop_await": round(t_stop - t_process, 2),
            "sink_read": round(t_read - t_stop, 2),
        },
        "batches": batches,
        "out_rows": n,
    }


def main() -> None:
    spark = get_session("dataengineering_londonhousingmap-stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    n_users = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .agg(F.countDistinct("user_id"))
        .first()[0]
    )
    print(f"sf_dir={SF_DIR} distinct user keys={n_users}", flush=True)
    variants = [
        (16, 10000, "base_sp16_arrow10k"),
        (8, 10000, "sp8"),
        (32, 10000, "sp32"),
        (16, 100000, "arrow100k"),
        (16, 1000, "arrow1k"),
    ]
    best: dict[str, dict] = {}
    for rep in range(REPS):
        for sp, ab, tag in variants:
            r = run_once(spark, sp, ab, tag)
            print(
                f"rep{rep} {tag}: wall {r['wall_s']}s split {r['split_s']} "
                f"batches {[(b['batchId'], b['triggerMs'], b['addBatchMs']) for b in r['batches']]}",
                flush=True,
            )
            if tag not in best or r["wall_s"] < best[tag]["wall_s"]:
                best[tag] = r
    print(json.dumps({"sf_dir": SF_DIR, "user_keys": n_users, "best": best}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
