#!/usr/bin/env python
"""Sessionize crossover A/B — VERDICT r11 stretch task 8: turn the
"use native session windows at scale" advice into a measured number.

Interleaves the two streaming sessionization formulations over the same
events feed, best-of-N in one session, at sf0.1 AND the 10x replication:

  custom = q_stream_sessions — applyInPandasWithState inactivity-gap
           operator (X20): per-group Python, immediate successor-closed
           emission, arbitrary per-session logic. Irreducibly
           Python-per-group (the r11 profile: ~99% of wall is stateful
           addBatch; state partitions the only knob).
  native = q_stream_session_native — F.session_window + watermark (X143):
           Catalyst's streaming MergingSessions exec, JVM-side, same
           30-minute gap semantics where expressible.

The outputs deliberately differ in emission protocol (append all-but-
trailing vs complete), so this is a WALL-CLOCK A/B of the two engines
running the same gap semantics — the correctness of each is its own
driver oracle. Run on a quiet host after tools/gen_bigdata.py:

  python tools/ab_sessionize.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from dataengineering_londonhousingmap_spark.queries import QUERIES  # noqa: E402
from dataengineering_londonhousingmap_spark.session import get_session  # noqa: E402

SCALES = {
    "sf0.1": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "10x": os.path.join(_ROOT, ".bigdata"),
}
PAIR = {"custom": "q_stream_sessions", "native": "q_stream_session_native"}
REPS = 2


def main() -> None:
    spark = get_session("dataengineering_londonhousingmap-ab-sessionize")
    spark.sparkContext.setLogLevel("ERROR")
    best: dict[tuple[str, str], float] = {}
    for rep in range(REPS + 1):  # rep 0 = uncounted warmup
        for scale, d in SCALES.items():
            for tag, q in PAIR.items():
                gc.collect()
                t0 = time.time()
                QUERIES[q](spark, d).write.format("noop").mode("overwrite").save()
                w = time.time() - t0
                if rep > 0:
                    k = (scale, tag)
                    best[k] = min(best.get(k, w), w)
                print(f"rep{rep} {scale} {tag} {w:.2f}s", flush=True)
    out = {"protocol": f"interleaved best-of-{REPS} after 1 warmup, one session, noop sink"}
    for scale in SCALES:
        c, n = best[(scale, "custom")], best[(scale, "native")]
        out[scale] = {
            "custom_s": round(c, 2),
            "native_s": round(n, 2),
            "native_speedup": round(c / n, 2),
        }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
