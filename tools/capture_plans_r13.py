#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r13/<q>_<tag>.txt.

Usage: python tools/capture_plans_r13.py before q_a q_b ...
       python tools/capture_plans_r13.py before --headline   (all bench queries)

Plan-only (no execution beyond what eager materialize() runs at
construction time); used for the optimization-round before/after evidence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from dataengineering_londonhousingmap_spark.queries import QUERIES
    from dataengineering_londonhousingmap_spark.session import get_session

    if names == ["--headline"]:
        import bench

        names = list(bench.HEADLINE)

    spark = get_session("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # streaming queries execute on construction etc.
            plan = f"<explain failed: {e}>"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
