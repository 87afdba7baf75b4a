#!/usr/bin/env python
"""Regenerate CATALOG.md — the mechanical index of the query catalog.

Generated from the live QUERIES/ORACLES dicts, so it cannot drift from the
code: one row per query in DRIVER EXECUTION ORDER, with its oracle status
and the first docstring line.

Run from the repo root: python tools/gen_catalog.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataengineering_londonhousingmap_spark.oracles import ORACLES  # noqa: E402
from dataengineering_londonhousingmap_spark.queries import QUERIES  # noqa: E402

HEADER = """# CATALOG — every driver-visible query, in execution order

Auto-generated from `queries.py`/`oracles.py` by `tools/gen_catalog.py` —
regenerate after catalog changes; do not edit by hand. "exact" = the driver
hash-compares the query against its DuckDB oracle; "rows-only" = approximate
by design, with an oracle-exact twin carrying the correctness burden.
"""


def main() -> None:
    lines = [HEADER]
    n_exact = 0
    lines.append("| # | query | oracle | summary |")
    lines.append("|---|---|---|---|")
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        doc = (fn.__doc__ or "").strip().splitlines()
        summary = doc[0].rstrip() if doc else ""
        if name in ORACLES:
            status = "exact"
            n_exact += 1
        else:
            status = "rows-only"
        lines.append(f"| {i} | {name} | {status} | {summary} |")
    lines.append("")
    lines.append(f"{len(QUERIES)} queries, {n_exact} oracle-exact, "
                 f"{len(QUERIES) - n_exact} rows-only.")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md"
    )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"CATALOG.md regenerated: {len(QUERIES)} queries, {n_exact} exact")


if __name__ == "__main__":
    main()
