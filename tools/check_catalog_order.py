#!/usr/bin/env python
"""Check (and propose) the per-round catalog ordering.

The driver verifies the first ~50 entries of `queries()` each round, in
dict order. To buy a full round of fresh coverage, the never-yet-sampled
queries (union of all CORRECTNESS_r*.json keys vs QUERIES) must sit at
the FRONT of the dict — forgetting this wasted round 4's sample on
round 3's block.

Run as the FIRST action of every round, right after reading the new
CORRECTNESS file:

    python tools/check_catalog_order.py

Exit 0: front block is exactly the never-sampled set (or everything has
been sampled). Exit 1: prints the never-sampled names that are NOT in
the front block — move them to the top of QUERIES in queries.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from dataengineering_londonhousingmap_spark.queries import QUERIES  # noqa: E402

WINDOW = 50  # driver budget per round


def main() -> int:
    sampled: set[str] = set()
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        sampled |= set(json.load(open(f)))
    names = list(QUERIES)
    never = [n for n in names if n not in sampled]
    front = names[: min(WINDOW, len(names))]
    print(f"catalog: {len(names)} entries, {len(never)} never driver-sampled")
    if not never:
        print("every entry has been sampled at least once — any order works")
        return 0
    # optimal layout: the first min(|never|, WINDOW) dict positions must
    # ALL be never-sampled (overflow queues immediately behind, becoming
    # the next round's front after the reorder). Any sampled entry inside
    # that prefix is a wasted driver slot while a never-sampled one waits.
    required = min(len(never), WINDOW)
    stale_in_prefix = [n for n in names[:required] if n in sampled]
    if not stale_in_prefix:
        queued = max(0, len(never) - WINDOW)
        print(
            f"OK: the front {required} positions are all never-sampled"
            + (f" ({queued} more queued right behind)" if queued else "")
        )
        return 0
    print(
        f"REORDER NEEDED — {len(stale_in_prefix)} already-sampled entries "
        f"occupy the front {required} positions while never-sampled entries "
        f"wait behind:"
    )
    for n in stale_in_prefix:
        print(f"  move down: {n} (position {names.index(n)})")
    for n in [x for x in never if x not in names[:required]][: len(stale_in_prefix)]:
        print(f"  move up:   {n} (position {names.index(n)})")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
