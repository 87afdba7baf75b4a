#!/usr/bin/env python
"""Check the per-round catalog ordering (staleness rotation).

The driver verifies the first ~50 entries of `queries()` each round, in
dict order. With all 198 entries sampled at least once, the order decides
WHICH 50 get re-verified against the freshest data vintage — queries last
sampled in r01 went five rounds of vintage drift without a driver check
(the exact mechanism that hid the HUGEINT bug). Required layout:

  1. never-sampled entries (new queries) first,
  2. then `queries.RE_VERIFY_FRONT` (semantics changed since last sample),
  3. then everything else stalest-first (ascending last-sampled round).

Since round 7 `queries.QUERIES` COMPUTES this order at import; this tool
re-derives the rule from the CORRECTNESS_r*.json union with its own code
(deliberately not importing the module's sort helpers) and exits 1 on any
disagreement in the front window — a broken or bypassed sort, a stale
RE_VERIFY_FRONT, or a hand-reorder that wastes driver slots.

Run as an early action of every round (and it runs in CI via
tests/test_catalog_order.py):

    python tools/check_catalog_order.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from dataengineering_londonhousingmap_spark.queries import (  # noqa: E402
    QUERIES,
    RE_VERIFY_FRONT,
)

WINDOW = 50  # driver budget per round


def last_sampled() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.load(open(f)):
            # max round, not glob order — lexicographic sort misorders
            # r100 vs r11..r99 (round-8 advisor)
            last[name] = max(last.get(name, 0), rnd)
    return last


def evaluate(
    names: list[str],
    last: dict[str, int],
    forced_since: dict[str, int],
    window: int = WINDOW,
) -> tuple[list[str], list[str], list[str]]:
    """Pure staleness-rule check: returns (missing_front, too_fresh,
    expected). Empty first two lists = compliant order. Split out of
    main() so the boundary and max-round semantics are unit-testable
    with synthetic histories (tests/test_catalog_order.py)."""
    never = [n for n in names if n not in last]
    # forced entries expire once a CORRECTNESS row from the change round
    # (or later) lands — mirror the self-expiry rule independently
    forced = [
        n
        for n, since in forced_since.items()
        if n in names and n not in never and last[n] < since
    ]
    # expected front window: never-sampled and forced entries in any order,
    # then stalest-first. Within-window positions don't matter (the driver
    # samples the whole window), so compare as a set.
    staleness = sorted(
        (n for n in names if n not in never and n not in forced),
        key=lambda n: last[n],
    )
    required = min(window, len(names))
    expected = (never + forced + staleness)[:required]
    # entries tied at the boundary staleness round are interchangeable —
    # widen the acceptable pool to every entry at most as stale as the
    # strictest round a compliant window could exclude. The boundary is
    # computed over the STALENESS-TAIL portion of the window only: a
    # forced entry sampled recently (say r6) would otherwise widen the
    # pool to everything at most that fresh, making the too-fresh check
    # near-vacuous exactly when RE_VERIFY_FRONT is in use (round-8
    # advisor). Never/forced entries are checked via missing_front.
    tail = [n for n in expected if n not in never and n not in forced]
    boundary = max((last[n] for n in tail), default=-1)
    pool = set(never) | set(forced) | {n for n in staleness if last[n] <= boundary}
    front = names[:required]
    missing_front = [n for n in never + forced if n not in front]
    too_fresh = [n for n in front if n not in pool]
    return missing_front, too_fresh, expected


def main() -> int:
    names = list(QUERIES)
    last = last_sampled()
    never = [n for n in names if n not in last]
    forced = [
        n
        for n, since in RE_VERIFY_FRONT.items()
        if n in names and n not in never and last[n] < since
    ]
    print(
        f"catalog: {len(names)} entries, {len(never)} never driver-sampled, "
        f"{len(forced)} forced re-verify"
    )
    missing_front, too_fresh, expected = evaluate(names, last, RE_VERIFY_FRONT)
    required = min(WINDOW, len(names))
    front = names[:required]
    if not missing_front and not too_fresh:
        rounds = sorted({last.get(n, 0) for n in front})
        print(
            f"OK: front {required} = never-sampled + forced + stalest "
            f"(last-sampled rounds in window: {rounds})"
        )
        return 0
    print(f"REORDER NEEDED — front window violates the staleness rule:")
    for n in missing_front:
        print(f"  must be in front (new/forced): {n} (position {names.index(n)})")
    for n in too_fresh:
        print(
            f"  too fresh for front: {n} (last sampled r{last.get(n, 0):02d}, "
            f"position {names.index(n)})"
        )
    stale_waiting = [n for n in expected if n not in front]
    for n in stale_waiting[: max(len(too_fresh), len(missing_front))]:
        print(f"  stalest waiting behind: {n} (last sampled r{last.get(n, 0):02d})")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
