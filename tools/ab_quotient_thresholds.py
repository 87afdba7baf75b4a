#!/usr/bin/env python
"""Quotient-threshold A/B — r10 verdict stretch task 7.

sparseMaxDupMembers=64k and literalMaxDupMembers=128 were chosen from
sf0.1 measurements; this confirms (or inverts) the defaults at 10x.

The two knobs gate on DUP-MEMBER COUNT, so each axis is only live where
the data puts the count near the threshold — a blind 3x3 grid would
measure the same arm nine times. Two targeted lanes instead:

  - sparse axis (.bigdata): the 10x replication makes every doc a 10-way
    twin (~45k dup members), so sparseMaxDupMembers 16384 forces the
    DENSE arm, 65536/262144 the sparse LocalRelation arm — the
    crossover the default must not invert. literalMax pinned 128 (a 45k
    dup set can never take the literal sub-arm anyway).
  - literal axis (sf0.1): the driver vintage carries ~16 dup members, so
    literalMaxDupMembers 32 forces the LocalRelation sub-arm while
    128/512 take the pure-Column literal sub-arm. sparseMax pinned 64k.

Interleaved best-of-3 per (config, query) in one session per lane.
Queries: the quotient-heaviest catalog entries (clusters carries the
measured py4j-storm history; minhash/ngram are the r10 residual pair;
embed_exact rides the bypass arm and should be invariant — a moving
bypass number flags noise, not a knob effect).

Run from the repo root after tools/gen_bigdata.py:
  python tools/ab_quotient_thresholds.py [--lane sparse|sparse_adv|literal|both]
(sparse_adv needs tools/gen_bigdata.py --adv staged first)
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

SPARSE_KEY = "spark.dataengineering_londonhousingmap_spark.quotient.sparseMaxDupMembers"
LIT_KEY = "spark.dataengineering_londonhousingmap_spark.quotient.literalMaxDupMembers"
REPS = 3

LANES = {
    "sparse": {
        "sf_dir": os.path.join(_ROOT, ".bigdata"),
        "configs": [(16384, 128), (65536, 128), (262144, 128)],
        "queries": ["q_dedup_clusters", "q_dedup_minhash", "q_ngram_jaccard",
                    "q_dedup_embed_exact"],
    },
    # r12 (VERDICT r11 task 5): same sparse axis on the ADVERSARIAL 10x
    # replication (NULL/empty/duplicated/newline/repetitive docs carried
    # to scale) — confirms the 16384 default's sign holds under nasty
    # inputs, not just the clean twins
    "sparse_adv": {
        "sf_dir": os.path.join(_ROOT, ".bigdata_adv"),
        "configs": [(16384, 128), (65536, 128), (262144, 128)],
        "queries": ["q_dedup_clusters", "q_dedup_minhash", "q_ngram_jaccard",
                    "q_dedup_embed_exact"],
    },
    "literal": {
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "configs": [(65536, 32), (65536, 128), (65536, 512)],
        "queries": ["q_dedup_clusters", "q_dedup_minhash", "q_ngram_jaccard",
                    "q_dedup_embed_exact"],
    },
}

lane_arg = "both"
for i, a in enumerate(sys.argv):
    if a == "--lane" and i + 1 < len(sys.argv):
        lane_arg = sys.argv[i + 1]

# drift gate (r12, VERDICT r11 stretch task 7): the configs interleave in
# ONE session, so only WITHIN-session condition drift can bias the matrix.
# q_dedup_embed_exact rides the bypass arm — invariant to both knobs by
# construction — so its config-to-config spread IS the noise control: when
# it exceeds the gate the lane re-runs once in a fresh session, then
# REFUSES to conclude (exit 2) instead of letting noise pick a default.
DRIFT_GATE = 1.25
INVARIANT_Q = "q_dedup_embed_exact"


def run_lane(lane: str) -> dict:
    spec = LANES[lane]
    spark = get_session(f"dataengineering_londonhousingmap-ab-quotient-{lane}")
    spark.sparkContext.setLogLevel("ERROR")
    best: dict[tuple, float] = {}
    for rep in range(REPS):
        for sparse_max, lit_max in spec["configs"]:
            spark.conf.set(SPARSE_KEY, str(sparse_max))
            spark.conf.set(LIT_KEY, str(lit_max))
            for name in spec["queries"]:
                gc.collect()
                t0 = time.time()
                QUERIES[name](spark, spec["sf_dir"]).write.format("noop").mode(
                    "overwrite"
                ).save()
                w = time.time() - t0
                k = (sparse_max, lit_max, name)
                best[k] = min(best.get(k, w), w)
                print(
                    f"[{lane}] rep{rep} sparse={sparse_max} lit={lit_max} "
                    f"{name} {w:.2f}s",
                    flush=True,
                )
    spark.conf.unset(SPARSE_KEY)
    spark.conf.unset(LIT_KEY)
    spark.stop()
    matrix: dict[str, dict[str, float]] = {}
    for (sm, lm, name), w in best.items():
        matrix.setdefault(name, {})[f"sparse={sm},lit={lm}"] = round(w, 2)
    return matrix


def main() -> None:
    out = {}
    refused = False
    for lane in LANES:
        if lane_arg not in (lane, "both"):
            continue
        for attempt in range(2):
            matrix = run_lane(lane)
            inv = matrix.get(INVARIANT_Q, {})
            spread = (max(inv.values()) / max(min(inv.values()), 1e-9)) if inv else 1.0
            gate = {"invariant": INVARIANT_Q, "spread": round(spread, 3),
                    "gate": DRIFT_GATE, "status": "ok"}
            if spread <= DRIFT_GATE:
                break
            print(
                f"[{lane}] DRIFT GATE: {INVARIANT_Q} (knob-invariant bypass "
                f"arm) spread {spread:.3f} > {DRIFT_GATE} — "
                + ("re-running lane in a fresh session" if attempt == 0
                   else "still out of band after re-run"),
                flush=True,
            )
            gate["status"] = (
                "REFUSED — within-session noise exceeds the knob effect "
                "size; do not conclude from this run"
            )
        if gate["status"] != "ok":
            refused = True
        out[lane] = {"matrix": matrix, "drift_gate": gate}
    print(json.dumps(out, indent=2))
    if refused:
        sys.exit(2)


if __name__ == "__main__":
    main()
