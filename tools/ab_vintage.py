#!/usr/bin/env python
"""Two-vintage interleaved A/B for the dedup trio — the r10 verdict's
task 2 ("reproduce, don't eliminate the cross-vintage attribution").

Runs q_dedup_minhash / q_ngram_jaccard / q_dedup_incremental best-of-3,
INTERLEAVED across two vintages in ONE session:

  heavy = the current driver sf0.1 (653 LSH candidates / 253 verified
          pairs / 8 twins on the r11 vintage — measured, not assumed)
  light = .vintage_light from tools/gen_vintage_profile.py, the same
          corpus re-profiled to r08's recorded workload stats
          (~172 candidates / ~70 verified / 0 twins, identical
          per-doc-distinct shingle volume ~1.35M)

plus the five bench drift controls each rep (pinned r07–r08 refs, median
ratio = host drift, same convention as bench.py). If the light vintage's
normalized walls return to the r08 references, the r10 residual
(minhash 1.21x / ngram 1.27x of r08) is REPRODUCED as pair-density
workload; if the residual survives on the light vintage, the quotient
detection aggregate is the suspect and gets profiled next.

Run from the repo root (quiet host): python tools/ab_vintage.py
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

HEAVY = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LIGHT = os.path.join(_ROOT, ".vintage_light")
TRIO = ("q_dedup_minhash", "q_ngram_jaccard", "q_dedup_incremental")
REPS = 3
# drift gate (r12, VERDICT r11 stretch task 7): AB_VINTAGE_r11 normalized
# through session drift 1.401 — the highest recorded — and only its wide
# margins saved the conclusion. A close-call A/B must never be decided by
# normalization alone: when the median control ratio leaves [1/1.25, 1.25]
# the measurement re-runs ONCE in a fresh session, and if drift is still
# out of band the tool REFUSES to conclude (exit 2) instead of normalizing.
DRIFT_GATE = 1.25

# bench.py's pinned control references (same constants — re-pinned r12
# opt for the disabled PySpark debugging hook; see bench.py)
CONTROLS_REF = {
    "q_serving_dashboard": 2.477,
    "q_triangle_count": 2.624,
    "q_join_nn": 1.122,
    "q_copurchase": 1.228,
    "q_stream_hourly": 0.717,
}

# r08 reference walls for the trio, derived from the r10 closing
# best-of-3 (PLANS.md r10 addendum: normalized 4.06 = 1.01x ref,
# 1.81 = 1.21x, 4.53 = 1.27x)
R08_REF = {
    "q_dedup_minhash": 1.50,
    "q_ngram_jaccard": 3.57,
    "q_dedup_incremental": 4.02,
}


def _run(spark, name: str, sf_dir: str) -> float:
    gc.collect()
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _measure() -> tuple[dict, dict, float]:
    """One full interleaved measurement in its OWN session (so a drift-gate
    re-run starts from fresh conditions, not the same aged JVM)."""
    spark = get_session("dataengineering_londonhousingmap-ab-vintage")
    spark.sparkContext.setLogLevel("ERROR")
    best: dict[tuple[str, str], float] = {}
    ctrl_best: dict[str, float] = {}
    # rep 0 is an uncounted warmup of the trio on both vintages (session
    # JIT/codegen caches), then REPS counted interleaved passes
    for rep in range(REPS + 1):
        for name in TRIO:
            for tag, d in (("heavy", HEAVY), ("light", LIGHT)):
                w = _run(spark, name, d)
                if rep > 0:
                    k = (name, tag)
                    best[k] = min(best.get(k, w), w)
                print(f"rep{rep} {name} {tag} {w:.2f}s", flush=True)
        if rep > 0:
            for c in CONTROLS_REF:
                w = _run(spark, c, HEAVY)
                ctrl_best[c] = min(ctrl_best.get(c, w), w)
                print(f"rep{rep} ctrl {c} {w:.2f}s", flush=True)
    ratios = sorted(ctrl_best[c] / r for c, r in CONTROLS_REF.items())
    drift = ratios[len(ratios) // 2]
    spark.stop()
    return best, ctrl_best, drift


def main() -> None:
    attempts: list[float] = []
    for attempt in range(2):
        best, ctrl_best, drift = _measure()
        attempts.append(round(drift, 3))
        if 1.0 / DRIFT_GATE <= drift <= DRIFT_GATE:
            break
        print(
            f"DRIFT GATE: median control drift {drift:.3f} outside "
            f"[{1/DRIFT_GATE:.2f}, {DRIFT_GATE}] — "
            + ("re-running in a fresh session" if attempt == 0
               else "still out of band after re-run"),
            flush=True,
        )
    gated = not (1.0 / DRIFT_GATE <= drift <= DRIFT_GATE)
    out = {
        "protocol": f"interleaved best-of-{REPS} after 1 warmup, one session per attempt, noop sink",
        "drift": round(drift, 3),
        "drift_gate": {
            "gate": DRIFT_GATE,
            "attempts": attempts,
            "status": "REFUSED — do not conclude from this run; rerun on a quieter host" if gated else "ok",
        },
        "controls": {c: round(v, 2) for c, v in ctrl_best.items()},
        "matrix": {},
    }
    for name in TRIO:
        h, l = best[(name, "heavy")], best[(name, "light")]
        out["matrix"][name] = {
            "heavy_s": round(h, 2),
            "light_s": round(l, 2),
            "heavy_norm": round(h / drift, 2),
            "light_norm": round(l / drift, 2),
            "light_vs_r08": round(l / drift / R08_REF[name], 2),
            "heavy_vs_r08": round(h / drift / R08_REF[name], 2),
        }
    print(json.dumps(out, indent=2))
    if gated:
        sys.exit(2)


if __name__ == "__main__":
    main()
