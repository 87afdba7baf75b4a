#!/usr/bin/env python
"""Run the ENTIRE query catalog against .bigdata/ (the 10x-replicated
~sf1 vintage from tools/gen_bigdata.py) and record wall seconds per query
to BENCH_BIGSCALE.json — execution evidence one decade of data beyond the
largest driver testdata. No oracle compare at this scale (DuckDB twins are
exercised at sf0.001/0.01/0.1); the claims here are (a) every plan still
EXECUTES — no OOM, no broadcast blowup, no guard trip — and (b) the
per-query ratio vs the sf0.1 bench stays far under the 10x data growth.

Run from the repo root: python tools/probe_bigscale.py  (~15-30 min)
Progress streams to /tmp/bigscale_progress.txt (one line per query).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from dataengineering_londonhousingmap_spark.queries import QUERIES  # noqa: E402
from dataengineering_londonhousingmap_spark.session import get_session  # noqa: E402

# --adv: probe the nasty-bearing replicated vintage (gen_bigdata.py --adv)
# instead — nasty x scale in one run -> BENCH_BIGSCALE_ADV.json
ADV = "--adv" in sys.argv
BIG = os.path.join(ROOT, ".bigdata_adv" if ADV else ".bigdata")
OUT_JSON = "BENCH_BIGSCALE_ADV.json" if ADV else "BENCH_BIGSCALE.json"

# --families a,b,...: probe only queries whose name starts with one of the
# given prefixes, merging results into the existing artifact (other entries
# carry over from the last full run). Lets the hot quotient/near-dup
# families be re-probed every round without paying the full-catalog ~800s;
# the subset choice is recorded in the artifact's probe_note so coverage
# stays auditable. Full-catalog runs (no flag) reset probe_note.
FAMILIES: list[str] = []
for i, a in enumerate(sys.argv):
    if a == "--families" and i + 1 < len(sys.argv):
        FAMILIES = [p.strip() for p in sys.argv[i + 1].split(",") if p.strip()]


def main() -> None:
    spark = get_session("dataengineering_londonhousingmap-bigscale")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    selected = {
        name: fn
        for name, fn in QUERIES.items()
        if not FAMILIES or any(name.startswith(p) for p in FAMILIES)
    }
    prior: dict = {}
    if FAMILIES and os.path.exists(os.path.join(ROOT, OUT_JSON)):
        with open(os.path.join(ROOT, OUT_JSON)) as f:
            prior = json.load(f)
        results.update(prior.get("queries", {}))
        errors.update(prior.get("errors", {}))
        for name in selected:  # probed fresh below; drop stale entries
            results.pop(name, None)
            errors.pop(name, None)
    # staged-LAYOUT queries rewrite a standing layout (bucketed tables, a
    # partitioned export) as a precondition; their first run's wall is
    # staging + query and rode the ratio as if it were query execution
    # (VERDICT r09: q_join_bucketed posted the clean-lane max 8.11 against
    # a 0.5s denominator). Run them twice: the staging guard (tableExists /
    # overwrite of the now-existing layout) makes run 2 the query-only
    # wall; stage_s = run1 − run2 is reported separately and ratios use
    # the query wall.
    stage_split = {
        "q_join_bucketed", "q_agg_bucketed", "q_sink_partitioned",
        "q_export_shards",
    }
    stage_s: dict[str, float] = dict(prior.get("stage_s", {}))
    runs: dict[str, list[float]] = dict(prior.get("runs", {}))
    for name in selected:
        stage_s.pop(name, None)
        runs.pop(name, None)
    with open("/tmp/bigscale_adv_progress.txt" if ADV else "/tmp/bigscale_progress.txt", "w") as out:
        for name, fn in selected.items():
            gc.collect()
            t0 = time.time()
            try:
                df = fn(spark, BIG)
                df.write.format("noop").mode("overwrite").save()
                wall = round(time.time() - t0, 3)
                # best-of-2 for EVERY query (r12, VERDICT r11 task 2: the
                # headline max_ratio moved 4.03→6.23 between same-tree
                # re-probes under the old >5s-tail-only retake — single
                # cold runs scatter ±30-50% on this host and the headline
                # rode whichever entry ran cold). Both walls are recorded
                # in the artifact's "runs" so the spread is auditable;
                # ratios use the best run (the min-of-N convention bench.py
                # established). For staged-LAYOUT queries run 1 also pays
                # layout staging, so stage_s = run1 − best(query runs).
                t1 = time.time()
                df = fn(spark, BIG)
                df.write.format("noop").mode("overwrite").save()
                run2 = round(time.time() - t1, 3)
                if name in stage_split:
                    # run1 = staging + query; runs 2..3 are query-only
                    t2 = time.time()
                    df = fn(spark, BIG)
                    df.write.format("noop").mode("overwrite").save()
                    run3 = round(time.time() - t2, 3)
                    results[name] = min(run2, run3)
                    runs[name] = [run2, run3]
                    stage_s[name] = round(max(0.0, wall - results[name]), 3)
                    print(
                        f"OK  {name} {results[name]:.1f}s (best-of-2: "
                        f"{run2:.1f}/{run3:.1f}, +{stage_s[name]:.1f}s staging)",
                        file=out, flush=True,
                    )
                else:
                    results[name] = min(wall, run2)
                    runs[name] = [wall, run2]
                    print(
                        f"OK  {name} {results[name]:.1f}s (best-of-2: "
                        f"{wall:.1f}/{run2:.1f})",
                        file=out, flush=True,
                    )
            except Exception as e:  # record, keep probing
                errors[name] = f"{type(e).__name__}: {e}"[:300]
                print(f"ERR {name} {errors[name]}", file=out, flush=True)
                traceback.print_exc(file=out)
            df = None

    # sf0.1 denominators: --bench <file>, else the LOCAL_BENCH json (a
    # same-session bench run), else the newest committed BENCH_r*.json.
    # The testdata vintage is driver-regenerated every round, so ratios
    # against a stale round's bench mix a vintage shift into what should
    # be a pure scale measurement — always probe against denominators
    # measured on the CURRENT vintage.
    bench_path = None
    for i, a in enumerate(sys.argv):
        if a == "--bench" and i + 1 < len(sys.argv):
            bench_path = sys.argv[i + 1]
    if bench_path is None:
        import glob
        import re

        cands = glob.glob(os.path.join(ROOT, "BENCH_LOCAL_r*.json")) + glob.glob(
            os.path.join(ROOT, "BENCH_r*.json")
        )
        def _round_of(p: str) -> int:
            m = re.search(r"_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1
        # local (same-vintage) benches outrank committed ones at equal round
        bench_path = max(cands, key=lambda p: (_round_of(p), "LOCAL" in p), default=None)
    bench = {}
    try:
        with open(bench_path) as f:
            b = json.load(f)
        bench = b.get("parsed", b).get("queries", {})
    except Exception:
        pass
    bench_name = os.path.basename(bench_path) if bench_path else None
    # --families merge integrity (ADVICE r09): carried-over numerators were
    # re-ratioed against the freshly resolved denominator — if the testdata
    # vintage regenerated between runs, that mixes vintages. Fresh ratios
    # are computed ONLY for this run's queries; carried entries keep the
    # ratios recorded against THEIR denominator, and the artifact names
    # both denominators when they differ.
    prior_bench_name = prior.get("bench_denominator")
    if isinstance(prior_bench_name, dict):
        # the prior artifact itself recorded a mismatch ({fresh_entries,
        # carried_entries}); its most recent measurements used
        # fresh_entries, so that is the name to compare against — and any
        # standing difference still flags below (ADVICE r11).
        prior_bench_name = prior_bench_name.get("fresh_entries")
    carried_ratios = (
        {
            q: r
            for q, r in prior.get("ratio_vs_sf01", {}).items()
            if q not in selected
        }
        if FAMILIES
        else {}
    )
    ratios = {
        q: round(results[q] / bench[q], 2)
        for q in results
        if q not in carried_ratios
        and q in bench
        and bench[q] > 0.5  # sub-noise-floor entries excluded
    }
    ratios.update(carried_ratios)
    doc = {
        "note": (
            "wall sec per catalog query on the 10x-replicated ~sf1 vintage "
            "(tools/gen_bigdata.py: 6M lineitem / 1M events / 50k docs), "
            "best-of-2 for EVERY query (r12: cold single runs scatter "
            "±30-50% on this host; both walls recorded per query under "
            "'runs', headline ratios use the best), noop sink, "
            "local[32]; ratio_vs_sf01 compares against the sf0.1 bench "
            "for queries above the 0.5s noise floor — 10x the data, so "
            "ratios well under 10 = sublinear"
        ),
        "quadratic_output_note": (
            "the replication gives every document/vector/name/coordinate "
            "10 identical twins, so near-dup pair OUTPUT grows ~100x by "
            "construction (q_join_nn exact twins, co-located grid stacks, "
            "contamination pairs, identical-name fuzzy blocks, identical "
            "overlapping intervals). Since r08 the COMPUTE on those "
            "families is representative-level (exact-dup quotient / "
            "reduce-then-min shells), so even the quadratic-output "
            "queries hold wall ratios under 10x at 10x data — the "
            "remaining cost is producing the output itself; a CLEAN-lane "
            "ratio drifting back above 10 means a quotient/shell was "
            "lost, not workload. ADV-lane ratios use the clean sf0.1 "
            "bench as denominator, so Python-boundary queries over the "
            "1.32x-heavier adversarial text (q_udtf, q_vocab_oov) "
            "legitimately read 10-14 — compare them against their own "
            "clean-lane entry before suspecting a regression; best-of-2 "
            "per query since r12, both walls under 'runs'"
        ),
        "queries": results,
        "runs": runs,
        "stage_s": stage_s,
        "stage_split_note": (
            "staged-layout queries (bucketed tables, partitioned exports) "
            "run twice: 'queries' records the second (query-only) wall — "
            "the standing layout already exists, so ratios measure query "
            "execution — and 'stage_s' the first run's extra layout-"
            "staging cost"
        ),
        "errors": errors,
        "ratio_vs_sf01": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
        "max_ratio": max(ratios.values(), default=None),
        "total_wall_s": round(sum(results.values()), 1),
        "bench_denominator": bench_name,
    }
    if FAMILIES:
        doc["probe_note"] = (
            f"partial re-probe: only prefixes {FAMILIES} "
            f"({len(selected)} queries) measured this run; remaining "
            "entries carry over from the artifact's last full-catalog run "
            f"(prior note: {prior.get('probe_note', 'full catalog')})"
        )
        # vintage integrity: only PARTIAL runs carry entries, so only they
        # can mismatch — carried ratios keep their own denominator.
        # (ADVICE r11: this guard previously sat in the full-run branch,
        # where there is nothing carried and the note was a false alarm.)
        if prior_bench_name and prior_bench_name != bench_name:
            doc["bench_denominator"] = {
                "fresh_entries": bench_name,
                "carried_entries": prior_bench_name,
            }
            doc["probe_note"] += (
                "; DENOMINATOR MISMATCH: carried entries' ratios were "
                f"computed against {prior_bench_name} and are preserved "
                f"verbatim, fresh entries use {bench_name} — rerun the "
                "full catalog to unify"
            )
    else:
        # affirmative, not implied-by-absence (VERDICT r10 task 1: the
        # carryover blemish is only auditable if full runs SAY so)
        doc["probe_note"] = (
            f"full catalog ({len(selected)} queries), every entry measured "
            "in this single session — no carried-over timings"
        )
    if ADV:
        doc["note"] = (
            "wall sec per catalog query on the 10x-replicated ~sf1 vintage "
            "WITH the .advdata nasties carried to scale (gen_bigdata.py "
            "--adv: NULL/negative events.value, NULL user_id, NANOS ts, "
            "empty/duplicated/newline/repetitive/whitespace docs); single "
            "run, noop sink, local[32]; ratio_vs_sf01 compares the CLEAN "
            "sf0.1 bench, so it includes nasty-induced workload shifts "
            "(e.g. twin-duplication inflating near-dup pair output)"
        )
    with open(os.path.join(ROOT, OUT_JSON), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"queries_ok": len(results), "errors": len(errors),
                      "max_ratio": doc["max_ratio"],
                      "total_wall_s": doc["total_wall_s"]}))


if __name__ == "__main__":
    main()
