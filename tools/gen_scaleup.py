#!/usr/bin/env python
"""Regenerate BENCH_SCALEUP.json — committed scale-up evidence.

Runs a representative query set at sf0.001 → sf0.01 → sf0.1 (10× data per
step) on the same local session and records best-of-2 wall seconds plus the
per-step ratios. The thing to check round-over-round: `ratio_01_to_1` stays
well under 10 (sublinear in data) for every query — a ratio drifting toward
or past 10 means a plan stopped scaling (shape change, spill, or straggler)
and is a regression even if absolute numbers look fine.

Run from the repo root: python tools/gen_scaleup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataengineering_londonhousingmap_spark.queries import QUERIES  # noqa: E402
from dataengineering_londonhousingmap_spark.session import get_session  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

# the shapes that stress scale: the serving star + both custom join shapes,
# the big-fact pipeline, shuffle-on-key near-dup, the curation composite,
# and the gridded radius join
SCALEUP_SET = [
    "q_star_join",
    "q_groupby_avg",
    "q_join_asof",
    "q_join_nn_gridded",
    "q_pipeline_listings",
    "q_dedup_minhash",
    "q_corpus_curation",
    "q_serving_radius",
    "q_join_range",
    "q_pack_sequences",
    # round-3 additions: broadcast-vocab probe, the double-explode
    # collocation miner, and the iterative weighted propagation
    "q_vocab_oov",
    "q_collocations",
    "q_pagerank",
    # round-3d additions: the TPC-H Q5 snowflake (only lineitem⋈orders may
    # shuffle), degree-oriented triangles (wedge join must stay bounded),
    # and the dual-pass nearest as-of (two keyed sorts, no cross product)
    "q_tpch_local_volume",
    "q_triangle_count",
    "q_join_asof_nearest",
    # round-5 additions: the candidate-pruned Jaccard verify (no full
    # shingle-table shuffle may appear as data grows) and the standing-index
    # incremental dedup (cost must track the increment, not the corpus)
    "q_ngram_jaccard",
    "q_dedup_incremental",
    # round-12 additions: BPE induction (iteration cost must track the
    # VOCABULARY, not the corpus), its corpus-encode join, and the
    # cluster-keyed split (one projection past the clustering)
    "q_bpe_merges",
    "q_bpe_encode",
    "q_bpe_tokenize",
    "q_split_cluster_safe",
]


def main() -> None:
    spark = get_session("dataengineering_londonhousingmap-scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM/python workers once so sf0.001 isn't paying session startup
    QUERIES["q_scan_parquet"](
        spark, f"/root/testdata/sf{SFS[0]}"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for name in SCALEUP_SET:
        per_sf: dict[str, float] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            per_sf[sf] = round(best, 3)
        per_sf["ratio_001_to_01"] = round(per_sf["0.01"] / per_sf["0.001"], 2)
        per_sf["ratio_01_to_1"] = round(per_sf["0.1"] / per_sf["0.01"], 2)
        results[name] = per_sf
        print(f"{name}: {per_sf}", file=sys.stderr)

    out = {
        "note": (
            "best-of-2 wall sec per query per scale factor on local[32]; "
            "each sf step is 10x the data, so ratio columns < 10 = sublinear "
            "scaling; regenerate with tools/gen_scaleup.py"
        ),
        "queries": results,
        "max_ratio_01_to_1": max(r["ratio_01_to_1"] for r in results.values()),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SCALEUP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
