#!/usr/bin/env python
"""Generate .vintage_light/ — the current sf0.1 vintage re-profiled to
r08's near-dup density, for the two-vintage falsification the r10 verdict
asked for (task 2: "reproduce, don't eliminate").

Background. The r10 closing best-of-3 left q_dedup_minhash at 1.21x and
q_ngram_jaccard at 1.27x of their r08 reference walls, attributed (by
elimination) to "8 twin documents and heavier text". Measuring the two
vintages' WORKLOAD stats directly refutes half of that attribution:

  - per-doc distinct char-8 shingles (the signature-stage work volume):
    r08 recorded 1.35M (PLANS.md r08 watch-close), current sf0.1 measures
    1,351,090 — IDENTICAL. The text is not heavier where it matters.
  - LSH candidate pairs: r08 recorded 172; current sf0.1 measures 653.
  - verified Jaccard pairs (>=0.2): r08 recorded 70; current measures 253.

So the real vintage axis is near-dup PAIR DENSITY (3.8x the candidates,
3.6x the verified pairs feed the verify/expand stages), not total text
weight. This tool builds the falsification vintage: same corpus, same
shingle volume, but pair density reduced to r08's recorded profile.

Method: compute the verified-pair graph with the engine's own DuckDB
oracle (bit-identical semantics to the Spark path), keep the first
--keep-verified pairs in (id_a, id_b) order, zero twins, and SCRAMBLE one
endpoint of every surplus pair — a deterministic per-doc character
shuffle seeded by doc_id: same length, same characters, shingle set
randomized so the doc drops out of every candidate bucket. Docs in kept
pairs are protected; a surplus pair between two protected docs is
unbreakable and reported. The tool re-runs the oracle on the output and
prints the achieved profile — the printed numbers are the evidence that
the vintage landed on r08's stats, not a claim.

All other tables are copied verbatim so any query (and the A/B drift
controls) can run against the directory.

Run from the repo root:  python tools/gen_vintage_profile.py
Then A/B with:           python tools/ab_vintage.py
"""

from __future__ import annotations

import os
import random
import shutil
import sys

import duckdb

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from dataengineering_londonhousingmap_spark.oracles import ORACLES  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(_ROOT, ".vintage_light")
KEEP_VERIFIED = 70    # r08's recorded verified-pair count
KEEP_CAND_ONLY = 102  # r08's 172 candidates minus its 70 verified
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _profile(con: duckdb.DuckDBPyConnection) -> dict:
    """Workload stats for whatever `documents` currently points at."""
    docs, twins = con.sql(
        "SELECT count(*), count(*) - count(DISTINCT text) FROM documents"
        " WHERE text IS NOT NULL"
    ).fetchone()
    (shingles,) = con.sql(
        """
        WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        idx AS (SELECT unnest(range(1, (SELECT max(length(text)) FROM d) + 1)) AS i)
        SELECT count(*) FROM (
          SELECT DISTINCT d.doc_id, substring(d.text, idx.i::INT, 8)
          FROM d JOIN idx ON idx.i <= greatest(1, length(d.text) - 7))
        """
    ).fetchone()
    (cand,) = con.sql(
        f"SELECT count(*) FROM ({ORACLES['q_dedup_minhash']})"
    ).fetchone()
    (verified,) = con.sql(
        f"SELECT count(*) FROM ({ORACLES['q_ngram_jaccard']})"
    ).fetchone()
    return {
        "docs": docs, "twin_surplus": twins, "doc_distinct_shingles": shingles,
        "lsh_candidates": cand, "verified_pairs": verified,
    }


def _scramble(text: str, seed: int) -> str:
    chars = list(text)
    random.Random(seed).shuffle(chars)
    return "".join(chars)


def main() -> None:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    )
    before = _profile(con)
    print(f"source profile  : {before}")

    pairs = con.sql(
        f"SELECT id_a, id_b FROM ({ORACLES['q_ngram_jaccard']}) ORDER BY id_a, id_b"
    ).fetchall()
    twin_ids = {
        r[0]
        for r in con.sql(
            """
            SELECT doc_id FROM documents
            WHERE text IS NOT NULL
              AND text IN (SELECT text FROM documents WHERE text IS NOT NULL
                           GROUP BY text HAVING count(*) > 1)
            """
        ).fetchall()
    }

    # keep the first KEEP_VERIFIED non-twin pairs; protect their docs
    kept: list[tuple[int, int]] = []
    protected: set[int] = set()
    scrambled: set[int] = set()
    for a, b in pairs:
        if len(kept) < KEEP_VERIFIED and a not in twin_ids and b not in twin_ids:
            kept.append((a, b))
            protected.add(a)
            protected.add(b)
    kept_set = set(kept)
    unbreakable = 0
    for a, b in pairs:
        if (a, b) in kept_set:
            continue
        if a in scrambled or b in scrambled:
            continue  # pair already broken by an earlier scramble
        victim = next((x for x in (b, a) if x not in protected), None)
        if victim is None:
            unbreakable += 1  # both endpoints anchor kept pairs
            continue
        scrambled.add(victim)
    scrambled |= twin_ids - protected  # zero twins in the output

    # candidate-only pairs (LSH collision, Jaccard < threshold): keep the
    # first KEEP_CAND_ONLY, break the rest the same way — they feed the
    # verify stage even though they fail it, so their density is workload
    cand_pairs = con.sql(
        f"SELECT id_a, id_b FROM ({ORACLES['q_dedup_minhash']}) ORDER BY id_a, id_b"
    ).fetchall()
    verified_set = {(a, b) for a, b in pairs}
    kept_cand = 0
    for a, b in cand_pairs:
        if (a, b) in verified_set or a in scrambled or b in scrambled:
            continue
        if kept_cand < KEEP_CAND_ONLY:
            kept_cand += 1
            protected.add(a)
            protected.add(b)
            continue
        victim = next((x for x in (b, a) if x not in protected), None)
        if victim is None:
            unbreakable += 1
            continue
        scrambled.add(victim)
    print(
        f"kept {len(kept)} verified + {kept_cand} candidate-only pairs,"
        f" scrambling {len(scrambled)} docs,"
        f" {unbreakable} unbreakable surplus pairs"
    )

    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            shutil.copy(src, f"{OUT}/{t}.parquet")

    rows = con.sql("SELECT * FROM documents ORDER BY doc_id").fetchdf()
    text_col = rows["text"].tolist()
    for i, doc_id in enumerate(rows["doc_id"].tolist()):
        if doc_id in scrambled and text_col[i] is not None:
            text_col[i] = _scramble(text_col[i], int(doc_id))
    rows["text"] = text_col
    con.register("light_docs", rows)
    con.sql(
        f"COPY (SELECT * FROM light_docs) TO '{OUT}/documents.parquet' (FORMAT PARQUET)"
    )

    con.sql("DROP VIEW documents")
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{OUT}/documents.parquet')"
    )
    after = _profile(con)
    print(f"light profile   : {after}")
    print(f"r08 reference   : docs=5000 doc_distinct_shingles~1350000"
          f" lsh_candidates=172 verified_pairs=70 (PLANS.md r08 watch-close)")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
