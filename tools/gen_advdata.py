#!/usr/bin/env python
"""Regenerate .advdata/ — an ADVERSARIAL copy of sf0.01 for oracle
hardening runs.

sf0.01, not sf0.001: event_type groups exceed the percentile operator's
1000-row small-group threshold there, so the GK-sketch bracket path (not
just the [min,max] fallback) runs against NULL-bearing data.

The driver's testdata is regenerated each round from the same benign
generator; latent engine-vs-oracle divergences (NULL handling, frame
shrinkage, division guards) only fire when the data changes shape. This
vintage keeps every invariant the engine pins (unique keys, non-null
text, 64-dim embeddings) but injects the plausible nasties:

* events.value NULL on event_id % 19 == 0 (~5%) — exercises every
  window/aggregate path's NULL symmetry (the q_ewma/q_window_median
  class: Spark collect_list drops NULLs, DuckDB list() keeps them).
* events.user_id NULL on event_id % 97 == 11 (~1%) — anonymous/missing
  actors, the NULL-KEY class (round-7 asof_join finding: a window
  partition groups NULL keys while SQL equi predicates reject them —
  every keyed join/window/sessionization path must agree with its
  oracle on how NULL keys group, join, and sort).
* events.value NEGATED on event_id % 23 == 1 (~4%) — sensor deltas go
  below zero in real feeds while the benign generator emits 0.01..490:
  exercises signed rounding (the -0.0 class), signed floor/cast cents,
  winsorize/percentile brackets spanning zero, and every abs-free
  aggregate's sign symmetry. NULL (% 19) wins where the slices overlap.
* documents.text duplicated on doc_id % 11 == 7 (each such doc takes the
  text of doc_id - 7) — floods the dedup family with real exact- and
  near-duplicates and stresses every tiebreak on tied fingerprints,
  minhash signatures, and quality scores.
* documents.text EMPTY ('' — non-NULL, ~2%) on doc_id % 53 == 3 (with
  n_chars=0 kept consistent) — zero-shingle docs, zero-token quality
  denominators, empty-string regex/split/substring edges: every
  length-normalized score and explode path must agree with its oracle
  when the value exists but is vacuous.
* events.ts stored as TIMESTAMP(NANOS) — the round-1 driver vintage that
  Spark's vectorized reader rejects as TimestampType; exercises the
  nanosAsLong + magnitude-classifying rebuild in read_testdata end-to-end
  (DuckDB reads NANOS natively, so the oracles are unaffected).

Usage:
    python tools/gen_advdata.py
    python .verify/driver_sim.py /root/repo/.advdata   # expect 0 failures

    python tools/gen_advdata.py --skew   # writes .advdata_skew/ instead:
        same base nasties PLUS hot keys — 85% of events collapse onto one
        event_type and every third order lands on one customer. Results
        must be IDENTICAL between engines regardless (skew moves plans —
        AQE splits, broadcast thresholds — never values); divergences here
        are real bugs (nondeterministic tiebreaks on newly-tied groups,
        driver-side assumptions about group sizes).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.01"
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKEW = "--skew" in sys.argv
DST = os.path.join(_ROOT, ".advdata_skew" if SKEW else ".advdata")

PASSTHROUGH = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "embeddings",
]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    # --skew: 85% of events collapse onto the lexicographically-first
    # event_type (every type stays PRESENT — mixture weights fail fast on
    # absent sources, by design); every third order lands on one customer.
    etype = (
        "CASE WHEN event_id % 20 < 17 THEN "
        "(SELECT min(event_type) FROM '{src}/events.parquet') "
        "ELSE event_type END".format(src=SRC)
        if SKEW
        else "event_type"
    )
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN event_id % 19 = 0 THEN NULL
                 WHEN event_id % 23 = 1 THEN -value
                 ELSE value END AS value,
            CASE WHEN event_id % 97 = 11 THEN NULL ELSE user_id END AS user_id,
            {etype} AS event_type
          )
          FROM '{SRC}/events.parquet'
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    if SKEW:
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                CASE WHEN o_orderkey % 3 = 0 THEN
                  (SELECT min(c_custkey) FROM '{SRC}/customer.parquet')
                ELSE o_custkey END AS o_custkey
              )
              FROM '{SRC}/orders.parquet'
            ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
            """
        )
    con.execute(
        f"""
        COPY (
          SELECT d.* REPLACE (
            -- %37=5: INTERIOR newline (first space becomes chr(10), 1:1 so
            -- n_chars holds): real corpora are multi-line; probes every
            -- tokenizer/regex/split path's newline symmetry across engines.
            -- %61=9: TRAILING newline: probes the line-reader/split tail
            -- semantics and the dollar-anchor audit class.
            CASE WHEN d.doc_id % 53 = 3 THEN ''
                 WHEN d.doc_id % 11 = 7 AND twin.text IS NOT NULL
                 THEN twin.text
                 WHEN d.doc_id % 37 = 5 THEN regexp_replace(d.text, ' ', chr(10))
                 WHEN d.doc_id % 61 = 9 THEN d.text || chr(10)
                 -- %71=13: LONG repetitive doc (~30x) — shingle/token
                 -- explodes, chunking, and repetition scores on the
                 -- multi-KB docs a real crawl always contains
                 WHEN d.doc_id % 71 = 13 THEN repeat(d.text || ' ', 30)
                 -- %83=17: WHITESPACE-ONLY text (non-zero chars, zero
                 -- tokens) — distinct from the empty-string class: every
                 -- trim/token/ratio denominator must agree when length>0
                 -- but the tokenizer yields nothing
                 WHEN d.doc_id % 83 = 17 THEN '   '
                 ELSE d.text END AS text,
            CASE WHEN d.doc_id % 53 = 3 THEN 0
                 WHEN d.doc_id % 11 = 7 AND twin.text IS NOT NULL
                 THEN length(twin.text)
                 WHEN d.doc_id % 61 = 9 THEN length(d.text) + 1
                 WHEN d.doc_id % 71 = 13 THEN length(repeat(d.text || ' ', 30))
                 WHEN d.doc_id % 83 = 17 THEN 3
                 ELSE d.n_chars END AS n_chars
          )
          FROM '{SRC}/documents.parquet' d
          LEFT JOIN '{SRC}/documents.parquet' twin
            ON twin.doc_id = d.doc_id - 7
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # rewrite events.ts as TIMESTAMP(NANOS) — the round-1 vintage shape
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev_path = os.path.join(DST, "events.parquet")
    tbl = pq.read_table(ev_path)
    i = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(
        i, pa.field("ts", pa.timestamp("ns")),
        tbl.column("ts").cast(pa.timestamp("ns")),
    )
    pq.write_table(tbl, ev_path, store_schema=False, coerce_timestamps=None)

    dups = con.execute(
        f"""SELECT count(*) FROM (
              SELECT text FROM '{DST}/documents.parquet'
              GROUP BY text HAVING count(*) > 1)"""
    ).fetchone()[0]
    print(f"duplicated text groups: {dups}")
    n, nulls = con.execute(
        f"SELECT count(*), sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) "
        f"FROM '{DST}/events.parquet'"
    ).fetchone()
    print(f"advdata written: {n} events, {nulls} NULL values")


if __name__ == "__main__":
    main()
