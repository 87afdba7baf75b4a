#!/usr/bin/env python
"""Generate .bigdata/ — a 10x-replicated sf0.1 vintage (~sf1: 6M lineitem
rows) for scale probes beyond the driver's largest testdata.

Each copy i shifts every key column by i * (stride of the table that OWNS
the key), so the ten copies are ten self-consistent shards of one larger
database: orders.o_custkey moves with customer.c_custkey, lineitem's three
FKs move with their dimensions, events.user_id moves with customer (it is
joined to c_custkey in the serving queries). region/nation are shared
dimensions and stay single-copy — exactly how a real 100 TB layout keeps
its small dims. Text/embeddings/timestamps are NOT perturbed: identical
text across copies makes every document a 10-way near-dup group, which
deliberately stresses the dedup candidate stage; identical timestamps put
10x the events in every rollup window.

Run from the repo root: python tools/gen_bigdata.py   (~30s, ~500 MB)
Probe with:            python tools/probe_bigscale.py
"""

from __future__ import annotations

import os
import shutil

import duckdb

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bigdata")
SRC = "/root/testdata/sf0.1"
K = 10

# strides: key space of the owning table (max+1 of the base vintage)
CUST = 15_000
ORD = 150_000
PART = 20_000
SUPP = 1_000
DOC = 5_000
VEC = 2_000
EVT = 100_000

# table -> list of (column, stride) to shift per copy; None = copy-0 only
PLAN: dict[str, list[tuple[str, int]] | None] = {
    "region": None,
    "nation": None,
    "customer": [("c_custkey", CUST)],
    "supplier": [("s_suppkey", SUPP)],
    "part": [("p_partkey", PART)],
    "orders": [("o_orderkey", ORD), ("o_custkey", CUST)],
    "lineitem": [("l_orderkey", ORD), ("l_partkey", PART), ("l_suppkey", SUPP)],
    "events": [("event_id", EVT), ("user_id", CUST)],
    "documents": [("doc_id", DOC)],
    "embeddings": [("vec_id", VEC)],
}


def main() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    con = duckdb.connect()
    for table, shifts in PLAN.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{OUT}/{table}.parquet"
        if shifts is None:
            shutil.copy(src, dst)
            continue
        cols = [f.strip() for f in con.sql(f"describe select * from '{src}'").fetchdf()["column_name"]]
        shifted = dict(shifts)
        select = ", ".join(
            f"(t.{c} + c.i * {shifted[c]}) AS {c}" if c in shifted else f"t.{c}"
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {select} FROM '{src}' t CROSS JOIN range({K}) c(i)) "
            f"TO '{dst}' (FORMAT parquet)"
        )
        n = con.sql(f"select count(*) from '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")

    # FK closure: a shard whose keys drifted would silently turn joins
    # into partial misses and make every probe ratio meaningless
    fks = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("events", "user_id", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    for child, ck, parent, pk in fks:
        orphans = con.sql(
            f"SELECT count(*) FROM '{OUT}/{child}.parquet' c "
            f"WHERE NOT EXISTS (SELECT 1 FROM '{OUT}/{parent}.parquet' p "
            f"WHERE p.{pk} = c.{ck})"
        ).fetchone()[0]
        assert orphans == 0, f"{child}.{ck} -> {parent}.{pk}: {orphans} orphans"
    print(f"wrote {OUT} (FK closure verified)")


if __name__ == "__main__":
    main()
