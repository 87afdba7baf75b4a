#!/usr/bin/env python
"""SimHash parameter sweep driven by the q_simhash_recall measurement
(VERDICT r11 task 1): the r11 query measured recall 0.75-0.92 /
precision 0.0015-0.03 at the 32-bit / 4x8-band / Hamming<=3 defaults —
the method floods its verify stage with ~30-600x more candidate work
than true pairs. This tool sweeps bits x band-layout x Hamming
threshold against the SAME exact ground truth (char-8 Jaccard >= 0.2 on
the bounded doc sample) and prints the full matrix, so the new defaults
are picked from measurements, not vibes.

Construction parity: fingerprints are computed HERE with the exact
md5-hex-prefix recipe the engine and its DuckDB oracle share (per-token
32-bit hash = hex chars 1-8; the 64-bit extension appends a second
independent 32-bit half from hex chars 9-16), so a config chosen from
this matrix transplants literally into simhash()/oracles.py.

Usage: python tools/sweep_simhash.py [sf_dir ...]   (default sf0.01 + sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# exact truth + both 32-bit fingerprint halves, DuckDB-side (the oracle's
# own construction; doc bound matches q_simhash_recall)
_SQL = r"""
WITH docs AS (
    SELECT doc_id, text
    FROM read_parquet('{dir}/documents.parquet')
    WHERE doc_id < 1000
),
tok AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(text), '[ \t\n\f\r\x0b]+')) AS tok
    FROM docs
),
h AS (
    SELECT doc_id,
           CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) AS h_lo,
           CAST('0x' || substring(md5(tok), 9, 8) AS BIGINT) AS h_hi
    FROM tok
),
sums AS (
    SELECT doc_id, {lo_sums}, {hi_sums}
    FROM h GROUP BY doc_id
)
SELECT doc_id, {lo_fp} AS fp_lo, {hi_fp} AS fp_hi FROM sums
"""

_TRUTH_SQL = r"""
WITH docs AS (
    SELECT doc_id, text
    FROM read_parquet('{dir}/documents.parquet')
    WHERE doc_id < 1000
),
sh AS (
    SELECT DISTINCT doc_id, substring(text, CAST(i AS INTEGER), 8) AS shingle
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
          FROM docs)
    WHERE substring(text, CAST(i AS INTEGER), 8) IS NOT NULL
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter_all AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter_all
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i / (sa.sz + sb.sz - i) >= 0.2
"""


def _sum_exprs(col: str, prefix: str) -> tuple[str, str]:
    sums = ", ".join(
        f"CAST(sum(CASE WHEN ({col} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT)"
        f" AS {prefix}{i}"
        for i in range(32)
    )
    fp = " + ".join(
        f"CASE WHEN {prefix}{i} > 0 THEN CAST({2**i} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
        for i in range(32)
    )
    return sums, fp


_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    return _POP[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1)


def sweep(sf_dir: str) -> list[dict]:
    con = duckdb.connect()
    lo_sums, lo_fp = _sum_exprs("h_lo", "a")
    hi_sums, hi_fp = _sum_exprs("h_hi", "b")
    fp = con.execute(
        _SQL.format(dir=sf_dir, lo_sums=lo_sums, hi_sums=hi_sums,
                    lo_fp=lo_fp, hi_fp=hi_fp)
    ).fetchdf().sort_values("doc_id")
    truth = con.execute(_TRUTH_SQL.format(dir=sf_dir)).fetchall()
    ids = fp["doc_id"].to_numpy()
    pos = {d: i for i, d in enumerate(ids)}
    lo = fp["fp_lo"].to_numpy().astype(np.uint64)
    hi = fp["fp_hi"].to_numpy().astype(np.uint64)
    n = len(ids)
    ia, ib = np.triu_indices(n, k=1)
    ham32 = popcount64(lo[ia] ^ lo[ib])
    ham64 = ham32 + popcount64(hi[ia] ^ hi[ib])
    is_true = np.zeros(len(ia), dtype=bool)
    # pair (i, j) i<j at flat index — mark truth
    flat = {}
    for k in range(len(ia)):
        flat[(ia[k], ib[k])] = k
    n_true = 0
    for a, b in truth:
        i, j = pos[a], pos[b]
        if i > j:
            i, j = j, i
        is_true[flat[(i, j)]] = True
        n_true += 1

    def band_pairs(nb: int, bb: int, use64: bool) -> np.ndarray:
        """Boolean mask over the pair index: shares >= 1 of nb bands of
        bb bits laid over the (64 if use64 else 32)-bit fingerprint
        (lo = bits 0-31, hi = bits 32-63)."""
        mask = np.zeros(len(ia), dtype=bool)
        full = (hi.astype(object) << 32) | lo.astype(object) if use64 else lo.astype(object)
        for j in range(nb):
            vals = np.array([(int(v) >> (bb * j)) & ((1 << bb) - 1) for v in full])
            mask |= vals[ia] == vals[ib]
        return mask

    rows = []
    layouts = {
        32: [(4, 8), (8, 4), (2, 16)],
        64: [(4, 16), (8, 8), (16, 4)],
    }
    hams = {32: [1, 2, 3, 4, 5], 64: [2, 3, 4, 5, 6, 7, 8, 10, 12]}
    for bits in (32, 64):
        ham = ham32 if bits == 32 else ham64
        for nb, bb in layouts[bits]:
            cand = band_pairs(nb, bb, bits == 64)
            for t in hams[bits]:
                ver = cand & (ham <= t)
                hits = int((ver & is_true).sum())
                nv = int(ver.sum())
                rows.append({
                    "sf": sf_dir, "bits": bits, "bands": f"{nb}x{bb}",
                    "ham": t,
                    "lossless": nb >= t + 1,
                    "n_true": n_true,
                    "n_cand": int(cand.sum()),
                    "n_verified": nv,
                    "n_hits": hits,
                    "recall": round(hits / n_true, 4) if n_true else None,
                    "precision": round(hits / nv, 4) if nv else None,
                    "cand_ratio": round(int(cand.sum()) / n_true, 1) if n_true else None,
                })
    return rows


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    all_rows = []
    for d in dirs:
        all_rows.extend(sweep(d))
    hdr = ["sf", "bits", "bands", "ham", "lossless", "n_true", "n_cand",
           "n_verified", "n_hits", "recall", "precision", "cand_ratio"]
    print("\t".join(hdr))
    for r in all_rows:
        print("\t".join(str(r[h]) for h in hdr))
    with open(os.path.join(ROOT, ".sweep_simhash.json"), "w") as f:
        json.dump(all_rows, f, indent=1)


if __name__ == "__main__":
    main()
