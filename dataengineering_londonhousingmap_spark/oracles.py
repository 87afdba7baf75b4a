"""DuckDB oracle SQL — the correctness twin of every query in queries.py.

Rules (mirror queries.py exactly or the value-hash mismatches):
  * identical output column names AND types (BIGINT for Spark longs,
    INTEGER for Spark ints — sums/len are cast explicitly because DuckDB
    widens to HUGEINT where Spark stays long);
  * identical float arithmetic ORDER inside expressions, then identical
    ``round(x, N)``;
  * DuckDB ``regexp_replace`` needs the ``'g'`` flag (Spark's is global by
    default) — every global replace below carries it;
  * md5 everywhere a hash is needed (bit-identical across engines).

EVERY catalog entry has an oracle (the driver scores a missing one as a
red row — VERDICT r02). Approximate operators are exact-oracled by
reproducing their md5-derived hyperplanes/centroids as SQL literals
(the brute-force twins remain as recall baselines); runtime streaming
semantics (watermark late-drop, dedup state expiry) are oracled by
replaying their empirically-probed boundary rules in SQL.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

# mirrors queries.STAGE_DIR — the manifest oracle reads the SAME staged
# files the Spark query wrote (layout-dependent stats can't be derived
# from the logical table content)
from .queries import STAGE_DIR as _STAGE_DIR  # noqa: E402 — single source of truth

# whitespace tokens of trimmed text; '' → empty list (mirrors functions.text.tokens)
_TOKENS = (
    "CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(text), '[ \\t\\n\\f\\r\\x0b]+') END"
)

# distinct char-8 shingles per doc (mirrors operators.dedup.char_shingles w=8)
_SHINGLES = """
  SELECT DISTINCT doc_id, substring(text, CAST(i AS INTEGER), 8) AS shingle
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM documents)
  WHERE substring(text, CAST(i AS INTEGER), 8) IS NOT NULL
"""

_NUM_HASHES = 16
_BANDS = 4
_ROWS_PER_BAND = _NUM_HASHES // _BANDS

# the universal-hash family must regenerate EXACTLY the Spark side's
# constants — single source of truth in operators.dedup
from .operators.dedup import MINHASH_P, _minhash_coeffs  # noqa: E402

_MINHASH_BASE = (
    f"(CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) % {MINHASH_P})"
)
_MINHASH_AGGS = ",\n    ".join(
    f"min(({a} * {_MINHASH_BASE} + {b}) % {MINHASH_P}) AS mh{i}"
    for i, (a, b) in enumerate(_minhash_coeffs(_NUM_HASHES))
)

_BAND_SELECTS = "\n  UNION ALL\n".join(
    "  SELECT doc_id, {b} AS band_idx, md5(concat_ws('|', {cols})) AS band_hash FROM sig".format(
        b=b,
        cols=", ".join(f"mh{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)),
    )
    for b in range(_BANDS)
)

# 64-bit SimHash as two 32-bit halves (r12 tuning, tools/sweep_simhash.py):
# h_lo from md5 hex chars 1-8, h_hi from chars 9-16; two positive BIGINTs
# keep every value and shift inside signed range on both engines.
_SIMHASH64_SUMS = ",\n    ".join(
    f"CAST(sum(CASE WHEN (h_{h} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS {p}{i}"
    for p, h in (("a", "lo"), ("b", "hi"))
    for i in range(32)
)
_SIMHASH64_FP_LO = " + ".join(
    f"CASE WHEN a{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for i in range(32)
)
_SIMHASH64_FP_HI = " + ".join(
    f"CASE WHEN b{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for i in range(32)
)

_STOPWORDS_SQL = "['the','a','an','and','or','of','to','in','is','it','for','on','with','as','by','at','this','that']"

_LANG_LISTS = {
    "en": "['the','and','of','is','to','in','that','with']",
    "de": "['der','die','das','und','ist','nicht','mit','ein']",
    "fr": "['le','la','les','et','est','une','pas','pour']",
    "es": "['el','los','las','es','una','por','con','para']",
}

_LANG_LISTS_DE = _LANG_LISTS["de"]
_LANG_LISTS_EN = _LANG_LISTS["en"]
_LANG_LISTS_ES = _LANG_LISTS["es"]
_LANG_LISTS_FR = _LANG_LISTS["fr"]

_DOT = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)

_BPE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r\x0b]"

# mixture-sampling rate arithmetic — single source of truth in queries.py
from .queries import _MIXTURE_WEIGHTS  # noqa: E402

# curation chain (quality score → language gate → content-fingerprint
# survivor), shared by q_corpus_curation and the full corpus pipeline
_CURATION_CTES = f"""base AS (
            SELECT doc_id, text,
                   length(text) AS nc,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
                   len({_TOKENS}) AS ntok,
                   len(list_filter({_TOKENS},
                       t -> list_contains({_STOPWORDS_SQL}, lower(t)))) AS stop_hits
            FROM documents
        ),
        scored AS (
            SELECT doc_id, text,
                   round(
                       least(nc / 500.0, 1.0) * 0.25
                       + (alpha / greatest(nc, 1)) * 0.25
                       + least((stop_hits / greatest(ntok, 1)) * 5.0, 1.0) * 0.25
                       + (CASE WHEN alpha / greatest(ntok, 1) BETWEEN 3.0 AND 12.0
                               THEN 1.0 ELSE 0.5 END) * 0.25
                   , 6) AS quality
            FROM base
        ),
        langs AS (
            SELECT doc_id,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS_DE}, t))) AS BIGINT) AS de,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS_EN}, t))) AS BIGINT) AS en,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS_ES}, t))) AS BIGINT) AS es,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS_FR}, t))) AS BIGINT) AS fr
            FROM (SELECT doc_id, list_transform({_TOKENS}, t -> lower(t)) AS tk FROM documents)
        ),
        kept AS (
            SELECT s.doc_id, s.quality,
                   md5(trim(regexp_replace(lower(s.text), '[ \\t\\n\\f\\r\\x0b]+', ' ', 'g'))) AS fingerprint
            FROM scored s JOIN langs l ON s.doc_id = l.doc_id
            WHERE s.quality >= 0.6
              AND greatest(l.de, l.en, l.es, l.fr) > 0
              AND NOT (l.de >= l.en AND l.de >= l.es AND l.de >= l.fr)
              AND (l.en >= l.es AND l.en >= l.fr)
        ),
        surv AS (
            SELECT doc_id, fingerprint, quality FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY fingerprint ORDER BY doc_id) AS rn
                FROM kept
            ) WHERE rn = 1
        )"""

_MIX_LANGS = ", ".join(f"'{s}'" for s in sorted(_MIXTURE_WEIGHTS))
_MIX_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{s}' THEN {w!r}e0" for s, w in sorted(_MIXTURE_WEIGHTS.items()))
    + " END"
)

# ---------------------------------------------------------------------------
# the oracle map
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {
    # -- scans / sinks ------------------------------------------------------
    "q_scan_parquet": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 30 AND l_shipdate >= TIMESTAMP '1998-01-01'
    """,
    "q_scan_csv": "SELECT r_regionkey, r_name FROM region",
    "q_sql_entry": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               CAST(round(sum(l_discount) * 100, 0) AS BIGINT)
                   / (100e0 * count(l_discount)) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_sink_partitioned": """
        SELECT event_id, user_id, value, event_type
        FROM events WHERE event_type = 'click'
    """,
    "q_sink_parquet": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'O'
    """,
    "q_scan_json": """
        SELECT event_id, event_type, value
        FROM events WHERE event_type = 'view'
    """,
    "q_create_rows": """
        SELECT CAST(site_id AS BIGINT) AS site_id, species,
               CAST(value AS DOUBLE) AS value
        FROM (VALUES (1, 'NO2', 42.0), (2, 'PM25', 11.5), (3, 'NO2', NULL))
             t(site_id, species, value)
    """,
    "q_scan_corrupt": """
        SELECT CAST(id AS BIGINT) AS id, CAST(value AS DOUBLE) AS value,
               is_corrupt
        FROM (VALUES (1, 10.5, FALSE), (NULL, NULL, TRUE), (3, NULL, FALSE),
                     (NULL, NULL, TRUE), (5, 2.25, FALSE))
             t(id, value, is_corrupt)
    """,
    "q_json_flatten": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               event_type
        FROM events
    """,
    "q_pipeline_listings": """
        WITH raw AS (
            SELECT CAST(l_orderkey AS VARCHAR) AS ad_id,
                   printf('https://ex.com/prop/%d/%d-%d-%d-%d-%d',
                          l_orderkey, l_linenumber, l_partkey, l_suppkey,
                          CAST(floor(l_extendedprice * 100) AS BIGINT),
                          CAST(floor(l_quantity) AS BIGINT)) AS link,
                   CASE WHEN l_linenumber = 7 THEN 'POA'
                        ELSE printf('£%d,%03d',
                                    CAST(floor(l_extendedprice) AS BIGINT) // 1000,
                                    CAST(floor(l_extendedprice) AS BIGINT) % 1000)
                   END AS price_raw,
                   printf('0.%02d miles Station %d',
                          l_partkey % 100, l_suppkey % 40) AS transport_raw
            FROM lineitem
        ),
        parsed AS (
            SELECT ad_id, link,
                   CAST(regexp_replace(price_raw, '[^0-9.]', '', 'g') AS DOUBLE) AS price,
                   CAST(string_split(transport_raw, ' miles ')[1] AS DOUBLE)
                       * 1.609344 AS distance_km,
                   string_split(transport_raw, ' miles ')[2] AS subway_station
            FROM raw
            WHERE regexp_matches(price_raw, '^[£,0-9]+$')
              AND contains(transport_raw, ' miles ')
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY ad_id ORDER BY link) AS rn
                FROM parsed
            ) WHERE rn = 1
        )
        SELECT subway_station,
               round(avg(price), 2) AS avg_price,
               count(*) AS n_listings,
               round(min(price), 2) AS min_price,
               round(max(price), 2) AS max_price
        FROM deduped
        WHERE distance_km < 1.0 AND price IS NOT NULL AND subway_station IS NOT NULL
        GROUP BY subway_station
    """,
    "q_pipeline_dexters": """
        WITH raw AS (
            SELECT CAST(l_orderkey AS VARCHAR) AS ad_id,
                   printf('https://dex.com/%d/%d-%d-%d-%d-%d',
                          l_orderkey, l_linenumber, l_partkey, l_suppkey,
                          CAST(floor(l_extendedprice * 100) AS BIGINT),
                          CAST(floor(l_quantity) AS BIGINT)) AS link,
                   CASE WHEN l_linenumber % 7 = 6 THEN 'POA'
                        ELSE printf('£%d,%03d',
                                    CAST(floor(l_extendedprice) AS BIGINT) // 1000,
                                    CAST(floor(l_extendedprice) AS BIGINT) % 1000)
                   END AS price_raw,
                   CASE WHEN l_linenumber % 7 = 3 THEN 'far'
                        ELSE printf('%dm', l_partkey % 2000) END AS distance_raw,
                   CASE WHEN l_linenumber % 7 = 3
                            THEN printf('Station %d %dm', l_suppkey % 40, l_partkey % 2000)
                        WHEN l_linenumber % 7 = 4
                            THEN printf('Victoria Hub%d', l_suppkey % 40)
                        WHEN l_linenumber % 7 = 5
                            THEN printf('Stop Network Rail Cross%d', l_suppkey % 40)
                        ELSE printf('Station %d', l_suppkey % 40) END AS s_raw,
                   printf('Line %d', l_partkey % 11) AS tube_line
            FROM lineitem
        ),
        rep AS (
            SELECT *, NOT regexp_matches(distance_raw, '[0-9]') AS leak,
                   string_split(s_raw, ' ') AS toks
            FROM raw WHERE regexp_matches(price_raw, '^[£,0-9]+$')
        ),
        s1 AS (
            SELECT ad_id, link, tube_line,
                   CAST(replace(replace(price_raw, '£', ''), ',', '') AS DOUBLE) AS price,
                   CASE WHEN leak THEN array_to_string(toks[1:len(toks)-1], ' ')
                        ELSE s_raw END AS station1,
                   CASE WHEN leak THEN toks[len(toks)] ELSE distance_raw END AS distance1
            FROM rep
        ),
        s2 AS (
            SELECT ad_id, link, tube_line, price, distance1,
                   CASE WHEN contains(station1, 'Victoria')
                        THEN CASE WHEN (string_split(station1, ' '))[1] = 'Victoria'
                                       AND len(string_split(station1, ' ')) >= 2
                                  THEN (string_split(station1, ' '))[2]
                                  ELSE 'Victoria' END
                        ELSE station1 END AS station2
            FROM s1
        ),
        s3 AS (
            SELECT ad_id, link, tube_line, price,
                   CASE WHEN regexp_matches(station2,
                                 'London Overground|Railway|Network Rail|Tramlink')
                        THEN (string_split(station2, ' '))[len(string_split(station2, ' '))]
                        ELSE station2 END AS subway_station,
                   CAST(regexp_replace(distance1, 'm$', '') AS DOUBLE) / 1000.0
                       AS distance_km
            FROM s2
        ),
        ded AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY ad_id ORDER BY link) AS rn
                FROM s3
            ) WHERE rn = 1
        )
        SELECT ad_id, round(price, 2) AS price, subway_station,
               round(distance_km, 6) AS distance_km, tube_line
        FROM ded
    """,
    "q_pipeline_air": """
        SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS site_code,
               event_type AS species_code,
               date_trunc('hour', ts) AS hour,
               CAST(round(sum(coalesce(value, 0)) * 100, 0) AS BIGINT)
                   / (100.0 * count(*)) AS avg_value,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    """,
    "q_pipeline_stations": """
        WITH zones AS (
            SELECT s_name AS "Station", 'zone_' || CAST(i AS VARCHAR) AS "Transport Zone"
            FROM supplier, (VALUES (1), (2), (3)) z(i)
            WHERE (s_suppkey + i) % 3 = 0
        ),
        lines AS (
            SELECT CASE WHEN s_suppkey % 4 = 0 THEN 'W-' || s_name ELSE s_name END
                       AS "Station",
                   'Line ' || CAST(s_suppkey % 5 AS VARCHAR) AS "Tube Line"
            FROM supplier WHERE s_suppkey % 2 = 0
        ),
        mapping AS (
            SELECT 'W-' || s_name AS wiki_name, s_name AS api_name
            FROM supplier WHERE s_suppkey % 4 = 0
        ),
        remapped AS (
            SELECT coalesce(m.api_name, l."Station") AS "Station", l."Tube Line"
            FROM lines l LEFT JOIN mapping m ON l."Station" = m.wiki_name
        )
        SELECT z."Station", z."Transport Zone",
               coalesce(r."Tube Line", 'Overground line') AS "Tube Line"
        FROM zones z LEFT JOIN remapped r ON z."Station" = r."Station"
    """,
    "q_serving_dashboard": """
        WITH raw AS (
            SELECT CAST(l_orderkey AS VARCHAR) AS ad_id,
                   printf('https://ex.com/prop/%d/%d-%d-%d-%d-%d',
                          l_orderkey, l_linenumber, l_partkey, l_suppkey,
                          CAST(floor(l_extendedprice * 100) AS BIGINT),
                          CAST(floor(l_quantity) AS BIGINT)) AS link,
                   CASE WHEN l_linenumber = 7 THEN 'POA'
                        ELSE printf('£%d,%03d',
                                    CAST(floor(l_extendedprice) AS BIGINT) // 1000,
                                    CAST(floor(l_extendedprice) AS BIGINT) % 1000)
                   END AS price_raw,
                   printf('0.%02d miles Station %d',
                          l_partkey % 100, l_suppkey % 40) AS transport_raw
            FROM lineitem
        ),
        parsed AS (
            SELECT ad_id, link,
                   CAST(regexp_replace(price_raw, '[^0-9.]', '', 'g') AS DOUBLE) AS price,
                   CAST(string_split(transport_raw, ' miles ')[1] AS DOUBLE)
                       * 1.609344 AS distance_km,
                   string_split(transport_raw, ' miles ')[2] AS subway_station
            FROM raw
            WHERE regexp_matches(price_raw, '^[£,0-9]+$')
              AND contains(transport_raw, ' miles ')
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY ad_id ORDER BY link) AS rn
                FROM parsed
            ) WHERE rn = 1
        ),
        prices AS (
            SELECT subway_station,
                   round(avg(price), 2) AS avg_price,
                   count(*) AS n_listings
            FROM deduped
            WHERE distance_km < 1.0 AND price IS NOT NULL
              AND subway_station IS NOT NULL
            GROUP BY subway_station
        ),
        pollution AS (
            SELECT 'Station ' || CAST((user_id % 20) * 2 AS VARCHAR) AS subway_station,
                   event_type AS species_code,
                   CAST(round(sum(coalesce(value, 0)) * 100, 0) AS BIGINT)
                       / (100e0 * count(*)) AS avg_value,
                   round(max(coalesce(value, 0)), 4) AS max_value,
                   count(*) AS n_measurements
            FROM events
            GROUP BY 1, 2
        ),
        dim AS (
            SELECT 'Station ' || CAST(i AS VARCHAR) AS subway_station,
                   'Line ' || CAST(i % 11 AS VARCHAR) AS tube_line,
                   CAST(i % 6 + 1 AS VARCHAR) AS transport_zone
            FROM generate_series(0, 39) t(i)
        )
        SELECT p.subway_station, p.avg_price, p.n_listings,
               po.species_code, po.avg_value, po.max_value, po.n_measurements,
               d.tube_line, d.transport_zone
        FROM prices p
        LEFT JOIN pollution po ON p.subway_station = po.subway_station
        LEFT JOIN dim d ON p.subway_station = d.subway_station
    """,
    # -- projections / filters ---------------------------------------------
    "q_project": "SELECT c_custkey, c_name, c_mktsegment AS segment FROM customer",
    "q_filter": """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
    """,
    "q_filter_regex": """
        SELECT p_partkey, p_name, p_type
        FROM part WHERE regexp_matches(p_name, '^(red|blue) ')
    """,
    "q_filter_contains": """
        SELECT p_partkey, p_name, p_type
        FROM part WHERE p_type LIKE '%PROMO%'
    """,
    "q_conditional_update": """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount > 0.05 THEN 0.05 ELSE l_discount END
                   AS discount_capped
        FROM lineitem
    """,
    # -- joins --------------------------------------------------------------
    "q_join_left": """
        SELECT n_nationkey, n_name, r_name
        FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
    """,
    "q_join_broadcast_map": """
        SELECT c_custkey, c_name, n_name AS nation_name
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
    "q_join_nn": """
        SELECT c_custkey, s_suppkey AS nearest_suppkey,
               round(abs(c_acctbal - s_acctbal), 6) AS dist
        FROM (
            SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal,
                   row_number() OVER (
                       PARTITION BY c_custkey
                       ORDER BY abs(c_acctbal - s_acctbal), s_suppkey
                   ) AS rn
            FROM customer CROSS JOIN supplier
        ) WHERE rn = 1
    """,
    "q_join_nn_gridded": """
        WITH c AS (
            SELECT c_custkey,
                   (c_custkey % 100) / 10.0 AS latitude,
                   (c_custkey * 7 % 100) / 10.0 AS longitude
            FROM customer
        ), s AS (
            SELECT s_suppkey,
                   (s_suppkey * 13 % 100) / 10.0 AS r_latitude,
                   (s_suppkey * 31 % 100) / 10.0 AS r_longitude
            FROM supplier
        )
        SELECT c_custkey, s_suppkey AS nearest_suppkey,
               round(abs(latitude - r_latitude) + abs(longitude - r_longitude), 6) AS dist
        FROM (
            SELECT c.c_custkey, s.s_suppkey, c.latitude, c.longitude,
                   s.r_latitude, s.r_longitude,
                   row_number() OVER (
                       PARTITION BY c.c_custkey
                       ORDER BY abs(latitude - r_latitude) + abs(longitude - r_longitude),
                                s_suppkey
                   ) AS rn
            FROM c CROSS JOIN s
        ) WHERE rn = 1
    """,
    "q_join_zip": """
        WITH l AS (
            SELECT r_name, row_number() OVER (ORDER BY r_regionkey) AS rn FROM region
        ), r AS (
            SELECT n_name, row_number() OVER (ORDER BY n_nationkey) AS rn
            FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 5)
        )
        SELECT l.r_name, r.n_name FROM l JOIN r USING (rn)
    """,
    "q_star_join": """
        SELECT r_name, n_name,
               count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q_join_salted": """
        SELECT s_name, count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
    """,
    "q_join_bucketed": """
        SELECT o_orderpriority, count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "q_join_semi_anti": """
        SELECT c_custkey, c_name, TRUE AS has_open_order
        FROM customer WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        UNION ALL
        SELECT c_custkey, c_name, FALSE AS has_open_order
        FROM customer WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    "q_set_ops": """
        SELECT custkey, 'only_open' AS bucket FROM (
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT custkey, 'both' AS bucket FROM (
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "q_join_asof": """
        WITH r AS (
            SELECT o_custkey AS user_id, o_orderdate,
                   max(o_orderkey) AS last_orderkey
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts,
               r.o_orderdate AS asof_o_orderdate, r.last_orderkey
        FROM events e
        ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
    """,
    # -- aggregations -------------------------------------------------------
    "q_groupby_avg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               CAST(round(sum(l_quantity), 0) AS BIGINT)
                   / (1.0 * count(l_quantity)) AS avg_qty,
               CAST(round(sum(l_extendedprice) * 100, 0) AS BIGINT)
                   / (100.0 * count(l_extendedprice)) AS avg_price,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q_groupby_window_avg": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(round(sum(value) * 100, 0) AS BIGINT)
                   / (100.0 * count(value)) AS avg_value,
               count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "q_count_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_suppliers,
               count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_rollup": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS g,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "q_cube": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS g,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "q_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_argmin": """
        SELECT c_nationkey, c_custkey AS min_custkey,
               round(c_acctbal, 2) AS min_acctbal
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (
                       PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                   ) AS rn
            FROM customer
        ) WHERE rn = 1
    """,
    "q_union_all": """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_totalprice > 50000.0
    """,
    "q_null_audit": """
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value
        FROM events
    """,
    # -- windows / top-k ----------------------------------------------------
    "q_window_analytics": """
        SELECT event_id, event_type, ts,
               round(lag(value, 1) OVER w, 6) AS prev_value,
               round(avg(value) OVER (PARTITION BY event_type
                     ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                   AS moving_avg3,
               CAST(row_number() OVER w AS BIGINT) AS seq
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
    "q_first_match": f"""
        SELECT doc_id, CAST(list_position({_TOKENS}, 'data') AS BIGINT) AS first_pos
        FROM documents
        WHERE list_position({_TOKENS}, 'data') > 0
    """,
    "q_limit": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    # -- sort / dedup -------------------------------------------------------
    "q_sort": """
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
        FROM (
            SELECT * FROM customer
            ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
            LIMIT 50
        )
    """,
    "q_dedup": "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "q_dedup_key": """
        SELECT o_custkey, o_orderkey, o_orderdate
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   row_number() OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    # -- reshape ------------------------------------------------------------
    "q_pivot_onehot": """
        SELECT c_nationkey,
               max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'Yes' ELSE 'No' END) AS "AUTOMOBILE",
               max(CASE WHEN c_mktsegment = 'BUILDING'   THEN 'Yes' ELSE 'No' END) AS "BUILDING",
               max(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 'Yes' ELSE 'No' END) AS "FURNITURE",
               max(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 'Yes' ELSE 'No' END) AS "HOUSEHOLD",
               max(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 'Yes' ELSE 'No' END) AS "MACHINERY"
        FROM customer GROUP BY c_nationkey
    """,
    "q_unpivot": """
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
        FROM lineitem WHERE l_orderkey <= 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax' AS measure, l_tax AS val
        FROM lineitem WHERE l_orderkey <= 100
    """,
    "q_split_sessions": """
        SELECT event_id, user_id,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM events
    """,
    # -- training-data: dedup ----------------------------------------------
    "q_dedup_exact": r"""
        SELECT min(doc_id) AS doc_id,
               md5(trim(regexp_replace(lower(text), '[ \t\n\f\r\x0b]+', ' ', 'g'))) AS fingerprint
        FROM documents
        GROUP BY md5(trim(regexp_replace(lower(text), '[ \t\n\f\r\x0b]+', ' ', 'g')))
    """,
    "q_dedup_minhash": f"""
        WITH sh AS ({_SHINGLES}),
        sig AS (
            SELECT doc_id,
                   {_MINHASH_AGGS}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
        {_BAND_SELECTS}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
    """,
    "q_dedup_simhash": f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '[ \\t\\n\\f\\r\\x0b]+')) AS tok
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) AS h_lo,
                   CAST('0x' || substring(md5(tok), 9, 8) AS BIGINT) AS h_hi
            FROM tok
        ),
        sums AS (
            SELECT doc_id,
                   {_SIMHASH64_SUMS}
            FROM h GROUP BY doc_id
        )
        SELECT doc_id,
               CAST({_SIMHASH64_FP_LO} AS BIGINT) AS simhash_lo,
               CAST({_SIMHASH64_FP_HI} AS BIGINT) AS simhash_hi
        FROM sums
    """,
    "q_ngram_jaccard": f"""
        WITH sh AS ({_SHINGLES}),
        sig AS (
            SELECT doc_id,
                   {_MINHASH_AGGS}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
        {_BAND_SELECTS}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a
            JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
            WHERE a.doc_id < b.doc_id
        ),
        sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
        ),
        inter AS (
            SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
            FROM cand c
            JOIN sh a ON a.doc_id = c.id_a
            JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
            GROUP BY c.id_a, c.id_b
        )
        SELECT id_a, id_b,
               round(i / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / (sa.sz + sb.sz - i) >= 0.2
    """,
    # -- training-data: similarity -----------------------------------------
    "q_embed_topk": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id < 10
        ),
        scored AS (
            SELECT q.query_id, e.vec_id AS match_id,
                   CASE WHEN sqrt({_DOT.format(a='e.embedding', b='e.embedding')})
                           * sqrt({_DOT.format(a='q.qe', b='q.qe')}) > 0
                        THEN {_DOT.format(a='e.embedding', b='q.qe')}
                             / (sqrt({_DOT.format(a='e.embedding', b='e.embedding')})
                                * sqrt({_DOT.format(a='q.qe', b='q.qe')}))
                   END AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, match_id, round(cosine, 6) + 0e0 AS cosine,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT query_id, match_id, cosine,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
                   ) AS rank
            FROM scored
        ) WHERE rank <= 5
    """,
    "q_dedup_embed_exact": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_DOT.format(a='a.embedding', b='b.embedding')}
                     / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
                        * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_DOT.format(a='a.embedding', b='b.embedding')}
              / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
                 * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})) >= 0.42
    """,
    "q_dedup_semantic": f"""
        WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE {_DOT.format(a='a.embedding', b='b.embedding')}
                  / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
                     * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})) >= 0.42
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src
        )
        SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id
    """,
    # q_dedup_embed: intentionally no oracle (LSH-candidate subset is
    # approximate by design; q_dedup_embed_exact is the exact twin)
    # q_embed_ann_lsh: intentionally no oracle (approximate by design)
    # q_embed_ann_ivf: intentionally no oracle (approximate by design)
    # -- training-data: text ------------------------------------------------
    "q_token_count": f"""
        SELECT doc_id,
               CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "q_text_quality": f"""
        WITH base AS (
            SELECT doc_id,
                   length(text) AS nc,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
                   len({_TOKENS}) AS ntok,
                   len(list_filter({_TOKENS},
                       t -> list_contains({_STOPWORDS_SQL}, lower(t)))) AS stop_hits
            FROM documents
        )
        SELECT doc_id,
               round(
                   least(nc / 500.0, 1.0) * 0.25
                   + (alpha / greatest(nc, 1)) * 0.25
                   + least((stop_hits / greatest(ntok, 1)) * 5.0, 1.0) * 0.25
                   + (CASE WHEN alpha / greatest(ntok, 1) BETWEEN 3.0 AND 12.0
                           THEN 1.0 ELSE 0.5 END) * 0.25
               , 6) AS quality,
               CAST(nc AS BIGINT) AS n_chars
        FROM base
    """,
    "q_lang_id": f"""
        WITH toks AS (
            SELECT doc_id,
                   list_transform({_TOKENS}, t -> lower(t)) AS tk
            FROM documents
        ),
        hits AS (
            SELECT doc_id,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS['de']}, t))) AS BIGINT) AS de,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS['en']}, t))) AS BIGINT) AS en,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS['es']}, t))) AS BIGINT) AS es,
                   CAST(len(list_filter(tk, t -> list_contains({_LANG_LISTS['fr']}, t))) AS BIGINT) AS fr
            FROM toks
        )
        SELECT doc_id,
               CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                    WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                    WHEN en >= es AND en >= fr THEN 'en'
                    WHEN es >= fr THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM hits
    """,
    "q_corpus_curation": f"""
        WITH {_CURATION_CTES}
        SELECT doc_id, fingerprint, quality FROM surv
    """,
    # the curation survivors → hash train split → concat-and-chunk packing:
    # THE full corpus-build pipeline, composed from the same verified
    # fragments
    "q_pipeline_corpus": f"""
        WITH {_CURATION_CTES},
        train AS (
            SELECT doc_id FROM surv
            WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
                       AS BIGINT) % 10000 >= 1000
        ),
        toks AS (
            SELECT d.doc_id,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                   d.doc_id % 8 AS shard
            FROM documents d JOIN train t ON d.doc_id = t.doc_id
        ),
        cum AS (
            SELECT doc_id, shard, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id, n_tokens
                       ROWS UNBOUNDED PRECEDING
                   ) - n_tokens AS start
            FROM toks
        )
        SELECT doc_id, shard, CAST(start // 2048 AS BIGINT) AS pack_id,
               CAST(start % 2048 AS BIGINT) AS pack_offset, n_tokens
        FROM cum
    """,
    "q_fingerprint": r"""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[ \t\n\f\r\x0b]+', ' ', 'g'))) AS fingerprint,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, length(text)),
                           i -> CAST(ascii(substring(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007
               ) AS BIGINT) AS rhash
        FROM documents
    """,
    "q_multimodal_frames": """
        SELECT doc_id AS asset_id,
               CAST(doc_id % 60000 AS INTEGER) AS duration_ms,
               CAST(unnest(generate_series(0,
                    greatest(CAST(doc_id % 60000 AS INTEGER) - 1, 0), 1000))
                    AS INTEGER) AS frame_ts_ms
        FROM documents WHERE doc_id % 3 = 2
    """,
    # -- streaming ----------------------------------------------------------
    # real Structured Streaming runs; the batch SQL below is the semantic
    # equivalent the stream must converge to on finite input
    "q_stream_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(round(sum(value) * 100, 0) AS BIGINT)
                   / (100.0 * count(value)) AS avg_value,
               count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "q_stream_dedup": """
        SELECT event_id, user_id, event_type, value FROM events
    """,
    "q_stream_sessions": """
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
            SELECT *, sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM marked
        ),
        sessions AS (
            SELECT user_id, sess,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events,
                   round(sum(coalesce(value, 0)), 6) AS total_value
            FROM numbered GROUP BY user_id, sess
        )
        -- emitted = closed by a successor event, or timed out once the
        -- final watermark (global max ts - 2h) passed session end + gap;
        -- only a user's trailing session younger than that stays in state
        SELECT user_id, session_start, session_end, n_events, total_value
        FROM sessions
        WHERE sess < (SELECT max(sess) FROM sessions s2
                      WHERE s2.user_id = sessions.user_id)
           OR session_end + INTERVAL 30 MINUTE
              < (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
    """,
    "q_stream_join": """
        SELECT l.event_id, r.event_id AS r_event_id, l.user_id, l.ts,
               r.ts AS r_ts
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND l.event_type = 'click' AND r.event_type = 'view'
         AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    """,
    "q_stream_enrich": """
        SELECT c.c_nationkey, count(*) AS n,
               CAST(round(sum(e.value) * 100, 0) AS BIGINT)
                   / (100e0 * count(e.value)) AS avg_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    # CDC apply lands arg-max-by-event_id per user (order_col=event_id,
    # latest-wins) — the upsert table IS this window query
    "q_stream_cdc": """
        SELECT event_id, user_id, event_type, value
        FROM (SELECT event_id, user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    # -- training-data: multimodal -----------------------------------------
    "q_multimodal_features": """
        SELECT doc_id AS asset_id,
               CAST(128 AS INTEGER) AS n_bytes,
               round(
                   CAST(list_sum(list_transform(generate_series(1, 16),
                       i -> CAST('0x' || substring(md5(text), 2 * CAST(i AS INTEGER) - 1, 2) AS BIGINT)
                   )) AS DOUBLE) / 16.0
               , 6) AS byte_mean
        FROM documents
    """,
    # 4×4 nearest-neighbour resize of the 8×16 fixture matrix: column
    # stride 4 samples digest bytes {0,4,8,12} (payload is row-repeated),
    # so hex pairs at 1-based positions {1,9,17,25} of md5(text)
    "q_multimodal_resize": """
        SELECT doc_id AS asset_id,
               CAST(4 AS INTEGER) AS out_w,
               CAST(4 AS INTEGER) AS out_h,
               round(
                   CAST(list_sum(list_transform([1, 9, 17, 25],
                       i -> CAST('0x' || substring(md5(text), CAST(i AS INTEGER), 2) AS BIGINT)
                   )) AS DOUBLE) / 4.0
               , 6) AS resized_mean
        FROM documents
    """,
    # -- training-data: clustering / sampling / packing (round 2) -----------
    # the identical LSH→Jaccard edge set as q_ngram_jaccard, then min
    # reachable doc per node via recursive CTE — the declarative twin of the
    # engine's iterative min-label propagation
    "q_dedup_clusters": f"""
        WITH RECURSIVE sh AS ({_SHINGLES}),
        sig AS (
            SELECT doc_id,
                   {_MINHASH_AGGS}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
        {_BAND_SELECTS}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a
            JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
            WHERE a.doc_id < b.doc_id
        ),
        sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
        ),
        inter AS (
            SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
            FROM cand c
            JOIN sh a ON a.doc_id = c.id_a
            JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
            GROUP BY c.id_a, c.id_b
        ),
        jac AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i / (sa.sz + sb.sz - i) >= 0.2
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM jac
            UNION ALL
            SELECT id_b, id_a FROM jac
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src
        )
        SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
    """,
    "q_sample_stratified": """
        SELECT event_id, event_type, value
        FROM events
        WHERE CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || 'sample'), 1, 8)
                   AS BIGINT) % 10000
              < CASE WHEN event_type = 'view' THEN 5000
                     WHEN event_type = 'click' THEN 2500
                     ELSE 10000 END
    """,
    # identical rate arithmetic as operators/sampling.py:mixture_sample,
    # generated from the SAME weights dict (queries._MIXTURE_WEIGHTS) so the
    # two sides cannot drift; e-notation keeps literals DOUBLE
    "q_sample_mixture": f"""
        WITH counts AS (
            SELECT lang, CAST(count(*) AS DOUBLE) AS n
            FROM documents
            WHERE lang IN ({_MIX_LANGS})
            GROUP BY lang
        ),
        tmin AS (SELECT min(n / {_MIX_CASE}) AS t FROM counts),
        rates AS (
            SELECT lang,
                   CAST(floor({_MIX_CASE} * (SELECT t FROM tmin) / n * 10000)
                        AS BIGINT) AS b
            FROM counts
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || 'mixture'), 1, 8)
                   AS BIGINT) % 10000 < r.b
    """,
    "q_join_range": """
        SELECT e.event_id, s.s_suppkey AS band_id
        FROM events e
        JOIN supplier s
          ON e.value >= CAST(s.s_suppkey AS DOUBLE) * 10e0
         AND e.value <  CAST(s.s_suppkey AS DOUBLE) * 10e0 + 25e0
    """,
    "q_train_test_split": """
        SELECT doc_id,
               CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
                              AS BIGINT) % 10000 < 1000
                    THEN 'test' ELSE 'train' END AS split
        FROM documents
    """,
    "q_pack_sequences": f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                   doc_id % 8 AS shard
            FROM documents
        ),
        cum AS (
            SELECT doc_id, shard, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id, n_tokens
                       ROWS UNBOUNDED PRECEDING
                   ) - n_tokens AS start
            FROM toks
        )
        SELECT doc_id, shard, CAST(start // 2048 AS BIGINT) AS pack_id,
               CAST(start % 2048 AS BIGINT) AS pack_offset, n_tokens
        FROM cum
    """,
    "q_window_range": """
        SELECT event_id, event_type, ts,
               CAST(round(sum(value) OVER w * 100, 0) AS BIGINT) / 100e0
                   AS trailing_sum,
               count(value) OVER w AS trailing_n
        FROM events
        WINDOW w AS (
            PARTITION BY event_type ORDER BY epoch_us(ts)
            RANGE BETWEEN 10800000000 PRECEDING AND CURRENT ROW
        )
    """,
    "q_interpolate": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   round(CAST(round(sum(value) * 100, 0) AS BIGINT)
                         / (100e0 * count(value)), 6) AS observed
            FROM events WHERE event_id % 3 = 0
            GROUP BY 1, 2
        ),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(min(hour), max(hour),
                          INTERVAL 1 HOUR)) AS hour
            FROM hourly GROUP BY event_type
        ),
        g AS (
            SELECT s.event_type, s.hour, h.observed,
                   last_value(h.observed IGNORE NULLS) OVER fwd AS prev_v,
                   first_value(h.observed IGNORE NULLS) OVER bwd AS next_v,
                   last_value(CASE WHEN h.observed IS NOT NULL THEN s.hour END
                              IGNORE NULLS) OVER fwd AS prev_h,
                   first_value(CASE WHEN h.observed IS NOT NULL THEN s.hour END
                               IGNORE NULLS) OVER bwd AS next_h
            FROM spine s
            LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hour = h.hour
            WINDOW fwd AS (PARTITION BY s.event_type ORDER BY s.hour
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   bwd AS (PARTITION BY s.event_type ORDER BY s.hour
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, hour, observed,
               CASE WHEN observed IS NOT NULL THEN observed
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                    -- floor(x*1e6 + 0.5)/1e6, not round(x, 6): identical
                    -- double arithmetic on both engines (see queries.py)
                    THEN floor((prev_v + (next_v - prev_v)
                               * ((epoch_us(hour) - epoch_us(prev_h))
                                  / (1e0 * (epoch_us(next_h) - epoch_us(prev_h)))))
                               * 1e6 + 0.5) / 1e6
               END AS interpolated
        FROM g
    """,
    "q_window_ranks": """
        SELECT c_custkey, c_nationkey,
               ntile(4) OVER w AS quartile,
               rank() OVER w AS rnk,
               floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
               floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    # identical SQL string on both engines (queries.py:_SQL_GROUPING_SETS)
    "q_grouping_sets": """
        SELECT coalesce(l_returnflag, '<all>') AS rflag,
               coalesce(l_linestatus, '<all>') AS lstatus,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "q_winsorize": """
        WITH pct AS (
            SELECT l_returnflag,
                   percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS p05,
                   percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
               round(least(p.p95, greatest(p.p05, l.l_extendedprice)), 6) AS price_w
        FROM lineitem l JOIN pct p USING (l_returnflag)
    """,
    # the Spark side computes rank-under-md5 in two shard levels; shard is
    # a PREFIX of the sort key so (shard, md5) order == global md5 order
    "q_shuffle_corpus": """
        SELECT doc_id,
               row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS shuffle_pos
        FROM documents
    """,
    # Simpson index from exact integer char counts: one IEEE division —
    # bit-identical with no rounding needed
    "q_char_diversity": """
        WITH chars AS (
            SELECT doc_id,
                   substring(text, CAST(i AS INTEGER), 1) AS ch
            FROM documents, unnest(generate_series(1, length(text))) AS u(i)
            WHERE length(text) >= 1 AND doc_id % 3 = 0
        ),
        counts AS (
            SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
        )
        SELECT doc_id,
               1.0 - CAST(sum(c * c) AS DOUBLE) / CAST(sum(c) * sum(c) AS DOUBLE)
                   AS diversity,
               count(*) AS distinct_chars
        FROM counts GROUP BY doc_id
    """,
    "q_text_normalize": r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[ \t\n\f\r\x0b]+', ' ', 'g')) AS text_norm,
               trim(regexp_replace(lower(text), '[ \t\n\f\r\x0b]+', ' ', 'g')) <> text AS changed
        FROM documents
    """,
    # md5-uniform vs quality: /2^32 is exact, comparison bit-identical
    "q_sample_weighted": f"""
        WITH {_CURATION_CTES}
        SELECT s.doc_id, s.quality,
               CAST('0x' || substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                   AS u_int
        FROM scored s
        WHERE CAST('0x' || substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                  / 4294967296e0
              < s.quality
    """,
    # append mode emits a window exactly once, when the watermark
    # (max ts − 2h after the final batch) passes its end
    "q_stream_hourly_append": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(round(sum(value) * 100, 0) AS BIGINT)
                   / (100.0 * count(value)) AS avg_value,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
        HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR
               <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
    """,
    # top-1000 bigrams by (count desc, bigram asc) — total order, so the
    # common set is identical on both engines; scores are integer ratios
    "q_corpus_stats_score": r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '[ \t\n\f\r\x0b]+') AS t
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i + 1])) AS bg
            FROM tok WHERE len(t) >= 2
        ),
        top AS (
            SELECT bg FROM (
                SELECT bg, count(*) AS c,
                       row_number() OVER (ORDER BY count(*) DESC, bg) AS rn
                FROM bg GROUP BY bg
            ) WHERE rn <= 1000
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_bigrams FROM bg GROUP BY doc_id
        ),
        common AS (
            SELECT doc_id, count(*) AS n_common
            FROM bg WHERE bg IN (SELECT bg FROM top)
            GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_bigrams,
               coalesce(c.n_common, 0) AS n_common,
               floor(coalesce(c.n_common, 0) / CAST(p.n_bigrams AS DOUBLE) * 1e6 + 0.5)
                   / 1e6 AS coverage
        FROM per_doc p LEFT JOIN common c ON p.doc_id = c.doc_id
    """,
    # sum/count division: one IEEE division per cell, stable without games
    "q_drift_report": """
        WITH prev AS (
            SELECT source, lang, count(*) AS prev_docs,
                   floor(sum(n_chars) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
                       AS prev_mean_chars
            FROM documents WHERE doc_id % 10 <> 0 GROUP BY source, lang
        ),
        curr AS (
            SELECT source, lang, count(*) AS curr_docs,
                   floor(sum(n_chars) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
                       AS curr_mean_chars
            FROM documents GROUP BY source, lang
        )
        SELECT coalesce(p.source, c.source) AS source,
               coalesce(p.lang, c.lang) AS lang,
               coalesce(p.prev_docs, 0) AS prev_docs,
               coalesce(c.curr_docs, 0) AS curr_docs,
               coalesce(c.curr_docs, 0) - coalesce(p.prev_docs, 0) AS delta_docs,
               p.prev_mean_chars, c.curr_mean_chars
        FROM prev p FULL OUTER JOIN curr c
          ON p.source = c.source AND p.lang = c.lang
    """,
    # sequential left folds mirror Spark's F.aggregate accumulation order
    # exactly — same op sequence, bit-identical doubles
    "q_embed_norms": """
        SELECT vec_id,
               len(embedding) AS dim,
               floor(sqrt(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                   (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS l2_norm,
               floor(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(embedding, x -> CAST(x AS DOUBLE))),
                   (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS component_sum
        FROM embeddings
    """,
    # argmax by (n_chars, doc_id) per fingerprint — the best-duplicate
    # attribution next to the min-id survivor
    "q_survivorship": r"""
        WITH fp AS (
            SELECT md5(trim(regexp_replace(lower(text), '[ \t\n\f\r\x0b]+', ' ', 'g'))) AS fingerprint,
                   doc_id, source, n_chars
            FROM documents
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY fingerprint
                                         ORDER BY n_chars DESC, doc_id DESC) AS rn
            FROM fp
        )
        SELECT f.fingerprint,
               min(f.doc_id) AS survivor_id,
               count(*) AS n_dupes,
               max(CASE WHEN r.rn = 1 THEN r.source END) AS best_source,
               max(f.n_chars) AS max_chars
        FROM fp f JOIN ranked r
          ON f.fingerprint = r.fingerprint AND f.doc_id = r.doc_id
        GROUP BY f.fingerprint
    """,
    "q_anonymize": """
        SELECT event_id, user_id % 100 AS cohort,
               CASE WHEN count(*) OVER (PARTITION BY user_id % 100, event_type) < 100
                    THEN 'OTHER' ELSE event_type END AS event_type_anon
        FROM events
    """,
    # three schema-identical staged copies of the dim, tagged by format
    "q_multi_source_union": """
        SELECT r_regionkey, r_name, 'csv' AS src_format FROM region
        UNION ALL
        SELECT r_regionkey, r_name, 'json' AS src_format FROM region
        UNION ALL
        SELECT r_regionkey, r_name, 'parquet' AS src_format FROM region
    """,
    # first-failed-rule precedence mirrors the CASE chain exactly
    "q_rejects_audit": """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price'
                    WHEN NOT (o_orderstatus IN ('O', 'F', 'P')) THEN 'unknown_status'
                    WHEN NOT (o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                                                  '4-NOT SPECIFIED', '5-LOW'))
                         THEN 'unknown_priority'
                    WHEN o_totalprice > 400000 THEN 'price_outlier'
               END AS reject_reason
        FROM orders
        WHERE CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price'
                   WHEN NOT (o_orderstatus IN ('O', 'F', 'P')) THEN 'unknown_status'
                   WHEN NOT (o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                                                 '4-NOT SPECIFIED', '5-LOW'))
                        THEN 'unknown_priority'
                   WHEN o_totalprice > 400000 THEN 'price_outlier'
              END IS NOT NULL
    """,
    "q_pivot_agg": """
        SELECT c.c_nationkey,
               round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS "1-URGENT",
               round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS "2-HIGH",
               round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS "3-MEDIUM",
               round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS "4-NOT SPECIFIED",
               round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS "5-LOW"
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    # integer-cents numerator and denominator: one IEEE division per row
    "q_share_of_total": """
        WITH per_nation AS (
            SELECT c.c_nationkey,
                   CAST(round(sum(o.o_totalprice) * 100, 0) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        )
        SELECT c_nationkey,
               cents / 100e0 AS nation_spend,
               CAST(cents AS DOUBLE) / CAST(sum(cents) OVER () AS DOUBLE) AS share
        FROM per_nation
    """,
    # footer-stat pushdown is semantics-preserving: plain agg is the oracle
    "q_agg_pushdown": """
        SELECT min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price,
               count(*) AS n_orders
        FROM orders
    """,
    # bucketing is a layout property, not a semantic one
    "q_agg_bucketed": """
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    """,
    # hint-invariant semantics: the plain join is the oracle
    "q_join_hinted": """
        SELECT o.o_orderkey, c.c_custkey, c.c_nationkey, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    # gaps-and-islands, all sessions (no watermark clause — batch twin of
    # q_stream_sessions' oracle)
    "q_sessions_batch": """
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
            SELECT *, sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               round(sum(coalesce(value, 0)), 6) AS total_value
        FROM numbered GROUP BY user_id, sess
    """,
    "q_dedup_windowed": """
        SELECT event_id, user_id, event_type, value
        FROM (SELECT event_id, user_id, event_type, value,
                     row_number() OVER (
                         PARTITION BY user_id, event_type, date_trunc('hour', ts)
                         ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "q_domain_cap": """
        SELECT doc_id, source
        FROM (SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                                 doc_id) AS r
              FROM documents)
        WHERE r <= 40
    """,
    "q_scan_evolved": """
        SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
               1 AS batch
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority, 2 AS batch
        FROM orders WHERE o_orderkey % 2 = 1
    """,
    # q_approx_sketches: intentionally no oracle (HLL++/KLL are
    # engine-specific sketches; q_count_distinct / q_percentiles are the
    # exact twins and unit tests bound the error)
    "q_funnel": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t_signup
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t_signup
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
            GROUP BY e.user_id
        )
        SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
               CASE WHEN s3.t_purchase IS NOT NULL THEN 3
                    WHEN s2.t_click IS NOT NULL THEN 2
                    ELSE 1 END AS reached_step
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    "q_gap_fill": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   round(CAST(round(sum(value) * 100, 0) AS BIGINT)
                         / (100e0 * count(value)), 6) AS observed
            FROM events WHERE event_id % 3 = 0
            GROUP BY 1, 2
        ),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(min(hour), max(hour),
                          INTERVAL 1 HOUR)) AS hour
            FROM hourly GROUP BY event_type
        )
        SELECT s.event_type, s.hour, h.observed,
               last_value(h.observed IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS UNBOUNDED PRECEDING
               ) AS filled
        FROM spine s
        LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hour = h.hour
    """,
    "q_join_nn_topk": """
        WITH l AS (
            SELECT c_custkey, c_custkey % 10 AS c_lat,
                   (c_custkey // 10) % 10 AS c_lon
            FROM customer
        ),
        r AS (
            SELECT s_suppkey, s_suppkey % 10 AS s_lat,
                   (s_suppkey // 7) % 10 AS s_lon
            FROM supplier
        ),
        ranked AS (
            SELECT l.c_custkey, r.s_suppkey,
                   abs(l.c_lat - r.s_lat) + abs(l.c_lon - r.s_lon) AS d,
                   row_number() OVER (
                       PARTITION BY l.c_custkey
                       ORDER BY abs(l.c_lat - r.s_lat) + abs(l.c_lon - r.s_lon),
                                r.s_suppkey
                   ) AS rn
            FROM l CROSS JOIN r
        )
        SELECT c_custkey, s_suppkey AS near_suppkey, CAST(d AS BIGINT) AS dist
        FROM ranked WHERE rn <= 3
    """,
    "q_profile": """
        SELECT 'o_orderkey' AS col_name,
               CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_value,
               CAST(max(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(count(*) FILTER (o_orderstatus IS NULL) AS BIGINT),
               CAST(count(DISTINCT o_orderstatus) AS BIGINT),
               CAST(min(o_orderstatus) AS VARCHAR),
               CAST(max(o_orderstatus) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(count(*) FILTER (o_totalprice IS NULL) AS BIGINT),
               CAST(count(DISTINCT o_totalprice) AS BIGINT),
               CAST(min(o_totalprice) AS VARCHAR),
               CAST(max(o_totalprice) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(count(*) FILTER (o_orderpriority IS NULL) AS BIGINT),
               CAST(count(DISTINCT o_orderpriority) AS BIGINT),
               CAST(min(o_orderpriority) AS VARCHAR),
               CAST(max(o_orderpriority) AS VARCHAR)
        FROM orders
    """,
    "q_scan_orc": """
        SELECT p_partkey, p_brand, p_size, p_retailprice
        FROM part WHERE p_size > 25
    """,
    # identical replacement chain as functions/text.py:PII_PATTERNS (URL
    # first), with DuckDB's explicit 'g' flag
    "q_redact_pii": r"""
        WITH planted AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                        || '.com or https://site' || CAST(doc_id % 5 AS VARCHAR)
                        || '.io/p/' || CAST(doc_id AS VARCHAR)
                        || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 100 AS VARCHAR) AS t
            FROM documents
        ),
        red AS (
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(t, 'https?://[^ \t\n\f\r\x0b]+', '<URL>', 'g'),
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS r
            FROM planted
        )
        SELECT doc_id, md5(r) AS redacted_fp,
               CAST(len(regexp_extract_all(r, '<URL>')) AS INTEGER) AS n_urls,
               CAST(len(regexp_extract_all(r, '<EMAIL>')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(r, '<IP>')) AS INTEGER) AS n_ips
        FROM red
    """,
    "q_chunk_docs": f"""
        WITH tok AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
        ),
        starts AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t), 1), 48)) AS start
            FROM tok
        )
        SELECT doc_id, CAST(start AS INTEGER) AS start,
               CAST(len(list_slice(t, start, start + 63)) AS INTEGER) AS chunk_tokens,
               array_to_string(list_slice(t, start, start + 63), ' ') AS chunk_text
        FROM starts
        WHERE len(list_slice(t, start, start + 63)) > 0
    """,
    "q_decontaminate": f"""
        WITH sh AS ({_SHINGLES}),
        collisions AS (
            SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
            FROM sh c JOIN sh b ON c.shingle = b.shingle
            WHERE b.doc_id % 50 = 0 AND c.doc_id % 50 <> 0
            GROUP BY c.doc_id, b.doc_id
            HAVING count(*) >= 5
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bench_matches,
               CAST(max(n_shared) AS BIGINT) AS max_overlap
        FROM collisions GROUP BY doc_id
    """,
    "q_text_search": f"""
        WITH dl AS (
            SELECT doc_id, len({_TOKENS}) AS dl FROM documents
        ),
        stats AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest({_TOKENS}) AS term FROM documents)
            WHERE term IN ('spark', 'merge', 'window')
            GROUP BY doc_id, term
        ),
        dft AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
        )
        SELECT doc_id,
               floor(sum(
                   ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1e0)
                   * tf * 2.2e0
                   / (tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * dl / avgdl))
               ) * 1e6 + 0.5e0) / 1e6 AS bm25
        FROM tf
        JOIN dft USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY doc_id
    """,
    "q_merge_upsert": """
        WITH u AS (
            SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                   floor(o_totalprice * 1.05e0 * 1e2 + 0.5e0) / 1e2 AS o_totalprice,
                   0 AS pri
            FROM orders WHERE o_orderkey % 2 = 0
        ),
        b AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS pri
            FROM orders WHERE o_orderkey % 3 <> 0
        ),
        allrows AS (SELECT * FROM u UNION ALL SELECT * FROM b)
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               CASE WHEN pri = 0 THEN 'update' ELSE 'base' END AS src
        FROM allrows
        QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY pri) = 1
    """,
    # PIT lookup: the SCD2 CTE joined on key + validity range (contiguous
    # [from, next_from) ranges → at most one match per event)
    "q_scd2_lookup": """
        WITH ordered AS (
            SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                   lag(o_orderpriority) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ) AS prev
            FROM orders
        ),
        chg AS (
            SELECT * FROM ordered
            WHERE prev IS NULL OR o_orderpriority <> prev
        ),
        dim AS (
            SELECT o_custkey, o_orderpriority,
                   o_orderdate AS effective_from,
                   lead(o_orderdate) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ) AS effective_to
            FROM chg
        )
        SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS d,
               d.o_orderpriority AS priority_asof, d.effective_from
        FROM events e
        LEFT JOIN dim d
          ON e.user_id = d.o_custkey
         AND CAST(e.ts AS DATE) >= d.effective_from
         AND (d.effective_to IS NULL OR CAST(e.ts AS DATE) < d.effective_to)
    """,
    "q_scd2": """
        WITH ordered AS (
            SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                   lag(o_orderpriority) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ) AS prev
            FROM orders
        ),
        chg AS (
            SELECT * FROM ordered
            WHERE prev IS NULL OR o_orderpriority <> prev
        )
        SELECT o_custkey, o_orderpriority,
               o_orderdate AS effective_from,
               lead(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS effective_to,
               (lead(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) IS NULL) AS is_current
        FROM chg
    """,
    "q_purge_partitioned": """
        -- NULL-key rows SURVIVE a purge: the engine deletes via anti-join
        -- (NULL never equals a purge key), so the survivor predicate must
        -- keep NULLs explicitly — a bare user_id % 97 <> 0 is unknown on
        -- NULL and silently drops the anonymous rows (round-7 NULL-key
        -- advdata nasty caught exactly this).
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * 1e2) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events
        WHERE user_id IS NULL OR user_id % 97 <> 0
        GROUP BY event_type
    """,
    "q_manifest": f"""
        WITH fm AS (
            SELECT file_name, num_row_groups, num_rows
            FROM parquet_file_metadata('{_STAGE_DIR}/orders_manifest/*.parquet')
        ),
        rg AS (
            SELECT file_name,
                   CAST(stats_min_value AS BIGINT) AS mn,
                   CAST(stats_max_value AS BIGINT) AS mx
            FROM parquet_metadata('{_STAGE_DIR}/orders_manifest/*.parquet')
            WHERE path_in_schema = 'o_orderkey'
        )
        SELECT regexp_extract(fm.file_name, '[^/]+$') AS file,
               CAST(fm.num_row_groups AS INTEGER) AS n_row_groups,
               CAST(fm.num_rows AS BIGINT) AS n_rows,
               CAST(min(rg.mn) AS BIGINT) AS o_orderkey_min,
               CAST(max(rg.mx) AS BIGINT) AS o_orderkey_max
        FROM fm JOIN rg ON fm.file_name = rg.file_name
        GROUP BY fm.file_name, fm.num_row_groups, fm.num_rows
    """,
    "q_impute": """
        WITH base AS (
            SELECT event_id, event_type,
                   CASE WHEN event_id % 13 <> 0
                        THEN CAST(floor(value * 1e2) AS BIGINT) END AS cents
            FROM events
        )
        SELECT event_id, event_type,
               CAST(coalesce(cents,
                    CAST(floor(CAST(sum(cents) OVER w AS DOUBLE) / count(cents) OVER w
                               + 0.5e0) AS BIGINT)) AS BIGINT) AS value_cents,
               (cents IS NULL) AS was_imputed
        FROM base
        WINDOW w AS (PARTITION BY event_type)
    """,
    "q_heavy_hitters": f"""
        WITH counts AS (
            SELECT source, term, count(*) AS n
            FROM (SELECT source, unnest({_TOKENS}) AS term FROM documents)
            GROUP BY source, term
        )
        SELECT source, CAST(rank AS INTEGER) AS rank, term, CAST(n AS BIGINT) AS n
        FROM (
            SELECT source, term, n,
                   row_number() OVER (PARTITION BY source ORDER BY n DESC, term ASC) AS rank
            FROM counts
        )
        WHERE rank <= 3
    """,
    "q_join_full_outer": """
        WITH agg AS (
            SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
        )
        SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name,
               CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
               (c_custkey IS NOT NULL) AS in_customer,
               (o_custkey IS NOT NULL) AS has_orders
        FROM customer FULL JOIN agg ON c_custkey = o_custkey
    """,
    "q_array_hof": f"""
        SELECT doc_id,
               CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
               CAST(len(list_filter({_TOKENS}, x -> length(x) > 4)) AS INTEGER) AS n_long,
               CAST(coalesce(list_sum(list_transform({_TOKENS}, x -> length(x))), 0)
                    AS INTEGER) AS total_chars
        FROM documents
    """,
    "q_fk_audit": """
        WITH a AS (
            SELECT 'lineitem->orders' AS relation,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM lineitem l
            LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
              ON l.l_orderkey = o.o_orderkey
        ),
        b AS (
            SELECT 'orders->customer' AS relation,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM orders ord
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON ord.o_custkey = c.c_custkey
        )
        SELECT * FROM a UNION ALL SELECT * FROM b
    """,
    "q_retention": """
        WITH uw AS (
            SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events
        ),
        coh AS (
            SELECT user_id, week,
                   min(week) OVER (PARTITION BY user_id) AS cohort_week
            FROM uw
        )
        SELECT cohort_week,
               CAST(datediff('day', cohort_week, week) // 7 AS INTEGER) AS week_offset,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM coh
        GROUP BY cohort_week, week_offset
    """,
    "q_incremental_rollup": """
        -- full recompute: the Spark side merges stored state with delta
        -- partials, so a green hash proves merge(state, delta) == truth
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 1e2) AS BIGINT)) AS BIGINT) AS cents,
               CAST(min(CAST(floor(value * 1e2) AS BIGINT)) AS BIGINT) AS vmin_cents,
               CAST(max(CAST(floor(value * 1e2) AS BIGINT)) AS BIGINT) AS vmax_cents
        FROM events
        GROUP BY event_type
    """,
    "q_histogram": """
        WITH b AS (
            SELECT CAST(floor(o_totalprice / 25000e0) AS INTEGER) AS bucket
            FROM orders
        )
        SELECT bucket,
               CAST(bucket AS DOUBLE) * 25000e0 AS lo,
               CAST(bucket + 1 AS DOUBLE) * 25000e0 AS hi,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM b
        GROUP BY bucket
    """,
    "q_zorder": """
        WITH base AS (
            SELECT l_orderkey, l_linenumber,
                   l_partkey % 1024 AS p, l_suppkey % 1024 AS s
            FROM lineitem
        ),
        z0 AS (
            SELECT l_orderkey, l_linenumber, p, s,
                   p & 65535 AS xa, s & 65535 AS xb
            FROM base
        ),
        z1 AS (
            SELECT l_orderkey, l_linenumber, p, s,
                   (xa | (xa << 8)) & 16711935 AS xa,
                   (xb | (xb << 8)) & 16711935 AS xb
            FROM z0
        ),
        z2 AS (
            SELECT l_orderkey, l_linenumber, p, s,
                   (xa | (xa << 4)) & 252645135 AS xa,
                   (xb | (xb << 4)) & 252645135 AS xb
            FROM z1
        ),
        z3 AS (
            SELECT l_orderkey, l_linenumber, p, s,
                   (xa | (xa << 2)) & 858993459 AS xa,
                   (xb | (xb << 2)) & 858993459 AS xb
            FROM z2
        ),
        z4 AS (
            SELECT l_orderkey, l_linenumber, p, s,
                   (xa | (xa << 1)) & 1431655765 AS xa,
                   (xb | (xb << 1)) & 1431655765 AS xb
            FROM z3
        )
        SELECT l_orderkey, l_linenumber, p, s, xa | (xb << 1) AS zkey
        FROM z4
    """,
    "q_text_repetition": r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '[ \t\n\f\r\x0b]+') AS t
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i + 1])) AS bg
            FROM tok WHERE len(t) >= 2
        ),
        counts AS (
            SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_bigrams,
               CAST(max(c) AS BIGINT) AS max_bigram,
               round(CAST(max(c) AS BIGINT) / (1e0 * CAST(sum(c) AS BIGINT)), 6)
                   AS rep_ratio
        FROM counts GROUP BY doc_id
    """,
    # -- §2.10 UDF surface (round-2 promotion) ------------------------------
    # the Spark side walks synthesized token triples through the F13 pandas
    # UDF; the oracle regenerates the same triples and CASE-walks them:
    # partkey%13==0 rows hold only a non-Underground triple → NULL triple;
    # partkey%6 ∈ {1,3,5} puts an Underground line in triple 1; else the
    # always-Underground triple 2 wins
    "q_closest_line": """
        WITH t AS (
            SELECT p_partkey,
                   CAST(p_partkey % 6 AS INTEGER) AS i1,
                   (p_partkey % 13 = 0) AS only_bad
            FROM part
        )
        SELECT p_partkey,
               CASE WHEN only_bad THEN NULL
                    WHEN i1 IN (1, 3, 5) THEN printf('Stop %d', p_partkey % 40)
                    ELSE printf('Hub %d', p_partkey % 25) END AS subway_station,
               CASE WHEN only_bad THEN NULL
                    WHEN i1 IN (1, 3, 5) THEN printf('%dm', p_partkey % 9)
                    ELSE printf('%dm', p_partkey % 7) END AS distance,
               CASE WHEN only_bad THEN NULL
                    WHEN i1 = 1 THEN 'Northern line'
                    WHEN i1 = 3 THEN 'Victoria line'
                    WHEN i1 = 5 THEN 'Central line'
                    ELSE 'Jubilee line' END AS tube_line
        FROM t
    """,
    # each page carries two ad lines — rebuild both records per order
    "q_parse_pages": """
        SELECT CAST(o_orderkey AS VARCHAR) AS ad_id,
               printf('£%d', CAST(floor(o_totalprice) AS BIGINT)) AS price_raw,
               printf('Addr %d', o_custkey % 100) AS address
        FROM orders
        UNION ALL
        SELECT o_orderkey || '-b',
               printf('£%d', CAST(floor(o_totalprice) AS BIGINT) + 1),
               printf('Addr %d', o_custkey % 100 + 1)
        FROM orders
    """,
    # the native window formulation of the applyInPandas grouped z-score;
    # NULLIF guards zero-variance groups (single-event users are NULL via
    # stddev_samp already)
    "q_grouped_zscore": """
        SELECT event_id, user_id,
               round((value - avg(value) OVER w)
                     / NULLIF(stddev_samp(value) OVER w, 0), 6) + 0e0 AS zscore
        FROM events
        WHERE value IS NOT NULL
        WINDOW w AS (PARTITION BY user_id)
    """,
    # plain cross join + haversine filter — the Spark side's gridded
    # radius join must return exactly this set; the formula mirrors
    # functions/cleaning.py:haversine_km term-for-term
    "q_serving_radius": """
        WITH listings AS (
            SELECT c_custkey AS listing_id,
                   (c_custkey % 9000) + 1000 AS price,
                   51.5 + CAST(c_custkey % 40 AS DOUBLE) * 0.004 AS lat,
                   -0.2 + CAST((c_custkey // 40) % 50 AS DOUBLE) * 0.003 AS lon
            FROM customer
        ),
        stations AS (
            SELECT s_suppkey AS station_id,
                   51.5 + CAST(s_suppkey % 8 AS DOUBLE) * 0.02 AS s_lat,
                   -0.2 + CAST((s_suppkey // 8) % 5 AS DOUBLE) * 0.03 AS s_lon
            FROM supplier WHERE s_suppkey <= 40
        ),
        within AS (
            SELECT station_id, price
            FROM listings, stations
            WHERE 2 * 6371.0088 * asin(sqrt(
                      pow(sin(radians(s_lat - lat) / 2), 2)
                      + cos(radians(lat)) * cos(radians(s_lat))
                        * pow(sin(radians(s_lon - lon) / 2), 2)
                  )) <= 1.0
        )
        SELECT station_id,
               CAST(sum(price) AS BIGINT) / (1e0 * count(price)) AS avg_price,
               count(*) AS n_listings
        FROM within GROUP BY station_id
    """,
}


# ---------------------------------------------------------------------------
# generated ANN oracles (round 3): the LSH hyperplanes and IVF centroid
# seeding are md5-derived and deterministic, so the exact bucket/probe/rerank
# pipeline is reproducible in SQL — plane vectors are emitted as double
# literals from the SAME generator the Spark operator uses
# (operators/similarity.py:_hyperplane). Float noise between numpy's pairwise
# summation and SQL's sequential sum is ~1e-15 — orders of magnitude inside
# the round(·, 6) the queries apply and the driver's 9-sig-digit hashing.
# ---------------------------------------------------------------------------

from .operators.similarity import _hyperplane  # noqa: E402

_DIM = 64


def _dot_lit_sql(vec: str, plane: list[float]) -> str:
    """Σ vec[i]·plane_i with the plane as inline double literals."""
    return " + ".join(
        f"CAST({vec}[{i + 1}] AS DOUBLE) * {plane[i]!r}" for i in range(_DIM)
    )


def _bucket_sql(vec: str, table: int, planes_per_table: int) -> str:
    """The table's sign-bit bucket as an integer expression (mirrors
    operators/similarity.py:_with_table_buckets bit order exactly)."""
    bits = [
        f"(CASE WHEN {_dot_lit_sql(vec, _hyperplane(table * 1000 + j, _DIM))} >= 0 "
        f"THEN {2 ** j} ELSE 0 END)"
        for j in range(planes_per_table)
    ]
    return " + ".join(bits)


def _sketch_cte(planes_per_table: int, num_tables: int = 8) -> str:
    """Per-(vector, hash-table) buckets over the embeddings table."""
    selects = [
        f"SELECT vec_id, {t} AS t, {_bucket_sql('embedding', t, planes_per_table)} AS b "
        "FROM embeddings"
        for t in range(num_tables)
    ]
    return " UNION ALL ".join(selects)


_COS = (
    "({dotab}) / (sqrt({dotaa}) * sqrt({dotbb}))"
)


def _cos_sql(a: str, b: str) -> str:
    return _COS.format(
        dotab=_DOT.format(a=a, b=b),
        dotaa=_DOT.format(a=a, b=a),
        dotbb=_DOT.format(a=b, b=b),
    )


_ANN_RERANK = """
    SELECT query_id, match_id, round(cosine, 6) + 0e0 AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT query_id, match_id, cosine,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
               ) AS rank
        FROM scored
    ) WHERE rank <= 5
"""

ORACLES["q_embed_ann_lsh"] = f"""
    WITH sk AS ({_sketch_cte(planes_per_table=4)}),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS match_id
        FROM sk c JOIN sk q ON c.t = q.t AND c.b = q.b
        WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    scored AS (
        SELECT cand.query_id, cand.match_id,
               {_cos_sql('e.embedding', 'q.embedding')} AS cosine
        FROM cand
        JOIN embeddings e ON e.vec_id = cand.match_id
        JOIN embeddings q ON q.vec_id = cand.query_id
    )
    {_ANN_RERANK}
"""

ORACLES["q_dedup_embed"] = f"""
    WITH sk AS ({_sketch_cte(planes_per_table=8)}),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sk a JOIN sk b ON a.t = b.t AND a.b = b.b
        WHERE a.vec_id < b.vec_id
    ),
    scored AS (
        SELECT cand.id_a, cand.id_b,
               {_cos_sql('ea.embedding', 'eb.embedding')} AS cosine
        FROM cand
        JOIN embeddings ea ON ea.vec_id = cand.id_a
        JOIN embeddings eb ON eb.vec_id = cand.id_b
    )
    SELECT id_a, id_b, round(cosine, 6) AS cosine
    FROM scored WHERE cosine >= 0.42
"""

# IVF: deterministic centroid sample (16 smallest md5(vec_id)), argmin-cosine
# inverted-list assignment, 4 probed lists per query, exact rerank — mirrors
# operators/similarity.py:ann_topk_ivf tie-breaks ((−sim, cid) lexicographic).
_IVF_BODY = """
    sims AS (
        SELECT e.vec_id, e.embedding, c.cid, {cos_ec} AS sim
        FROM embeddings e CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY sim DESC, cid ASC
                   ) AS rn
            FROM sims
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cid FROM (
            SELECT vec_id AS query_id, cid,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY sim DESC, cid ASC
                   ) AS pr
            FROM sims WHERE vec_id < 10
        ) WHERE pr <= 4
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS match_id,
               {cos_aq} AS cosine
        FROM assigned a
        JOIN probes p ON a.cid = p.cid
        JOIN embeddings q ON q.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
    )
"""

ORACLES["q_embed_ann_ivf"] = f"""
    WITH cent AS (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS cid,
               embedding AS cvec
        FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
    ),
    {_IVF_BODY.format(
        cos_ec=_cos_sql('e.embedding', 'c.cvec'),
        cos_aq=_cos_sql('a.embedding', 'q.embedding'),
    )}
    {_ANN_RERANK}
"""


def _kmeans_iter_sql(prev: str, n: int) -> str:
    """One Lloyd iteration as CTEs: argmin-cosine assignment against {prev},
    per-(cluster, dim) mean, empty clusters keep {prev}'s centroid — mirrors
    operators/similarity.py:train_ivf_centroids."""
    cos = _cos_sql("e.embedding", "c.cvec")
    return f"""
    a{n} AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {cos} DESC, c.cid ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN {prev} c
        ) WHERE rn = 1
    ),
    m{n} AS (
        SELECT cid, i.i AS d, avg(CAST(embedding[i.i] AS DOUBLE)) AS mu
        FROM a{n}, (SELECT unnest(generate_series(1, {_DIM})) AS i) i
        GROUP BY cid, i.i
    ),
    l{n} AS (
        SELECT cid, list(mu ORDER BY d) AS mvec FROM m{n} GROUP BY cid
    ),
    c{n} AS (
        SELECT p.cid,
               COALESCE(l.mvec, CAST(p.cvec AS DOUBLE[])) AS cvec
        FROM {prev} p LEFT JOIN l{n} l USING (cid)
    )"""


ORACLES["q_embed_ann_ivf_trained"] = f"""
    WITH seed AS (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid,
               embedding AS cvec
        FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
    ),
    {_kmeans_iter_sql('seed', 1)},
    {_kmeans_iter_sql('c1', 2)},
    cent AS (SELECT cid + 1 AS cid, cvec FROM c2),
    {_IVF_BODY.format(
        cos_ec=_cos_sql('e.embedding', 'c.cvec'),
        cos_aq=_cos_sql('a.embedding', 'q.embedding'),
    )}
    {_ANN_RERANK}
"""

# the sketches aren't cross-engine reproducible; the oracle checks the exact
# distinct count and asserts the accuracy-contract flags (see the query
# docstring) — a sketch out of tolerance turns the row red
ORACLES["q_approx_sketches"] = """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p90_ok
    FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# round-3 additions
# ---------------------------------------------------------------------------

ORACLES["q_dq_checks"] = """
    WITH m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(count(o_custkey) AS DOUBLE) AS nn,
               CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS nd,
               CAST(sum(CASE WHEN o_totalprice >= 0.0 AND o_totalprice < 600000.0
                             THEN 1 ELSE 0 END) AS DOUBLE) AS inr,
               CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END) AS DOUBLE) AS ins
        FROM orders
    ),
    rows_out AS (
        SELECT 'completeness:o_custkey' AS "check", round(nn / n, 6) AS metric,
               CAST(1.0 AS DOUBLE) AS threshold FROM m
        UNION ALL
        SELECT 'uniqueness:o_orderkey', round(nd / n, 6), CAST(1.0 AS DOUBLE) FROM m
        UNION ALL
        SELECT 'range:o_totalprice', round(inr / n, 6), CAST(0.95 AS DOUBLE) FROM m
        UNION ALL
        SELECT 'membership:o_orderstatus', round(ins / n, 6), CAST(1.0 AS DOUBLE) FROM m
    )
    SELECT "check", metric, threshold, metric >= threshold AS passed FROM rows_out
"""

# islands form of the native session window: closed-interval merge (break
# strictly-greater than the 30-min gap), end = last event + gap
ORACLES["q_session_window"] = """
    WITH brk AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS is_new
        FROM events
    ),
    isl AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM brk
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM isl
    GROUP BY user_id, sid
"""

# stratum-global hash rank == the Spark side's shard rank + offset because
# the shard is a prefix of the sort key (operators/sampling.py)
ORACLES["q_kfold"] = """
    SELECT doc_id, lang,
           CAST((row_number() OVER (
                     PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR) || 'kfold'), doc_id
                 ) - 1) % 5 AS INTEGER) AS fold
    FROM documents
"""

ORACLES["q_tfidf"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                           ELSE string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r\\x0b]+')
                      END) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
               round(tf.tf * ln(n_docs / dfq.df), 6) AS tfidf,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS rnk
        FROM tf JOIN dfq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, tfidf FROM scored WHERE rnk <= 3
"""

# sentence split: same '. ' delimiter and explicit whitespace strip class
# as the UDTF; pos counts only KEPT (non-empty) sentences
ORACLES["q_udtf"] = """
    WITH parts AS (
        SELECT doc_id, i,
               trim(parts[CAST(i AS INTEGER)],
                    ' ' || chr(9) || chr(10) || chr(12) || chr(13) || chr(11)) AS sentence
        FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
             unnest(generate_series(1, len(parts))) AS t(i)
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INTEGER) AS pos,
           sentence,
           CAST(len(list_filter(string_split_regex(sentence, '[ \\t\\n\\f\\r\\x0b]+'),
                                x -> x <> '')) AS INTEGER) AS n_words
    FROM parts WHERE sentence <> ''
"""

ORACLES["q_recursive_cte"] = """
    WITH RECURSIVE anc AS (
        SELECT c_custkey, c_custkey AS node, 0 AS depth FROM customer
        UNION ALL
        SELECT c_custkey, node // 10 AS node, depth + 1 AS depth
        FROM anc WHERE node >= 10
    )
    SELECT c_custkey, node AS root_key, depth FROM anc WHERE node < 10
"""

ORACLES["q_fuzzy_join"] = """
    WITH blocked AS (
        SELECT c_custkey, c_name, substring(c_name, 1, 16) AS block FROM customer
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM blocked a JOIN blocked b ON a.block = b.block
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) <= 1
"""

# roundtrip sink+scan: the oracle is the source table itself
ORACLES["q_scan_xml"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""

# sliding window = each event duplicated into its two epoch-aligned
# window starts; avg via the exact-cents trick (mirrors exact_avg_cents)
ORACLES["q_stream_sliding"] = """
    WITH ex AS (
        SELECT date_trunc('hour', ts) AS ws, event_type, value FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events
    )
    SELECT ws AS window_start,
           ws + INTERVAL 2 HOUR AS window_end,
           event_type,
           CAST(round(sum(value) * 100, 0) AS BIGINT)
               / (100.0 * count(value)) AS avg_value,
           count(*) AS n
    FROM ex GROUP BY ws, event_type
"""

ORACLES["q_compact_plan"] = f"""
    WITH fm AS (
        SELECT regexp_extract(file_name, '[^/]+$') AS file,
               CAST(num_rows AS BIGINT) AS n_rows
        FROM parquet_file_metadata('{_STAGE_DIR}/events_compact_src/*.parquet')
    ),
    cum AS (
        SELECT file, n_rows,
               sum(n_rows) OVER (ORDER BY file ROWS UNBOUNDED PRECEDING)
                   - n_rows AS strt
        FROM fm
    )
    SELECT file, n_rows, CAST(strt // 2500 AS INTEGER) AS out_group FROM cum
"""

# post-compaction manifest: two independent footer readers (pyarrow via
# build_manifest, DuckDB parquet_metadata) over the SAME rewritten files
ORACLES["q_compact_apply"] = f"""
    WITH fm AS (
        SELECT file_name, num_row_groups, num_rows
        FROM parquet_file_metadata('{_STAGE_DIR}/events_compact_apply_dst/*.parquet')
    ),
    rg AS (
        SELECT file_name,
               CAST(stats_min_value AS BIGINT) AS mn,
               CAST(stats_max_value AS BIGINT) AS mx
        FROM parquet_metadata('{_STAGE_DIR}/events_compact_apply_dst/*.parquet')
        WHERE path_in_schema = 'event_id'
    )
    SELECT regexp_extract(fm.file_name, '[^/]+$') AS file,
           CAST(fm.num_row_groups AS INTEGER) AS n_row_groups,
           CAST(fm.num_rows AS BIGINT) AS n_rows,
           CAST(min(rg.mn) AS BIGINT) AS event_id_min,
           CAST(max(rg.mx) AS BIGINT) AS event_id_max
    FROM fm JOIN rg ON fm.file_name = rg.file_name
    GROUP BY fm.file_name, fm.num_row_groups, fm.num_rows
"""

# exactly-once across availableNow restarts: the sink table must equal the
# whole events table — a double-loaded or dropped file shifts these sums
ORACLES["q_stream_restart"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(value) AS BIGINT) AS n_valued,
           CAST(sum(CAST(floor(value * 1e2) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY event_type
"""

ORACLES["q_runtime_filter"] = """
    WITH supp AS (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5),
    bs AS (
        SELECT DISTINCT
               CAST('0x' || substring(md5(CAST(s_suppkey AS VARCHAR)), 1, 8) AS BIGINT)
                   % 4096 AS b
        FROM supp
    ),
    cand AS (
        SELECT l_suppkey, l_quantity FROM lineitem
        WHERE CAST('0x' || substring(md5(CAST(l_suppkey AS VARCHAR)), 1, 8) AS BIGINT)
                  % 4096 IN (SELECT b FROM bs)
    ),
    m AS (SELECT * FROM cand WHERE l_suppkey IN (SELECT s_suppkey FROM supp))
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM m
"""

ORACLES["q_snapshot_diff"] = """
    WITH a AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice * 1.1e0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM a WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
        FROM a WHERE o_orderkey % 101 = 0
    )
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_totalprice <> b.o_totalprice
                     OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(count(*) AS BIGINT) AS n
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    GROUP BY 1
"""

# correlation from sufficient statistics — the identical formula, never
# the engine's own corr() (whose update order isn't reproducible)
ORACLES["q_corr_matrix"] = """
    WITH s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(l_quantity) AS sq, sum(l_quantity * l_quantity) AS ssq,
               sum(l_discount) AS sd, sum(l_discount * l_discount) AS ssd,
               sum(l_tax) AS st, sum(l_tax * l_tax) AS sst,
               sum(l_quantity * l_discount) AS sqd,
               sum(l_quantity * l_tax) AS sqt,
               sum(l_discount * l_tax) AS sdt
        FROM lineitem
    )
    SELECT 'l_quantity' AS x, 'l_discount' AS y,
           round((n * sqd - sq * sd)
                 / sqrt((n * ssq - sq * sq) * (n * ssd - sd * sd)), 6) + 0e0 AS corr
    FROM s
    UNION ALL
    SELECT 'l_quantity', 'l_tax',
           round((n * sqt - sq * st)
                 / sqrt((n * ssq - sq * sq) * (n * sst - st * st)), 6)
    FROM s
    UNION ALL
    SELECT 'l_discount', 'l_tax',
           round((n * sdt - sd * st)
                 / sqrt((n * ssd - sd * sd) * (n * sst - st * st)), 6)
    FROM s
"""

ORACLES["q_minmax_scale"] = """
    WITH stats AS (
        SELECT c_mktsegment, min(c_acctbal) AS mn, max(c_acctbal) AS mx
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           CASE WHEN s.mx = s.mn THEN 0.0e0
                ELSE round((c.c_acctbal - s.mn) / (s.mx - s.mn), 6) END AS scaled
    FROM customer c JOIN stats s USING (c_mktsegment)
"""

ORACLES["q_nested_agg"] = """
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT)
               / (100.0 * count(o_totalprice)) AS avg_spend
    FROM orders GROUP BY o_custkey
"""

ORACLES["q_window_median"] = """
    WITH fr AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               list_sort(list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))[3] AS median5
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT user_id, ts, event_id, value, median5 FROM fr WHERE rn >= 5
"""

ORACLES["q_pattern_match"] = """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(ts, 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, ts AS pattern_start, ts2 AS pattern_end,
           event_id AS start_event_id
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      AND ts2 <= ts + INTERVAL 1 HOUR
"""

# -- round-3 batch 2: event analytics, scale diagnostics, corpus hygiene ----

ORACLES["q_transition_matrix"] = """
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    trans AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_trans,
           round(n_trans / sum(n_trans) OVER (PARTITION BY from_type), 6) AS p
    FROM trans
"""

ORACLES["q_skew_report"] = """
    WITH keyed AS (
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST('0x' || substring(md5(CAST(l_suppkey AS VARCHAR)), 1, 8) AS BIGINT) % 32
               AS bucket,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows
    FROM keyed GROUP BY bucket
"""

ORACLES["q_vocab_oov"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
    ),
    dfreq AS (
        SELECT tok, count(*) AS df
        FROM (SELECT DISTINCT doc_id, tok FROM toks)
        GROUP BY tok
    ),
    vocab AS (
        SELECT tok FROM dfreq ORDER BY df DESC, tok ASC LIMIT 200
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) / count(*), 6)
               AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
"""

ORACLES["q_split_leakage"] = f"""
    WITH sh AS ({_SHINGLES}),
    sig AS (
        SELECT doc_id,
               {_MINHASH_AGGS}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
    {_BAND_SELECTS}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    jac AS (
        SELECT id_a, id_b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / (sa.sz + sb.sz - i) >= 0.2
    ),
    split AS (
        SELECT doc_id,
               CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8) AS BIGINT)
                         % 10000 < 1000
                    THEN 'test' ELSE 'train' END AS split
        FROM documents
    )
    SELECT j.id_a, j.id_b, j.jaccard,
           a.split AS split_a, b.split AS split_b
    FROM jac j
    JOIN split a ON a.doc_id = j.id_a
    JOIN split b ON b.doc_id = j.id_b
    WHERE a.split <> b.split
"""

ORACLES["q_spearman_corr"] = """
    WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lineitem),
    vq AS (SELECT l_quantity AS v, count(*) AS cnt FROM lineitem GROUP BY 1),
    rkq AS (SELECT v, (sum(cnt) OVER (ORDER BY v) - (cnt - 1) / 2.0) AS r FROM vq),
    vd AS (SELECT l_discount AS v, count(*) AS cnt FROM lineitem GROUP BY 1),
    rkd AS (SELECT v, (sum(cnt) OVER (ORDER BY v) - (cnt - 1) / 2.0) AS r FROM vd),
    vt AS (SELECT l_tax AS v, count(*) AS cnt FROM lineitem GROUP BY 1),
    rkt AS (SELECT v, (sum(cnt) OVER (ORDER BY v) - (cnt - 1) / 2.0) AS r FROM vt),
    base AS (
        SELECT rkq.r / n.n AS rx, rkd.r / n.n AS ry, rkt.r / n.n AS rz
        FROM lineitem l
        CROSS JOIN n
        JOIN rkq ON l.l_quantity = rkq.v
        JOIN rkd ON l.l_discount = rkd.v
        JOIN rkt ON l.l_tax = rkt.v
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS cn,
               sum(rx) AS sx, sum(rx * rx) AS ssx,
               sum(ry) AS sy, sum(ry * ry) AS ssy,
               sum(rz) AS sz, sum(rz * rz) AS ssz,
               sum(rx * ry) AS sxy, sum(rx * rz) AS sxz, sum(ry * rz) AS syz
        FROM base
    )
    SELECT 'l_quantity' AS x, 'l_discount' AS y,
           round((cn * sxy - sx * sy)
                 / sqrt((cn * ssx - sx * sx) * (cn * ssy - sy * sy)), 6) + 0e0 AS spearman
    FROM s
    UNION ALL
    SELECT 'l_quantity', 'l_tax',
           round((cn * sxz - sx * sz)
                 / sqrt((cn * ssx - sx * sx) * (cn * ssz - sz * sz)), 6)
    FROM s
    UNION ALL
    SELECT 'l_discount', 'l_tax',
           round((cn * syz - sy * sz)
                 / sqrt((cn * ssy - sy * sy) * (cn * ssz - sz * sz)), 6)
    FROM s
"""

ORACLES["q_containment"] = f"""
    WITH sh AS ({_SHINGLES}),
    sig AS (
        SELECT doc_id,
               {_MINHASH_AGGS}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
    {_BAND_SELECTS}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, round(i / least(sa.sz, sb.sz), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / least(sa.sz, sb.sz) >= 0.3
"""

ORACLES["q_stream_late"] = """
    WITH a AS (SELECT * FROM events WHERE event_id % 2 = 0),
    b AS (SELECT * FROM events WHERE event_id % 2 = 1),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM a),
    kept AS (
        SELECT ts, event_type, value FROM a
        UNION ALL
        SELECT b.ts, b.event_type, b.value
        FROM b, wm
        WHERE date_trunc('hour', b.ts) + INTERVAL 1 HOUR > wm.wm
    )
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value
    FROM kept
    GROUP BY 1, 2, 3
"""

ORACLES["q_gopher_rules"] = f"""
    WITH base AS (
        SELECT doc_id,
               len({_TOKENS}) AS n_tokens,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
               length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\f\\r\\x0b]', '', 'g'))
                   AS symbol_chars,
               length(text) AS n_chars,
               len(list_filter({_TOKENS},
                   t -> list_contains({_STOPWORDS_SQL}, lower(t)))) AS stop_hits
        FROM documents
    ),
    ratios AS (
        SELECT doc_id,
               CAST(n_tokens AS INTEGER) AS n_tokens,
               round(alpha_chars / greatest(n_tokens, 1), 6) AS mean_word_len,
               round(symbol_chars / greatest(n_chars, 1), 6) AS symbol_ratio,
               round(stop_hits / greatest(n_tokens, 1), 6) AS stop_ratio
        FROM base
    )
    SELECT doc_id, n_tokens, mean_word_len, symbol_ratio, stop_ratio,
           (n_tokens >= 10 AND n_tokens <= 10000) AS ok_length,
           (mean_word_len >= 2.0 AND mean_word_len <= 10.0) AS ok_word_len,
           (symbol_ratio <= 0.1) AS ok_symbols,
           (stop_ratio >= 0.02) AS ok_stopwords,
           ((n_tokens >= 10 AND n_tokens <= 10000)
            AND (mean_word_len >= 2.0 AND mean_word_len <= 10.0)
            AND (symbol_ratio <= 0.1)
            AND (stop_ratio >= 0.02)) AS keep
    FROM ratios
"""

ORACLES["q_collocations"] = f"""
    WITH toks AS (
        SELECT unnest({_TOKENS}) AS tok FROM documents
    ),
    uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c_tok FROM toks GROUP BY tok
    ),
    t_total AS (SELECT CAST(sum(c_tok) AS DOUBLE) AS t FROM uni),
    toklists AS (SELECT {_TOKENS} AS tl FROM documents),
    bg AS (
        SELECT tl[i] || ' ' || tl[i + 1] AS bg
        FROM (SELECT tl, unnest(generate_series(1, len(tl) - 1)) AS i
              FROM toklists
              WHERE len(tl) >= 2)
    ),
    n_total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bg),
    bgc AS (
        SELECT bg, CAST(count(*) AS BIGINT) AS n_xy,
               split_part(bg, ' ', 1) AS x, split_part(bg, ' ', 2) AS y
        FROM bg GROUP BY bg
        HAVING count(*) >= 5
    )
    SELECT bgc.bg, bgc.n_xy,
           ux.c_tok AS n_x, uy.c_tok AS n_y,
           round((CAST(bgc.n_xy AS DOUBLE) * t_total.t * t_total.t)
                 / (CAST(ux.c_tok AS DOUBLE) * CAST(uy.c_tok AS DOUBLE) * n_total.n),
                 6) AS lift
    FROM bgc
    JOIN uni ux ON ux.tok = bgc.x
    JOIN uni uy ON uy.tok = bgc.y
    CROSS JOIN t_total
    CROSS JOIN n_total
    ORDER BY lift DESC, bgc.bg ASC
    LIMIT 100
"""

ORACLES["q_variant"] = """
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_totalprice AS price,
           o_orderstatus AS tag1,
           CAST(NULL AS VARCHAR) AS missing
    FROM orders
"""

ORACLES["q_arrow_map"] = """
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(strlen(text) AS INTEGER) AS n_bytes
    FROM documents
"""

# the DAG-orchestrated run must land the identical serving star
ORACLES["q_pipeline_dag"] = ORACLES["q_serving_dashboard"]

ORACLES["q_dedup_incremental"] = f"""
    WITH sh AS ({_SHINGLES}),
    sig AS (
        SELECT doc_id,
               {_MINHASH_AGGS}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
    {_BAND_SELECTS}
    ),
    split AS (
        SELECT doc_id,
               (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'ded_idx'), 1, 8) AS BIGINT)
                % 10000 < 2000) AS is_new
        FROM documents
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS id_a, i.doc_id AS id_b
        FROM bands n
        JOIN split sn ON sn.doc_id = n.doc_id AND sn.is_new
        JOIN bands i ON i.band_idx = n.band_idx AND i.band_hash = n.band_hash
        JOIN split si ON si.doc_id = i.doc_id AND NOT si.is_new
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    )
    SELECT id_a AS new_id, id_b AS index_id,
           round(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.sz + sb.sz - i) >= 0.2
"""

ORACLES["q_join_interval"] = """
    WITH a AS (
        SELECT o_orderkey AS a_key,
               CAST(o_orderdate AS DATE) AS a_start,
               CAST(o_orderdate AS DATE) + to_days(CAST(o_orderkey % 7 + 1 AS INTEGER)) AS a_end
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    b AS (
        SELECT o_orderkey AS b_key,
               CAST(o_orderdate AS DATE) AS b_start,
               CAST(o_orderdate AS DATE) + to_days(CAST(o_custkey % 5 + 1 AS INTEGER)) AS b_end
        FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT a_key, b_key,
           CAST(date_diff('day', greatest(a_start, b_start), least(a_end, b_end)) + 1
                AS INTEGER) AS overlap_days
    FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
"""

ORACLES["q_equidepth"] = """
    WITH vc AS (
        SELECT l_quantity, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1
    ),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
    ranked AS (
        SELECT l_quantity, cnt,
               sum(cnt) OVER (ORDER BY l_quantity) AS cum
        FROM vc
    )
    SELECT least(10, CAST(((cum - cnt) * 10) // n.n AS INTEGER) + 1) AS bucket,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           min(l_quantity) AS lo,
           max(l_quantity) AS hi
    FROM ranked, n
    GROUP BY 1
"""

ORACLES["q_sample_temperature"] = """
    WITH docs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 15 < 1 THEN 'g0'
                    WHEN doc_id % 15 < 3 THEN 'g1'
                    WHEN doc_id % 15 < 7 THEN 'g2'
                    ELSE 'g3' END AS src_group
        FROM documents
    ),
    cnt AS (
        SELECT src_group, CAST(count(*) AS BIGINT) AS n FROM docs GROUP BY src_group
    ),
    c AS (SELECT min(sqrt(n)) AS c FROM cnt),
    rate AS (
        SELECT src_group, CAST(floor(c.c / sqrt(n) * 10000) AS BIGINT) AS thr
        FROM cnt, c
    )
    SELECT d.doc_id, d.src_group
    FROM docs d
    JOIN rate r ON r.src_group = d.src_group
    WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || 'temp'), 1, 8) AS BIGINT)
          % 10000 < r.thr
"""

ORACLES["q_stream_dedup_late"] = """
    WITH a AS (
        SELECT user_id, ts, event_id
        FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events WHERE event_id % 2 = 0
        ) WHERE rn = 1
    ),
    b AS (
        SELECT user_id, ts, event_id
        FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CASE WHEN user_id % 2 = 0 THEN ts END DESC,
                                CASE WHEN user_id % 2 = 0 THEN event_id END DESC,
                                ts ASC, event_id ASC
                   ) AS rn
            FROM events WHERE event_id % 2 = 1
        ) WHERE rn = 1
    ),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM a)
    SELECT user_id, ts, event_id FROM a
    UNION ALL
    SELECT b.user_id, b.ts, b.event_id
    FROM b
    CROSS JOIN wm
    LEFT JOIN a ON a.user_id = b.user_id
    WHERE b.ts > wm.wm
      AND (a.user_id IS NULL OR a.ts + INTERVAL 1 HOUR <= wm.wm)
"""

ORACLES["q_embed_class_report"] = """
    WITH ex AS (
        SELECT label, vec_id,
               generate_subscripts(embedding, 1) AS d,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings GROUP BY label),
    cent AS (
        SELECT ex.label, d, sum(x) / any_value(n.n_vecs) AS c
        FROM ex JOIN n ON n.label = ex.label
        GROUP BY ex.label, d
    ),
    cnorm AS (
        SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label
    ),
    per_vec AS (
        SELECT ex.label, ex.vec_id,
               sum(x * c) AS dot,
               sqrt(sum(x * x)) AS vn
        FROM ex JOIN cent ON cent.label = ex.label AND cent.d = ex.d
        GROUP BY ex.label, ex.vec_id
    ),
    cosines AS (
        SELECT p.label,
               CASE WHEN p.vn > 0 AND cn.cn > 0 THEN p.dot / (p.vn * cn.cn) END AS cos
        FROM per_vec p JOIN cnorm cn ON cn.label = p.label
    )
    SELECT c.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(cos), 6) + 0e0 AS mean_cos,
           round(min(cos), 6) + 0e0 AS min_cos,
           round(any_value(cn.cn), 6) AS centroid_norm
    FROM cosines c JOIN cnorm cn ON cn.label = c.label
    GROUP BY c.label
"""

ORACLES["q_copurchase"] = """
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS f FROM li GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3
    )
    SELECT part_a, part_b, n_orders,
           fa.f AS n_a, fb.f AS n_b,
           round(n_orders / least(fa.f, fb.f), 6) AS confidence
    FROM pairs
    JOIN freq fa ON fa.l_partkey = part_a
    JOIN freq fb ON fb.l_partkey = part_b
"""

# streaming native session windows: complete-mode finite feed == batch merge
ORACLES["q_stream_session_native"] = ORACLES["q_session_window"]

def _pr_iter(prev: str, out: str) -> str:
    return f"""
    c_{out} AS (
        SELECT e.dst AS part, sum(r.rank / d.deg) AS cin
        FROM {prev} r
        JOIN edges e ON e.src = r.part
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ),
    {out} AS (
        SELECT nodes.part, 0.15 / nn.n + 0.85 * coalesce(c_{out}.cin, 0.0) AS rank
        FROM nodes CROSS JOIN nn
        LEFT JOIN c_{out} ON c_{out}.part = nodes.part
    )"""


ORACLES["q_pagerank"] = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3
    ),
    edges AS (
        SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT src AS part FROM deg),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT part, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),{_pr_iter("r0", "r1")},{_pr_iter("r1", "r2")},{_pr_iter("r2", "r3")}
    SELECT part, round(rank, 9) AS rank FROM r3
"""

ORACLES["q_join_nullsafe"] = """
    WITH cust AS (
        SELECT c_custkey,
               CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
                    ELSE c_mktsegment END AS segment
        FROM customer
    ),
    segs AS (
        SELECT segment, upper(segment) AS segment_label
        FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer)
        WHERE segment <> 'MACHINERY'
        UNION ALL
        SELECT NULL, 'UNKNOWN'
    )
    SELECT c.c_custkey, s.segment_label
    FROM cust c JOIN segs s ON c.segment IS NOT DISTINCT FROM s.segment
"""

ORACLES["q_set_ops_all"] = """
    WITH open_r AS (
        SELECT o_custkey AS custkey, o_orderpriority AS prio
        FROM orders WHERE o_orderstatus = 'O'
    ),
    done_r AS (
        SELECT o_custkey AS custkey, o_orderpriority AS prio
        FROM orders WHERE o_orderstatus = 'F'
    ),
    surplus AS (
        SELECT custkey, prio, 'open_surplus' AS bucket
        FROM (SELECT * FROM open_r EXCEPT ALL SELECT * FROM done_r)
    ),
    common AS (
        SELECT custkey, prio, 'common' AS bucket
        FROM (SELECT * FROM open_r INTERSECT ALL SELECT * FROM done_r)
    )
    SELECT custkey, prio, bucket, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM surplus UNION ALL SELECT * FROM common)
    GROUP BY custkey, prio, bucket
"""

from .queries import _SQL_LATERAL as _SQL_LATERAL_TWIN

ORACLES["q_sql_lateral"] = _SQL_LATERAL_TWIN

# file-ingest trio: the oracles REBUILD the staged files' expected content
# from the documents view / the md5-derived byte construction, so they are
# standalone (no stage-dir read, no ordering contract). Hex is uppercase on
# BOTH engines; Spark's base64 chunks long output, hence hex fingerprints.
ORACLES["q_scan_text"] = """
    SELECT unnest(string_split(
        CAST(doc_id AS VARCHAR) || '|' || replace(coalesce(text, ''), chr(13), ' '),
        chr(10))) AS value
    FROM documents WHERE doc_id < 40
"""

ORACLES["q_scan_wholefile"] = """
    WITH recs AS (
        SELECT doc_id, doc_id % 4 AS shard,
               CAST(doc_id AS VARCHAR) || '|' ||
               replace(coalesce(text, ''), chr(13), ' ') || chr(10) AS rec
        FROM documents WHERE doc_id < 40
    ),
    files AS (
        SELECT 'shard' || CAST(shard AS VARCHAR) || '.txt' AS fname,
               string_agg(rec, '' ORDER BY doc_id) AS content
        FROM recs GROUP BY shard
    )
    SELECT fname, CAST(strlen(content) AS BIGINT) AS n_bytes,
           md5(content) AS content_md5
    FROM files
"""

ORACLES["q_scan_binary"] = """
    WITH parts AS (
        SELECT i, j, md5('bin' || i || '|' || j) AS p
        FROM range(8) t(i), range(64) s(j)
    ),
    files AS (
        SELECT 'blob' || CAST(i AS VARCHAR) || '.bin' AS fname,
               upper(string_agg(p, '' ORDER BY j)) AS hx
        FROM parts GROUP BY i
    )
    SELECT fname, CAST(strlen(hx) // 2 AS BIGINT) AS length,
           md5(hx) AS content_md5
    FROM files
"""

ORACLES["q_export_shards"] = f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
               doc_id % 8 AS shard
        FROM documents
        WHERE len({_TOKENS}) >= 10
    ),
    cum AS (
        SELECT doc_id, shard, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id, n_tokens
                   ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS start
        FROM toks
    ),
    packed AS (
        SELECT shard, start // 2048 AS pack_id, n_tokens FROM cum
    ),
    per_pack AS (
        SELECT shard, pack_id,
               CAST(count(*) AS BIGINT) AS docs,
               CAST(sum(n_tokens) AS BIGINT) AS tok
        FROM packed GROUP BY shard, pack_id
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(docs) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           CAST(count(*) * 2048 - sum(tok) AS BIGINT) AS pad_waste
    FROM per_pack GROUP BY shard
"""

ORACLES["q_dedup_agreement"] = f"""
    WITH sh AS ({_SHINGLES}),
    sig AS (
        SELECT doc_id,
               {_MINHASH_AGGS}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
    {_BAND_SELECTS}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    jac AS (
        SELECT id_a, id_b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / (sa.sz + sb.sz - i) >= 0.2
    ),
    con AS (
        SELECT id_a, id_b, round(i / least(sa.sz, sb.sz), 6) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / least(sa.sz, sb.sz) >= 0.3
    ),
    fp AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[ \\t\\n\\f\\r\\x0b]+', ' ', 'g'))) AS f
        FROM documents
    ),
    ex AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b, TRUE AS exact
        FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
    )
    SELECT coalesce(j.id_a, c.id_a, e.id_a) AS id_a,
           coalesce(j.id_b, c.id_b, e.id_b) AS id_b,
           j.jaccard,
           c.containment,
           (j.jaccard IS NOT NULL) AS by_jaccard,
           (c.containment IS NOT NULL) AS by_containment,
           coalesce(e.exact, FALSE) AS by_exact
    FROM jac j
    FULL JOIN con c ON c.id_a = j.id_a AND c.id_b = j.id_b
    FULL JOIN ex e ON e.id_a = coalesce(j.id_a, c.id_a) AND e.id_b = coalesce(j.id_b, c.id_b)
"""

ORACLES["q_audio_frames"] = """
    WITH base AS (
        SELECT doc_id AS asset_id,
               CAST(t.k AS INTEGER) AS frame_idx,
               md5(text || '|' || CAST(t.k AS VARCHAR)) AS h
        FROM documents
        CROSS JOIN generate_series(0, 7) AS t(k)
        WHERE doc_id < 100 AND text IS NOT NULL
    )
    SELECT asset_id, frame_idx,
           CAST(CAST('0x' || substring(h, 1, 2) AS BIGINT) * CAST('0x' || substring(h, 1, 2) AS BIGINT) + CAST('0x' || substring(h, 3, 2) AS BIGINT) * CAST('0x' || substring(h, 3, 2) AS BIGINT) + CAST('0x' || substring(h, 5, 2) AS BIGINT) * CAST('0x' || substring(h, 5, 2) AS BIGINT) + CAST('0x' || substring(h, 7, 2) AS BIGINT) * CAST('0x' || substring(h, 7, 2) AS BIGINT) + CAST('0x' || substring(h, 9, 2) AS BIGINT) * CAST('0x' || substring(h, 9, 2) AS BIGINT) + CAST('0x' || substring(h, 11, 2) AS BIGINT) * CAST('0x' || substring(h, 11, 2) AS BIGINT) + CAST('0x' || substring(h, 13, 2) AS BIGINT) * CAST('0x' || substring(h, 13, 2) AS BIGINT) + CAST('0x' || substring(h, 15, 2) AS BIGINT) * CAST('0x' || substring(h, 15, 2) AS BIGINT) + CAST('0x' || substring(h, 17, 2) AS BIGINT) * CAST('0x' || substring(h, 17, 2) AS BIGINT) + CAST('0x' || substring(h, 19, 2) AS BIGINT) * CAST('0x' || substring(h, 19, 2) AS BIGINT) + CAST('0x' || substring(h, 21, 2) AS BIGINT) * CAST('0x' || substring(h, 21, 2) AS BIGINT) + CAST('0x' || substring(h, 23, 2) AS BIGINT) * CAST('0x' || substring(h, 23, 2) AS BIGINT) + CAST('0x' || substring(h, 25, 2) AS BIGINT) * CAST('0x' || substring(h, 25, 2) AS BIGINT) + CAST('0x' || substring(h, 27, 2) AS BIGINT) * CAST('0x' || substring(h, 27, 2) AS BIGINT) + CAST('0x' || substring(h, 29, 2) AS BIGINT) * CAST('0x' || substring(h, 29, 2) AS BIGINT) + CAST('0x' || substring(h, 31, 2) AS BIGINT) * CAST('0x' || substring(h, 31, 2) AS BIGINT) AS BIGINT) AS energy,
           round((CAST('0x' || substring(h, 1, 2) AS BIGINT) + CAST('0x' || substring(h, 3, 2) AS BIGINT) + CAST('0x' || substring(h, 5, 2) AS BIGINT) + CAST('0x' || substring(h, 7, 2) AS BIGINT) + CAST('0x' || substring(h, 9, 2) AS BIGINT) + CAST('0x' || substring(h, 11, 2) AS BIGINT) + CAST('0x' || substring(h, 13, 2) AS BIGINT) + CAST('0x' || substring(h, 15, 2) AS BIGINT) + CAST('0x' || substring(h, 17, 2) AS BIGINT) + CAST('0x' || substring(h, 19, 2) AS BIGINT) + CAST('0x' || substring(h, 21, 2) AS BIGINT) + CAST('0x' || substring(h, 23, 2) AS BIGINT) + CAST('0x' || substring(h, 25, 2) AS BIGINT) + CAST('0x' || substring(h, 27, 2) AS BIGINT) + CAST('0x' || substring(h, 29, 2) AS BIGINT) + CAST('0x' || substring(h, 31, 2) AS BIGINT)) / 16.0, 6) AS mean_amp
    FROM base
"""

ORACLES["q_curriculum"] = f"""
    WITH base AS (
        SELECT doc_id, text,
               length(text) AS nc,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               len({_TOKENS}) AS ntok,
               len(list_filter({_TOKENS},
                   t -> list_contains({_STOPWORDS_SQL}, lower(t)))) AS stop_hits
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               round(
                   least(nc / 500.0, 1.0) * 0.25
                   + (alpha / greatest(nc, 1)) * 0.25
                   + least((stop_hits / greatest(ntok, 1)) * 5.0, 1.0) * 0.25
                   + (CASE WHEN alpha / greatest(ntok, 1) BETWEEN 3.0 AND 12.0
                           THEN 1.0 ELSE 0.5 END) * 0.25
               , 6) AS quality
        FROM base
    ),
    tiers AS (
        SELECT doc_id,
               CASE WHEN quality >= 0.7 THEN 0
                    WHEN quality >= 0.5 THEN 1
                    ELSE 2 END AS tier,
               md5(CAST(doc_id AS VARCHAR)) AS k
        FROM scored
    )
    SELECT doc_id, tier,
           CAST(row_number() OVER (ORDER BY tier, k, doc_id) AS BIGINT) AS train_pos
    FROM tiers
"""

ORACLES["q_format_sft"] = """
    WITH r AS (
        SELECT doc_id,
               '### Instruction:' || chr(10) || 'Summarize the passage from '
                   || source || '.' || chr(10) || '### Response:' || chr(10) AS prefix,
               text
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           prefix || text AS rendered,
           0 AS prompt_start,
           CAST(length(prefix) AS INTEGER) AS prompt_end,
           CAST(length(prefix) AS INTEGER) AS completion_start,
           CAST(length(prefix) + length(text) AS INTEGER) AS completion_end,
           (length(prefix) + length(text) = length(prefix || text)) AS spans_ok
    FROM r
"""

def _equidepth_score_sql(metric: str, buckets: int = 5) -> str:
    return f"""(
        SELECT {metric},
               least({buckets},
                     CAST(((cum - cnt) * {buckets}) // n AS INTEGER) + 1) AS score
        FROM (
            SELECT {metric}, cnt,
                   sum(cnt) OVER (ORDER BY {metric}) AS cum
            FROM (SELECT {metric}, CAST(count(*) AS BIGINT) AS cnt
                  FROM per_cust GROUP BY {metric})
        ), (SELECT CAST(count(*) AS BIGINT) AS n FROM per_cust)
    )"""


ORACLES["q_rfm"] = f"""
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref FROM orders),
    per_cust AS (
        SELECT o_custkey AS custkey,
               date_diff('day', max(CAST(o_orderdate AS DATE)), any_value(ref.ref))
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(floor(sum(o_totalprice) / 100) AS BIGINT) AS monetary_bin
        FROM orders CROSS JOIN ref
        GROUP BY o_custkey
    ),
    r AS {_equidepth_score_sql("recency_days")},
    f AS {_equidepth_score_sql("frequency")},
    m AS {_equidepth_score_sql("monetary_bin")}
    SELECT p.custkey,
           CAST(p.recency_days AS INTEGER) AS recency_days,
           p.frequency, p.monetary_bin,
           CAST(6 - r.score AS BIGINT) AS r_score,
           f.score AS f_score,
           m.score AS m_score,
           CAST(6 - r.score AS VARCHAR) || CAST(f.score AS VARCHAR)
               || CAST(m.score AS VARCHAR) AS segment
    FROM per_cust p
    JOIN r ON r.recency_days = p.recency_days
    JOIN f ON f.frequency = p.frequency
    JOIN m ON m.monetary_bin = p.monetary_bin
"""

ORACLES["q_ab_test"] = """
    WITH armed AS (
        SELECT CASE WHEN CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'abtest'), 1, 8) AS BIGINT)
                         % 10000 < 5000
                    THEN 'A' ELSE 'B' END AS arm,
               value
        FROM events WHERE value IS NOT NULL
    ),
    stats AS (
        SELECT arm, CAST(count(*) AS DOUBLE) AS n,
               sum(value) AS s, sum(value * value) AS ss
        FROM armed GROUP BY arm
    ),
    j AS (
        SELECT a.n AS n_a, a.s AS s_a, a.ss AS ss_a,
               b.n AS n_b, b.s AS s_b, b.ss AS ss_b
        FROM (SELECT * FROM stats WHERE arm = 'A') a
        CROSS JOIN (SELECT * FROM stats WHERE arm = 'B') b
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(s_a / n_a, 6) AS mean_a,
           round(s_b / n_b, 6) AS mean_b,
           round(s_b / n_b - s_a / n_a, 6) + 0e0 AS uplift,
           round((s_b / n_b - s_a / n_a)
                 / sqrt(((ss_a - s_a * s_a / n_a) / (n_a - 1)) / n_a
                        + ((ss_b - s_b * s_b / n_b) / (n_b - 1)) / n_b), 6) + 0e0 AS t_stat
    FROM j
"""

# kappa backfill: the batch execution of the stream code path shares the
# stream oracle verbatim — parity IS the check
ORACLES["q_stream_backfill"] = ORACLES["q_stream_hourly"]

ORACLES["q_prune_report"] = f"""
    WITH fm AS (
        SELECT file_name, num_rows
        FROM parquet_file_metadata('{_STAGE_DIR}/prune_report/*.parquet')
    ),
    rg AS (
        SELECT file_name, max(CAST(stats_max_value AS BIGINT)) AS mx
        FROM parquet_metadata('{_STAGE_DIR}/prune_report/*.parquet')
        WHERE path_in_schema = 'o_orderkey'
        GROUP BY file_name
    ),
    man AS (
        SELECT fm.file_name, CAST(fm.num_rows AS BIGINT) AS n_rows, rg.mx
        FROM fm JOIN rg ON rg.file_name = fm.file_name
    ),
    g AS (SELECT max(mx) AS gmax FROM man),
    t AS (
        SELECT pct, (g.gmax * pct) // 100 AS threshold
        FROM (VALUES (25), (50), (75)) v(pct) CROSS JOIN g
    )
    SELECT CAST(t.pct AS INTEGER) AS pct, t.threshold,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN man.mx <= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
               AS files_skipped,
           CAST(sum(CASE WHEN man.mx <= t.threshold THEN man.n_rows ELSE 0 END) AS BIGINT)
               AS rows_skipped
    FROM t CROSS JOIN man
    GROUP BY t.pct, t.threshold
"""

ORACLES["q_lsh_recall"] = f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
    sh AS (
        SELECT DISTINCT doc_id, substring(text, CAST(i AS INTEGER), 8) AS shingle
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
              FROM docs)
        WHERE substring(text, CAST(i AS INTEGER), 8) IS NOT NULL
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
    inter_all AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT id_a, id_b
        FROM inter_all
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / (sa.sz + sb.sz - i) >= 0.2
    ),
    sig AS (
        SELECT doc_id,
               {_MINHASH_AGGS}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
    {_BAND_SELECTS}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
    ),
    j AS (
        SELECT coalesce(t.id_a, c.id_a) AS id_a,
               coalesce(t.id_b, c.id_b) AS id_b,
               (t.id_a IS NOT NULL) AS is_t,
               (c.id_a IS NOT NULL) AS is_c
        FROM truth t
        FULL JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
    )
    SELECT CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN is_c THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN is_t AND is_c THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           round(sum(CASE WHEN is_t AND is_c THEN 1 ELSE 0 END)
                 / sum(CASE WHEN is_t THEN 1 ELSE 0 END), 6) AS recall,
           round(sum(CASE WHEN is_t AND is_c THEN 1 ELSE 0 END)
                 / sum(CASE WHEN is_c THEN 1 ELSE 0 END), 6) AS precision
    FROM j
"""

ORACLES["q_ivf_recall"] = f"""
    WITH cent AS (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS cid,
               embedding AS cvec
        FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
    ),
    sims AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos_sql('e.embedding', 'c.cvec')} AS sim
        FROM embeddings e CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY sim DESC, cid ASC
                   ) AS rn
            FROM sims
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cid, pr FROM (
            SELECT vec_id AS query_id, cid,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY sim DESC, cid ASC
                   ) AS pr
            FROM sims WHERE vec_id < 10
        ) WHERE pr <= 4
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS match_id, p.pr,
               {_cos_sql('a.embedding', 'q.embedding')} AS cosine
        FROM assigned a
        JOIN probes p ON a.cid = p.cid
        JOIN embeddings q ON q.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
    ),
    levels AS (SELECT unnest([1, 2, 4]) AS n_probe),
    ivf AS (
        SELECT n_probe, query_id, match_id FROM (
            SELECT l.n_probe, s.query_id, s.match_id,
                   row_number() OVER (
                       PARTITION BY l.n_probe, s.query_id
                       ORDER BY s.cosine DESC, s.match_id ASC
                   ) AS rk
            FROM scored s JOIN levels l ON s.pr <= l.n_probe
        ) WHERE rk <= 5
    ),
    bq AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < 10
    ),
    bscored AS (
        SELECT bq.query_id, e.vec_id AS match_id,
               {_cos_sql('e.embedding', 'bq.qe')} AS cosine
        FROM embeddings e CROSS JOIN bq
        WHERE e.vec_id <> bq.query_id
    ),
    brute AS (
        SELECT query_id, match_id FROM (
            SELECT query_id, match_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
                   ) AS rk
            FROM bscored
        ) WHERE rk <= 5
    ),
    tr AS (
        SELECT l.n_probe, b.query_id, b.match_id
        FROM brute b CROSS JOIN levels l
    ),
    j AS (
        SELECT coalesce(t.n_probe, i.n_probe) AS n_probe,
               (t.query_id IS NOT NULL) AS is_t,
               (i.query_id IS NOT NULL) AS is_i
        FROM tr t
        FULL JOIN ivf i
          ON i.n_probe = t.n_probe AND i.query_id = t.query_id
         AND i.match_id = t.match_id
    )
    SELECT CAST(n_probe AS INTEGER) AS n_probe,
           CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN is_i THEN 1 ELSE 0 END) AS BIGINT) AS n_ivf,
           CAST(sum(CASE WHEN is_t AND is_i THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           round(sum(CASE WHEN is_t AND is_i THEN 1 ELSE 0 END)
                 / sum(CASE WHEN is_t THEN 1 ELSE 0 END), 6) AS recall,
           round(sum(CASE WHEN is_t AND is_i THEN 1 ELSE 0 END)
                 / sum(CASE WHEN is_i THEN 1 ELSE 0 END), 6) AS precision
    FROM j GROUP BY n_probe ORDER BY n_probe
"""

ORACLES["q_triangle_count"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
        ) GROUP BY node
    ),
    tri AS (
        -- canonical a<b<c enumeration: each triangle appears exactly once
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri
    )
    SELECT corners.node, CAST(count(*) AS BIGINT) AS n_triangles, deg.deg
    FROM corners JOIN deg ON deg.node = corners.node
    GROUP BY corners.node, deg.deg
"""

ORACLES["q_outlier_mad"] = """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS m
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, e.value, med.m, abs(e.value - med.m) AS d
        FROM events e JOIN med ON med.event_type = e.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(d, 0.5) AS md
        FROM dev GROUP BY 1
    )
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(max(dev.m), 6) AS median,
           round(max(mad.md), 6) AS mad,
           CAST(sum(CASE WHEN dev.d > 3 * mad.md THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           round(max(CASE WHEN dev.d > 3 * mad.md THEN dev.value END), 6)
               AS max_outlier
    FROM dev JOIN mad ON mad.event_type = dev.event_type
    GROUP BY dev.event_type
"""

ORACLES["q_ks_drift"] = """
    WITH d AS (
        SELECT source, n_chars FROM documents WHERE source IN ('src0', 'src1')
    ),
    counts AS (
        SELECT n_chars,
               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS b
        FROM d GROUP BY 1
    ),
    cum AS (
        SELECT n_chars,
               sum(a) OVER (ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
               sum(b) OVER (ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
        FROM counts
    ),
    tot AS (
        SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS na,
               sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS nb
        FROM d
    )
    SELECT CAST(na AS BIGINT) AS n_src0,
           CAST(nb AS BIGINT) AS n_src1,
           CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS ks_numerator,
           floor(max(abs(ca * nb - cb * na))
                 / CAST(na * nb AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ks_stat
    FROM cum CROSS JOIN tot
    GROUP BY na, nb
"""

ORACLES["q_join_asof_nearest"] = """
    WITH ev AS (
        SELECT event_id, user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    ord AS (
        SELECT o_custkey AS user_id,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS od,
               max(o_orderkey) AS okey
        FROM orders GROUP BY 1, 2
    ),
    cand AS (
        SELECT e.event_id, e.user_id, e.d, o.od, o.okey,
               abs(e.d - o.od) AS dist
        FROM ev e JOIN ord o ON o.user_id = e.user_id
    ),
    best AS (SELECT event_id, min(dist) AS mind FROM cand GROUP BY 1),
    pick AS (
        -- at min distance there are at most two candidates (one per side);
        -- min(od) = the earlier date = backward-tie preference
        SELECT c.event_id, c.user_id, min(c.od) AS od, min(c.dist) AS dist_days
        FROM cand c JOIN best b ON b.event_id = c.event_id AND c.dist = b.mind
        GROUP BY 1, 2
    )
    SELECT p.event_id, p.user_id,
           DATE '1970-01-01' + CAST(p.od AS INTEGER) AS nearest_orderdate,
           p.dist_days,
           o.okey AS nearest_orderkey
    FROM pick p
    JOIN ord o ON o.user_id = p.user_id AND o.od = p.od
    WHERE p.dist_days <= 30
"""

ORACLES["q_tpch_shipping_priority"] = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""

ORACLES["q_tpch_local_volume"] = """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""

ORACLES["q_string_agg"] = """
    WITH ranked AS (
        SELECT c_nationkey, c_name,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rn
        FROM customer
    )
    SELECT c_nationkey,
           string_agg(c_name, ', ' ORDER BY rn) AS top_customers,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked
    WHERE rn <= 5
    GROUP BY c_nationkey
"""

# truncated-window EWMA — same 64-row trail, same left-to-right fold as the
# Spark array aggregate (DuckDB lambda index i is 1-based → exponent len-i
# mirrors Spark's 0-based s-1-i)
ORACLES["q_ewma"] = """
    WITH trail AS (
        SELECT event_id, user_id, ts, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 63 PRECEDING AND CURRENT ROW
               ) AS w
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT event_id, user_id, ts, value,
           round(
               list_sum(list_transform(
                   w, (x, i) -> x * pow(0.7, CAST(len(w) - i AS DOUBLE))))
               / list_sum(list_transform(
                   w, (x, i) -> pow(0.7, CAST(len(w) - i AS DOUBLE)))),
               6
           ) AS ewma
    FROM trail
"""

ORACLES["q_unigram_logprob"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    uni AS (
        SELECT tok,
               ln(CAST(cnt AS DOUBLE)
                  / CAST((SELECT sum(cnt) FROM vocab) AS DOUBLE)) AS lp
        FROM vocab
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(u.lp), 6) AS mean_logprob
    FROM tok t JOIN uni u USING (tok)
    GROUP BY t.doc_id
"""

# content-defined 64-char window selection (operators/dedup.py:
# selected_windows): the md5-hex-prefix → int64 selection replays the Spark
# filter bit-identically (the MinHash base idiom). Shared by the
# substring-dedup pair query and the boilerplate-span report.
_SELECTED_WINDOWS = """
    SELECT DISTINCT doc_id, text,
           md5(substring(text, CAST(i AS INTEGER), 64)) AS win
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 63, 1))) AS i
          FROM documents)
    WHERE substring(text, CAST(i AS INTEGER), 64) IS NOT NULL
      AND (CAST('0x' || substring(md5(substring(text, CAST(i AS INTEGER), 64)), 1, 15) AS BIGINT) % 16) = 0
"""

ORACLES["q_dedup_substring"] = f"""
    WITH w AS ({_SELECTED_WINDOWS}),
    kept AS (
        SELECT win FROM (SELECT DISTINCT win, text FROM w)
        GROUP BY win HAVING count(*) <= 64
    ),
    wk AS (SELECT DISTINCT doc_id, win FROM w JOIN kept USING (win))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS shared_windows
    FROM wk a JOIN wk b USING (win)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
"""

ORACLES["q_boilerplate_spans"] = f"""
    WITH w AS ({_SELECTED_WINDOWS})
    SELECT win, CAST(count(*) AS BIGINT) AS n_texts
    FROM (SELECT DISTINCT win, text FROM w)
    GROUP BY win HAVING count(*) >= 2
"""

# span-carrying variant of _SELECTED_WINDOWS (win is md5(span), 1:1) for
# the excision surgery — the fold replays Spark's F.aggregate replace-all
# in identical ascending span order via list_reduce over a prepended list
_SELECTED_WINDOWS_SPAN = """
    SELECT DISTINCT doc_id, text,
           substring(text, CAST(i AS INTEGER), 64) AS span,
           md5(substring(text, CAST(i AS INTEGER), 64)) AS win
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 63, 1))) AS i
          FROM documents)
    WHERE substring(text, CAST(i AS INTEGER), 64) IS NOT NULL
      AND (CAST('0x' || substring(md5(substring(text, CAST(i AS INTEGER), 64)), 1, 15) AS BIGINT) % 16) = 0
"""

ORACLES["q_excise_spans"] = f"""
    WITH w AS ({_SELECTED_WINDOWS_SPAN}),
    f AS (
        SELECT win FROM (SELECT DISTINCT win, text FROM w)
        GROUP BY win HAVING count(*) >= 2
    ),
    per_doc AS (
        SELECT doc_id, list(span ORDER BY span) AS spans
        FROM (SELECT DISTINCT doc_id, span, win FROM w)
        JOIN f USING (win)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(len(p.spans), 0) AS BIGINT) AS n_flagged_spans,
           CASE WHEN p.spans IS NULL THEN d.text
                ELSE list_reduce(list_prepend(d.text, p.spans),
                                 (acc, s) -> replace(acc, s, ''))
           END AS clean_text
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

# span-level incremental dedup: new-batch (md5 bucket < 2000) vs standing
# index, kept windows only (boilerplate cut over BOTH sides' distinct texts)
ORACLES["q_substring_incremental"] = f"""
    WITH w AS ({_SELECTED_WINDOWS}),
    kept AS (
        SELECT win FROM (SELECT DISTINCT win, text FROM w)
        GROUP BY win HAVING count(*) <= 64
    ),
    wk AS (
        SELECT DISTINCT doc_id, win,
               (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'ded_idx'), 1, 8) AS BIGINT)
                   % 10000 < 2000) AS is_new
        FROM w JOIN kept USING (win)
    )
    SELECT n.doc_id AS new_id, i.doc_id AS index_id,
           CAST(count(*) AS BIGINT) AS shared_windows
    FROM wk n JOIN wk i USING (win)
    WHERE n.is_new AND NOT i.is_new
    GROUP BY 1, 2
"""

ORACLES["q_decontaminate_spans"] = f"""
    WITH w AS ({_SELECTED_WINDOWS}),
    bw AS (SELECT doc_id AS bench_id, win FROM w WHERE doc_id % 50 = 0),
    cw AS (SELECT doc_id, win FROM w WHERE doc_id % 50 <> 0),
    ov AS (
        SELECT cw.doc_id, bw.bench_id, CAST(count(*) AS BIGINT) AS n_spans
        FROM cw JOIN bw USING (win)
        GROUP BY cw.doc_id, bw.bench_id
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bench_matches,
           CAST(max(n_spans) AS BIGINT) AS max_shared_spans
    FROM ov
    GROUP BY doc_id
"""

# 8x8-bit banding over the 64-bit two-half simhash fingerprint (r12 tuned
# literals, q_simhash_recall): bands 0-3 from the lo half, 4-7 from hi
_SIMHASH_BAND_SELECTS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {j} AS band_idx,"
    f" (simhash_{'lo' if j < 4 else 'hi'} >> {8 * (j % 4)}) & 255 AS band_val FROM fp"
    for j in range(8)
)

ORACLES["q_simhash_recall"] = f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
    sh AS (
        SELECT DISTINCT doc_id, substring(text, CAST(i AS INTEGER), 8) AS shingle
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
              FROM docs)
        WHERE substring(text, CAST(i AS INTEGER), 8) IS NOT NULL
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
    inter_all AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT id_a, id_b
        FROM inter_all
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / (sa.sz + sb.sz - i) >= 0.2
    ),
    tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '[ \\t\\n\\f\\r\\x0b]+')) AS tok
        FROM docs
    ),
    h AS (
        SELECT doc_id,
               CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) AS h_lo,
               CAST('0x' || substring(md5(tok), 9, 8) AS BIGINT) AS h_hi
        FROM tok
    ),
    sums AS (
        SELECT doc_id, {_SIMHASH64_SUMS}
        FROM h GROUP BY doc_id
    ),
    fp AS (SELECT doc_id,
                  CAST({_SIMHASH64_FP_LO} AS BIGINT) AS simhash_lo,
                  CAST({_SIMHASH64_FP_HI} AS BIGINT) AS simhash_hi
           FROM sums),
    bands AS (
    {_SIMHASH_BAND_SELECTS}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM bands x
        JOIN bands y ON x.band_idx = y.band_idx AND x.band_val = y.band_val
        WHERE x.doc_id < y.doc_id
    ),
    verified AS (
        SELECT c.id_a, c.id_b,
               bit_count(xor(fa.simhash_lo, fb.simhash_lo))
               + bit_count(xor(fa.simhash_hi, fb.simhash_hi)) AS ham
        FROM cand c
        JOIN fp fa ON fa.doc_id = c.id_a
        JOIN fp fb ON fb.doc_id = c.id_b
    ),
    j AS (
        SELECT coalesce(t.id_a, v.id_a) AS id_a,
               coalesce(t.id_b, v.id_b) AS id_b,
               (t.id_a IS NOT NULL) AS is_t,
               (v.id_a IS NOT NULL) AS is_c,
               (v.ham IS NOT NULL AND v.ham <= 5) AS is_v
        FROM truth t
        FULL JOIN verified v ON v.id_a = t.id_a AND v.id_b = t.id_b
    )
    SELECT CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN is_c THEN 1 ELSE 0 END) AS BIGINT) AS n_band_pairs,
           CAST(sum(CASE WHEN is_v THEN 1 ELSE 0 END) AS BIGINT) AS n_verified,
           CAST(sum(CASE WHEN is_t AND is_v THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           round(sum(CASE WHEN is_t AND is_v THEN 1 ELSE 0 END)
                 / sum(CASE WHEN is_t THEN 1 ELSE 0 END), 6) AS recall,
           round(sum(CASE WHEN is_t AND is_v THEN 1 ELSE 0 END)
                 / sum(CASE WHEN is_v THEN 1 ELSE 0 END), 6) AS precision
    FROM j
"""

# cluster-aware split: the q_dedup_clusters components (reused verbatim as
# a nested CTE) bucketed by md5 of the component id — the identical lottery
# as operators/sampling.py:_hash_bucket
ORACLES["q_split_cluster_safe"] = f"""
    WITH cc AS ({ORACLES["q_dedup_clusters"]})
    SELECT doc_id, cluster_id,
           CASE WHEN CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR)
                    || 'cwsplit'), 1, 8) AS BIGINT) % 10000 < 9000
                THEN 'train' ELSE 'eval' END AS split
    FROM cc
"""

# BPE vocabulary induction: 5 chained merge iterations over the word-
# frequency table. The fold is list_reduce over singleton-wrapped symbols
# (accumulator and element must share a type); DuckDB list slice ends are
# INCLUSIVE, so dropping the accumulator's last element is acc[:-2].
# {cols} carries word through the seq CTEs when the consumer (q_bpe_encode)
# joins the segmented vocabulary back to the corpus.
_BPE_ITER = """
    p{k} AS (
        SELECT pr[1] AS pair_a, pr[2] AS pair_b, CAST(sum(freq) AS BIGINT) AS cnt
        FROM (SELECT freq,
                     unnest(list_transform(generate_series(1, len(seq) - 1),
                         i -> [seq[CAST(i AS INTEGER)],
                               seq[CAST(i AS INTEGER) + 1]])) AS pr
              FROM seq{k})
        GROUP BY 1, 2
    ),
    t{k} AS (SELECT pair_a, pair_b, cnt FROM p{k}
             ORDER BY cnt DESC, pair_a, pair_b LIMIT 1),
    seq{k1} AS (
        SELECT {cols},
               list_reduce(list_transform(s.seq, x -> [x]),
                   (acc, el) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.pair_a
                                          AND el[1] = t.pair_b
                                     THEN list_append(acc[:-2], t.pair_a || t.pair_b)
                                     ELSE list_concat(acc, el) END) AS seq
        FROM seq{k} s LEFT JOIN t{k} t ON TRUE
    )"""

_BPE_TOKS = """
        SELECT doc_id, lower(w) AS word
        FROM (SELECT doc_id,
                     unnest(string_split_regex(trim(text),
                         '[ \\t\\n\\f\\r\\x0b]+')) AS w
              FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        WHERE regexp_matches(w, '^[A-Za-z]+$')
          AND length(w) BETWEEN 2 AND 16
"""

_BPE_SEQ0 = """
        SELECT word, freq,
               list_transform(generate_series(1, length(word)),
                   i -> substring(word, CAST(i AS INTEGER), 1)) AS seq
        FROM words
"""

ORACLES["q_bpe_merges"] = (
    f"""
    WITH toks AS ({_BPE_TOKS}),
    words AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY word),
    seq0 AS ({_BPE_SEQ0}),"""
    + ",".join(_BPE_ITER.format(k=k, k1=k + 1, cols="s.freq") for k in range(5))
    + """
    SELECT * FROM ("""
    + "\n    UNION ALL ".join(
        f"SELECT CAST({k + 1} AS INTEGER) AS iter, pair_a, pair_b,"
        f" pair_a || pair_b AS merged, cnt FROM t{k}"
        for k in range(5)
    )
    + """)
"""
)

# the APPLY side: the corpus joined to the segmented vocabulary (seq5 under
# all five merges), per-doc subword stats; integer sums cast to BIGINT
# (DuckDB promotes to HUGEINT)
ORACLES["q_bpe_encode"] = (
    f"""
    WITH toks AS ({_BPE_TOKS}),
    words AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY word),
    seq0 AS ({_BPE_SEQ0}),"""
    + ",".join(_BPE_ITER.format(k=k, k1=k + 1, cols="s.word, s.freq") for k in range(5))
    + """
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(word)) AS BIGINT) AS n_chars,
           CAST(sum(len(seq)) AS BIGINT) AS n_subwords
    FROM toks JOIN seq5 USING (word)
    GROUP BY doc_id
"""
)

# apply-to-unseen: merges learned on the 80% train split (md5 lottery on
# doc_id, salt 'bpe_split'), applied to the 20% held-out docs' distinct
# words via the nested fold — merge order outer (list_reduce with the
# char seq prepended as the seed), greedy scan inner
_BPE_SPLIT_HOLD = ("CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)"
                   " || 'bpe_split'), 1, 8) AS BIGINT) % 10000 < 2000")

ORACLES["q_bpe_tokenize"] = (
    f"""
    WITH toks AS ({_BPE_TOKS}),
    hold AS (SELECT doc_id, word FROM toks WHERE {_BPE_SPLIT_HOLD}),
    words AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
              FROM toks WHERE NOT ({_BPE_SPLIT_HOLD}) GROUP BY word),
    seq0 AS ({_BPE_SEQ0}),"""
    + ",".join(_BPE_ITER.format(k=k, k1=k + 1, cols="s.freq") for k in range(5))
    + """,
    merges AS ("""
    + "\n        UNION ALL ".join(
        f"SELECT {k + 1} AS it, pair_a, pair_b FROM t{k}" for k in range(5)
    )
    + """),
    marr AS (SELECT list([pair_a, pair_b] ORDER BY it) AS ml FROM merges),
    enc AS (
        SELECT word,
               list_reduce(list_prepend(chars, marr.ml),
                   (acc, m) -> list_reduce(list_transform(acc, x -> [x]),
                       (a2, el) -> CASE WHEN len(a2) > 0 AND a2[-1] = m[1]
                                             AND el[1] = m[2]
                                        THEN list_append(a2[:-2], m[1] || m[2])
                                        ELSE list_concat(a2, el) END)) AS seq
        FROM (SELECT word,
                     list_transform(generate_series(1, length(word)),
                         i -> substring(word, CAST(i AS INTEGER), 1)) AS chars
              FROM (SELECT DISTINCT word FROM hold)), marr
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(word)) AS BIGINT) AS n_chars,
           CAST(sum(len(seq)) AS BIGINT) AS n_subwords
    FROM hold JOIN enc USING (word)
    GROUP BY doc_id
"""
)
