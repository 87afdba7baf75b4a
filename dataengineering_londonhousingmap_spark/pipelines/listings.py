"""Listings pipelines — the zoopla/dexters clean-and-unify stages.

Reproduces the observable semantics of the reference's scrape-transform
code (pipeline .py) as declarative plans, including its quirks where they
reach stored data:

* invalid price strings dropped BEFORE parsing (.py:146-150 ``is_dropped``);
* asymmetric extraction defaults — bathrooms 0, receptions 1
  (.py:388-395);
* the distance-leaked-into-station repair for dexters rows whose distance
  cell has no digits (.py:560-576);
* Victoria-line prefix cleanup (.py:579-602) and forbidden-rail-brand
  cleanup (.py:545-557);
* first-seen ad_id dedup (.py:215-216) — made deterministic on an explicit
  scrape-order column;
* 'None' strings → NULL (.py:290).

Unit normalization (zoopla miles / dexters metres → km) is the engine's
declared upgrade (SURVEY §1.2); the serving layer works in km.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import (
    clean_dexters_distance_m,
    clean_dexters_price,
    clean_tube_stop_string,
    distance_km_from_metres,
    distance_km_from_miles,
    get_tube_dist,
    has_numbers,
    is_valid_price,
    none_string_to_null,
    split_miles,
    strip_tube,
    to_num,
    victoria_clean_stop,
)
from ..operators.dedup import dedup_first_seen


def clean_zoopla(raw: DataFrame, order_col: str = "ad_id") -> DataFrame:
    """zoopla_raw → cleaned listings rows (FIXTURES.md §1 clean form).

    Order of operations (r12 opt): validity filters → first-seen dedup →
    parse. The winner per ad_id is decided by the validity predicates and
    (ad_id, order_col) alone — never by a parsed value — so deduping
    BEFORE the regex/parse chain keeps the winners identical while the
    parse runs once per surviving ad (~¼ of the rows on colliding-ad
    vintages; the parse is row-wise pure, so parse-then-dedup and
    dedup-then-parse commute). The validity filters must stay FIRST so an
    invalid row never wins an ad_id: price validity precedes dedup in the
    reference too (.py:146-150 before the .py:215-216 insert), while the
    ' miles ' transport check runs AFTER the reference's dedup (~.py:253)
    — its pre-dedup position here is this repo's oracle-pinned choice
    since r01, not reference-mirrored (ADVICE r12).
    """
    dist_mi, station = split_miles("transport_raw")
    survivors = dedup_first_seen(
        raw
        # P7: malformed prices are dropped before parsing (.py:146-150)
        .filter(is_valid_price("price_raw"))
        # P7: rows without a ' miles ' separator are skipped (.py:253-255)
        .filter(F.col("transport_raw").contains(" miles ")),
        # O4: first-occurrence-wins on ad_id (.py:215-216)
        "ad_id",
        [order_col],
    )
    return survivors.select(
        "ad_id",
        "link",
        to_num("price_raw").alias("price"),
        none_string_to_null("bedrooms").cast("int").alias("bedrooms"),
        none_string_to_null("bathrooms").cast("int").alias("bathrooms"),
        none_string_to_null("living_rooms").cast("int").alias("living_rooms"),
        "address",
        station.alias("subway_station"),
        distance_km_from_miles(dist_mi).alias("distance_km"),
    )


def clean_dexters(raw: DataFrame, order_col: str = "ad_id") -> DataFrame:
    """dexters_raw → cleaned listings rows, with the reference's two-pass
    station-name repair collapsed into single when/otherwise projections
    (P9 — no filtered-copy writebacks)."""
    # repair pass 1 (.py:560-576): distance cell has no digits → the real
    # distance leaked into the station string's last token
    leak = ~has_numbers("distance_raw") & F.col("subway_station_raw").isNotNull()
    station1 = F.when(leak, strip_tube("subway_station_raw")).otherwise(
        F.col("subway_station_raw")
    )
    distance1 = F.when(leak, get_tube_dist("subway_station_raw")).otherwise(
        F.col("distance_raw")
    )
    # repair pass 2 (.py:588-602): 'Victoria X' rows; pass 3 (.py:545-557):
    # forbidden rail brands keep only the final token
    station2 = F.when(station1.contains("Victoria"), victoria_clean_stop(station1)).otherwise(
        station1
    )
    station3 = clean_tube_stop_string(station2)

    # validity filter → first-seen dedup → parse (same commute argument as
    # clean_zoopla, r12 opt): the winner per ad_id depends only on the
    # price-validity predicate and (ad_id, order_col), so the three-pass
    # station repair and the distance parse run once per surviving ad
    survivors = dedup_first_seen(
        raw.filter(is_valid_price("price_raw")), "ad_id", [order_col]
    )
    return survivors.select(
        "ad_id",
        "link",
        clean_dexters_price("price_raw").alias("price"),
        F.col("bedrooms").cast("int").alias("bedrooms"),
        # asymmetric defaults preserved from .py:388-395 are applied at
        # scrape-parse time; by this stage they are already ints
        F.col("bathrooms").cast("int").alias("bathrooms"),
        F.col("reception").cast("int").alias("living_rooms"),
        "address",
        station3.alias("subway_station"),
        distance_km_from_metres(clean_dexters_distance_m(distance1)).alias("distance_km"),
        "tube_line",
    )


def unify_listings(
    zoopla: DataFrame,
    dexters: DataFrame,
    station_names_mapping: DataFrame,
) -> DataFrame:
    """Union both sources onto the canonical station vocabulary via the
    name-reconciliation dimension (database_schema.sql:61-66) — broadcast
    left joins, unmapped names kept (the reference serves them unmapped
    too, J2 semantics)."""
    m = station_names_mapping
    z_map = F.broadcast(
        m.select(
            F.col("zoopla_scraper_station_names").alias("src_name"),
            F.col("location_information_station_names").alias("canonical_name"),
        ).filter(F.col("src_name").isNotNull() & (F.col("src_name") != ""))
    )
    d_map = F.broadcast(
        m.select(
            F.col("dexters_scraper_station_names").alias("src_name"),
            F.col("location_information_station_names").alias("canonical_name"),
        ).filter(F.col("src_name").isNotNull() & (F.col("src_name") != ""))
    )

    z = (
        zoopla.join(z_map, zoopla.subway_station == z_map.src_name, "left")
        .withColumn("subway_station", F.coalesce("canonical_name", "subway_station"))
        .drop("src_name", "canonical_name")
        .withColumn("source", F.lit("zoopla"))
        .withColumn("tube_line", F.lit(None).cast("string"))
    )
    d = (
        dexters.join(d_map, dexters.subway_station == d_map.src_name, "left")
        .withColumn("subway_station", F.coalesce("canonical_name", "subway_station"))
        .drop("src_name", "canonical_name")
        .withColumn("source", F.lit("dexters"))
    )
    cols = [
        "ad_id", "source", "link", "price", "bedrooms", "bathrooms",
        "living_rooms", "address", "subway_station", "distance_km", "tube_line",
    ]
    return z.select(*cols).unionByName(d.select(*cols))
