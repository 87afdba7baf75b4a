"""Explicit schemas — the engine's analog of the reference's declared DDL.

The reference declares every table up front in
``02_data_processing_and_storing/database_schema.sql:2-66`` (two physical
types, ``numeric``/``varchar(256)``); the *semantic* types are enforced by its
pandas ``astype`` checkpoints (pipeline ``.py:525,561,589,608,631-632``).
Here both live in one place as Spark ``StructType``s: testdata tables the
driver generates (TESTDATA.md) and domain tables from FIXTURES.md.

Never ``inferSchema`` — schema-on-read CSV/JSON goes through these.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver testdata (TPC-H-ish; TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON payload string
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Domain tables (FIXTURES.md; reference database_schema.sql:5-66)
# ---------------------------------------------------------------------------

# schema_housing.zoopla raw scrape shape (database_schema.sql:5-15;
# fields produced by pipeline .py:262-287)
ZOOPLA_RAW = T.StructType(
    [
        T.StructField("ad_id", T.StringType(), False),
        T.StructField("link", T.StringType(), False),
        T.StructField("price_raw", T.StringType(), False),
        T.StructField("bedrooms", T.StringType(), True),
        T.StructField("bathrooms", T.StringType(), True),
        T.StructField("living_rooms", T.StringType(), True),
        T.StructField("address", T.StringType(), False),
        T.StructField("transport_raw", T.StringType(), False),
    ]
)

# cleaned listings shape shared by zoopla/dexters after unification
LISTINGS_CLEAN = T.StructType(
    [
        T.StructField("ad_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),  # 'zoopla' | 'dexters'
        T.StructField("link", T.StringType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("bedrooms", T.IntegerType(), True),
        T.StructField("bathrooms", T.IntegerType(), True),
        T.StructField("living_rooms", T.IntegerType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("subway_station", T.StringType(), True),
        T.StructField("distance_km", T.DoubleType(), True),  # unit-normalized
        T.StructField("tube_line", T.StringType(), True),
    ]
)

# schema_housing.dexters (database_schema.sql:18-31)
DEXTERS_RAW = T.StructType(
    [
        T.StructField("ad_id", T.StringType(), False),
        T.StructField("street_name", T.StringType(), False),
        T.StructField("price_raw", T.StringType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("bedrooms", T.IntegerType(), True),
        T.StructField("bathrooms", T.IntegerType(), True),
        T.StructField("reception", T.IntegerType(), True),
        T.StructField("link", T.StringType(), False),
        T.StructField("subway_station_raw", T.StringType(), True),
        T.StructField("distance_raw", T.StringType(), True),
        T.StructField("tube_line", T.StringType(), True),
    ]
)

# schema_housing.location_information (database_schema.sql:33-42)
LOCATION_INFORMATION = T.StructType(
    [
        T.StructField("subway_station", T.StringType(), False),
        T.StructField("tube_line", T.StringType(), False),
        T.StructField("transport_zone", T.StringType(), False),
        T.StructField("address", T.StringType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("latitude", T.DoubleType(), True),
    ]
)

# schema_housing.air_quality (database_schema.sql:45-51) — timestamp upgraded
# from the reference's varchar (SURVEY §1.2)
AIR_QUALITY = T.StructType(
    [
        T.StructField("site_code", T.StringType(), False),
        T.StructField("measurement_date_gmt", T.TimestampType(), False),
        T.StructField("species_code", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# schema_housing.tube_site_mapping (database_schema.sql:54-58)
TUBE_SITE_MAPPING = T.StructType(
    [
        T.StructField("subway_station", T.StringType(), False),
        T.StructField("site_code", T.StringType(), False),
    ]
)

# schema_housing.station_names_mapping (database_schema.sql:61-66)
STATION_NAMES_MAPPING = T.StructType(
    [
        T.StructField("location_information_station_names", T.StringType(), False),
        T.StructField("zoopla_scraper_station_names", T.StringType(), True),
        T.StructField("dexters_scraper_station_names", T.StringType(), True),
    ]
)

# air sensor site metadata (LondonAir_site_information_collection.ipynb:164-165)
AIR_SITES = T.StructType(
    [
        T.StructField("site_code", T.StringType(), False),
        T.StructField("site_name", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
    ]
)

# LondonAir nested API payload (pipeline .py:734-738): the raw JSON shape
# before flattening; `Data` is the hourly measurements array
LONDONAIR_PAYLOAD = T.StructType(
    [
        T.StructField(
            "AirQualityData",
            T.StructType(
                [
                    T.StructField("@SiteCode", T.StringType()),
                    T.StructField(
                        "Data",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("@MeasurementDateGMT", T.StringType()),
                                    T.StructField("@SpeciesCode", T.StringType()),
                                    T.StructField("@Value", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

DOMAIN_TABLES: dict[str, T.StructType] = {
    "zoopla_raw": ZOOPLA_RAW,
    "dexters_raw": DEXTERS_RAW,
    "listings_clean": LISTINGS_CLEAN,
    "location_information": LOCATION_INFORMATION,
    "air_quality": AIR_QUALITY,
    "tube_site_mapping": TUBE_SITE_MAPPING,
    "station_names_mapping": STATION_NAMES_MAPPING,
    "air_sites": AIR_SITES,
}
