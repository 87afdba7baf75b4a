"""dataengineering_londonhousingmap_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference London-housing ETL/analytics stack (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, columnar
Parquet storage, broadcast star joins, Structured Streaming for incremental
time-series ingest — plus the large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) the reference
never had but a 100 TB deployment needs.

Layout:
    session.py    — tuned SparkSession builders (local test vs cluster)
    schemas.py    — explicit StructType schemas (testdata + domain tables)
    sources/      — readers/writers: parquet, csv, json, jdbc
    functions/    — scalar Column-expression library (cleaning, text, vectors)
    operators/    — composite relational operators (nn-join, dedup, reshape,
                    similarity, multimodal)
    pipelines/    — domain pipelines reproducing the reference's ETL semantics
    streaming/    — incremental ingest (watermark, windowed agg, stateful dedup)
    queries.py    — the driver-facing query catalog (SURVEY.md §2 inventory)
    oracles.py    — DuckDB-equivalent ANSI SQL per query (correctness gate)
"""

__version__ = "0.1.0"
