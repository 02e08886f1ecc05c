"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference marketing-ETL pipeline
(Giray18/etl-s3-airflow-snowflake-powerbi-marketing-data), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, join-based MERGE
semantics, and large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB clusters.

Layout
------
- ``session``    : tuned SparkSession builder
- ``tables``     : test-table loading / view registration
- ``sources``    : readers (CSV/Parquet/JSON payload) and writers
- ``operators``  : row transforms, surrogate keys, merge/upsert, dedup,
                   similarity search
- ``functions``  : text analysis, multimodal column helpers
- ``plans``      : the marketing star-schema pipeline + KPI views, plus
                   general relational query plans
- ``streaming``  : Structured Streaming variants of the ingest pipeline
"""

__version__ = "0.1.0"
