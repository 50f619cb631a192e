"""cdc_practice_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference CDC pipeline
(kimjaebeom98/cdc-practice), re-expressed Spark-first.

The reference is a MySQL → Debezium → Kafka → Python-consumer → Postgres
CDC demo whose entire computation is one Airflow DAG
(``airflow-dags/simple_kafka_etl.py``) materializing three warehouse
artifacts: an append-only change-history table, an upserted current-state
snapshot, and a per-user stats table.  This package reproduces those
semantics as set-oriented DataFrame pipelines (batch + Structured
Streaming), then extends the engine with the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the 100 TB use case needs.

Layout:
    session.py    SparkSession builder + fixture loaders
    schemas.py    explicit StructTypes (schema-on-read for the change feed)
    cdc/          change-feed normalization, history, snapshot, stats
    queries/      read-side analytic query surface (SURVEY.md §2.3)
    operators/    dedup (exact/minhash/simhash/jaccard), similarity search
    functions/    text analysis + vector math column functions
    streaming/    Structured Streaming shells (readStream → foreachBatch)
    sources/      source/sink helpers (kafka config builder, parquet)
"""

__version__ = "0.1.0"
