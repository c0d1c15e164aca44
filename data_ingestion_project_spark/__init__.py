"""data_ingestion_project_spark — a PySpark-native analytics & ingestion engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference batch-ETL pipeline (ShadowA7X/Data_Ingestion_Project, surveyed in
SURVEY.md), extended with the analytics and LLM-data-pipeline operators a
100 TB training-data platform needs:

- ``session``    — SparkSession factory (Arrow, AQE, sane shuffle sizing)
- ``schemas``    — explicit StructTypes (no schema inference in the hot path)
- ``sources``    — parquet/csv/json table readers + the users HTTP/JSON source
- ``functions``  — column-level helpers (text stats, vector math, crypto UDFs)
- ``operators``  — composite operators (secure transform, keep-first upsert,
                   dedup family, similarity search, as-of join, sessionize)
- ``queries``    — the declared query inventory (TPC-H-ish, events, documents,
                   embeddings) exposed through ``__spark_entry__``
- ``streaming``  — Structured Streaming ingestion (foreachBatch upsert)
- ``plans``      — plan inspection helpers (explain capture, shuffle census)

Design stance: declare logical plans with the DataFrame API and let
Catalyst/Tungsten choose physical strategy; Python UDFs only where builtins
genuinely cannot express the semantics (crypto, MinHash), always as
Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
