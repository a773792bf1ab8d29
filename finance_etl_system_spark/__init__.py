"""finance_etl_system_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference system ``hieuleminh03/finance-etl-system``
(a dockerized financial OHLCV pipeline: Kafka -> Mongo -> Spark batch ETL
-> ES/Mongo -> sklearn ML), re-expressed as idiomatic Spark DataFrame /
SQL / Structured Streaming code, plus large-scale training-data pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7):
- columnar-first: Parquet + DataFrames, explicit schemas (catalog.py)
- declarative plans: let Catalyst do pushdown/pruning/join selection
- one partitioned job instead of per-symbol driver loops
- UDFs only where built-ins genuinely can't express the semantics
  (recursive EMA, sklearn model training) — then Arrow-batched pandas
  UDFs, never row-at-a-time Python
"""

__version__ = "0.1.0"
