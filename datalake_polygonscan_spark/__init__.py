"""datalake_polygonscan_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference ETL pipeline (``vinioliveirakasta/datalake_polygonscan``, an
ERC-20 transfer ingest job: PolygonScan API -> transform -> warehouse),
re-expressed Spark-first:

- DataFrame/SQL declarative plans; Catalyst does pushdown/pruning/join
  selection; AQE handles runtime re-planning and skew.
- Explicit ``StructType`` schemas everywhere (the reference infers
  schemas from dict keys — ``walletDataConsumer.py:139``).
- Atomic snapshot-overwrite table semantics (the reference's
  TRUNCATE+COPY at ``resources/redshift.py:80,98-104`` is non-atomic).
- LLM-data-pipeline operators (dedup, similarity search, multimodal
  plumbing, text analysis) designed for 100 TB scale.

Layout:
    session    SparkSession factory (UTC, AQE, Arrow)
    schemas    explicit StructTypes for every table
    tables     testdata catalog loader
    io         sources (parquet/json/csv) and sinks (atomic overwrite)
    functions  scalar/vector/text expression builders (JVM-side)
    operators  dedup, similarity, top-k (composed DataFrame ops)
    pipeline   the reference-equivalent ingest pipeline (R5-R13)
    streaming  Structured Streaming ops (windows, watermark, dedup)
    queries    operator registry: SURVEY.md §2.2 id -> (query, oracle)
"""

__version__ = "0.1.0"
