"""autosinapi_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
LAMP-LUCAS/AutoSINAPI reference pipeline (pandas + PostgreSQL) as an
idiomatic Spark engine: DataFrame/SQL logical plans optimized by
Catalyst, columnar Parquet at rest, shuffle-aware operators designed
for 100 TB scale, plus LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``         SparkSession factory tuned for local[N] and cluster use
- ``schemas``         explicit StructTypes for SINAPI + driver fixture tables
- ``catalog``         fixture table access (nanos-timestamp normalization)
- ``functions/``      column-expression helpers (coercion, text, vectors)
- ``operators/``      engine operators (unpivot, dedup, near-dedup, windows,
                      repair, BOM explosion, write-policy sinks, ...)
- ``plans/``          the query registry consumed by ``__spark_entry__``
- ``sources/``        pre-schema ingestion (header discovery, two-row header
                      flatten, sheet/file routing, zip, landing writes)
- ``streaming/``      incremental AvailableNow loads, watermarked windows,
                      stateful operators
- ``pipeline``        end-to-end SINAPI ETL orchestrator (Fase 0-3 parity)
"""

__version__ = "0.1.0"
