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
- ``config``          engine config mirroring the reference's DEFAULT_CONSTANTS
- ``functions/``      column-expression helpers (coercion, text, vectors)
- ``operators/``      engine operators (unpivot, dedup, windows, repair,
                      BOM explosion, write policies, similarity, ...)
- ``plans/``          the query registry consumed by ``__spark_entry__``
- ``sources/``        pre-schema ingestion (header discovery, normalization)
- ``streaming/``      incremental / Structured Streaming operators
- ``pipeline``        end-to-end ETL orchestrator with reference parity
"""

__version__ = "0.1.0"
