"""JSONL corpus source/sink — the interchange format of LLM pipelines.

Web-scale text corpora (Common Crawl derivatives, RedPajama, FineWeb
releases) move as newline-delimited JSON, usually gzipped. This module
is the landing pair for them:

- ``read_jsonl``: schema-REQUIRED distributed read (schema inference
  would scan 100 TB twice), with malformed lines captured into a
  ``_corrupt_record`` column instead of failing the job — crawl data
  always contains breakage, and silently dropping it hides volume
  loss. Gzip is transparent to Spark's text-based sources, so ``.gz``
  paths just work (note: one gzip file = one non-splittable partition;
  shard uploads accordingly).
- ``land_jsonl_to_parquet``: the K8 landing discipline — convert ONCE
  to parquet so every downstream scan gets columnar pruning, pushdown
  and splittable files.
- ``write_jsonl_shards``: the export half — hand a curated corpus to
  a tokenizer/trainer as N JSONL shards (uncompressed or gzip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """PERMISSIVE JSONL read with explicit schema + corrupt capture.

    NB: Spark refuses a query that column-prunes down to ONLY the
    corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    frame before filtering on it, as ``land_jsonl_to_parquet`` does.
    """
    full = schema
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def land_jsonl_to_parquet(
    spark: SparkSession,
    jsonl_path: str,
    out_path: str,
    schema: T.StructType,
) -> tuple[DataFrame, int]:
    """Land JSONL as parquet; returns (clean frame, corrupt count).

    Corrupt lines are counted and EXCLUDED from the landed table (the
    caller decides whether the loss rate is acceptable); the landed
    parquet carries only the declared schema columns.
    """
    raw = read_jsonl(spark, jsonl_path, schema, keep_corrupt=True)
    raw.cache()
    n_corrupt = raw.where(F.col(CORRUPT_COL).isNotNull()).count()
    clean = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    clean.write.mode("overwrite").parquet(out_path)
    raw.unpersist()
    return spark.read.parquet(out_path), n_corrupt


def write_jsonl_shards(
    df: DataFrame,
    out_path: str,
    n_shards: int,
    compress: bool = False,
) -> None:
    """Export a corpus as N JSONL shards (optionally gzipped)."""
    w = df.repartition(n_shards).write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(out_path)
