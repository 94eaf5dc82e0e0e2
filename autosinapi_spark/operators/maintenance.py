"""Table-maintenance operators: compaction + data-skipping layout.

At 100 TB the write path decides the read path's fate:

- Streaming/incremental appends (``streaming/incremental.py``, K2)
  accrete thousands of small parquet files; scans then pay per-file
  open/footer costs and lose vectorized locality. ``compact_table``
  rewrites a table directory into size-targeted files.
- Filter-heavy workloads (period lookups, key ranges) want each file
  to cover a DISJOINT key range so parquet row-group min/max stats
  prune whole files at planning time. ``write_range_layout`` writes
  with ``repartitionByRange + sortWithinPartitions`` — the
  Spark-native equivalent of clustering/Z-ordering on one key.

Both stage into a sibling temp directory and swap on success, so a
failed rewrite never corrupts the live table (the same
write-temp-then-promote discipline as ``sinks.write_overwrite``; on
object stores the swap becomes a manifest/metadata commit).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    return sum(
        f.stat().st_size
        for f in Path(path).rglob("*.parquet")
        if f.is_file()
    )


def _swap_dirs(tmp: str, live: str) -> None:
    back = live + "__old"
    shutil.move(live, back)
    shutil.move(tmp, live)
    shutil.rmtree(back)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files_to_compact: int = 2,
) -> int:
    """Rewrite a parquet table into ~target-sized files; returns the
    output file count (0 = nothing to do).

    File count = ceil(current_bytes / target). Parquet compresses, so
    output files land under the target rather than over (fine — the
    point is eliminating the thousands-of-tiny-files regime, not
    hitting an exact size). The local directory swap stands in for a
    FileSystem rename / table-format commit in deployment.
    """
    p = Path(path)
    files = list(p.rglob("*.parquet"))
    if len(files) < min_files_to_compact:
        return 0
    total = _dir_bytes(path)
    n_out = max(1, -(-total // target_file_bytes))
    if n_out >= len(files):
        return 0  # already at/under the target granularity
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    _swap_dirs(tmp, path)
    return len(list(Path(path).rglob("*.parquet")))


def write_range_layout(
    df: DataFrame,
    path: str,
    key: str,
    n_files: int,
) -> None:
    """Write ``df`` so each file covers a disjoint ``key`` range.

    ``repartitionByRange`` samples range boundaries and hashes rows to
    ordered partitions; ``sortWithinPartitions`` orders rows inside
    each file so parquet writes tight per-row-group min/max stats.
    A later ``WHERE key BETWEEN a AND b`` scan then prunes every file
    whose [min, max] misses the predicate — file-level skipping
    without any table format.
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int,
) -> None:
    """Save as a bucketed+sorted managed table (hash-clustered files).

    Bucketing pre-shuffles ONCE at write time: every row with the same
    key hash lands in the same bucket file, so a later join or
    aggregation on the bucket key needs NO exchange — the single
    biggest shuffle eliminator for repeated large-x-large joins (fact
    tables joined every run). Both sides must bucket on the join key
    with the same bucket count. Plan-asserted in
    tests/test_layout.py: the join of two such tables contains no
    Exchange operator.
    """
    (
        df.repartition(n_buckets, bucket_key)
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Hive-style directory partitioning (`col=value/` directories).

    Equality/IN predicates on the partition columns prune entire
    directories at PLAN time (PartitionFilters in the scan node —
    never opens a pruned file's footer), which is the first-line
    defense at 100 TB: a per-source or per-date filter touches only
    its slice. Keep partition columns low-cardinality (source, date,
    lang) — per-key directories explode small files otherwise; use
    bucketing or range layout for high-cardinality keys.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
