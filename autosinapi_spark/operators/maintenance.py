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


def _zvalue(cols: list, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` of each
    column's rank-space value. Pure Column arithmetic — no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("bigint"), j).bitwiseAND(1)
            z = z + (bit.cast("bigint") * F.lit(1 << (j * len(cols) + i)))
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    keys: list[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` clustered by a Morton (Z-order) curve over ``keys``.

    ``write_range_layout`` gives perfect file-level skipping on ONE
    key; a filter on any other key still scans every file. Z-ordering
    interleaves the bits of several keys so each file covers a small
    hyper-rectangle of the key space — per-file min/max parquet stats
    then prune files for predicates on ANY of the keys (the layout
    idea behind Delta/Iceberg OPTIMIZE ZORDER, built from plain Spark
    primitives: bounded bucket space, bit interleave,
    repartitionByRange on the curve position).

    Each key is mapped to a bounded 2^bits bucket space with
    equal-width binning over its (min, max) — ONE aggregate, no
    global-window rank (an ``ntile`` rank space would be a
    single-partition sort, exactly the shape this module exists to
    avoid). Heavy key skew makes the buckets uneven (rank-space
    binning via sampled quantile boundaries is the refinement) but
    pruning stays correct: min/max stats never lie, skew only costs
    some pruning efficiency. The two scalars per key collected here
    are layout parameters, not data.
    """
    from pyspark.sql import functions as F

    n_tiles = 1 << bits
    bounds = df.agg(
        *[
            f
            for k in keys
            for f in (
                F.min(F.col(k).cast("double")).alias(f"lo_{k}"),
                F.max(F.col(k).cast("double")).alias(f"hi_{k}"),
            )
        ]
    ).collect()[0]
    if any(bounds[f"lo_{k}"] is None for k in keys):
        # empty input or an all-NULL key: there is nothing to order
        # by — write as-is rather than crash (an empty incremental
        # slice routed through the layout writer must be a no-op).
        df.write.mode("overwrite").parquet(path)
        return
    bucket_cols = []
    for k in keys:
        lo, hi = bounds[f"lo_{k}"], bounds[f"hi_{k}"]
        span = (hi - lo) or 1.0
        b = F.least(
            F.lit(n_tiles - 1),
            F.floor((F.col(k).cast("double") - F.lit(lo)) / F.lit(span) * n_tiles),
        ).cast("bigint")
        bucket_cols.append(b)
    z = _zvalue(bucket_cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
