"""Compaction + range-layout maintenance operators."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from autosinapi_spark.operators.maintenance import (
    compact_table,
    write_range_layout,
)


def _parquet_files(path) -> list[Path]:
    return sorted(Path(path).rglob("*.parquet"))


def test_compact_collapses_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)
    assert len(_parquet_files(path)) == 40
    before = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}

    n_out = compact_table(spark, path, target_file_bytes=128 << 20)

    assert 0 < n_out < 40
    assert len(_parquet_files(path)) == n_out
    after = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert after == before  # lossless rewrite
    assert not Path(path + "__compact_tmp").exists()
    assert not Path(path + "__old").exists()


def test_compact_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    files_before = _parquet_files(path)
    assert compact_table(spark, path) == 0
    assert _parquet_files(path) == files_before  # untouched


def test_range_layout_files_cover_disjoint_key_ranges(spark, tmp_path):
    path = str(tmp_path / "ranged")
    df = spark.range(0, 50_000).select(
        (F.xxhash64("id") % 100_000).alias("key"), F.col("id").alias("v")
    )
    write_range_layout(df, path, key="key", n_files=8)

    spans = []
    for f in _parquet_files(path):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "key"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) > 1
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # no overlap => a key predicate prunes files

    # round-trips losslessly
    assert spark.read.parquet(path).count() == 50_000
