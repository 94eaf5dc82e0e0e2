"""JSONL source/sink (sources/jsonl.py)."""

from __future__ import annotations

import gzip
import json
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from autosinapi_spark.sources.jsonl import (
    CORRUPT_COL,
    land_jsonl_to_parquet,
    read_jsonl,
    write_jsonl_shards,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def _write_fixture(path: Path, gz: bool) -> None:
    lines = [
        json.dumps({"doc_id": i, "text": f"doc {i} body", "lang": "en"})
        for i in range(10)
    ]
    lines.insert(4, '{"doc_id": broken json')  # malformed line
    data = ("\n".join(lines) + "\n").encode()
    if gz:
        path.write_bytes(gzip.compress(data))
    else:
        path.write_bytes(data)


def test_read_jsonl_captures_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    _write_fixture(p, gz=False)
    # Spark disallows queries pruned down to ONLY the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache first, as
    # land_jsonl_to_parquet does.
    df = read_jsonl(spark, str(p), SCHEMA).cache()
    assert df.where(F.col(CORRUPT_COL).isNotNull()).count() == 1
    good = df.where(F.col(CORRUPT_COL).isNull())
    assert good.count() == 10
    assert {r["doc_id"] for r in good.collect()} == set(range(10))
    df.unpersist()


def test_read_jsonl_gzip_transparent(spark, tmp_path):
    p = tmp_path / "corpus.jsonl.gz"
    _write_fixture(p, gz=True)
    df = read_jsonl(spark, str(p), SCHEMA).cache()
    assert df.where(F.col(CORRUPT_COL).isNull()).count() == 10
    df.unpersist()


def test_land_jsonl_excludes_corrupt_and_counts(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    _write_fixture(p, gz=False)
    landed, n_corrupt = land_jsonl_to_parquet(
        spark, str(p), str(tmp_path / "landed"), SCHEMA
    )
    assert n_corrupt == 1
    assert landed.count() == 10
    assert CORRUPT_COL not in landed.columns


def test_write_jsonl_shards_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    )
    out = tmp_path / "export"
    write_jsonl_shards(df, str(out), n_shards=4)
    files = [f for f in out.glob("part-*.json")]
    assert len(files) == 4
    back = spark.read.schema("doc_id long, text string").json(str(out))
    assert back.count() == 100
    assert {r["doc_id"] for r in back.collect()} == set(range(100))


def test_write_jsonl_shards_gzip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    out = tmp_path / "export_gz"
    write_jsonl_shards(df, str(out), n_shards=1, compress=True)
    assert list(out.glob("part-*.json.gz"))
    assert spark.read.schema("doc_id long, text string").json(
        str(out)
    ).count() == 1
