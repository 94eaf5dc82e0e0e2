"""Table access layer for the driver's parquet fixtures.

``load`` returns a lazy DataFrame straight off the parquet scan —
filters and projections composed on top of it are pushed into the
scan by Catalyst (check with ``.explain``: PushedFilters / ReadSchema).

At cluster scale these would be catalog tables (Hive/Unity/Glue) with
partition columns; locally they are single parquet files per table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Fixture parquet stores timestamps as INT64 TIMESTAMP(NANOS) (pandas
# datetime64[ns]), which Spark's reader rejects outright. We read them
# as raw nanos (legacy nanosAsLong) and floor-divide to micros — the
# exact truncation DuckDB applies when it scans the same files, so
# oracle comparisons stay bit-identical.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_conf(spark: SparkSession, key: str, value: str) -> None:
    try:
        current = spark.conf.get(key)
    except Exception:
        current = None
    if current != value:
        spark.conf.set(key, value)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one fixture table (nanos timestamps normalized).

    Engine-owned sessions get these two confs from ``session.get_spark``
    already; the idempotent re-assert here exists because the DRIVER
    runs queries on its own vanilla session (nanosAsLong is mandatory
    to read the fixtures at all — there is no per-read reader option
    for it — and the UTC pin keeps date_format/date_trunc aligned with
    DuckDB's naive-timestamp formatting).
    """
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {FIXTURE_TABLES}")
    _ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    dtypes = dict(df.dtypes)
    for c in _NANOS_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in FIXTURE_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
