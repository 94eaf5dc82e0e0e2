"""Bucketed co-located join demo: pre-bucketing both sides on the join
key removes the shuffle entirely — the 100 TB answer for repeated
large-x-large joins (SURVEY §4 scale posture)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from autosinapi_spark.catalog import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load(spark, SF_SMOKE, "part").select("p_partkey", "p_name")
    for name in ("li_bucketed", "part_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        li.write.bucketBy(8, "l_partkey")
        .sortBy("l_partkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        part.withColumnRenamed("p_partkey", "l_partkey")
        .write.bucketBy(8, "l_partkey")
        .sortBy("l_partkey")
        .mode("overwrite")
        .saveAsTable("part_bucketed")
    )
    yield "li_bucketed", "part_bucketed"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_rebalance):
    li_t, part_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(spark.table(part_t), "l_partkey")
        plan = _plan(joined)
        # co-located buckets: the sort-merge join needs NO shuffle
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and an equivalent unbucketed join DOES shuffle both sides
        li = load(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_quantity")
        part = load(spark, SF_SMOKE, "part").select(
            F.col("p_partkey").alias("l_partkey"), "p_name"
        )
        assert _plan(li.join(part, "l_partkey")).count("Exchange") == 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_plain(spark, bucketed_tables):
    li_t, part_t = bucketed_tables
    bucketed = spark.table(li_t).join(spark.table(part_t), "l_partkey")
    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load(spark, SF_SMOKE, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    assert bucketed.count() == li.join(part, "l_partkey").count()
