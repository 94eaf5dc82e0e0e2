"""Plan-shape proof for the storage-layout operators: bucketing must
eliminate the join exchange, Hive partitioning must prune at plan time.

These are the two write-path decisions that dominate read cost at
100 TB; asserting on the PHYSICAL PLAN (not timings) pins the property
the layout exists for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autosinapi_spark.catalog import load
from autosinapi_spark.operators.maintenance import (
    write_bucketed_table,
    write_partitioned,
)
from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_runs_without_exchange(spark, no_broadcast):
    orders = load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed_table(orders, "t_orders_b", "o_orderkey", 4)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        4,
    )
    try:
        joined = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"), "o_orderkey"
        )
        plan = _physical(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # sanity: the join still returns the right row count
        want = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        ).count()
        assert joined.count() == want

        # the same-key aggregation also reuses the bucket distribution
        agg = spark.table("t_lineitem_b").groupBy("o_orderkey").count()
        assert "Exchange" not in _physical(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partitioned_write_prunes_at_plan_time(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])

    scan = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = _physical(scan)
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1].split("\n")[0]
    # pruned scan reads only the en partition's rows
    want = docs.where(F.col("lang") == "en").count()
    assert scan.count() == want
    # and the pruned file set is strictly smaller than the table's
    n_all = len(
        list(__import__("pathlib").Path(path).rglob("*.parquet"))
    )
    n_en = len(
        list((__import__("pathlib").Path(path) / "lang=en").rglob("*.parquet"))
    )
    assert 0 < n_en < n_all
