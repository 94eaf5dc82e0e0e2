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


def test_zorder_layout_prunes_on_both_keys(spark, tmp_path):
    """File-level min/max skipping must work on BOTH z-ordered keys,
    where a 1-D range layout only serves its single sort key."""
    import pathlib

    import pyarrow.parquet as pq

    from autosinapi_spark.operators.maintenance import (
        write_range_layout,
        write_zorder_layout,
    )

    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    write_zorder_layout(li, zpath, ["l_orderkey", "l_partkey"], 16)
    write_range_layout(li, rpath, "l_orderkey", 16)

    def overlapping(path, col, lo, hi):
        files = sorted(pathlib.Path(path).rglob("*.parquet"))
        hit = 0
        for f in files:
            md = pq.read_metadata(f)
            mn = min(
                md.row_group(i).column(
                    md.schema.names.index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(i).column(
                    md.schema.names.index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            if mn <= hi and mx >= lo:
                hit += 1
        return hit, len(files)

    stats = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]
    ok_lo, ok_hi = stats[0], stats[1]
    pk_lo, pk_hi = stats[2], stats[3]
    # a ~5%-wide slice of each key's domain
    o_a = ok_lo + (ok_hi - ok_lo) * 40 // 100
    o_b = ok_lo + (ok_hi - ok_lo) * 45 // 100
    p_a = pk_lo + (pk_hi - pk_lo) * 40 // 100
    p_b = pk_lo + (pk_hi - pk_lo) * 45 // 100

    z_o, z_n = overlapping(zpath, "l_orderkey", o_a, o_b)
    z_p, _ = overlapping(zpath, "l_partkey", p_a, p_b)
    r_o, r_n = overlapping(rpath, "l_orderkey", o_a, o_b)
    r_p, _ = overlapping(rpath, "l_partkey", p_a, p_b)

    # range layout: perfect on its sort key, useless on the other
    assert r_o <= max(2, r_n // 4)
    assert r_p == r_n
    # z-order: prunes meaningfully on BOTH keys. Ratio, not exact
    # counts: repartitionByRange's boundary sampling shifts a file or
    # two between runs (load-dependent input split order), so an exact
    # halving bound flakes under full-suite contention; >=30% of files
    # skipped on each key is the property the layout must deliver.
    assert z_o < z_n and z_p < z_n
    assert z_o <= 0.7 * z_n and z_p <= 0.7 * z_n
