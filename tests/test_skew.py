"""Salted-join correctness + plan shape: result identical to the plain
join; the physical join key includes the salt column."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from autosinapi_spark.catalog import load
from autosinapi_spark.operators.skew import salted_join
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key — the shape salting exists for
    li = load(spark, SF_SMOKE, "lineitem").limit(5000)
    return li.select(
        F.when(F.col("l_linenumber") > 1, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("k"),
        "l_quantity",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return (
        load(spark, SF_SMOKE, "part")
        .select(F.col("p_partkey").alias("k"), "p_name")
        .limit(500)
    )


def _counts(df):
    return {
        (r["k"], r["p_name"]): r["n"]
        for r in df.groupBy("k", "p_name").agg(F.count("*").alias("n")).collect()
    }


def test_salted_inner_equals_plain(skewed, dim):
    plain = skewed.join(dim, "k")
    salted = salted_join(skewed, dim, ["k"], n_salts=4)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _counts(salted) == _counts(plain)


def test_salted_left_preserves_unmatched(skewed, dim):
    plain = skewed.join(dim, "k", "left")
    salted = salted_join(skewed, dim, ["k"], n_salts=4, how="left")
    assert salted.count() == plain.count()
    assert (
        salted.where(F.col("p_name").isNull()).count()
        == plain.where(F.col("p_name").isNull()).count()
    )


def test_salt_participates_in_join_key(spark, skewed, dim):
    # disable auto-broadcast so the shuffle join's partitioning is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            salted_join(skewed, dim, ["k"], n_salts=4).explain("simple")
        plan = buf.getvalue()
        assert "__salt" in plan  # hot key spread across 4 sub-keys
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_rejects_ambiguous_columns(skewed):
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(skewed, skewed, ["k"])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, skewed.select("k"), ["k"], how="full")
