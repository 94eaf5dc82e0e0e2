"""ANN LSH quality tests — recall on planted near-duplicates.

Random fixtures have no true near neighbors (cosines cluster near 0),
so recall is measured on planted twins: v and 1.001*v share cosine
direction exactly, hence MUST land in the same hyperplane bucket in
every table — candidate-stage recall on planted pairs is 1.0 by
construction, and the test verifies the implementation delivers it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from autosinapi_spark.catalog import load
from autosinapi_spark.functions.vectors import (
    as_double,
    hyperplane_bucket,
    rademacher_planes,
)
from tests.conftest import SF_SMOKE

BITS, TABLES, DIM = 8, 2, 64
PLANES = rademacher_planes(BITS * TABLES, DIM)


def _bucketed(df):
    cols = [
        hyperplane_bucket(
            F.col("v"), PLANES[t * BITS : (t + 1) * BITS]
        ).alias(f"b{t}")
        for t in range(TABLES)
    ]
    return df.select("vec_id", *cols)


def test_planted_twin_recall_is_total(spark):
    emb = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.001).alias("v"),
    )
    orig_b = _bucketed(emb)
    twin_b = _bucketed(twins).select(
        (F.col("vec_id") - 100000).alias("vec_id"),
        F.col("b0").alias("tb0"),
        F.col("b1").alias("tb1"),
    )
    joined = orig_b.join(twin_b, "vec_id")
    n = joined.count()
    same = joined.where(
        (F.col("b0") == F.col("tb0")) & (F.col("b1") == F.col("tb1"))
    ).count()
    assert n > 0
    assert same == n, f"twin bucket recall {same}/{n} < 1.0"


def test_bucket_range(spark):
    emb = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    stats = (
        _bucketed(emb)
        .agg(
            F.min("b0").alias("lo0"),
            F.max("b0").alias("hi0"),
            F.min("b1").alias("lo1"),
            F.max("b1").alias("hi1"),
            F.countDistinct("b0").alias("nb"),
        )
        .collect()[0]
    )
    assert 0 <= stats["lo0"] and stats["hi0"] < (1 << BITS)
    assert 0 <= stats["lo1"] and stats["hi1"] < (1 << BITS)
    # random projections over all dims must actually spread the keys
    assert stats["nb"] > (1 << BITS) // 4
