"""embedding_covariance vs a numpy replay on the smoke fixture."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMOKE


def test_covariance_matches_numpy(spark):
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.linalg_queries import (
        _D,
        embedding_covariance,
    )

    vecs = np.array(
        [
            r.embedding[:_D]
            for r in load(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    n = vecs.shape[0]
    mean = vecs.mean(axis=0)
    cov = np.cov(vecs, rowvar=False, bias=True)  # population (divide by n)
    std = np.sqrt(np.diag(cov))

    rows = embedding_covariance(spark, SF_SMOKE).collect()
    assert len(rows) == _D * (_D + 1) // 2
    for r in rows:
        assert r.n == n
        i, j = r.dim_i, r.dim_j
        assert abs(r.mean_i - mean[i]) < 1e-5
        assert abs(r.cov - cov[i, j]) < 1e-5
        assert abs(r.corr - cov[i, j] / (std[i] * std[j])) < 1e-5
    # diagonal correlation is 1 by definition
    for r in rows:
        if r.dim_i == r.dim_j:
            assert abs(r.corr - 1.0) < 1e-6


def test_covariance_single_shuffle_plan(spark):
    """The Gramian pattern: exactly one aggregation over the scan —
    no explode/join before the agg, one exchange total."""
    from autosinapi_spark.plans.linalg_queries import embedding_covariance

    plan = (
        embedding_covariance(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" in plan  # the inline() reshape of the 1-row agg
    assert plan.count("Exchange") <= 1
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan
