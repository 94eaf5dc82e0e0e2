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


def test_covariance_single_shuffle_plan(spark, no_rebalance):
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


def test_mapinpandas_gramian_matches_sql_covariance(spark):
    """The high-d scale path (Arrow partial X^T X) must agree with the
    exact-decimal SQL Gramian to float tolerance — the documented
    contract for switching forms past d ~ 100."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.operators.linalg import (
        covariance_from_gramian,
        gramian,
    )
    from autosinapi_spark.plans.linalg_queries import (
        _D,
        embedding_covariance,
    )

    emb = load(spark, SF_SMOKE, "embeddings")
    row = gramian(emb, "embedding", _D).collect()[0]
    mean, cov = covariance_from_gramian(row, _D)

    sql_rows = embedding_covariance(spark, SF_SMOKE).collect()
    assert row["n"] == sql_rows[0].n
    for r in sql_rows:
        assert abs(mean[r.dim_i] - r.mean_i) < 1e-6
        assert abs(cov[r.dim_i, r.dim_j] - r.cov) < 1e-6


def test_gramian_partials_merge_is_partition_invariant(spark):
    """Repartitioning (different batch boundaries) must not change the
    result beyond float noise — the property that makes the partial
    merge safe under AQE/speculation."""
    import numpy as np

    from autosinapi_spark.catalog import load
    from autosinapi_spark.operators.linalg import gramian

    emb = load(spark, SF_SMOKE, "embeddings")
    r1 = gramian(emb.repartition(1), "embedding", 8).collect()[0]
    r7 = gramian(emb.repartition(7), "embedding", 8).collect()[0]
    assert r1["n"] == r7["n"]
    assert np.allclose(r1["s"], r7["s"], atol=1e-8)
    assert np.allclose(r1["g"], r7["g"], atol=1e-6)


def test_pca_projection_matches_numpy_eigh(spark):
    """The unrolled power-iteration rounds must land on numpy's dominant
    eigenvector (up to sign) and the projections must match."""
    import numpy as np

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.linalg_queries import (
        _D,
        embedding_pca_project,
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
    cov = np.cov(vecs, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    centered = vecs - vecs.mean(axis=0)
    expect = centered @ top

    got_rows = embedding_pca_project(spark, SF_SMOKE).collect()
    ids = [
        r.vec_id
        for r in load(spark, SF_SMOKE, "embeddings")
        .select("vec_id")
        .collect()
    ]
    got = dict((r.vec_id, r.pc1) for r in got_rows)
    g = np.array([got[i] for i in ids])
    # sign of the power-iteration vector is seed-determined: align
    if np.dot(g, expect) < 0:
        expect = -expect
    # correlation ~1 and small absolute error relative to the spread
    corr = np.corrcoef(g, expect)[0, 1]
    assert corr > 0.9999
    assert np.max(np.abs(g - expect)) < 1e-2 * max(1.0, np.std(expect))


def test_pca_top2_matches_numpy_eigh(spark):
    """Deflation must recover the SECOND eigenvector too: both
    projections correlate with numpy's top-2, and pc1/pc2 are
    (near-)uncorrelated as principal axes must be."""
    import numpy as np

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.linalg_queries import (
        _D,
        embedding_pca_top2,
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
    cov = np.cov(vecs, rowvar=False, bias=True)
    _evals, evecs = np.linalg.eigh(cov)
    centered = vecs - vecs.mean(axis=0)
    exp1 = centered @ evecs[:, -1]
    exp2 = centered @ evecs[:, -2]

    rows = embedding_pca_top2(spark, SF_SMOKE).collect()
    ids = [
        r.vec_id
        for r in load(spark, SF_SMOKE, "embeddings")
        .select("vec_id")
        .collect()
    ]
    d1 = {r.vec_id: r.pc1 for r in rows}
    d2 = {r.vec_id: r.pc2 for r in rows}
    g1 = np.array([d1[i] for i in ids])
    g2 = np.array([d2[i] for i in ids])
    for g, exp in ((g1, exp1), (g2, exp2)):
        if np.dot(g, exp) < 0:
            exp = -exp
        assert np.corrcoef(g, exp)[0, 1] > 0.999
    # orthogonal axes -> uncorrelated projections
    assert abs(np.corrcoef(g1, g2)[0, 1]) < 0.01


def test_gramian_units_is_bit_exact_under_repartition(spark):
    """Integer-unit quantization before summation makes the partial
    merge associative: ANY partitioning must give the bit-identical
    result (not just tolerance-close like the float gramian) — the
    property that buys the d=64 query its hard DuckDB oracle."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.operators.linalg import gramian_units

    emb = load(spark, SF_SMOKE, "embeddings")
    r1 = gramian_units(emb.repartition(1), "embedding", 16).collect()[0]
    r7 = gramian_units(emb.repartition(7), "embedding", 16).collect()[0]
    assert r1["n"] == r7["n"]
    assert list(r1["s"]) == list(r7["s"])
    assert list(r1["g"]) == list(r7["g"])


def test_gramian_units_matches_float_gramian_to_scale(spark):
    """units/scale must track the float Gramian within quantization
    error (1/scale per product, n rows summed)."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.operators.linalg import gramian, gramian_units

    emb = load(spark, SF_SMOKE, "embeddings")
    f = gramian(emb, "embedding", 8).collect()[0]
    u = gramian_units(emb, "embedding", 8, scale=1e10).collect()[0]
    assert f["n"] == u["n"]
    tol = f["n"] * 1e-10 + 1e-9
    for a, b in zip(f["g"], u["g"]):
        assert abs(a - b / 1e10) <= tol
