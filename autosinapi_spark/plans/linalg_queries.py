"""Distributed linear algebra over embedding columns (extension).

``embedding_covariance`` computes the mean vector and the upper
triangle of the covariance + correlation matrix of the embedding
table in ONE pass — the Gramian pattern of Spark MLlib's
``RowMatrix.computeGramianMatrix``: every product x_i * x_j is a
per-row expression, the d*(d+1)/2 sums partial-aggregate map-side,
and the shuffle carries exactly one wide row per partition. Nothing
explodes: the naive alternative (posexplode to (row, i, x_i) then a
self-join + groupBy(i, j)) shuffles N * d^2 rows and is the shape
that dies at 100 TB.

The covariance matrix is the input to whitening / PCA — with d small
(here 16 of the 64 fixture dims, to keep the agg-column count
codegen-friendly) the eigen step on the d x d result is a driver-side
triviality; the DISTRIBUTED work is exactly this query. For d in the
hundreds the same single-pass shape holds via a mapInPandas partial
X^T X per batch (numpy matmul) merged by element-wise array sum.

Cross-engine float determinism follows the registry's dsum pattern:
raw moments are summed exactly as DECIMAL(28,10) (order-independent),
cast to double, and covariance/correlation are derived from those
identical doubles with the identical expression tree on both engines,
then rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

# First _D of the 64 fixture dims: d*(d+1)/2 = 136 decimal-sum agg
# columns — comfortably inside codegen limits. (64 dims -> 2080 agg
# columns works but compiles slowly; the mapInPandas partial-Gramian
# variant documented above is the right form there.)
_D = 16

_PAIRS = [(i, j) for i in range(_D) for j in range(i, _D)]


def _cov_sql() -> str:
    xs = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(_D)
    )
    sums = ", ".join(
        f"SUM(CAST(x{i} AS DECIMAL(28,10))) AS s{i}" for i in range(_D)
    )
    prods = ", ".join(
        f"SUM(CAST(x{i} * x{j} AS DECIMAL(28,10))) AS p{i}_{j}"
        for i, j in _PAIRS
    )
    # identical expression tree to the Spark side: exact decimal sums
    # -> double, then (p - s_i*s_j/n)/n in double
    covs = ", ".join(
        f"(CAST(p{i}_{j} AS DOUBLE) "
        f"- CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE) / n) / n "
        f"AS c{i}_{j}"
        for i, j in _PAIRS
    )
    entries = " UNION ALL ".join(
        f"SELECT {i} AS dim_i, {j} AS dim_j, n, "
        f"ROUND(CAST(s{i} AS DOUBLE) / n, 6) AS mean_i, "
        f"ROUND(c{i}_{j}, 6) AS cov, "
        f"ROUND(c{i}_{j} / SQRT(c{i}_{i} * c{j}_{j}), 6) AS corr "
        f"FROM c"
        for i, j in _PAIRS
    )
    return f"""
    WITH base AS (SELECT {xs} FROM embeddings),
    agg AS (SELECT COUNT(*) AS n, {sums}, {prods} FROM base),
    c AS (SELECT n, {', '.join(f's{i}' for i in range(_D))},
                 {covs} FROM agg)
    {entries}
    """


@register(
    "embedding_covariance",
    _cov_sql(),
    doc="Single-pass distributed covariance/correlation (upper "
    "triangle) + mean of the embedding table — the Gramian pattern "
    "(MLlib computeGramianMatrix): per-row products, map-side partial "
    "decimal sums, one wide row per partition crosses the shuffle. "
    "Input to whitening/PCA (extension).",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim_i, dim_j, n, mean_i, cov, corr) for i <= j over d=16 dims.

    Scale shape: ONE aggregation over the scan — no explode, no
    self-join; d*(d+1)/2 decimal sums partial-aggregate map-side so
    the exchange moves a single 138-column row per input partition.
    The d x d result is driver-sized by construction; downstream
    eigen/whitening happens on that, not on the corpus.
    """
    emb = load(spark, sf_dir, "embeddings")
    # One generated Spark-SQL statement, parsed JVM-side in a single
    # call: building the same plan from ~1000 Python Column objects
    # costs ~10 s of py4j round trips before Spark sees any of it.
    xs = ", ".join(
        f"CAST(element_at(embedding, {i + 1}) AS DOUBLE) AS x{i}"
        for i in range(_D)
    )
    sums = ", ".join(
        f"SUM(CAST(x{i} AS DECIMAL(28,10))) AS s{i}" for i in range(_D)
    )
    prods = ", ".join(
        f"SUM(CAST(x{i} * x{j} AS DECIMAL(28,10))) AS p{i}_{j}"
        for i, j in _PAIRS
    )
    # structs carry only RAW sums; cov/corr come AFTER the inline()
    # with one small uniform expression per row (full formulas inside
    # 136 struct literals blow up the optimizer's expression tree)
    structs = ", ".join(
        f"named_struct('dim_i', {i}, 'dim_j', {j}, 'n', n, "
        f"'si', CAST(s{i} AS DOUBLE), 'sj', CAST(s{j} AS DOUBLE), "
        f"'pij', CAST(p{i}_{j} AS DOUBLE), "
        f"'pii', CAST(p{i}_{i} AS DOUBLE), "
        f"'pjj', CAST(p{j}_{j} AS DOUBLE))"
        for i, j in _PAIRS
    )
    # identical formula tree to the oracle's c{i}_{j} definitions:
    # cov(i, j) = (p_ij - s_i * s_j / n) / n on exact-decimal-derived
    # doubles, so results are bit-equal however often re-evaluated
    return spark.sql(
        f"""
        WITH base AS (SELECT {xs} FROM {{emb}}),
        agg AS (SELECT COUNT(*) AS n, {sums}, {prods} FROM base),
        e AS (SELECT inline(array({structs})) FROM agg)
        SELECT dim_i, dim_j, n,
               ROUND(si / n, 6) AS mean_i,
               ROUND((pij - si * sj / n) / n, 6) AS cov,
               ROUND(((pij - si * sj / n) / n)
                     / SQRT(((pii - si * si / n) / n)
                            * ((pjj - sj * sj / n) / n)), 6) AS corr
        FROM e
        """,
        emb=emb,
    )
