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
    # "+ 0" normalizes IEEE signed zero: DuckDB's ROUND keeps the sign
    # of a value that rounds to zero from below (-1e-7 -> -0.0), while
    # Spark's ROUND goes through BigDecimal and always emits +0.0; the
    # driver hashes representations, so -0.0 vs +0.0 is a mismatch even
    # though Python == calls them equal (r6's one red row).
    entries = " UNION ALL ".join(
        f"SELECT {i} AS dim_i, {j} AS dim_j, n, "
        f"ROUND(CAST(s{i} AS DOUBLE) / n, 6) + 0 AS mean_i, "
        f"ROUND(c{i}_{j}, 6) + 0 AS cov, "
        f"ROUND(c{i}_{j} / SQRT(c{i}_{i} * c{j}_{j}), 6) + 0 AS corr "
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


# --- power-iteration PCA projection (first principal component) ------

_PI_SQUARINGS = 7  # C -> C^2 -> ... -> C^128 by repeated squaring.
# Power iteration without per-step normalization is just C^T v0, so
# the T=128 effective rounds collapse into 7 matrix squarings (trace-
# rescaled each time so entries can neither overflow nor vanish) plus
# ONE matrix-vector product normalized at the end. 128 rounds pin the
# dominant direction even on the fixture's near-isotropic spectrum
# (unit-tested vs numpy eigh); both the squaring count and every
# summation order are fixed, so the eigenvector is bit-identical
# across engines.


def _c(i: int, j: int) -> str:
    """Symmetric covariance element name (upper triangle stored)."""
    return f"c{min(i, j)}_{max(i, j)}"


def _pca_square_sql(prev: str, s: int) -> tuple[str, str]:
    """(product_select, rescale_select) for one squaring step — shared
    verbatim by the oracle CTE chain and the Spark stepwise frames so
    the formula tree cannot diverge."""
    prod = ", ".join(
        " + ".join(f"{prev}_{i}_{k} * {prev}_{k}_{j}" for k in range(_D))
        + f" AS r_{i}_{j}"
        for i in range(_D)
        for j in range(_D)
    )
    tr = " + ".join(f"r_{i}_{i}" for i in range(_D))
    scaled = ", ".join(
        f"r_{i}_{j} / ({tr}) AS a{s}_{i}_{j}"
        for i in range(_D)
        for j in range(_D)
    )
    return prod, scaled


def _pca_final_sql(prev: str) -> str:
    """Normalized (C^(2^S)) . 1 — the eigenvector select list."""
    w = ", ".join(
        " + ".join(f"{prev}_{i}_{j}" for j in range(_D)) + f" AS w{i}"
        for i in range(_D)
    )
    nrm = " + ".join(f"w{i} * w{i}" for i in range(_D))
    v = ", ".join(f"w{i} / SQRT({nrm}) AS v{i}" for i in range(_D))
    return f"SELECT {v} FROM (SELECT {w} FROM __PREV__)"


def _pca_cte_chain() -> str:
    """Oracle CTE chain: a0 (full symmetric matrix) -> S trace-
    rescaled squarings -> the normalized eigenvector ``e``."""
    parts = []
    a0 = ", ".join(
        f"{_c(i, j)} AS a0_{i}_{j}" for i in range(_D) for j in range(_D)
    )
    parts.append(f"a0 AS (SELECT {a0} FROM c)")
    prev = "a0"
    for s in range(1, _PI_SQUARINGS + 1):
        prod, scaled = _pca_square_sql(prev, s)
        parts.append(f"q{s} AS (SELECT {prod} FROM {prev})")
        parts.append(f"a{s} AS (SELECT {scaled} FROM q{s})")
        prev = f"a{s}"
    ev = _pca_final_sql(prev).replace("__PREV__", prev)
    parts.append(f"ev AS ({ev})")
    return ",\n    ".join(parts)


def _dominant_eigvec(spark: SparkSession, mframe: DataFrame) -> DataFrame:
    """1-row frame ``ev`` (array<double>): dominant eigenvector of the
    matrix in ``mframe.m`` via ``_PI_SQUARINGS`` trace-rescaled
    squarings + one normalized row-sum.

    The Spark-side eigen steps run on the ARRAY form with HOF folds:
    tiny statements that parse/analyze in milliseconds, vs ~1 s per
    statement for the 4096-scalar-expression form, and interpreted
    HOF cost is irrelevant on 1-row frames. Every fold iterates in
    the same ascending order and left-association as the oracle's
    scalar chains (0.0 + x == x bitwise), so the eigenvector is
    bit-identical — pinned by the sim compare and the numpy tests.

    r15: the matrix is COLLECTED once (bounded — D x D = 4096
    doubles) and the squarings run in pure PYTHON on the driver; the
    eigenvector returns as a SQL array literal. The former shape
    eagerly localCheckpoint-ed every squaring (~0.13 s of driver-side
    planning per step, x7 per eigenvector, x2 eigenvectors in the
    top-2 query — ~2 s of that query's 2.15 s wall was plan
    construction + 1-row jobs); a lazy chain is no alternative (the
    analyzer re-analyzes the whole subquery tree per step — measured
    10.7 s). Bit-parity holds EXACTLY, not approximately: Python
    floats are IEEE doubles with the same semantics as the JVM's;
    ``sum()`` seeds at int 0 and folds left-associated (0 + x == x
    and 0.0 + x == x exactly), matching the SQL
    ``aggregate(..., 0.0D, acc + ...)`` folds' order term for term;
    ``math.sqrt`` is correctly rounded like java.lang.Math.sqrt; and
    the literal round trip is exact (collect yields IEEE doubles,
    repr() is shortest-round-trip, the D literal parses correctly
    rounded). NOT numpy — BLAS reassociates sums. Verified exceptAll
    == 0 both ways at sf0.01 AND sf0.1, plus the pinned numpy tests.
    """
    import math

    rng = range(_D)
    m = [list(r) for r in mframe.select("m").collect()[0]["m"]]
    for _ in range(_PI_SQUARINGS):
        # same event order as the SQL folds: tr from mm, then every
        # product cell divided by tr
        tr = sum(sum(m[i][k] * m[k][i] for k in rng) for i in rng)
        m = [
            [sum(m[i][k] * m[k][j] for k in rng) / tr for j in rng]
            for i in rng
        ]
    w = [sum(m[i][j] for j in rng) for i in rng]
    nrm = math.sqrt(sum(x * x for x in w))
    ev = [x / nrm for x in w]
    return spark.sql(
        "SELECT array(" + ",".join(f"{x!r}D" for x in ev) + ") AS ev"
    )


def _pca_sql() -> str:
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
    covs = ", ".join(
        f"(CAST(p{i}_{j} AS DOUBLE) "
        f"- CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE) / n) / n "
        f"AS c{i}_{j}"
        for i, j in _PAIRS
    )
    means = ", ".join(
        f"CAST(s{i} AS DOUBLE) / n AS m{i}" for i in range(_D)
    )
    proj = " + ".join(f"(b.x{i} - e.m{i}) * e.v{i}" for i in range(_D))
    return f"""
    WITH base AS (SELECT vec_id, {xs} FROM embeddings),
    agg AS (SELECT COUNT(*) AS n, {sums}, {prods} FROM base),
    c AS (SELECT n, {", ".join(f"s{i}" for i in range(_D))},
                 {covs} FROM agg),
    {_pca_cte_chain()},
    e AS (SELECT v.*, m.* FROM ev v, (SELECT {means} FROM c) m)
    SELECT b.vec_id, ROUND({proj}, 6) + 0 AS pc1
    FROM base b, e
    """


@register(
    "embedding_pca_project",
    _pca_sql(),
    doc="First-principal-component projection: covariance Gramian -> "
    f"{_PI_SQUARINGS} trace-rescaled matrix squarings (= 2^"
    f"{_PI_SQUARINGS} power-iteration rounds) computed INSIDE the "
    "plan with fixed summation order, so both engines produce the "
    "bit-identical dominant eigenvector -> mean-centered projection "
    "of every embedding onto it. Full-oracle distributed PCA without "
    "any driver-side eigen step (extension).",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, pc1): each embedding's coordinate on the dominant
    principal axis of the corpus.

    Scale shape: two passes over the data — the single-pass Gramian
    aggregate (map-side partial decimal sums; one wide row per
    partition), then a row-local projection against the 1-row
    eigenvector frame (broadcast cross join). The eigen step costs
    S * d^3 scalar ops on 1-row frames regardless of corpus size.
    The oracle evaluates it as one linear CTE chain; the Spark side
    runs the SAME arithmetic as stepwise 1-row frames with eager
    lineage truncation — handed over whole, Catalyst's projection
    collapse inflates the chain into a ~2-minute optimizer pass.
    Sign of the component is fixed by the all-ones seed.
    """
    emb = load(spark, sf_dir, "embeddings")
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
    covs = ", ".join(
        f"(CAST(p{i}_{j} AS DOUBLE) "
        f"- CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE) / n) / n "
        f"AS c{i}_{j}"
        for i, j in _PAIRS
    )
    means = ", ".join(
        f"CAST(s{i} AS DOUBLE) / n AS m{i}" for i in range(_D)
    )
    rows = ", ".join(
        "array(" + ", ".join(_c(i, j) for j in range(_D)) + ")"
        for i in range(_D)
    )
    # one corpus pass: covariance matrix (as nested array) + means,
    # materialized once
    cmat = spark.sql(
        f"""
        WITH base AS (SELECT vec_id, {xs} FROM {{emb}}),
        agg AS (SELECT COUNT(*) AS n, {sums}, {prods} FROM base),
        c AS (SELECT n, {", ".join(f"s{i}" for i in range(_D))},
                     {covs} FROM agg)
        SELECT array({rows}) AS m, {means} FROM c
        """,
        emb=emb,
    ).localCheckpoint(eager=False)

    v = _dominant_eigvec(spark, cmat)
    # scalar-extract the eigenvector so the corpus-wide projection is
    # whole-stage-codegen arithmetic, not an interpreted per-row fold
    e = spark.sql(
        "SELECT "
        + ", ".join(f"ev[{i}] AS v{i}" for i in range(_D))
        + " FROM {v}",
        v=v,
    )
    proj = " + ".join(f"(b.x{i} - e.m{i}) * e.v{i}" for i in range(_D))
    m_cols = ", ".join(f"m{i}" for i in range(_D))
    return spark.sql(
        f"""
        WITH base AS (SELECT vec_id, {xs} FROM {{emb}}),
        e AS (SELECT v.*, m.* FROM {{v}} v,
                    (SELECT {m_cols} FROM {{cmat}}) m)
        SELECT b.vec_id, ROUND({proj}, 6) AS pc1
        FROM base b, e
        """,
        emb=emb,
        v=e,
        cmat=cmat,
    )


# --- top-2 PCA via deflation -----------------------------------------


def _sq_chain_ctes(src: str, tag: str) -> tuple[str, str]:
    """Squaring-chain CTE fragment over matrix columns ``{src}_{i}_{j}``
    producing ``{tag}{S}_{i}_{j}``; returns (fragment, final_name).
    Same arithmetic as ``_pca_square_sql`` with namespaced CTEs so two
    chains can coexist in one oracle."""
    parts = []
    prev = src
    for s in range(1, _PI_SQUARINGS + 1):
        prod = ", ".join(
            " + ".join(f"{prev}_{i}_{k} * {prev}_{k}_{j}" for k in range(_D))
            + f" AS r_{i}_{j}"
            for i in range(_D)
            for j in range(_D)
        )
        tr = " + ".join(f"r_{i}_{i}" for i in range(_D))
        scaled = ", ".join(
            f"r_{i}_{j} / ({tr}) AS {tag}{s}_{i}_{j}"
            for i in range(_D)
            for j in range(_D)
        )
        parts.append(f"q{tag}{s} AS (SELECT {prod} FROM {prev})")
        parts.append(f"{tag}{s} AS (SELECT {scaled} FROM q{tag}{s})")
        prev = f"{tag}{s}"
    return ",\n    ".join(parts), prev


def _eigvec_cte(mat: str, out: str) -> str:
    """Normalized row-sum eigenvector select over matrix ``{mat}`` with
    output columns ``{out}{i}``."""
    w = ", ".join(
        " + ".join(f"{mat}_{i}_{j}" for j in range(_D)) + f" AS w{i}"
        for i in range(_D)
    )
    nrm = " + ".join(f"w{i} * w{i}" for i in range(_D))
    v = ", ".join(f"w{i} / SQRT({nrm}) AS {out}{i}" for i in range(_D))
    return f"SELECT {v} FROM (SELECT {w} FROM {mat})"


def _pca2_sql() -> str:
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
    covs = ", ".join(
        f"(CAST(p{i}_{j} AS DOUBLE) "
        f"- CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE) / n) / n "
        f"AS c{i}_{j}"
        for i, j in _PAIRS
    )
    means = ", ".join(
        f"CAST(s{i} AS DOUBLE) / n AS m{i}" for i in range(_D)
    )
    g0 = ", ".join(
        f"{_c(i, j)} AS g0_{i}_{j}" for i in range(_D) for j in range(_D)
    )
    chain1, m1 = _sq_chain_ctes("g0", "ga")
    # Rayleigh quotient lam = v' C v with the same fold order the
    # Spark HOFs use (i ascending outer, j ascending inner)
    lam = " + ".join(
        f"v{i} * ("
        + " + ".join(f"{_c(i, j)} * v{j}" for j in range(_D))
        + ")"
        for i in range(_D)
    )
    d0 = ", ".join(
        f"{_c(i, j)} - lam * v{i} * v{j} AS h0_{i}_{j}"
        for i in range(_D)
        for j in range(_D)
    )
    chain2, m2 = _sq_chain_ctes("h0", "gb")
    p1 = " + ".join(f"(b.x{i} - e.m{i}) * e.v{i}" for i in range(_D))
    p2 = " + ".join(f"(b.x{i} - e.m{i}) * e.u{i}" for i in range(_D))
    return f"""
    WITH base AS (SELECT vec_id, {xs} FROM embeddings),
    agg AS (SELECT COUNT(*) AS n, {sums}, {prods} FROM base),
    c AS (SELECT n, {", ".join(f"s{i}" for i in range(_D))},
                 {covs} FROM agg),
    g0 AS (SELECT {g0} FROM c),
    {chain1},
    ev1 AS ({_eigvec_cte(m1, "v")}),
    lamc AS (SELECT {lam} AS lam FROM c, ev1),
    h0 AS (SELECT {d0} FROM c, ev1, lamc),
    {chain2},
    ev2 AS ({_eigvec_cte(m2, "u")}),
    e AS (SELECT ev1.*, ev2.*, m.*
          FROM ev1, ev2, (SELECT {means} FROM c) m)
    SELECT b.vec_id, ROUND({p1}, 6) + 0 AS pc1, ROUND({p2}, 6) + 0 AS pc2
    FROM base b, e
    """


@register(
    "embedding_pca_top2",
    _pca2_sql(),
    doc="Two-component PCA via deflation: dominant eigenvector as in "
    "embedding_pca_project, Rayleigh-quotient eigenvalue, rank-one "
    "deflation C - lam v v', second squaring chain for the next "
    "component, both projections emitted per embedding — all inside "
    "the plan with fixed summation order, bit-identical across "
    "engines (extension).",
)
def embedding_pca_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, pc1, pc2): coordinates on the top two principal axes.

    Scale shape: identical to ``embedding_pca_project`` (one Gramian
    pass + a broadcast projection) — deflation adds only 1-row-frame
    work (a Rayleigh quotient, a rank-one update, a second squaring
    chain), so the per-component cost is corpus-independent; top-k
    components iterate the same deflation loop k-1 more times.
    """
    emb = load(spark, sf_dir, "embeddings")
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
    covs = ", ".join(
        f"(CAST(p{i}_{j} AS DOUBLE) "
        f"- CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE) / n) / n "
        f"AS c{i}_{j}"
        for i, j in _PAIRS
    )
    means = ", ".join(
        f"CAST(s{i} AS DOUBLE) / n AS m{i}" for i in range(_D)
    )
    rows = ", ".join(
        "array(" + ", ".join(_c(i, j) for j in range(_D)) + ")"
        for i in range(_D)
    )
    cmat = spark.sql(
        f"""
        WITH base AS (SELECT vec_id, {xs} FROM {{emb}}),
        agg AS (SELECT COUNT(*) AS n, {sums}, {prods} FROM base),
        c AS (SELECT n, {", ".join(f"s{i}" for i in range(_D))},
                     {covs} FROM agg)
        SELECT array({rows}) AS m, {means} FROM c
        """,
        emb=emb,
    ).localCheckpoint(eager=False)

    d1 = _D - 1
    v1 = _dominant_eigvec(spark, cmat)
    # Rayleigh quotient + rank-one deflation on the 1-row frames; the
    # fold orders mirror the oracle's scalar chains exactly
    m2 = spark.sql(
        f"""
        SELECT transform(sequence(0, {d1}), i ->
                 transform(sequence(0, {d1}), j ->
                   m[i][j] - lam * ev[i] * ev[j])) AS m
        FROM (SELECT m, ev,
                     aggregate(sequence(0, {d1}), CAST(0.0 AS DOUBLE),
                       (acc, i) -> acc + ev[i] *
                         aggregate(sequence(0, {d1}),
                                   CAST(0.0 AS DOUBLE),
                                   (a2, j) -> a2 + m[i][j] * ev[j]))
                       AS lam
              FROM {{c}}, {{v}})
        """,
        c=cmat,
        v=v1,
    ).localCheckpoint(eager=True)
    v2 = _dominant_eigvec(spark, m2)

    e = spark.sql(
        "SELECT "
        + ", ".join(f"a.ev[{i}] AS v{i}" for i in range(_D))
        + ", "
        + ", ".join(f"b.ev[{i}] AS u{i}" for i in range(_D))
        + " FROM {a} a, {b} b",
        a=v1,
        b=v2,
    )
    p1 = " + ".join(f"(b.x{i} - e.m{i}) * e.v{i}" for i in range(_D))
    p2 = " + ".join(f"(b.x{i} - e.m{i}) * e.u{i}" for i in range(_D))
    m_cols = ", ".join(f"m{i}" for i in range(_D))
    return spark.sql(
        f"""
        WITH base AS (SELECT vec_id, {xs} FROM {{emb}}),
        e AS (SELECT v.*, m.* FROM {{v}} v,
                    (SELECT {m_cols} FROM {{cmat}}) m)
        SELECT b.vec_id, ROUND({p1}, 6) AS pc1, ROUND({p2}, 6) AS pc2
        FROM base b, e
        """,
        emb=emb,
        v=e,
        cmat=cmat,
    )


# --- high-dim Gramian via the Arrow escape hatch ---------------------

_HD_D = 64  # all fixture dims — past the ~100-agg-column SQL comfort zone
_HD_SCALE = "1e10"


@register(
    "embedding_covariance_hd",
    f"""
    WITH base AS (
      SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (SELECT UNNEST(generate_series(1, {_HD_D})) AS d)
    SELECT i.d - 1 AS dim_i, j.d - 1 AS dim_j,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(v[i.d] * v[j.d] * {_HD_SCALE}) AS BIGINT))
                AS BIGINT) AS gram_units
    FROM base, dims i, dims j
    WHERE i.d <= j.d
    GROUP BY 1, 2
    """,
    doc=f"Full-dimension (d={_HD_D}) Gramian upper triangle in exact "
    "integer units via the Arrow mapInPandas partial-X^T X path — the "
    "documented escape hatch for d past the SQL agg-column comfort "
    "zone, here exercised against a hard DuckDB oracle: quantizing "
    "every per-row product to floor(x_i*x_j*scale) BEFORE summation "
    "makes the int64 sums associative, so the result is bit-identical "
    "under any partitioning (extension).",
)
def embedding_covariance_hd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim_i, dim_j, n, gram_units) for i <= j over all 64 dims.

    Scale shape: one ``mapInPandas`` pass computes a per-Arrow-batch
    partial X^T X with vectorized numpy (chunked rank-1 expansion, no
    per-row Python), and only the (1 + d + d^2)-long integer partials
    cross the exchange — batches-sized, never rows-sized. Covariance
    derives from units/scale: cov = g/(n*scale) - outer(s, s)/(n*
    scale)^2; the d x d finish is driver-sized. The integer-unit
    quantization is what buys a HARD oracle: float partial sums are
    batch-order-dependent in the last ulps (the ``gramian`` operator's
    documented caveat), int64 unit sums are exact and associative.
    """
    from ..operators.linalg import gramian_units

    emb = load(spark, sf_dir, "embeddings")
    gdf = gramian_units(emb, "embedding", _HD_D, scale=float(_HD_SCALE))
    # upper-triangle explode of the 1-row (n, s, g) frame: row-local,
    # d*(d+1)/2 output rows
    return spark.sql(
        f"""
        SELECT t.dim_i, t.dim_j, n, t.gram_units
        FROM {{gdf}}
        LATERAL VIEW inline(
          flatten(transform(sequence(0, {_HD_D - 1}), i ->
            transform(sequence(i, {_HD_D - 1}), j ->
              struct(i AS dim_i, j AS dim_j,
                     element_at(g, i * {_HD_D} + j + 1) AS gram_units))))
        ) t AS dim_i, dim_j, gram_units
        """,
        gdf=gdf,
    )
