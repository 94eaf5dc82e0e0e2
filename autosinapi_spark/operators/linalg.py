"""Distributed Gramian via Arrow-batched partial matrix products.

``plans/linalg_queries.embedding_covariance`` computes the d=16
covariance as d(d+1)/2 SQL decimal sums — the right form while the
agg-column count stays codegen-friendly. Past d ≈ 100 that form costs
O(d^2) Catalyst expressions; THIS operator is the documented scale
path: each Arrow batch computes its partial X^T X / column sum / count
with one numpy matmul (vectorized, no per-row Python), and the tiny
(1 + d + d^2)-float partials reduce by element-wise array sum. One
pass, constant-size shuffle, d bounded only by executor memory for a
d x d float block.

Float caveat (why the SQL form stays the ORACLE path): numpy partial
sums are batch-order-dependent in the last ulps, so this operator's
results are reproducible but not bit-pinned against DuckDB; the unit
test asserts agreement with the exact-decimal SQL query to 1e-6 —
the documented contract for the high-d path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),  # column sums (d)
        StructField("g", ArrayType(DoubleType())),  # X^T X flattened (d*d)
    ]
)


def gramian(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """1-row DataFrame (n, s[d], g[d*d]) = (count, Σx, Σ x x^T).

    Mean/covariance/correlation derive driver-side from the d x d
    result: mean = s/n, cov = g/n - outer(mean, mean).
    """

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64)[:dim] for v in pdf[vec_col]]
            )
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    partials = df.select(vec_col).mapInPandas(_partials, _PARTIAL_SCHEMA)
    # element-wise merge of the per-batch partials: zip_with sums keep
    # the reduce JVM-side; the frame being reduced is batches-sized,
    # never rows-sized
    zsum = lambda c: F.aggregate(  # noqa: E731
        F.collect_list(c),
        F.array_repeat(F.lit(0.0), dim if c == "s" else dim * dim),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    return partials.agg(
        F.sum("n").alias("n"),
        zsum("s").alias("s"),
        zsum("g").alias("g"),
    )


def covariance_from_gramian(row, dim: int):
    """Driver-side finish: (mean, cov) numpy arrays from a gramian row."""
    import numpy as np

    n = row["n"]
    s = np.array(row["s"])
    g = np.array(row["g"]).reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return mean, cov


_UNITS_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(LongType())),  # floor(x*scale) sums
        StructField("g", ArrayType(LongType())),  # floor(x_i*x_j*scale)
    ]
)


def gramian_units(
    df: DataFrame, vec_col: str, dim: int, scale: float = 1e10
) -> DataFrame:
    """1-row frame (n, s[d], g[d*d]) of EXACT integer-unit moments.

    Same single-pass shape as :func:`gramian`, but every per-row
    product is quantized to integer units (``floor(x_i * x_j *
    scale)``) BEFORE summation, so the int64 sums are associative and
    the result is bit-identical under any partitioning or batch order
    — float-sum order-dependence, the reason :func:`gramian` can only
    be tolerance-checked, is gone, and a hard cross-engine oracle
    (DuckDB computes the identical floor in SQL) becomes possible at
    any d. Pick ``scale`` so ``max|x_i*x_j| * scale * n_rows`` stays
    inside int64 (1e10 covers ~1e6 rows of unit-norm-ish embeddings;
    a 100 TB corpus drops to 1e8 units or merges per-shard partials
    hierarchically).
    """

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64)[:dim] for v in pdf[vec_col]]
            )
            g = np.zeros((dim, dim), dtype=np.int64)
            # chunk the rank-1 expansion: einsum over the whole Arrow
            # batch is n*d*d floats (10k rows x 64x64 = 327 MB); 256
            # rows at a time caps it at ~8 MB
            for lo in range(0, len(x), 256):
                xx = x[lo : lo + 256]
                g += (
                    np.floor(np.einsum("ni,nj->nij", xx, xx) * scale)
                    .astype(np.int64)
                    .sum(axis=0)
                )
            s = np.floor(x * scale).astype(np.int64).sum(axis=0)
            yield pd.DataFrame(
                {"n": [len(x)], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    partials = df.select(vec_col).mapInPandas(_partials, _UNITS_SCHEMA)
    zero = lambda k: F.array_repeat(F.lit(0).cast("long"), k)  # noqa: E731
    zsum = lambda c, k: F.aggregate(  # noqa: E731
        F.collect_list(c), zero(k), lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b)
    )
    return partials.agg(
        F.sum("n").alias("n"),
        zsum("s", dim).alias("s"),
        zsum("g", dim * dim).alias("g"),
    )
