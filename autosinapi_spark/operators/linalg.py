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
