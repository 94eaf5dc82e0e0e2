"""Vector column expressions for embedding similarity.

Built-in higher-order functions (zip_with / aggregate / transform) keep
the dot products JVM-side — no Python round-trip. Elements are cast to
double before arithmetic so results match the DuckDB oracle's DOUBLE[]
math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i with a left-to-right double accumulator."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(v: Column, n_bits: int = 8) -> Column:
    """LSH bucket id from the sign pattern of the first ``n_bits`` dims.

    Deterministic random-hyperplane surrogate (axis-aligned planes):
    bucket = Σ 2^i * [v_i >= 0]. Collapses the candidate set per query
    from N to ~N/2^n_bits at the cost of recall — the scale path for ANN.
    """
    bucket = F.lit(0)
    for i in range(n_bits):
        bit = F.when(F.element_at(v, i + 1) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return bucket
