"""Skew mitigation — salted joins for hot keys.

AQE's skew-join splitting (enabled in ``session.py``) handles most
sort-merge skew at runtime, but it cannot help a broadcast-infeasible
join whose ONE key holds half the table. Salting is the explicit fix:
spread each hot key over ``n_salts`` synthetic sub-keys on the big
side, replicate the small side across every salt, join on
(key, salt). Shuffle partitions then bound at roughly
``max_key_share / n_salts``.

Cost model: the small side is replicated n_salts times — use only
when (small_rows * n_salts) stays comfortably shuffle-able and the
key histogram is actually skewed; for even keys the plain join wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Join big ⋈ small on ``on`` with the big side salted n_salts ways.

    ``rand(seed)`` spreads the big side's rows uniformly across salts
    (row-to-salt assignment is arbitrary by design — every salt joins
    the same replicated small-side rows, so the result set is exactly
    the plain join's). Supports inner/left joins (the replicated side
    must be the lookup side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    overlap = (set(big.columns) & set(small.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns: {sorted(overlap)}")

    salted_big = big.withColumn(
        SALT, (F.rand(seed) * n_salts).cast("int")
    )
    replicated_small = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated_small, [*on, SALT], how)
    return out.drop(SALT)
