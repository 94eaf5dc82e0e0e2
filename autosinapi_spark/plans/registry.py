"""Query registry machinery + numeric determinism helpers.

Every engine capability from SURVEY.md §2 is exposed as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB.

Cross-engine float determinism
------------------------------
A plain ``SUM(double)`` is order-dependent, so Spark and DuckDB can
disagree in the last ulps and fail the driver's value-hash compare.
Every summed double is therefore cast per-row to ``DECIMAL(28,10)``,
summed exactly, ROUNDED IN DECIMAL (exact HALF_UP — deterministic
even when the sum lands exactly on a .5 boundary at the target
scale, where rounding the double instead diverges across engines),
and only then cast back to double. Returning the raw
DECIMAL(38,10) failed the driver hash on all 6 queries that used it
(the driver canonicalizes Decimal differently from floats) — the
final double cast of an exact 2-to-6-dp decimal is lossless enough
to hash identically. Ratios divide two such identical doubles, so
both engines round the same quotient (residual risk: a quotient
landing exactly on a .5 boundary — vanishingly rare for real-valued
ratios, impossible to remove without cross-engine decimal division
semantics).
``dsum``/``davg`` implement the Spark side; ``sql_dsum``/``sql_davg``
emit the literal matching SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def dsum(c: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent sum: exact decimal sum, rounded IN DECIMAL
    (HALF_UP, exact — identical in both engines even when the sum
    lands exactly on a .5 boundary at the target scale, where
    rounding the double diverges: DuckDB rounds the true double,
    just under the boundary, down; Spark rounds the decimal repr
    up — hit by ``returned_item_top_customers`` at sf0.01, exact
    sum 307843.5950000000), then cast to double."""
    return (
        F.round(F.sum(c.cast("decimal(28,10)")), scale)
        .cast("double")
        .alias(alias)
    )


def davg(c: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent mean (exact decimal sum / count, rounded)."""
    return F.round(
        F.sum(c.cast("decimal(28,10)")).cast("double") / F.count(F.lit(1)),
        scale,
    ).alias(alias)


# SQL fragments matching dsum/davg for the DuckDB oracle side.
def sql_dsum(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,10))), "
        f"{scale}) AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    # "+ 0" normalizes IEEE signed zero: DuckDB's ROUND keeps the sign
    # when a negative mean rounds to zero (-1e-9 -> -0.0) while Spark's
    # ROUND (BigDecimal) always emits +0.0, and the driver hashes
    # representations (r6 embedding_covariance lesson).
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE) "
        f"/ COUNT(*), {scale}) + 0 AS {alias}"
    )
