"""Query registry machinery + numeric determinism helpers.

Every engine capability from SURVEY.md §2 is exposed as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB.

Cross-engine float determinism
------------------------------
A plain ``SUM(double)`` is order-dependent, so Spark and DuckDB can
disagree in the last ulps and fail the driver's value-hash compare.
Every summed double is therefore cast per-row to ``DECIMAL(28,10)``,
summed exactly, and RETURNED AS DECIMAL(38,10): DuckDB's
decimal->double cast is not correctly rounded (int128 -> double, then
a division by 10^scale), so casting back to double would reintroduce
ulp mismatches — keeping the exact decimal avoids the cast entirely.
Means divide the exact sum as double and round to 6 decimals, which
absorbs both the cast discrepancy (~1e-12 relative) and per-element
decimal tie-rounding differences (Spark HALF_UP vs DuckDB HALF_EVEN).
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


def dsum(c: Column, alias: str) -> Column:
    """Order-independent sum: per-row decimal cast, exact decimal result."""
    return F.sum(c.cast("decimal(28,10)")).alias(alias)


def davg(c: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent mean (exact decimal sum / count, rounded)."""
    return F.round(
        F.sum(c.cast("decimal(28,10)")).cast("double") / F.count(F.lit(1)),
        scale,
    ).alias(alias)


# SQL fragments matching dsum/davg for the DuckDB oracle side.
def sql_dsum(expr: str, alias: str) -> str:
    return f"SUM(CAST({expr} AS DECIMAL(28,10))) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE) "
        f"/ COUNT(*), {scale}) AS {alias}"
    )
