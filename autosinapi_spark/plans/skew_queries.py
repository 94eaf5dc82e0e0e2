"""Skew-mitigation query — salted join, oracle-checked.

The salt is an internal detail: a salted join must return exactly the
plain join's rows, so the DuckDB oracle IS the plain join. The fixture
side is made deliberately skewed (90% of rows on one hot key) so the
query exercises the shape salting exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.skew import salted_join
from .registry import register, sql_dsum, dsum


@register(
    "skew_salted_join",
    f"""
    SELECT k, p.p_name AS descricao,
           COUNT(*) AS n,
           {sql_dsum('l.l_quantity', 'soma_qtd')}
    FROM (
      SELECT CASE WHEN l_linenumber > 1 THEN 1 ELSE l_partkey END AS k,
             l_quantity
      FROM lineitem
    ) l
    JOIN part p ON l.k = p.p_partkey
    GROUP BY k, p.p_name
    """,
    doc="Skew-salted join (hot key spread over 8 salts, lookup side "
    "replicated); result provably identical to the plain join — the "
    "oracle is the unsalted join.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = li.select(
        F.when(F.col("l_linenumber") > 1, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("k"),
        "l_quantity",
    )
    dim = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("descricao")
    )
    joined = salted_join(big, dim, ["k"], n_salts=8)
    return joined.groupBy("k", "descricao").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_quantity"), "soma_qtd"),
    )
