"""BOM explosion queries (J9) on a synthesized deterministic hierarchy.

The driver fixtures have no self-referencing edge table, so one is
derived deterministically from ``part``: every ``p_partkey >= 10``
points to parent ``p_partkey div 10`` with coefficient
``1 + p_partkey % 3`` — a forest rooted at codes 0-9 with depth
~log10(max_key). The DuckDB oracle is the real ``WITH RECURSIVE`` the
reference describes (DataModel.md:386-391), which Spark lacks — the
engine side runs the iterative ``explode_bom`` operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.bom import explode_bom, rollup_cost
from .registry import register, sql_dsum

_EDGES_SQL = """
      SELECT p_partkey // 10 AS parent, p_partkey AS child,
             CAST(1 + (p_partkey % 3) AS DOUBLE) AS coef
      FROM part WHERE p_partkey >= 10
"""

_EXPLODE_SQL = f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    expl AS (
      SELECT parent AS root, child, coef AS total_coef, 1 AS depth
      FROM edges WHERE parent < 10
      UNION ALL
      SELECT e.root, g.child, e.total_coef * g.coef, e.depth + 1
      FROM expl e JOIN edges g ON g.parent = e.child
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") >= 10).select(
        F.expr("p_partkey div 10").alias("parent"),
        F.col("p_partkey").alias("child"),
        (F.lit(1) + F.col("p_partkey") % 3).cast("double").alias("coef"),
    )


@register(
    "bom_explode",
    _EXPLODE_SQL + "SELECT root, child, total_coef, depth FROM expl",
    doc="J9 recursive BOM explosion (DataModel.md:386-391) as iterative "
    "frontier joins; oracle = WITH RECURSIVE.",
)
def bom_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    roots = edges.where(F.col("parent") < 10).select("parent").distinct()
    return explode_bom(edges, roots=roots)


@register(
    "bom_cost_rollup",
    _EXPLODE_SQL
    + f"""
    SELECT e.root AS composicao_codigo,
           {sql_dsum('e.total_coef * p.p_retailprice', 'custo_total')},
           COUNT(*) AS n_itens
    FROM expl e JOIN part p ON e.child = p.p_partkey
    GROUP BY e.root
    """,
    doc="Cost rollup over the exploded BOM: Σ coeficiente×preço "
    "(DataModel.md:376-391).",
)
def bom_cost_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    exploded = bom_explode(spark, sf_dir)
    prices = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    return rollup_cost(exploded, prices, "p_partkey", "p_retailprice").select(
        F.col("root").alias("composicao_codigo"), "custo_total", "n_itens"
    )


@register(
    "bom_explode_auto_roots",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    roots AS (
      -- parent domain EXCEPT child domain (spelled as NOT IN: DuckDB
      -- rejects set ops other than UNION inside a RECURSIVE block)
      SELECT DISTINCT parent FROM edges
      WHERE parent NOT IN (SELECT child FROM edges)
    ),
    expl AS (
      SELECT e.parent AS root, e.child, e.coef AS total_coef, 1 AS depth
      FROM edges e JOIN roots r ON e.parent = r.parent
      UNION ALL
      SELECT x.root, g.child, x.total_coef * g.coef, x.depth + 1
      FROM expl x JOIN edges g ON g.parent = x.child
    )
    SELECT root, child, total_coef, depth FROM expl
    """,
    doc="J9 with U4 root discovery: roots = parent domain EXCEPT child "
    "domain (explode_bom's default-roots subtract path; "
    "etl_pipeline.py:296,322).",
)
def bom_explode_auto_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    return explode_bom(_edges(spark, sf_dir), roots=None)


