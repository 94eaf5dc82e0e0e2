"""SQL-text query surface (S9/K7) — spark.sql over registered views.

The reference's consumer-side surface is raw SQL through
``Database.execute_query`` (``database.py:261-268``); the engine's
equivalent is ``spark.sql`` over the fixture views registered by
``catalog.register_views``. One registered query exercises that whole
path (view registration -> SQL text -> Catalyst) with the reference's
q3 item-history shape, so the SQL entry point has a CORRECTNESS row
of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from .registry import register


@register(
    "sql_text_item_history",
    """
    SELECT l_partkey AS item_codigo,
           strftime(l_shipdate, '%Y-%m') AS periodo,
           COUNT(*) AS n_registros
    FROM lineitem
    WHERE l_partkey <= 100
    GROUP BY 1, 2
    """,
    doc="S9/K7 SQL-text source: spark.sql over registered temp views "
    "(database.py:261-268; the q3 history shape as raw SQL).",
)
def sql_text_item_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_partkey AS item_codigo,
               date_format(l_shipdate, 'yyyy-MM') AS periodo,
               COUNT(*) AS n_registros
        FROM lineitem
        WHERE l_partkey <= 100
        GROUP BY 1, 2
        ORDER BY periodo DESC, item_codigo
        """
    )
