"""Write-policy queries (K2-K5) — logical MERGE results, oracle-checked.

Each query builds an "existing table" and an "incoming monthly batch"
from the fixtures, applies one write policy from
``operators/sinks.py``, and returns the merged table state — exactly
what the physical writer would persist. Reference:
``/root/reference/autosinapi/core/database.py:151-259`` invoked at
``etl_pipeline.py:279,354-376``.

Fixture framing: ``part`` plays the catalog (codigo/descricao/unidade/
status), ``orders`` plays a monthly fact table. The existing side is
``p_partkey % 2 = 0`` (a previous load), the incoming batch is
``p_partkey % 3 = 0`` with re-derived descriptions and a *column
subset* — which is what makes K3's "update only incoming's columns"
rule observable (unidade/status survive on matched rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sinks import (
    append_ignore_conflicts,
    overwrite,
    replace_by_period,
    upsert,
)
from .registry import register

_EXISTING_SQL = """
    SELECT p_partkey AS codigo, p_name AS descricao,
           p_brand AS unidade, 'ATIVO' AS status
    FROM part WHERE p_partkey % 2 = 0
"""
_INCOMING_SQL = """
    SELECT p_partkey AS codigo, upper(p_name) AS descricao
    FROM part WHERE p_partkey % 3 = 0
"""


def _existing_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("codigo"),
        F.col("p_name").alias("descricao"),
        F.col("p_brand").alias("unidade"),
        F.lit("ATIVO").alias("status"),
    )


def _incoming_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").alias("codigo"),
        F.upper(F.col("p_name")).alias("descricao"),
    )


@register(
    "sink_append_nodup",
    f"""
    SELECT * FROM ({_EXISTING_SQL})
    UNION ALL
    SELECT codigo, descricao, CAST(NULL AS VARCHAR) AS unidade,
           'ATIVO' AS status
    FROM ({_INCOMING_SQL})
    WHERE codigo NOT IN (SELECT codigo FROM ({_EXISTING_SQL}))
    """,
    doc="K2 append-ignore-conflicts: PK anti-join + union, DDL default "
    "fill (database.py:175-204; J5).",
)
def sink_append_nodup(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = _existing_catalog(spark, sf_dir)
    incoming = _incoming_catalog(spark, sf_dir)
    return append_ignore_conflicts(
        existing, incoming, ["codigo"], defaults={"status": F.lit("ATIVO")}
    )


@register(
    "sink_upsert_catalog",
    f"""
    SELECT e.codigo,
           CASE WHEN i.codigo IS NOT NULL THEN i.descricao
                ELSE e.descricao END AS descricao,
           e.unidade, e.status
    FROM ({_EXISTING_SQL}) e
    LEFT JOIN ({_INCOMING_SQL}) i ON e.codigo = i.codigo
    UNION ALL
    SELECT codigo, descricao, CAST(NULL AS VARCHAR) AS unidade,
           'ATIVO' AS status
    FROM ({_INCOMING_SQL})
    WHERE codigo NOT IN (SELECT codigo FROM ({_EXISTING_SQL}))
    """,
    doc="K3 upsert: full-outer merge on PK updating only incoming's "
    "columns — unidade/status preserved on match (database.py:220-246, "
    "DataModel.md:197; J6).",
)
def sink_upsert_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = _existing_catalog(spark, sf_dir)
    incoming = _incoming_catalog(spark, sf_dir)
    return upsert(
        existing, incoming, ["codigo"], defaults={"status": F.lit("ATIVO")}
    )


@register(
    "sink_replace_period",
    """
    SELECT o_orderkey AS codigo, strftime(o_orderdate, '%Y-%m') AS periodo,
           o_totalprice AS valor
    FROM orders WHERE strftime(o_orderdate, '%Y-%m') <> '1995-03'
    UNION ALL
    SELECT o_orderkey AS codigo, strftime(o_orderdate, '%Y-%m') AS periodo,
           o_totalprice * 2 AS valor
    FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
    """,
    doc="K4 replace-by-period: drop one month, append its recomputed "
    "batch (database.py:206-218); physically dynamic partition "
    "overwrite.",
)
def sink_replace_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("codigo"),
        F.col("o_orderdate").alias("data_referencia"),
        F.col("o_totalprice").alias("valor"),
    )
    period = "1995-03"
    incoming = base.where(
        F.date_format("data_referencia", "yyyy-MM") == period
    ).withColumn("valor", F.col("valor") * 2)
    merged = replace_by_period(base, incoming, "data_referencia", period)
    return merged.select(
        "codigo",
        F.date_format("data_referencia", "yyyy-MM").alias("periodo"),
        "valor",
    )


@register(
    "sink_truncate_reload",
    """
    SELECT l_orderkey AS pai_codigo, l_partkey AS item_codigo,
           l_quantity AS coeficiente
    FROM lineitem WHERE l_linenumber = 1
    """,
    doc="K5 truncate+reload: the structure tables are fully rebuilt "
    "each month — overwrite with the new edge set "
    "(database.py:248-259, etl_pipeline.py:359-367).",
)
def sink_truncate_reload(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    edges = li.where(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("pai_codigo"),
        F.col("l_partkey").alias("item_codigo"),
        F.col("l_quantity").alias("coeficiente"),
    )
    stale = edges.limit(0)  # last month's structure, being discarded
    return overwrite(stale, edges)


# --- SCD Type 2 dimension history (K3's warehouse extension) ----------

_SCD2_EFF = "2024-06-01"
# incoming re-derivation: %3 keys arrive; of those, %5 keys carry the
# UNCHANGED description (exercises the matched-but-identical no-op
# path); the rest change to upper(p_name). %4 keys additionally start
# with one pre-closed historical version (exercises history
# passthrough). Unmatched incoming keys (odd %3) exercise inserts.


@register(
    "sink_scd2_history",
    f"""
    WITH cur AS (
      SELECT p_partkey AS codigo, p_name AS descricao,
             p_brand AS unidade, DATE '2023-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
      FROM part WHERE p_partkey % 2 = 0
    ),
    hist AS (
      SELECT p_partkey AS codigo, 'v0 ' || p_name AS descricao,
             p_brand AS unidade, DATE '2022-01-01' AS valid_from,
             DATE '2023-01-01' AS valid_to, FALSE AS is_current
      FROM part WHERE p_partkey % 4 = 0
    ),
    dim AS (SELECT * FROM cur UNION ALL SELECT * FROM hist),
    inc AS (
      SELECT p_partkey AS codigo,
             CASE WHEN p_partkey % 5 = 0 THEN p_name
                  ELSE upper(p_name) END AS descricao,
             p_brand AS unidade
      FROM part WHERE p_partkey % 3 = 0
    ),
    changed AS (
      SELECT c.codigo FROM cur c JOIN inc i ON i.codigo = c.codigo
      WHERE c.descricao IS DISTINCT FROM i.descricao
         OR c.unidade IS DISTINCT FROM i.unidade
    )
    SELECT codigo, descricao, unidade, valid_from, valid_to, is_current
    FROM (
      SELECT * FROM hist
      UNION ALL
      SELECT * FROM cur WHERE codigo NOT IN (SELECT codigo FROM changed)
      UNION ALL
      SELECT c.codigo, c.descricao, c.unidade, c.valid_from,
             DATE '{_SCD2_EFF}', FALSE
      FROM cur c WHERE c.codigo IN (SELECT codigo FROM changed)
      UNION ALL
      SELECT i.codigo, i.descricao, i.unidade, DATE '{_SCD2_EFF}',
             CAST(NULL AS DATE), TRUE
      FROM inc i WHERE i.codigo IN (SELECT codigo FROM changed)
      UNION ALL
      SELECT i.codigo, i.descricao, i.unidade, DATE '{_SCD2_EFF}',
             CAST(NULL AS DATE), TRUE
      FROM inc i WHERE i.codigo NOT IN (SELECT codigo FROM cur)
    )
    """,
    doc="SCD Type 2 merge: changed current rows are closed at the "
    "effective date and re-inserted as new versions, identical "
    "matches no-op, history rows pass through, unmatched keys "
    "insert — the full-history extension of the reference's Type 1 "
    "upsert (database.py:220-246) (extension).",
)
def sink_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kimball Type 2 state after one monthly batch.

    Scale shape (see ``operators/sinks.scd2_merge``): the change set
    is ONE PK-keyed join of the current slice against the deduped
    batch with null-safe attribute compares; closed/new/insert arms
    are semi/anti joins on the same key — at deployment one
    Delta/Iceberg MERGE. History rows bypass the join entirely.
    """
    from ..operators.sinks import scd2_merge

    part = load(spark, sf_dir, "part")
    cur = part.where(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("codigo"),
        F.col("p_name").alias("descricao"),
        F.col("p_brand").alias("unidade"),
        F.lit("2023-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    hist = part.where(F.col("p_partkey") % 4 == 0).select(
        F.col("p_partkey").alias("codigo"),
        F.concat(F.lit("v0 "), F.col("p_name")).alias("descricao"),
        F.col("p_brand").alias("unidade"),
        F.lit("2022-01-01").cast("date").alias("valid_from"),
        F.lit("2023-01-01").cast("date").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    dim = cur.unionByName(hist)
    inc = part.where(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").alias("codigo"),
        F.when(F.col("p_partkey") % 5 == 0, F.col("p_name"))
        .otherwise(F.upper(F.col("p_name")))
        .alias("descricao"),
        F.col("p_brand").alias("unidade"),
    )
    return scd2_merge(
        dim,
        inc,
        pk=["codigo"],
        attrs=["descricao", "unidade"],
        effective=_SCD2_EFF,
    )


@register(
    "snapshot_diff_cdc",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderdate < DATE '1997-01-01'
    ),
    snap_new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             o_orderpriority
      FROM base WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders
      WHERE o_orderdate >= DATE '1997-01-01' AND o_orderkey % 5 = 0
    ),
    diff AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                    THEN 'update'
             END AS change_type,
             o.o_orderstatus AS old_o_orderstatus,
             n.o_orderstatus AS new_o_orderstatus,
             o.o_orderpriority AS old_o_orderpriority,
             n.o_orderpriority AS new_o_orderpriority
      FROM base o FULL JOIN snap_new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey, change_type,
           old_o_orderstatus, new_o_orderstatus,
           old_o_orderpriority, new_o_orderpriority
    FROM diff WHERE change_type IS NOT NULL
    """,
    doc="CDC snapshot diff: classify every order key across two "
    "simulated snapshots as insert/delete/update via one full-outer "
    "PK join with null-safe attribute compares; unchanged rows are "
    "dropped (the incremental-resync inverse of the reference's "
    "write policies, database.py:151-259) (extension).",
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change set between two deterministic snapshots of
    ``orders``: the old snapshot is every pre-1997 order; the new one
    drops ``%13`` keys (deletes), flips status to ``'X'`` on ``%7``
    keys (updates), and adds the ``%5`` post-1997 orders (inserts).

    Scale shape (see ``operators/sinks.snapshot_diff``): one
    full-outer shuffle join on the order key, change-volume-sized
    output, scans pruned to pk+attrs. Bucketed snapshots make the
    join shuffle-free.
    """
    from ..operators.sinks import snapshot_diff

    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")
    base = orders.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    snap_new = (
        base.where(F.col("o_orderkey") % 13 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_orderpriority",
        )
        .unionByName(
            orders.where(
                (F.col("o_orderdate") >= cutoff)
                & (F.col("o_orderkey") % 5 == 0)
            ).select("o_orderkey", "o_orderstatus", "o_orderpriority")
        )
    )
    return snapshot_diff(
        base,
        snap_new,
        pk=["o_orderkey"],
        attrs=["o_orderstatus", "o_orderpriority"],
    )
