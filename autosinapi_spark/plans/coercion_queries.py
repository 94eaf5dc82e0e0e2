"""Coercion / validation / history queries — the SURVEY §2 cells that
had code but no registered (oracle-checked) query in round 1.

Covers: C1 accent strip, C2 upper+trim, C3 regex squash, C4 code
extraction, C5 decimal-comma, C6 numeric coercion, C7 MM/yyyy parse
(``/root/reference/autosinapi/core/processor.py:73-132,188-243,384``),
J7 FK orphan validation (database.py:106-123), §2.6 global-sort item
history (docs/DataModel.md:395-401), A5 key-domain union
(etl_pipeline.py:320), F2 negated-membership filter
(processor.py:279-286).

pt-BR strings are synthesized deterministically from fixture columns
(printf on integer keys) so both engines parse the exact same text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.coercion import (
    decimal_comma_to_double,
    extract_code,
    first_of_month,
    normalize_code,
    upper_trim,
)
from ..functions.text import normalize_label
from ..operators.repair import orphan_check
from .registry import davg, register, sql_davg


@register(
    "coercion_ptbr_roundtrip",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           TRY_CAST(replace(printf('%d,%02d', l_partkey, l_linenumber),
                            ',', '.') AS DOUBLE) AS valor,
           TRY_CAST(replace(replace(printf('%d.%03d,%02d',
                                           l_orderkey % 100 + 1,
                                           l_partkey % 1000,
                                           l_linenumber),
                            '.', ''), ',', '.') AS DOUBLE) AS valor_milhar,
           upper(trim('  ' || lower(l_returnflag) || ' ')) AS flag,
           strftime(strptime(printf('%02d/%d', month(l_shipdate),
                                    year(l_shipdate)), '%m/%Y'),
                    '%Y-%m-%d') AS mes_ref,
           TRY_CAST(TRY_CAST(trim(printf(' %d ', l_partkey)) AS DOUBLE)
                    AS BIGINT) AS codigo
    FROM lineitem
    """,
    doc="C2/C5/C6/C7 pt-BR ingestion coercions round-tripped on "
    "synthesized strings (processor.py:188-243).",
)
def coercion_ptbr_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    txt_plain = F.format_string(
        "%d,%02d", F.col("l_partkey"), F.col("l_linenumber")
    )
    txt_milhar = F.format_string(
        "%d.%03d,%02d",
        F.col("l_orderkey") % 100 + 1,
        F.col("l_partkey") % 1000,
        F.col("l_linenumber"),
    )
    flag_txt = F.concat(F.lit("  "), F.lower("l_returnflag"), F.lit(" "))
    mes_txt = F.format_string(
        "%02d/%d", F.month("l_shipdate"), F.year("l_shipdate")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        decimal_comma_to_double(txt_plain).alias("valor"),
        decimal_comma_to_double(txt_milhar).alias("valor_milhar"),
        upper_trim(flag_txt).alias("flag"),
        F.date_format(first_of_month(mes_txt), "yyyy-MM-dd").alias("mes_ref"),
        normalize_code(F.format_string(" %d ", F.col("l_partkey"))).alias(
            "codigo"
        ),
    )


@register(
    "normalize_text_codes",
    r"""
    SELECT p_partkey,
           regexp_replace(regexp_replace(
               upper(strip_accents(printf('Composição (%s,%d)',
                                          p_name, p_partkey))),
               '\s+', '_', 'g'), '[^A-Z0-9_]', '', 'g')
             AS nome_normalizado,
           TRY_CAST(regexp_extract(printf('Composição (%s,%d)',
                                          p_name, p_partkey),
                                   ',(\d+)\)$', 1) AS BIGINT)
             AS codigo_extraido
    FROM part
    """,
    doc="C1 accent strip + C3 regex squash + C4 code extraction "
    "(processor.py:73-132,384; config.py:77).",
)
def normalize_text_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    raw = F.format_string(
        "Composição (%s,%d)", F.col("p_name"), F.col("p_partkey")
    )
    return part.select(
        "p_partkey",
        normalize_label(raw).alias("nome_normalizado"),
        extract_code(raw).alias("codigo_extraido"),
    )


@register(
    "orphan_check_facts",
    """
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM lineitem
    WHERE l_partkey NOT IN
          (SELECT p_partkey FROM part WHERE p_partkey % 7 <> 0)
    """,
    doc="J7 FK validation: fact rows whose key is absent from the "
    "(restricted) catalog — must be loaded as placeholders or "
    "rejected (database.py:106-123).",
)
def orphan_check_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cat = load(spark, sf_dir, "part").where(F.col("p_partkey") % 7 != 0)
    return orphan_check(li, "l_partkey", cat, "p_partkey").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )


@register(
    "item_price_history",
    f"""
    SELECT l_partkey AS item_codigo,
           strftime(l_shipdate, '%Y-%m') AS periodo,
           {sql_davg('l_extendedprice', 'preco_medio')},
           COUNT(*) AS n
    FROM lineitem
    WHERE l_partkey <= 200
    GROUP BY 1, 2
    """,
    doc="q3 item history: monthly price series per item, ORDER BY "
    "data_referencia DESC (DataModel.md:395-401; SURVEY §2.6 global "
    "sort).",
)
def item_price_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_partkey") <= 200)
        .groupBy(
            F.col("l_partkey").alias("item_codigo"),
            F.date_format("l_shipdate", "yyyy-MM").alias("periodo"),
        )
        .agg(
            davg(F.col("l_extendedprice"), "preco_medio"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.desc("periodo"), F.asc("item_codigo"))
    )


@register(
    "key_domain_union",
    """
    SELECT l_partkey AS codigo FROM lineitem
    UNION
    SELECT l_suppkey AS codigo FROM lineitem
    """,
    doc="A5 set union of key domains: set(parent) | set(child) "
    "(etl_pipeline.py:320).",
)
def key_domain_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance=False: pure project+distinct — the scan-rebalance
    # exchange is pure overhead here (r14 verdict ask #3)
    li = load(spark, sf_dir, "lineitem", rebalance=False)
    return (
        li.select(F.col("l_partkey").alias("codigo"))
        .union(li.select(F.col("l_suppkey").alias("codigo")))
        .distinct()
    )


@register(
    "filter_parent_rows",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE value IS NOT NULL
      AND upper(event_type) NOT IN ('CLICK', 'VIEW')
    """,
    doc="F2 parent-row filter: not-null key + negated membership "
    "(processor.py:279-286).",
)
def filter_parent_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.where(
        F.col("value").isNotNull()
        & ~F.upper(F.col("event_type")).isin("CLICK", "VIEW")
    ).select("event_id", "user_id", "event_type", "value")
