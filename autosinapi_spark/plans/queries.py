"""Core query surface — SURVEY.md §2 operators on the driver fixtures.

Each query cites the reference operator(s) it exercises
(``/root/reference/...`` file:line via SURVEY §2 IDs) and carries a
DuckDB oracle. Column names/types are aligned between Spark and oracle
(driver hashes values under name-sorted columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load
from ..operators.dedup import dedup_keep_first, exact_text_dedup
from ..operators.repair import missing_keys, placeholder_rows
from ..operators.reshape import tagged_union, unpivot_values
from ..operators.windows import latest_per_group, status_from_latest
from .registry import davg, dsum, register, sql_davg, sql_dsum

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape = SINAPI cost-rollup shape,
# SURVEY §7.2). Exercises filter pushdown + hash aggregate (A-agg family).
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price', 2)},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 2)},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 2)},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship aggregation; shape of SINAPI Σ coeficiente×preço "
    "(DataModel.md:376-391) on lineitem.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            # money sums at scale 2 (magnitude rule): these are the
            # audit's perennial WATCH rows — at scale 6 the decimal
            # significand sits ~31x under the 2^53 DOUBLE-cast budget
            # at the gate SF and would breach near sf0.3; scale 2
            # buys 10^4 headroom, and sum_base_price (2-dp inputs) is
            # value-identical either way.
            dsum(F.col("l_extendedprice"), "sum_base_price", 2),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
                2,
            ),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
                2,
            ),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Reference q1: cost lookup with catalog join (J8; DataModel.md:376-382).
# Broadcast the small catalog side (part) against the fact (lineitem).
# ---------------------------------------------------------------------------


@register(
    "cost_lookup",
    f"""
    SELECT l.l_partkey AS codigo, p.p_name AS descricao, p.p_brand AS marca,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'custo_total')},
           {sql_davg('l.l_extendedprice', 'preco_medio')},
           COUNT(*) AS n_itens
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY l.l_partkey, p.p_name, p.p_brand
    """,
    doc="J8 cost lookup: fact ⋈ broadcast(catalog) + rollup "
    "(DataModel.md:376-382).",
)
def cost_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    return (
        li.join(broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("l_partkey").alias("codigo"),
            F.col("p_name").alias("descricao"),
            F.col("p_brand").alias("marca"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "custo_total",
            ),
            davg(F.col("l_extendedprice"), "preco_medio"),
            F.count(F.lit(1)).alias("n_itens"),
        )
    )


# ---------------------------------------------------------------------------
# W1/A3: latest event per user (etl_pipeline.py:402-408 SQL window).
# ---------------------------------------------------------------------------

_LATEST_EVENT_ORACLE = """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
"""


@register(
    "latest_event_per_user",
    _LATEST_EVENT_ORACLE,
    doc="W1/A3 latest-per-group via row_number "
    "(etl_pipeline.py:402-408).",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    latest = latest_per_group(ev, ["user_id"], "ts", tiebreak_cols=["event_id"])
    return latest.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "value",
    )


# ---------------------------------------------------------------------------
# J4+W1: status sync — latest event decides lifecycle status
# (etl_pipeline.py:399-423; deactivation ILIKE, config.py:31).
# ---------------------------------------------------------------------------


@register(
    "user_status_sync",
    """
    SELECT user_id,
           CASE WHEN upper(event_type) LIKE '%ERROR%'
                THEN 'DESATIVADO' ELSE 'ATIVO' END AS status
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="J4 status sync: latest maintenance event decides ATIVO/DESATIVADO "
    "(etl_pipeline.py:399-423).",
)
def user_status_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return status_from_latest(
        ev,
        ["user_id"],
        "ts",
        deactivation_predicate=F.upper(F.col("event_type")).like("%ERROR%"),
        tiebreak_cols=["event_id"],
    )


# ---------------------------------------------------------------------------
# J1-J3: placeholder integrity repair (etl_pipeline.py:287-338).
# Catalog is artificially restricted (p_partkey % 7 != 0) so the
# anti-join finds real "missing" codes; placeholders use the
# reference's template (config.py:38).
# ---------------------------------------------------------------------------


@register(
    "missing_parts_placeholder",
    """
    SELECT m.codigo,
           'INSUMO_DESCONHECIDO_' || CAST(m.codigo AS VARCHAR) AS descricao,
           'UN' AS unidade
    FROM (SELECT DISTINCT l_partkey AS codigo FROM lineitem
          WHERE l_partkey IS NOT NULL) m
    LEFT JOIN (SELECT p_partkey FROM part WHERE p_partkey % 7 <> 0) c
      ON m.codigo = c.p_partkey
    WHERE c.p_partkey IS NULL
    """,
    doc="J1-J3 placeholder repair: anti-join missing codes + template "
    "description (etl_pipeline.py:287-338, config.py:38).",
)
def missing_parts_placeholder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    catalog = load(spark, sf_dir, "part").where(F.col("p_partkey") % 7 != 0)
    missing = missing_keys(li, "l_partkey", catalog, "p_partkey")
    missing = missing.select(F.col("p_partkey").alias("codigo"))
    return placeholder_rows(
        missing,
        "codigo",
        detail=None,
        desc_col="__desc",
        desc_template="INSUMO_DESCONHECIDO_%d",
        default_unit="UN",
    )


# ---------------------------------------------------------------------------
# C12/K4 shape: monthly period bucketing (database.py:208 TO_CHAR).
# ---------------------------------------------------------------------------


@register(
    "monthly_order_revenue",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS periodo,
           {sql_dsum('o_totalprice', 'receita')},
           COUNT(*) AS n_pedidos
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
    doc="C12 period key TO_CHAR(date,'YYYY-MM') (database.py:208) + "
    "monthly fact rollup.",
)
def monthly_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("periodo")
    ).agg(
        dsum(F.col("o_totalprice"), "receita"),
        F.count(F.lit(1)).alias("n_pedidos"),
    )


# ---------------------------------------------------------------------------
# U3: tagged union view (vw_composicao_itens_unificados,
# database.py:129-132) — two edge projections with literal type tags.
# ---------------------------------------------------------------------------


@register(
    "union_view_itens",
    """
    SELECT l_orderkey AS pai_codigo, l_partkey AS item_codigo,
           l_quantity AS coeficiente, 'INSUMO' AS tipo_item
    FROM lineitem
    UNION ALL
    SELECT l_orderkey AS pai_codigo, l_suppkey AS item_codigo,
           l_quantity AS coeficiente, 'COMPOSICAO' AS tipo_item
    FROM lineitem
    """,
    doc="U3 tagged UNION ALL view (database.py:129-132).",
)
def union_view_itens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance=False: streaming projection+union, no shuffle of its
    # own — the scan-rebalance exchange is pure overhead (r14 ask #3)
    li = load(spark, sf_dir, "lineitem", rebalance=False)
    a = li.select(
        F.col("l_orderkey").alias("pai_codigo"),
        F.col("l_partkey").alias("item_codigo"),
        F.col("l_quantity").alias("coeficiente"),
    )
    b = li.select(
        F.col("l_orderkey").alias("pai_codigo"),
        F.col("l_suppkey").alias("item_codigo"),
        F.col("l_quantity").alias("coeficiente"),
    )
    return tagged_union([(a, "INSUMO"), (b, "COMPOSICAO")], tag_col="tipo_item")


# ---------------------------------------------------------------------------
# A1: deterministic keyed dedup (processor.py:256-258 drop_duplicates
# keep-first, made order-stable per SURVEY §7.3).
# ---------------------------------------------------------------------------


@register(
    "dedup_first_item_per_order",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    doc="A1 keyed dedup, deterministic survivor (processor.py:256-258).",
)
def dedup_first_item_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures; the
    # extra tiebreak columns make the survivor total-ordered.
    return dedup_keep_first(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_suppkey"]
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")


# ---------------------------------------------------------------------------
# R1: unpivot/melt — the signature SINAPI transform (processor.py:134-158).
# Pivot lineitem to a wide per-returnflag frame (columns = linestatus,
# like the 27 UF columns), then unpivot back; oracle is the equivalent
# GROUP BY.
# ---------------------------------------------------------------------------


@register(
    "unpivot_qty_by_status",
    f"""
    SELECT l_returnflag, l_linestatus AS uf,
           {sql_dsum('l_quantity', 'valor')}
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="R1 unpivot wide->long with null drop (processor.py:134-158); "
    "wide frame synthesized by pivot.",
)
def unpivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    statuses = ["F", "O"]  # fixture domain of l_linestatus
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", statuses)
        .agg(dsum(F.col("l_quantity"), "v"))
    )
    return unpivot_values(
        wide,
        id_cols=["l_returnflag"],
        value_cols=statuses,
        var_name="uf",
        value_name="valor",
        drop_null=True,
    )


# ---------------------------------------------------------------------------
# Exact text dedup (LLM-pipeline extension; hash-groupBy on digest).
# ---------------------------------------------------------------------------


@register(
    "exact_dedup_documents",
    """
    SELECT MIN(doc_id) AS survivor_id, COUNT(*) AS dup_count
    FROM documents
    GROUP BY trim(regexp_replace(text, '\\s+', ' ', 'g'))
    """,
    doc="Exact dedup: digest-groupBy, min-id survivor (extension; "
    "A1 family).",
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return exact_text_dedup(docs, "text", "doc_id", normalize=True)


# ---------------------------------------------------------------------------
# JSON extraction from events.props (engine extension noted in SURVEY
# §2.9: from_json/get_json_object).
# ---------------------------------------------------------------------------


@register(
    "events_json_extract",
    """
    SELECT event_id, user_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    doc="JSON prop extraction (get_json_object) from events.props.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
    )


# ---------------------------------------------------------------------------
# Tumbling time-window aggregation (extension per SURVEY §2.10: batch
# equivalent of the streaming windowed agg).
# ---------------------------------------------------------------------------


@register(
    "hourly_event_stats",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hora,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'soma_valor')}
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h window aggregation over events (batch shape of the "
    "streaming windowed agg).",
)
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
            "hora"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value"), "soma_valor"),
    )


# ---------------------------------------------------------------------------
# OLAP rollup (extension): hierarchical subtotals in one pass — the
# reporting shape over the monthly fact tables (grand total / per
# period / per period+status) that a cost dashboard would issue.
# ---------------------------------------------------------------------------


@register(
    "rollup_revenue",
    f"""
    SELECT strftime(o_orderdate, '%Y') AS ano,
           o_orderstatus AS situacao,
           {sql_dsum('o_totalprice', 'receita', scale=2)},
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (strftime(o_orderdate, '%Y'), o_orderstatus)
    """,
    doc="OLAP ROLLUP: grand total + per-year + per-year-and-status "
    "subtotals in a single aggregation pass (extension; partial "
    "aggregation applies per grouping set).",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.rollup(
        F.date_format("o_orderdate", "yyyy").alias("ano"),
        F.col("o_orderstatus").alias("situacao"),
    ).agg(
        # scale=2: the grand total reaches ~4e9, where double spacing
        # (~5e-7) collides with a 6-decimal rounding boundary — wide
        # totals need a coarser, magnitude-safe round
        dsum(F.col("o_totalprice"), "receita", scale=2),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Sliding event windows + trailing moving averages — the two analytic
# window shapes SURVEY §7 promised beyond tumbling (hourly_event_stats):
# overlapping time windows (each event lands in window_size/slide
# buckets) and per-key ROWS-frame trailing aggregates.
# ---------------------------------------------------------------------------


@register(
    "sliding_event_stats",
    f"""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                    - (k.k * INTERVAL '15 minutes'), '%Y-%m-%d %H:%M')
             AS janela,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'soma_valor')}
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
    GROUP BY 1, 2
    """,
    doc="Sliding-window event stats: 1-hour windows sliding every "
    "15 minutes — each event contributes to 4 overlapping windows "
    "(extension; the overlapping-window twin of hourly_event_stats).",
)
def sliding_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping time windows via F.window(size, slide).

    Scale shape: Spark expands each row into size/slide window
    assignments BEFORE the hash aggregate (same 4x factor the oracle
    replays with generate_series); the aggregate partial-combines
    map-side on (window, type), so the exchange carries only group
    rows. Window starts align to the epoch 15-minute grid in both
    engines (DuckDB's time_bucket origin sits on that grid).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "soma_valor"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("janela"),
            "event_type",
            "n",
            "soma_valor",
        )
    )


@register(
    "customer_revenue_moving_avg",
    """
    WITH monthly AS (
      SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS mes,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10))), 2)
                  AS DOUBLE) AS receita
      FROM orders GROUP BY o_custkey, 2
    )
    SELECT o_custkey, mes, receita,
           ROUND(CAST(SUM(CAST(receita AS DECIMAL(28,10))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS receita_mm3,
           COUNT(*) OVER w AS n_meses
    FROM monthly
    WINDOW w AS (PARTITION BY o_custkey ORDER BY mes
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="Per-customer 3-month trailing moving average of monthly "
    "revenue: ROWS-frame window over a keyed monthly aggregate "
    "(extension; the trailing-aggregate analytic shape).",
)
def customer_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-month mean per customer.

    Scale shape: the window partitions by customer (hash exchange,
    no global sort) and the monthly aggregate upstream reuses the
    same key, so AQE can co-locate both on one exchange. The frame
    sum goes through exact decimals — a 3-double frame is small, but
    frame-order float addition is still engine-dependent; the decimal
    form removes the question.
    """
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_custkey", F.date_format("o_orderdate", "yyyy-MM").alias("mes")
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,10)")), 2
        )
        .cast("double")
        .alias("receita")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("mes")
        .rowsBetween(-2, Window.currentRow)
    )
    return monthly.select(
        "o_custkey",
        "mes",
        "receita",
        # scale=6, not 2: a 2-decimal sum divided by the frame count
        # lands exactly on x.xx5 ties where the engines' double-round
        # directions differ; at 6 decimals the quotient (<= 3 decimal
        # digits) is never a tie.
        F.round(
            F.sum(F.col("receita").cast("decimal(28,10)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("receita_mm3"),
        F.count(F.lit(1)).over(w).alias("n_meses"),
    )


@register(
    "pivot_qty_by_status",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END",
                     'qty_F')},
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END",
                     'qty_O')}
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot (long -> wide): per-returnflag quantity totals spread "
    "across linestatus columns — the inverse of the R1 unpivot "
    "(extension; Spark .pivot with an explicit value list).",
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot with a PINNED value list.

    Passing the domain explicitly (['F', 'O']) matters at scale: an
    unpinned ``.pivot(col)`` first runs a distinct scan over the
    pivot column to discover values — an extra corpus pass and a
    nondeterministic column order. Pinned values compile straight to
    conditional aggregates (exactly the oracle's CASE WHEN form).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum(F.col("l_quantity"), "q"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_F"),
            F.col("O").alias("qty_O"),
        )
    )


@register(
    "cube_revenue",
    f"""
    SELECT strftime(o_orderdate, '%Y') AS ano,
           o_orderstatus AS situacao,
           GROUPING(strftime(o_orderdate, '%Y')) AS g_ano,
           GROUPING(o_orderstatus) AS g_situacao,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'receita', scale=2)}
    FROM orders
    GROUP BY CUBE (strftime(o_orderdate, '%Y'), o_orderstatus)
    """,
    doc="CUBE grouping sets: all 2^2 subtotal combinations over "
    "(year, status) with GROUPING() markers (extension; completes "
    "the grouping-sets family next to rollup_revenue).",
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube with grouping-id disambiguation.

    GROUPING() columns distinguish a real NULL key from a subtotal
    row — the standard cube-consumer contract. Spark expands the
    cube into grouping sets before the hash aggregate; each set
    partial-aggregates map-side like any groupBy.
    """
    orders = load(spark, sf_dir, "orders")
    # project the grouping keys to plain attributes FIRST: F.grouping()
    # must reference the exact cube column, and an expression aliased
    # inline in .cube() is not resolvable from .agg()
    base = orders.select(
        F.date_format("o_orderdate", "yyyy").alias("ano"),
        F.col("o_orderstatus").alias("situacao"),
        "o_totalprice",
    )
    return (
        base.cube("ano", "situacao")
        .agg(
            F.grouping("ano").alias("g_ano"),
            F.grouping("situacao").alias("g_situacao"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice"), "receita", scale=2),
        )
        .select("ano", "situacao", "g_ano", "g_situacao", "n", "receita")
    )


# ---------------------------------------------------------------------------
# Event-rate anomaly detection (extension): hourly count z-scores per
# event type — the monitoring query a pipeline team runs over its
# ingestion stream to catch crawler stalls / floods. Integer count
# sums keep mean/variance EXACT in both engines; only the final
# z-score rounds.
# ---------------------------------------------------------------------------

_ANOM_Z = 3.0


@register(
    "event_rate_anomalies",
    f"""
    WITH hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hora,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS h,
             SUM(n) AS sn,
             SUM(n * n) AS sn2
      FROM hourly GROUP BY event_type
    )
    SELECT hh.event_type, hh.hora, hh.n,
           ROUND((hh.n - CAST(st.sn AS DOUBLE) / st.h)
                 / sqrt((st.sn2 - CAST(st.sn AS DOUBLE) * st.sn / st.h)
                        / (st.h - 1)), 4) AS z,
           CASE WHEN abs((hh.n - CAST(st.sn AS DOUBLE) / st.h)
                 / sqrt((st.sn2 - CAST(st.sn AS DOUBLE) * st.sn / st.h)
                        / (st.h - 1))) > {_ANOM_Z}
                THEN 1 ELSE 0 END AS is_anomaly
    FROM hourly hh
    JOIN stats st ON st.event_type = hh.event_type
    WHERE st.h > 1
      AND st.sn2 - CAST(st.sn AS DOUBLE) * st.sn / st.h > 0
    """,
    doc="Hourly event-rate anomaly detection: per-type z-scores of "
    "hourly counts vs the type's own distribution (extension; the "
    "crawler-stall/flood monitor over an ingestion stream).",
)
def event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: two chained hash aggregates — (type, hour) then
    (type) — both with map-side partial combine; the per-type stats
    side is tiny (|event types| rows) and broadcasts into the final
    join, so nothing beyond the hourly rollup ever shuffles. All
    moments are integer sums (exact cross-engine); z rounds at 4.
    """
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
            "hora"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("h"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("sn2"),
    )
    mean = F.col("sn").cast("double") / F.col("h")
    ss = F.col("sn2") - F.col("sn").cast("double") * F.col("sn") / F.col("h")
    var = ss / (F.col("h") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    # ss > 0 guard: a type whose hourly counts are all identical would
    # hit 0/0 -> NaN, whose canonicalization is engine-specific; a
    # constant-rate type has no anomalies by definition, so drop it.
    return (
        hourly.join(
            F.broadcast(stats.where((F.col("h") > 1) & (ss > 0))),
            "event_type",
        )
        .select(
            "event_type",
            "hora",
            "n",
            F.round(z, 4).alias("z"),
            F.when(F.abs(z) > _ANOM_Z, F.lit(1)).otherwise(F.lit(0)).alias(
                "is_anomaly"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (extension): completes the grouping-sets
# family next to rollup_revenue (prefix chain) and cube_revenue (full
# lattice) with a HAND-PICKED set list that neither shortcut can
# express: detail by (year, status), a status-only marginal, and the
# grand total — but NO year-only marginal.
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_revenue",
    f"""
    SELECT strftime(o_orderdate, '%Y') AS ano,
           o_orderstatus AS situacao,
           GROUPING(strftime(o_orderdate, '%Y')) AS g_ano,
           GROUPING(o_orderstatus) AS g_situacao,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'receita', scale=2)}
    FROM orders
    GROUP BY GROUPING SETS ((strftime(o_orderdate, '%Y'), o_orderstatus),
                            (o_orderstatus), ())
    """,
    doc="Explicit GROUPING SETS: hand-picked subtotal list "
    "((year,status),(status),()) that is neither a rollup prefix "
    "chain nor a full cube, with GROUPING() markers (extension).",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked grouping sets via the Spark 4 DataFrame API.

    Scale shape: identical to cube/rollup — Spark expands the set
    list before one hash aggregate (each input row replicated once
    per matching set, 3× here vs the cube's 4×), every set
    partial-aggregates map-side, and the group-key domain
    (|years|×|statuses| + |statuses| + 1) is tiny, so the exchange
    carries only combiner output.
    """
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.date_format("o_orderdate", "yyyy").alias("ano"),
        F.col("o_orderstatus").alias("situacao"),
        "o_totalprice",
    )
    return (
        base.groupingSets(
            [["ano", "situacao"], ["situacao"], []], "ano", "situacao"
        )
        .agg(
            F.grouping("ano").alias("g_ano"),
            F.grouping("situacao").alias("g_situacao"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice"), "receita", scale=2),
        )
        .select("ano", "situacao", "g_ano", "g_situacao", "n", "receita")
    )


# ---------------------------------------------------------------------------
# Time-series gap fill (extension): resample events to a dense hourly
# grid per event type — missing hours materialized with count 0 and
# the last observed hourly mean carried forward (LOCF). The standard
# "regularize an irregular series" step before any rolling-window or
# forecasting consumer; neither rollup nor window functions alone can
# produce rows that do not exist in the input.
# ---------------------------------------------------------------------------


@register(
    "events_gap_fill",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hora,
             COUNT(*) AS n,
             {sql_davg('value', 'valor_hora')}
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT t.event_type, u.hora
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN bounds
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(bounds.h0, bounds.h1,
                                      INTERVAL 1 HOUR)) AS hora) u
    ),
    joined AS (
      SELECT s.event_type, s.hora,
             CAST(COALESCE(h.n, 0) AS BIGINT) AS n,
             h.valor_hora,
             h.n IS NULL AS is_gap
      FROM spine s
      LEFT JOIN hourly h
        ON h.event_type = s.event_type AND h.hora = s.hora
    )
    SELECT event_type, hora, n,
           COALESCE(last_value(valor_hora IGNORE NULLS)
                      OVER (PARTITION BY event_type ORDER BY hora
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW),
                    0.0) AS valor_locf,
           is_gap
    FROM joined
    ORDER BY event_type, hora
    """,
    doc="Time-series resample + gap fill: dense hourly spine per "
    "event type (generated rows for missing hours), count 0 and "
    "last-observation-carried-forward hourly mean on the gaps "
    "(extension; the regularization step before rolling-window / "
    "forecast consumers).",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid with LOCF over an irregular event series.

    Scale shape: the fact scan reduces FIRST to an (event_type, hour)
    hash aggregate (map-side combine; grid-sized output), so the
    spine join and LOCF window never touch raw events. The spine is
    generated, not shuffled: a 1-row global bounds aggregate and the
    distinct-type frame broadcast, and sequence() explodes per type —
    |types| × |hours| rows. The LOCF window partitions by event_type
    (bounded partitions ≈ series length; at 100 TB the partition key
    would widen to (type, month) with a per-month seed row to keep
    partitions bounded). The carried value is the already-rounded
    hourly mean, so both engines carry bit-identical doubles.
    """
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    hora = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(
        F.col("event_type"), hora.alias("hora")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        davg(F.col("value"), "valor_hora"),
    )
    bounds = ev.agg(
        F.min(hora).alias("h0"), F.max(hora).alias("h1")
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hora"),
        )
    )
    joined = spine.join(
        hourly, ["event_type", "hora"], "left"
    ).select(
        "event_type",
        "hora",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        "valor_hora",
        F.col("n").isNull().alias("is_gap"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hora")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hora",
        "n",
        F.coalesce(
            F.last("valor_hora", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("valor_locf"),
        "is_gap",
    ).orderBy("event_type", "hora")


# --- exponentially weighted moving average ---------------------------
# EWMA over the per-part monthly price series. Weights are the exact
# binary decay 2^-j over the last _EWMA_LOOKBACK observations
# (alpha = 0.5), renormalized over the lags actually present, so the
# head of each series is a proper partial average. Power-of-two
# weights make every product an exact exponent shift and the fixed
# left-associated 8-term addition chain is IEEE-identical across
# engines — no decimal detour needed.

_EWMA_LOOKBACK = 8
_EWMA_MAXPART = 500


def _ewma_sql() -> str:
    lags = ",\n             ".join(
        f"LAG(preco_medio, {j}) OVER w AS m{j}"
        for j in range(1, _EWMA_LOOKBACK)
    )
    num = " + ".join(
        f"COALESCE(m{j} * {2.0 ** -j!r}, 0)"
        for j in range(_EWMA_LOOKBACK)
    )
    den = " + ".join(
        f"(CASE WHEN m{j} IS NOT NULL THEN {2.0 ** -j!r} ELSE 0 END)"
        for j in range(_EWMA_LOOKBACK)
    )
    return f"""
    WITH monthly AS (
      SELECT l_partkey AS item_codigo,
             strftime(l_shipdate, '%Y-%m') AS periodo,
             {{davg}}
      FROM lineitem
      WHERE l_partkey <= {_EWMA_MAXPART}
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT item_codigo, periodo, preco_medio AS m0,
             {lags}
      FROM monthly
      WINDOW w AS (PARTITION BY item_codigo ORDER BY periodo)
    )
    SELECT item_codigo, periodo, m0 AS preco_medio,
           ROUND(({num}) / ({den}), 6) AS preco_ewma
    FROM lagged
    ORDER BY item_codigo, periodo
    """.format(davg=sql_davg("l_extendedprice", "preco_medio"))


@register(
    "item_price_ewma",
    _ewma_sql(),
    doc="Exponentially weighted moving average (alpha=0.5) of the "
    f"per-part monthly price over the last {_EWMA_LOOKBACK} observed "
    "months, renormalized at series heads — exact power-of-two decay "
    "weights keep the float chain engine-identical (extension; the "
    "exponential-smoothing analytic shape next to the uniform "
    "moving average).",
)
def item_price_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item_codigo, periodo, preco_medio, preco_ewma) per observed
    month.

    Scale shape: one map-side-combinable monthly aggregate keyed by
    (part, month), then a window PARTITIONED by part (hash exchange,
    no global sort — AQE can reuse the aggregate's exchange). The
    EWMA itself is 7 LAGs plus a fixed 8-term arithmetic chain, all
    whole-stage-codegen row-local work; weights 2^-j are exact
    exponent shifts so the chain is bit-identical in both engines
    over the 6dp-rounded monthly means. Smoothing over the
    OBSERVATION sequence (not the calendar grid) is deliberate: gap
    months carry no fabricated zero, matching pandas
    ``ewm(alpha=.5, ignore_na=True)`` semantics.
    """
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.col("l_partkey") <= _EWMA_MAXPART)
        .groupBy(
            F.col("l_partkey").alias("item_codigo"),
            F.date_format("l_shipdate", "yyyy-MM").alias("periodo"),
        )
        .agg(davg(F.col("l_extendedprice"), "preco_medio"))
    )
    w = Window.partitionBy("item_codigo").orderBy("periodo")
    m = [F.col("preco_medio")] + [
        F.lag("preco_medio", j).over(w)
        for j in range(1, _EWMA_LOOKBACK)
    ]
    num = None
    den = None
    for j in range(_EWMA_LOOKBACK):
        wt = 2.0 ** -j
        term = F.coalesce(m[j] * F.lit(wt), F.lit(0.0))
        dterm = F.when(m[j].isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return (
        monthly.select(
            "item_codigo",
            "periodo",
            "preco_medio",
            F.round(num / den, 6).alias("preco_ewma"),
        )
        .orderBy("item_codigo", "periodo")
    )
