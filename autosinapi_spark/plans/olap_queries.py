"""Multi-table OLAP join queries (TPC-H Q3/Q5 shapes; extension).

The reference's query surface is single-fact lookups and rollups
(DataModel.md:376-391); these two queries extend it with the classic
star-join shapes every warehouse workload runs — they exist to
exercise (and pin, via ``tests/test_plans.py``-style assertions) the
join PLANNING that matters at 100 TB:

- BOUNDED dimensions (nation, region) broadcast explicitly; the
  fact-scale arms (customer, supplier) carry no hint — the optimizer
  picks broadcast vs shuffle per scale factor (auto-broadcast at
  bench scale, shuffle join at 100 TB, where a pinned broadcast of a
  fact-scale side would OOM the executors);
- selective filters (market segment, region name) are applied BEFORE
  each join, so every arm prunes maximally;
- orders⋈lineitem is the one unavoidable fact-fact exchange, plus
  the final partial-aggregated groupBy.

Both are patterned on public TPC-H queries (Q3 "shipping priority",
Q5 "local supplier volume") restated over the fixture schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load
from .registry import dsum, register, sql_dsum

_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1998-07-01"
_Q3_TOPN = 10

_Q5_REGION = "ASIA"
_Q5_FROM = "1996-01-01"
_Q5_TO = "1998-01-01"


@register(
    "top_unshipped_orders",
    f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 2)},
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT {_Q3_TOPN}
    """,
    doc="TPC-H Q3 shape: top-N highest-revenue orders not yet shipped "
    "at a cutoff date, for one market segment — segment-filtered "
    "customer joined into orders (physical join optimizer-chosen), "
    "orders⋈lineitem on the order key, partial-aggregated rollup, "
    "TakeOrdered top-N (extension).",
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: customer is filtered to one segment BEFORE its
    join, so orders joins against a side a fifth of customer's size.
    The customer arm carries NO broadcast hint on purpose — customer
    is fact-scale, so the right physical join depends on SF and the
    optimizer (with stats/AQE) must pick it: auto-broadcast under the
    threshold (as it does at bench scale), shuffle join beyond it.
    orders⋈lineitem is the unavoidable fact-fact exchange (bucketed
    layouts make it exchange-free, see ``tests/test_bucketing.py``);
    the top-N is TakeOrdered (heap per partition + driver merge of
    N), never a global sort.
    """
    cutoff = F.lit(_Q3_DATE).cast("timestamp")
    cust = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < cutoff
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > cutoff
    )
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                2,
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(_Q3_TOPN)
    )


@register(
    "regional_supplier_volume",
    f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 2)},
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_FROM} 00:00:00'
      AND o.o_orderdate < TIMESTAMP '{_Q5_TO} 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    doc="TPC-H Q5 shape: revenue from LOCAL supplier-customer pairs "
    "(same nation) per nation of one region — the bounded "
    "region⋈nation map broadcast down both the customer and supplier "
    "arms, facts joined on their keys, nation-level rollup "
    "(extension).",
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the region filter collapses nation to a handful
    of rows, which broadcast into customer and supplier (the only
    PINNED broadcasts — nation/region are bounded dimensions), so
    both arms are pre-pruned before touching a fact. The pruned
    customer and supplier arms carry no broadcast hint: they are
    fact-scale, and the optimizer must pick broadcast vs shuffle per
    SF (auto-broadcast at bench scale, shuffle join at 100 TB). The
    'local' (c_nationkey = s_nationkey) predicate rides the supplier
    join, not a separate shuffle. Final rollup has one group per
    nation — all map-side combine.
    """
    nations = (
        load(spark, sf_dir, "nation")
        .join(
            broadcast(
                load(spark, sf_dir, "region").where(
                    F.col("r_name") == _Q5_REGION
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = load(spark, sf_dir, "customer").join(
        broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").join(
        broadcast(nations.select(F.col("n_nationkey").alias("sn_key"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_TO).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (F.col("c_nationkey") == supp["s_nationkey"]),
        )
        .join(
            broadcast(nations),
            supp["s_nationkey"] == nations["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                2,
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select("n_name", "revenue", "n_items")
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --- incremental aggregate merge (materialized-view maintenance) -----

_INC_MOD = 10  # batch = the 10% of orders with o_orderkey % 10 == 0


@register(
    "incremental_rollup_merge",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS periodo,
           {sql_dsum('o_totalprice', 'receita', 2)},
           COUNT(*) AS n_pedidos
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
    doc="Incremental materialized-view maintenance: the monthly "
    "revenue rollup is kept as PARTIAL aggregates (exact decimal sum "
    "+ count per period); a new batch folds in by merging partials — "
    "sum of sums — never rescanning history. The oracle is the full "
    "recompute over all orders: exact-decimal partials make the "
    "merge bit-equal to it (extension).",
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue after merging a 10% batch into the 90% state.

    Scale shape: history is aggregated ONCE into per-period partial
    state (period-keyed, partial-aggregated map-side); each new batch
    aggregates only its own rows and merges by period — the merge
    shuffles state-sized frames (months x 1 row), not history. The
    partial sum stays an exact DECIMAL so merge order cannot drift
    from the full recompute; rounding to the published double happens
    only at read time. This is the maintenance loop behind every
    'replace-by-period' sink (K4) when periods arrive incrementally.
    """
    orders = load(spark, sf_dir, "orders")
    period = F.date_format("o_orderdate", "yyyy-MM").alias("periodo")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(period).agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,10)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    state = partial(orders.where(F.col("o_orderkey") % _INC_MOD != 0))
    batch = partial(orders.where(F.col("o_orderkey") % _INC_MOD == 0))
    merged = (
        state.unionByName(batch)
        .groupBy("periodo")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    return merged.select(
        "periodo",
        F.round(F.col("s"), 2).cast("double").alias("receita"),
        F.col("n").alias("n_pedidos"),
    )


# --- analytic window functions (lag / percent_rank / ntile) ----------


@register(
    "price_change_analysis",
    f"""
    WITH monthly AS (
      SELECT l_partkey AS part_key,
             strftime(l_shipdate, '%Y-%m') AS periodo,
             {sql_dsum('l_extendedprice', 'price', 2)},
             COUNT(*) AS n_sales
      FROM lineitem
      GROUP BY l_partkey, strftime(l_shipdate, '%Y-%m')
    )
    SELECT part_key, periodo, price, n_sales,
           LAG(price) OVER w_part AS prev_price,
           ROUND(price - COALESCE(LAG(price) OVER w_part, price), 2)
             AS mom_change,
           CASE WHEN COUNT(*) OVER w_all > 1
                THEN ((RANK() OVER w_month - 1) * 1000000)
                     // (COUNT(*) OVER w_all - 1)
                ELSE CAST(0 AS BIGINT) END AS pct_rank_ppm,
           CAST(NTILE(4) OVER w_month AS BIGINT) AS price_quartile
    FROM monthly
    WINDOW
      w_part AS (PARTITION BY part_key ORDER BY periodo),
      w_month AS (PARTITION BY periodo ORDER BY price, part_key),
      w_all AS (PARTITION BY periodo)
    """,
    doc="Analytic window breadth: per-part monthly revenue with "
    "LAG month-over-month change, percent-rank position (emitted as "
    "integer parts-per-million — (rank-1)*1e6 div (n-1) — because a "
    "rounded PERCENT_RANK double lands exactly on .5 rounding "
    "boundaries the two engines break differently) and NTILE "
    "quartile within each month; every ordering carries a unique "
    "(price, part) tiebreak (extension).",
)
def price_change_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part monthly revenue with lag/rank/quartile analytics.

    Scale shape: one partial-aggregated rollup to (part, month) grain,
    then two KEYED windows — by part (time series) and by month
    (cross-sectional rank). No global window exists anywhere; both
    exchanges are on real keys and AQE coalesces the small months.
    The exact-decimal monthly sum keeps the ranked value identical
    across engines, so rank/ntile cuts cannot drift.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.col("l_partkey").alias("part_key"),
        F.date_format("l_shipdate", "yyyy-MM").alias("periodo"),
    ).agg(
        dsum(F.col("l_extendedprice"), "price", 2),
        F.count(F.lit(1)).alias("n_sales"),
    )
    w_part = Window.partitionBy("part_key").orderBy("periodo")
    w_month = Window.partitionBy("periodo").orderBy("price", "part_key")
    w_all = Window.partitionBy("periodo")
    base = (
        monthly.withColumn("prev_price", F.lag("price").over(w_part))
        .withColumn("rk", F.rank().over(w_month))
        .withColumn("nm", F.count(F.lit(1)).over(w_all))
        .withColumn("qt", F.ntile(4).over(w_month))
    )
    return base.select(
        "part_key",
        "periodo",
        "price",
        "n_sales",
        "prev_price",
        F.round(
            F.col("price") - F.coalesce("prev_price", "price"), 2
        ).alias("mom_change"),
        F.when(
            F.col("nm") > 1,
            F.expr("((rk - 1) * 1000000L) div (nm - 1)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pct_rank_ppm"),
        F.col("qt").cast("long").alias("price_quartile"),
    )


# --- national market share (TPC-H Q8 shape) --------------------------

_Q8_REGION = "AMERICA"  # customer region under analysis
_Q8_NATION = "NATION_6"  # supplier nation whose share is measured
_Q8_PTYPE = "PROMO"  # product line under analysis


@register(
    "nation_market_share",
    f"""
    WITH vol AS (
      SELECT strftime(o.o_orderdate, '%Y') AS ano,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{_Q8_REGION}'
        AND p.p_type = '{_Q8_PTYPE}'
    )
    SELECT ano,
           {sql_dsum('volume', 'total_volume', 2)},
           {sql_dsum(f"CASE WHEN supp_nation = '{_Q8_NATION}' "
                     "THEN volume ELSE 0 END", 'nation_volume', 2)},
           ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = '{_Q8_NATION}'
                                    THEN volume ELSE 0 END
                               AS DECIMAL(28,10))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(28,10))) AS DOUBLE),
                 6) AS mkt_share
    FROM vol
    GROUP BY ano
    ORDER BY ano
    """,
    doc="TPC-H Q8 shape: one nation's share of a product line's "
    "sales volume into one customer region, per order year — "
    "selective dimension filters pushed below every join, bounded "
    "dims pinned broadcast, share via conditional aggregation in a "
    "single pass (extension).",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share per year via ONE conditional aggregation.

    Scale shape: the naive Q8 form computes nation and total volume
    as two scans or a self-join; here both are conditional sums in
    the same hash aggregate, so the fact side is read once. part is
    filtered to one p_type BEFORE its join (1/6 selectivity reaching
    the parquet scan as a pushed filter) and carries no hint — it is
    fact-scale, so the optimizer picks broadcast vs shuffle per SF.
    nation(×2 roles)/region are bounded dims, pinned broadcast, and
    the region filter prunes the customer arm before orders joins
    it. lineitem⋈orders stays the one fact-fact exchange. The final
    group key (year) has ~7 values — all map-side combine; the share
    divides two exactly-summed decimals, so both engines round the
    same double.
    """
    li = load(spark, sf_dir, "lineitem")
    part = (
        load(spark, sf_dir, "part")
        .where(F.col("p_type") == _Q8_PTYPE)
        .select("p_partkey")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust_nations = (
        load(spark, sf_dir, "nation")
        .join(
            broadcast(
                load(spark, sf_dir, "region").where(
                    F.col("r_name") == _Q8_REGION
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(broadcast(supp_nation), supp["s_nationkey"] == F.col("sn_key"))
        .select(
            F.date_format("o_orderdate", "yyyy").alias("ano"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
    )
    is_nation = F.col("supp_nation") == _Q8_NATION
    cond_vol = F.when(is_nation, F.col("volume")).otherwise(F.lit(0.0))
    return (
        vol.groupBy("ano")
        .agg(
            dsum(F.col("volume"), "total_volume", 2),
            dsum(cond_vol, "nation_volume", 2),
            F.round(
                F.sum(cond_vol.cast("decimal(28,10)")).cast("double")
                / F.sum(F.col("volume").cast("decimal(28,10)")).cast(
                    "double"
                ),
                6,
            ).alias("mkt_share"),
        )
        .select("ano", "total_volume", "nation_volume", "mkt_share")
        .orderBy("ano")
    )


# --- late-shipment priority check (TPC-H Q4 shape) --------------------

_Q4_FROM = "1997-01-01"
_Q4_TO = "1997-04-01"  # one quarter
_Q4_LATE_DAYS = 60  # fixture adapter: no commit/receipt dates, so
# "late" = first shipment more than 60 days after the order date


@register(
    "order_priority_late",
    f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_FROM} 00:00:00'
      AND o.o_orderdate < TIMESTAMP '{_Q4_TO} 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >
                        o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: per-priority count of one quarter's orders "
    "having at least one line shipped late (> 60 days after the "
    "order date — fixture adapter for the missing commit/receipt "
    "dates), the EXISTS decorrelated to a left-semi join "
    "(extension).",
)
def order_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-per-order decorrelated into one semi join.

    Scale shape: the quarter filter prunes orders at the scan
    (pushed min/max on o_orderdate); the EXISTS becomes a LEFT SEMI
    join on the order key with the lateness predicate as the
    residual condition — the semi join short-circuits per key (no
    duplicate-order blowup, no distinct needed), and at fact scale
    it is the standard orderkey-partitioned exchange.  The final
    rollup has five groups — pure map-side combine.
    """
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q4_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_TO).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate")
            + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --- customer order-count distribution (TPC-H Q13 shape) --------------

_Q13_EXCLUDED_PRIO = "4-NOT SPECIFIED"  # fixture adapter: the comment
# NOT-LIKE filter of the original has no fixture column; excluding one
# priority class plays the same role (creates the zero-order bucket)


@register(
    "customer_order_distribution",
    f"""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '{_Q13_EXCLUDED_PRIO}'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: distribution of per-customer order counts "
    "(zero included) over a filtered order class — the left-join "
    "double aggregation restated as pre-aggregate-then-outer-join "
    "(extension).",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13's LEFT JOIN + per-customer COUNT, decorrelated.

    Scale shape: because the outer-join key IS the first group key,
    the fact side is aggregated FIRST (orders collapses to one row
    per customer behind a map-side combine — the exchange carries
    custkey-cardinality, not order-cardinality), and only then
    outer-joined to the customer dimension; a naive join-then-count
    would shuffle every order row. The second aggregate has
    |distinct counts| groups — pure map-side collapse.
    """
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != _Q13_EXCLUDED_PRIO
    )
    ocnt = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    per_cust = cust.join(
        ocnt, cust.c_custkey == ocnt.o_custkey, "left"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- small-quantity order revenue (TPC-H Q17 shape) -------------------

_Q17_BRAND = "Brand#13"
_Q17_MAX_SIZE = 15  # fixture adapter: stands in for Q17's container
# filter (the fixture part table has no p_container column)


@register(
    "small_qty_order_revenue",
    f"""
    WITH pk AS (
      SELECT p_partkey FROM part
      WHERE p_brand = '{_Q17_BRAND}' AND p_size < {_Q17_MAX_SIZE}
    ),
    fl AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN pk ON pk.p_partkey = l.l_partkey
    ),
    pq AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM fl GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(fl.l_extendedprice AS DECIMAL(28,10)))
                      AS DOUBLE) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM fl JOIN pq ON pq.l_partkey = fl.l_partkey
    WHERE fl.l_quantity < 0.2 * pq.avg_qty
    """,
    doc="TPC-H Q17 shape: average yearly revenue lost if small-"
    "quantity orders (below 20% of the part's average quantity) "
    "were not filled, for one brand/size class — the correlated "
    "scalar subquery decorrelated to a per-part aggregate join "
    "(extension).",
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17's correlated AVG subquery as aggregate-then-rejoin.

    Scale shape: the brand/size filter reduces part to a sliver that
    broadcasts (checked by the plan test), so lineitem is pruned
    BEFORE any exchange; the per-part average and the rejoin then
    run on the filtered fact slice only, partitioned by partkey
    (one exchange feeds both the aggregate and the join under AQE
    reuse). The average is an exact decimal sum over a double
    count — bit-identical across engines, so the 0.2x threshold
    compare can never straddle an ulp.
    """
    part_keys = (
        load(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") == _Q17_BRAND)
            & (F.col("p_size") < _Q17_MAX_SIZE)
        )
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    fl = li.join(
        broadcast(part_keys),
        li.l_partkey == part_keys.p_partkey,
    ).drop("p_partkey")
    pq = fl.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(28,10)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    small = fl.join(pq, "l_partkey").where(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast(
                "double"
            )
            / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- large-volume customers (TPC-H Q18 shape) -------------------------

_Q18_MIN_QTY = 300


@register(
    "large_volume_customers",
    f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE)
               AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,10))) > {_Q18_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, ROUND(b.sum_qty, 2) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    """,
    doc="TPC-H Q18 shape: customers whose orders exceed a total-"
    "quantity threshold — the IN-subquery restated as aggregate-"
    "filter-then-join, reusing the aggregate's own sum instead of "
    "re-scanning lineitem (extension).",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18's HAVING-IN subquery without the second fact scan.

    Scale shape: the only fact-scale exchange is the orderkey
    aggregate; the HAVING filter collapses it to a handful of
    qualifying orders, and the original query's re-join of lineitem
    to recompute the same sum is elided by carrying the aggregate's
    value through the join (at 100 TB that saves a second full
    lineitem shuffle). The qualifying frame is tiny, so both
    dimension joins resolve as broadcasts of the FILTERED side under
    AQE, never of raw orders/customer.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_qty")
        )
        .where(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("sum_qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


# --- dormant high-balance customers (TPC-H Q22 shape) -----------------

_Q22_CUTOFF = "2000-07-01"  # fixture adapter: Q22's "no orders at
# all" is empty on this fixture (every customer has orders), so the
# anti-join arm is the recent-order window instead


@register(
    "dormant_rich_customers",
    f"""
    WITH ab AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(28,10))), 2)
                AS DOUBLE) AS total_bal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no "
    "recent orders, rolled up by market segment — global scalar "
    "aggregate broadcast into the filter, NOT EXISTS as a left-anti "
    "join against the date-pruned order slice (extension).",
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22's two subqueries: broadcast scalar + anti join.

    Scale shape: the global average is a 1-row aggregate
    crossJoin-broadcast into the customer scan (the same idiom as
    ``event_rate_anomalies``); the NOT EXISTS becomes a LEFT ANTI
    join against orders pruned to the recent window AT THE SCAN
    (pushed o_orderdate min/max), projected to the join key only —
    at 100 TB the anti join's build side is the recent slice's
    custkey set, not the order table. Final rollup: five segments,
    map-side combine.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.crossJoin(broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(F.col("c_acctbal"), "total_bal", 2),
        )
        .orderBy("c_mktsegment")
    )


# --- top supplier by period revenue (TPC-H Q15 shape) -----------------

_Q15_FROM = "1996-01-01"
_Q15_TO = "1996-04-01"


@register(
    "top_supplier_revenue",
    f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(28,10))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q15_TO} 00:00:00'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT MAX(r) AS mr FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(rev.r, 2) AS DOUBLE) AS total_revenue
    FROM rev, mx
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r = mx.mr
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: supplier(s) with the maximum revenue over "
    "one quarter — the view + scalar-subquery formulation restated "
    "as aggregate, broadcast global max, tie-preserving equality "
    "join (extension).",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15's revenue view + MAX subquery, decorrelated.

    Scale shape: one date-pruned fact aggregate (suppkey keys,
    map-side combine), then the global max is a 1-row aggregate
    crossJoin-broadcast back — the equality keeps ALL tied
    suppliers, exactly like the original's WHERE total =
    (SELECT MAX...). The tie compare runs on the EXACT decimal sums
    (never the rounded doubles), so two suppliers a ulp apart can't
    both win. The supplier join input is at most one row per
    supplier — broadcast side under AQE.
    """
    # rebalance=False: date-pruned scan straight into a map-side-
    # combining aggregate — the rebalance exchange is pure overhead
    # (r14 verdict ask #3)
    li = load(spark, sf_dir, "lineitem", rebalance=False).where(
        (F.col("l_shipdate") >= F.lit(_Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_TO).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,10)"
            )
        ).alias("r")
    )
    mx = rev.agg(F.max("r").alias("mr"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(broadcast(mx))
        .where(F.col("r") == F.col("mr"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --- disjunctive bracket revenue (TPC-H Q19 shape) --------------------

_Q19_BRACKETS = (  # widened vs the original so every test SF has hits
    ("Brand#12", 15, 1, 15),
    ("Brand#23", 20, 10, 25),
    ("Brand#34", 25, 20, 35),
)


def _q19_sql_pred() -> str:
    return " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {mx} "
        f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, mx, qlo, qhi in _Q19_BRACKETS
    )


@register(
    "bracket_revenue_disjunctive",
    f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 2)},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_q19_sql_pred()}
    """,
    doc="TPC-H Q19 shape: revenue from three disjunctive "
    "brand/size/quantity brackets — the OR-of-conjuncts join "
    "predicate whose single-table factors (brand+size union; the "
    "quantity hull) must still prune the scans (extension).",
)
def bracket_revenue_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19's OR-of-conjuncts as one join with a residual predicate.

    Scale shape: the union of the part-only factors (the three
    brand+size conjuncts) is applied to the part scan BEFORE the
    join — the disjunction over part columns alone is pushable even
    though the full predicate isn't — and the quantity hull
    [min(qlo), max(qhi)] is likewise pushed to the lineitem scan;
    the exact per-bracket pairing stays as the join residual. The
    filtered part sliver broadcasts; one fact pass, one 1-row
    aggregate.
    """
    qlo = min(q for _, _, q, _ in _Q19_BRACKETS)
    qhi = max(q for _, _, _, q in _Q19_BRACKETS)
    part_pred = None
    for b, mx, _, _ in _Q19_BRACKETS:
        c = (F.col("p_brand") == b) & F.col("p_size").between(1, mx)
        part_pred = c if part_pred is None else (part_pred | c)
    part = (
        load(spark, sf_dir, "part")
        .where(part_pred)
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity").between(qlo, qhi))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    full = None
    for b, mx, lo, hi in _Q19_BRACKETS:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, mx)
            & F.col("l_quantity").between(lo, hi)
        )
        full = c if full is None else (full | c)
    joined = li.join(
        broadcast(part), li.l_partkey == part.p_partkey
    ).where(full)
    return joined.agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "revenue",
            2,
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- suppliers who kept orders waiting (TPC-H Q21 shape) --------------

_Q21_LATE_DAYS = 60  # fixture adapter: no commit/receipt dates (same
# convention as order_priority_late)
_Q21_TOPN = 10


@register(
    "suppliers_kept_waiting",
    f"""
    WITH j AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate >
               o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY AS is_late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT l_suppkey) FILTER (WHERE is_late) AS n_late,
             MAX(l_suppkey) FILTER (WHERE is_late) AS blame
      FROM j GROUP BY l_orderkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order p JOIN supplier s ON s.s_suppkey = p.blame
    WHERE p.n_supp > 1 AND p.n_late = 1
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT {_Q21_TOPN}
    """,
    doc="TPC-H Q21 shape: suppliers solely responsible for delaying "
    "multi-supplier finished orders — the EXISTS(other supplier) "
    "AND NOT EXISTS(other LATE supplier) pair collapsed into one "
    "per-order distinct-supplier aggregation (extension).",
)
def suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's double correlated EXISTS as a single aggregation.

    Scale shape: the textbook plan self-joins lineitem TWICE (the
    EXISTS and NOT EXISTS arms); this form instead aggregates each
    order's supplier set once — two distinct-counts and a
    conditional max over the same orderkey exchange that the
    order-status join already needs, so lineitem is scanned and
    shuffled exactly once. The n_late = 1 ∧ n_supp > 1 filter then
    IS the double-EXISTS semantics (the lone late supplier is the
    MAX-FILTER). Status filter prunes orders at the scan; the
    qualifying frame is orders-scale; supplier join broadcasts under
    AQE; TakeOrdered for the top-N.
    """
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate")
            + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS")
        ).alias("is_late"),
    )
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late"),
        F.max(late_supp).alias("blame"),
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(sup, F.col("blame") == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(_Q21_TOPN)
    )


# --- dominant-share suppliers (TPC-H Q20 shape) -----------------------

_Q20_FROM = "1997-01-01"
_Q20_TO = "1998-01-01"
_Q20_MAX_SIZE = 10
# share threshold 60%, compared as 5*q > 3*tot on the EXACT decimal
# sums — the ratio never exists as a float, so no engine can round
# a boundary case differently
_Q20_NUM, _Q20_DEN = 5, 3


@register(
    "dominant_share_suppliers",
    f"""
    WITH pk AS (
      SELECT p_partkey FROM part WHERE p_size < {_Q20_MAX_SIZE}
    ),
    sp AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(28,10))) AS q
      FROM lineitem JOIN pk ON pk.p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '{_Q20_FROM} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q20_TO} 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ),
    pt AS (SELECT l_partkey, SUM(q) AS tot FROM sp GROUP BY l_partkey),
    qual AS (
      SELECT DISTINCT sp.l_suppkey
      FROM sp JOIN pt ON pt.l_partkey = sp.l_partkey
      WHERE sp.q * {_Q20_NUM} > pt.tot * {_Q20_DEN}
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN qual ON qual.l_suppkey = s.s_suppkey
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape: suppliers holding a dominant (>60%) share "
    "of some small part's annual shipped volume — the nested "
    "IN/scalar-subquery chain restated as two stacked aggregates "
    "plus a semi-join, with the share compared in exact decimal "
    "cross-multiplication (extension; the fixture has no partsupp, "
    "so shipped volume stands in for available stock).",
)
def dominant_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested subqueries as stacked aggregates.

    Scale shape: the part sliver broadcasts into the date-pruned
    fact scan; the (supp, part) aggregate and the per-part total are
    two hash aggregates over the SAME partkey-containing keys (AQE
    reuses the exchange for the second); the share filter
    cross-multiplies the exact decimal sums — no float ratio
    exists to straddle an ulp between engines. The distinct
    qualifying-supplier set is supplier-scale; its join to the
    supplier dim broadcasts.
    """
    pk = (
        load(spark, sf_dir, "part")
        .where(F.col("p_size") < _Q20_MAX_SIZE)
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q20_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q20_TO).cast("timestamp"))
    )
    sp = (
        li.join(broadcast(pk), li.l_partkey == pk.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("q"))
    )
    pt = sp.groupBy("l_partkey").agg(F.sum("q").alias("tot"))
    qual = (
        sp.join(pt, "l_partkey")
        .where(F.col("q") * _Q20_NUM > F.col("tot") * _Q20_DEN)
        .select("l_suppkey")
        .distinct()
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sup.join(qual, sup.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Z-order layout keys (lakehouse data clustering) -----------------

_Z_BITS = 16  # per-dimension bits interleaved into a 32-bit z-value
_Z_FILES = 64  # target layout files


def _z_expr(xcol: str, ycol: str) -> str:
    """Bit-interleave SQL shared verbatim by both engines: z =
    sum_i ((x>>i & 1) << 2i) + ((y>>i & 1) << (2i+1)) — pure integer
    shifts, so the value is identical everywhere."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _z_norm(col: str, lo: str, hi: str, idiv: str) -> str:
    """Range-normalize a BIGINT key into the [0, 2^bits) budget:
    ((x - min) * (2^bits - 1)) idiv (max - min). Pure integer
    arithmetic — operands are non-negative, so DuckDB's ``//`` and
    Spark's ``DIV`` truncate identically. Without this, any key
    exceeding 2^bits - 1 (l_partkey at sf>=1) would alias distinct
    values onto one z-cell and min/max skipping on that key degrades
    — same equal-width binning as
    ``operators/maintenance.write_zorder_layout``."""
    top = (1 << _Z_BITS) - 1
    return (
        f"(CASE WHEN {hi} = {lo} THEN 0 "
        f"ELSE ((CAST({col} AS BIGINT) - {lo}) * {top}) "
        f"{idiv} ({hi} - {lo}) END)"
    )


def _z_sql(table: str, idiv: str) -> str:
    """The full z-order key query, parameterized only by the fact
    table reference and the engine's integer-division token."""
    return f"""
    WITH mm AS (
      SELECT MIN(CAST(l_partkey AS BIGINT)) AS pmin,
             MAX(CAST(l_partkey AS BIGINT)) AS pmax,
             MIN(CAST(l_suppkey AS BIGINT)) AS smin,
             MAX(CAST(l_suppkey AS BIGINT)) AS smax
      FROM {table}
    ),
    b AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             {_z_norm('l_partkey', 'pmin', 'pmax', idiv)} AS px,
             {_z_norm('l_suppkey', 'smin', 'smax', idiv)} AS sx
      FROM {table} CROSS JOIN mm
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({_z_expr('px', 'sx')} AS BIGINT) AS zval,
           CAST({_z_expr('px', 'sx')} % {_Z_FILES} AS BIGINT) AS zbucket
    FROM b
    """


@register(
    "zorder_layout_keys",
    _z_sql("lineitem", "//"),
    doc=f"Z-order layout keys over (l_partkey, l_suppkey): each key "
    f"range-normalized into the {_Z_BITS}-bit budget (true OPTIMIZE "
    f"ZORDER behavior — works for any key domain), then Morton "
    f"interleaved per row plus a {_Z_FILES}-way clustering bucket — "
    "the write-layout pass of lakehouse table maintenance, which "
    "makes min/max file statistics selective for BOTH keys at once "
    "(extension).",
)
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every lineitem row with its Morton z-value and layout bucket.

    Scale shape: one 1-row min/max aggregate (broadcast back as a
    scalar — the only exchange in the plan), then the normalization
    and z-value are pure row-local integer expressions (bit shifts
    inside codegen — no UDF, no fact-table shuffle). Normalizing into
    the bit budget first is what keeps pruning selective on BOTH keys
    at any scale: raw keys above 2^bits - 1 would alias distinct
    parts to one z-cell (l_partkey crosses 65535 at sf>=1). Writing
    the layout is then ``repartitionByRange(zbucket, zval)`` + a
    sorted parquet write; the modulo bucket stands in for the range
    boundaries the writer would compute from a z-value quantile
    sketch (the registered query keeps it deterministic for the
    oracle).
    """
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(_z_sql("{li}", "DIV"), li=li)


# --- 2D skyline (Pareto frontier) ------------------------------------
# Classic OLAP operator (Borzsony, Kossmann & Stocker 2001, "The
# Skyline Operator") the reference has no analogue for: return every
# part not DOMINATED on (retail price, size) — no other part is <= on
# both attributes and strictly < on at least one. The textbook
# distributed form is sort-filter-skyline: after sorting by price, a
# point is on the skyline iff its size is strictly below the minimum
# size of every strictly-cheaper point — a prefix-min, which at scale
# is computed hierarchically (per-range partial mins + a tiny
# boundary combine), never as one unpartitioned global window.

_SKY_BUCKETS = 64

_SKY_SQL = """
    WITH pm AS (
      SELECT p_retailprice AS price, MIN(p_size) AS msize
      FROM part GROUP BY 1
    ),
    w AS (
      SELECT price, msize,
             MIN(msize) OVER (
               ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prior_min
      FROM pm
    )
    SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
    FROM part p JOIN w ON w.price = p.p_retailprice
    WHERE p.p_size = w.msize
      AND (w.prior_min IS NULL OR w.prior_min > p.p_size)
    ORDER BY price, p.p_partkey
"""


@register(
    "skyline_pareto_parts",
    _SKY_SQL,
    doc="2D skyline / Pareto frontier over parts on (retail price, "
    "size): strict-dominance filter via the sort-filter-skyline "
    "prefix-min, computed hierarchically (per-price min -> "
    f"{_SKY_BUCKETS} range-bucket partial mins -> tiny boundary "
    "combine) so no data-scale frame is ever a single unpartitioned "
    "window (Borzsony-Kossmann-Stocker 2001; extension).",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_partkey, price, size) for every non-dominated part.

    Scale shape: the prefix "min size over all strictly-cheaper
    prices" is a distributed prefix-scan, NOT a global sort window:

    1. per-price min size — one map-side-combinable groupBy;
    2. prices hashed into range buckets off a broadcast 1-row
       min/max aggregate (same scalar-bounds pattern as the z-order
       layout pass);
    3. per-bucket partial mins — a second tiny groupBy whose output
       is <= _SKY_BUCKETS rows, so the strictly-prior-bucket
       cumulative min runs on a metadata-scale frame (the only sort
       window in the plan, bounded by the bucket count, never by the
       data);
    4. each price's prefix min = min(cum-min of all strictly-prior
       buckets [broadcast lookup], running min over the strictly
       smaller prices INSIDE its own bucket — a window partitioned
       by bucket, whose partitions the range bucketing keeps
       balanced).

    A part survives iff its size equals its price's min AND the
    prefix min of strictly-cheaper prices is null-or-larger —
    exactly strict Pareto dominance (ties on both attributes all
    survive, matching the NOT EXISTS formulation). The fact table is
    touched once for the per-price min and once for the final
    survivor join against the distinct-price frame.
    """
    from pyspark.sql import Window

    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    pm = part.groupBy("price").agg(F.min("size").alias("msize"))
    bounds = pm.agg(
        F.min("price").alias("lo"), F.max("price").alias("hi")
    )
    # range bucket off the broadcast scalar bounds; guard hi == lo
    bucketed = pm.crossJoin(broadcast(bounds)).select(
        "price",
        "msize",
        F.least(
            F.floor(
                (F.col("price") - F.col("lo"))
                * _SKY_BUCKETS
                / F.when(
                    F.col("hi") > F.col("lo"), F.col("hi") - F.col("lo")
                ).otherwise(F.lit(1.0))
            ),
            F.lit(_SKY_BUCKETS - 1),
        )
        .cast("int")
        .alias("bkt"),
    )
    bm = bucketed.groupBy("bkt").agg(F.min("msize").alias("bmin"))
    w_bkt = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # <= _SKY_BUCKETS rows: a metadata-scale frame, like the z-order
    # bounds aggregate — the unpartitioned window is bounded by the
    # bucket constant, not the data
    bprior = bm.select(
        "bkt", F.min("bmin").over(w_bkt).alias("bkt_prior")
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixed = (
        bucketed.join(broadcast(bprior), "bkt")
        .withColumn("in_prior", F.min("msize").over(w_in))
        .select(
            "price",
            "msize",
            F.least(
                F.coalesce("bkt_prior", F.lit(2**31)),
                F.coalesce("in_prior", F.lit(2**31)),
            ).alias("prior_raw"),
        )
        .select(
            "price",
            "msize",
            F.when(
                F.col("prior_raw") < 2**31, F.col("prior_raw")
            ).alias("prior_min"),
        )
    )
    return (
        part.join(prefixed, "price")
        .where(
            (F.col("size") == F.col("msize"))
            & (
                F.col("prior_min").isNull()
                | (F.col("prior_min") > F.col("size"))
            )
        )
        .select("p_partkey", "price", "size")
        .orderBy("price", "p_partkey")
    )


# --- KMV (bottom-k) distinct-count sketch ----------------------------
# The third sketch family next to the count-min (frequency) and Bloom
# (membership) sketches: K-Minimum-Values cardinality estimation
# (Bar-Yossef et al. 2002). Hash every key to a uniform [0,1) value
# via the md5 portable-hash contract; the k-th smallest DISTINCT
# hash u_k estimates the cardinality as (k-1)/u_k. The sketch is
# mergeable (union = bottom-k of the concatenated bottom-k sets),
# which is the whole point at 100 TB: per-partition bottom-k partials
# combine in O(k) instead of shuffling every distinct key to one
# reducer.

_KMV_K = 256
_KMV_SALTS = 32
_KMV_SEED = 11
_KMV_SPACE = float(1 << 60)  # matches portable_hash64's 15 hex digits
_KMV_BOUND = round(3.0 / _KMV_K ** 0.5, 6)  # ~3 sigma of 1/sqrt(k-2)

_KMV_SQL = f"""
    WITH d AS (
      SELECT DISTINCT l_returnflag AS flag,
             CAST('0x' || substr(md5('{_KMV_SEED}:' ||
                  CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM lineitem
    ),
    r AS (
      SELECT flag, h,
             ROW_NUMBER() OVER (PARTITION BY flag ORDER BY h) AS rn
      FROM d
    ),
    km AS (
      SELECT flag, COUNT(*) AS nk, MAX(h) AS hk
      FROM r WHERE rn <= {_KMV_K} GROUP BY flag
    ),
    ex AS (SELECT flag, COUNT(*) AS n_exact FROM d GROUP BY flag),
    est AS (
      SELECT e.flag, e.n_exact,
             ROUND(CASE WHEN km.nk < {_KMV_K}
                        THEN CAST(km.nk AS DOUBLE)
                        ELSE {_KMV_K - 1}.0
                             / (CAST(km.hk AS DOUBLE) / {_KMV_SPACE!r})
                   END, 4) AS n_est
      FROM ex e JOIN km ON km.flag = e.flag
    )
    SELECT flag AS l_returnflag, n_exact, n_est,
           ROUND(ABS(n_est - n_exact) / n_exact, 6) AS rel_err,
           ABS(n_est - n_exact) / n_exact <= {_KMV_BOUND!r}
             AS within_bound
    FROM est
    ORDER BY l_returnflag
"""


@register(
    "distinct_kmv_orders",
    _KMV_SQL,
    doc=f"KMV (bottom-{_KMV_K}) distinct-count sketch: per return "
    "flag, estimate the distinct order count from the k-th smallest "
    "md5-uniform hash, exact companion + relative error + 3-sigma "
    "bound check — the mergeable cardinality sketch next to CMS "
    "(frequency) and Bloom (membership) (Bar-Yossef et al. 2002; "
    "extension).",
)
def distinct_kmv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, n_exact, n_est, rel_err, within_bound) per flag.

    Scale shape: the hash is row-local; the distinct pass is a
    map-side-combinable partial dedup on (flag, hash). The bottom-k
    selection is HIERARCHICAL — a first ROW_NUMBER window over
    (flag, hash % {_KMV_SALTS}) salt groups keeps k per salt (every
    sort partition bounded by distinct/{_KMV_SALTS}), a second
    window over the <= {_KMV_SALTS}*k survivors per flag takes the
    global bottom-k — exploiting KMV mergeability (bottom-k of
    bottom-k partials == global bottom-k) so no per-flag sort ever
    sees more than {_KMV_SALTS}*k rows. At 100 TB the same combine
    runs per input partition (an Aggregator holding a k-bounded
    heap); the exact-companion arm disappears and only the k-row
    sketches move. The estimate (k-1)/u_k and the error check are
    exact IEEE ops on both engines.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    hcol = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{_KMV_SEED}:"),
                    F.col("l_orderkey").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    d = (
        li.select(F.col("l_returnflag").alias("flag"), hcol.alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    w1 = Window.partitionBy("flag", F.pmod(F.col("h"), _KMV_SALTS)).orderBy(
        "h"
    )
    w2 = Window.partitionBy("flag").orderBy("h")
    bottom = (
        d.withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= _KMV_K)
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= _KMV_K)
    )
    km = bottom.groupBy("flag").agg(
        F.count(F.lit(1)).alias("nk"), F.max("h").alias("hk")
    )
    ex = d.groupBy("flag").agg(F.count(F.lit(1)).alias("n_exact"))
    est = ex.join(km, "flag").select(
        "flag",
        "n_exact",
        F.round(
            F.when(
                F.col("nk") < _KMV_K, F.col("nk").cast("double")
            ).otherwise(
                F.lit(float(_KMV_K - 1))
                / (F.col("hk").cast("double") / F.lit(_KMV_SPACE))
            ),
            4,
        ).alias("n_est"),
    )
    return est.select(
        F.col("flag").alias("l_returnflag"),
        "n_exact",
        "n_est",
        F.round(
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
        (
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact")
            <= F.lit(_KMV_BOUND)
        ).alias("within_bound"),
    ).orderBy("l_returnflag")


# --- KMV set-operation estimation (theta-sketch algebra) -------------
# The reason production systems keep KMV/theta sketches around is not
# single-set counting but SET ALGEBRA without re-scanning: union,
# intersection, and Jaccard estimates straight from two k-row
# sketches (Dasgupta et al. 2016, the DataSketches theta sketch).
# Sets: distinct order keys carrying an 'A' vs an 'R' return flag.
# Union: bottom-k of the merged sketches (KMV mergeability);
# intersection: common hashes below theta (the union's k-th value),
# scaled by 1/theta.

_KMV2_K = 256

_KMV2_SQL = f"""
    WITH d AS (
      SELECT DISTINCT l_returnflag AS flag,
             CAST('0x' || substr(md5('{_KMV_SEED}:' ||
                  CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    sk AS (
      SELECT flag, h FROM (
        SELECT flag, h,
               ROW_NUMBER() OVER (PARTITION BY flag ORDER BY h) AS rn
        FROM d
      ) WHERE rn <= {_KMV2_K}
    ),
    un AS (
      SELECT h FROM (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM sk)
      ) WHERE rn <= {_KMV2_K}
    ),
    theta AS (
      SELECT MAX(h) AS hk, COUNT(*) AS nk FROM un
    ),
    common AS (
      SELECT COUNT(*) AS nc
      FROM (SELECT h FROM sk WHERE flag = 'A') a
      JOIN (SELECT h FROM sk WHERE flag = 'R') r USING (h),
           theta t
      WHERE a.h <= t.hk
    ),
    exact AS (
      SELECT
        (SELECT COUNT(*) FROM d WHERE flag = 'A') AS n_a,
        (SELECT COUNT(*) FROM d WHERE flag = 'R') AS n_r,
        (SELECT COUNT(DISTINCT h) FROM d) AS n_union,
        (SELECT COUNT(*) FROM
           (SELECT h FROM d WHERE flag = 'A'
            INTERSECT SELECT h FROM d WHERE flag = 'R')) AS n_inter
    )
    SELECT e.n_a, e.n_r, e.n_union, e.n_inter,
           ROUND(CASE WHEN t.nk < {_KMV2_K}
                      THEN CAST(t.nk AS DOUBLE)
                      ELSE {_KMV2_K - 1}.0
                           / (CAST(t.hk AS DOUBLE) / {_KMV_SPACE!r})
                 END, 4) AS union_est,
           ROUND(CAST(c.nc AS DOUBLE)
                 / (CAST(t.hk AS DOUBLE) / {_KMV_SPACE!r}), 4)
             AS inter_est,
           ROUND(CAST(e.n_inter AS DOUBLE) / e.n_union, 6)
             AS jaccard_exact,
           ROUND(CAST(c.nc AS DOUBLE)
                   / (CAST(t.hk AS DOUBLE) / {_KMV_SPACE!r})
                 / (CASE WHEN t.nk < {_KMV2_K}
                         THEN CAST(t.nk AS DOUBLE)
                         ELSE {_KMV2_K - 1}.0
                              / (CAST(t.hk AS DOUBLE) / {_KMV_SPACE!r})
                    END), 6) AS jaccard_est
    FROM exact e, theta t, common c
"""


@register(
    "kmv_set_overlap",
    _KMV2_SQL,
    doc="Theta-sketch set algebra from two bottom-"
    f"{_KMV2_K} KMV sketches ('A' vs 'R' return-flag order-key "
    "sets): union via sketch merge, intersection via common hashes "
    "below theta scaled 1/theta, Jaccard from both — set-operation "
    "cardinalities without re-scanning the fact table, exact "
    "companions alongside (Dasgupta et al. 2016; extension).",
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: exact and sketched |A|, |R|, union, intersection,
    Jaccard.

    Scale shape: after the map-side-combined distinct on (flag,
    hash), EVERYTHING downstream operates on <= 2k sketch rows —
    that is the operational win: the two k-row sketches are what a
    warehouse would persist per partition/day, and union/intersect/
    Jaccard for any pair of partitions then costs O(k log k) with no
    fact-table access. Per-flag bottom-k uses the same hierarchical
    salt-group windows as ``distinct_kmv_orders``; the union sketch,
    theta cut, and common-hash count are metadata-scale joins. The
    exact companions (one distinct + one intersect over the same
    frame) exist only to pin the estimator in the oracle compare.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    hcol = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{_KMV_SEED}:"),
                    F.col("l_orderkey").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    d = (
        li.where(F.col("l_returnflag").isin("A", "R"))
        .select(F.col("l_returnflag").alias("flag"), hcol.alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    w1 = Window.partitionBy("flag", F.pmod(F.col("h"), _KMV_SALTS)).orderBy(
        "h"
    )
    w2 = Window.partitionBy("flag").orderBy("h")
    sk = (
        d.withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= _KMV2_K)
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= _KMV2_K)
        .select("flag", "h")
        .localCheckpoint(eager=False)
    )
    # union sketch: bottom-k of the merged <= 2k distinct hashes —
    # a metadata-scale frame, constant-partitioned window is fine
    wu = Window.partitionBy(F.lit(1)).orderBy("h")
    un = (
        sk.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(wu))
        .where(F.col("rn") <= _KMV2_K)
    )
    theta = un.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("nk"))
    common = (
        sk.where(F.col("flag") == "A")
        .select("h")
        .join(sk.where(F.col("flag") == "R").select("h"), "h")
        .crossJoin(broadcast(theta))
        .where(F.col("h") <= F.col("hk"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    exact = d.agg(
        F.sum(F.when(F.col("flag") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).alias("n_r"),
        F.count_distinct(F.col("h")).alias("n_union"),
    ).crossJoin(
        broadcast(
            d.groupBy("h")
            .agg(F.count_distinct("flag").alias("nf"))
            .where(F.col("nf") == 2)
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    )
    u_theta = F.col("hk").cast("double") / F.lit(_KMV_SPACE)
    union_est = F.when(
        F.col("nk") < _KMV2_K, F.col("nk").cast("double")
    ).otherwise(F.lit(float(_KMV2_K - 1)) / u_theta)
    inter_est = F.col("nc").cast("double") / u_theta
    return (
        exact.crossJoin(broadcast(theta))
        .crossJoin(broadcast(common))
        .select(
            "n_a",
            "n_r",
            "n_union",
            "n_inter",
            F.round(union_est, 4).alias("union_est"),
            F.round(inter_est, 4).alias("inter_est"),
            F.round(
                F.col("n_inter").cast("double") / F.col("n_union"), 6
            ).alias("jaccard_exact"),
            F.round(inter_est / union_est, 6).alias("jaccard_est"),
        )
    )


# --- z-order data-skipping statistics (the layout's payoff) ----------
# `zorder_layout_keys` computes the write layout; this query computes
# WHY it matters: per-file min/max key statistics under the z-range
# file assignment vs a hash (arrival-style) layout, and how many
# files a bottom-quartile predicate on EITHER key can skip. The
# z-range assignment takes the TOP 4 Morton bits (a 4x4 grid over
# both normalized key ranges), which is what a real OPTIMIZE writer
# produces when it range-partitions on zval; the hash layout spreads
# every key range across every file, so its min/max stats prune
# nothing — scan fraction 1.0 vs ~0.25.

_ZS_FILES = 16  # top-4-Morton-bit file grid (4 ranges per key)
_ZS_SHIFT = 1 << (2 * _Z_BITS - 4)  # zval // this = top 4 bits


def _zstat_sql(table: str, idiv: str) -> str:
    return f"""
    WITH z AS ({_z_sql(table, idiv)}),
    mm2 AS (
      SELECT MIN(CAST(l_partkey AS BIGINT)) AS pmin,
             MAX(CAST(l_partkey AS BIGINT)) AS pmax,
             MIN(CAST(l_suppkey AS BIGINT)) AS smin,
             MAX(CAST(l_suppkey AS BIGINT)) AS smax
      FROM {table}
    ),
    pred AS (
      SELECT pmin AS pk_lo, pmin + (pmax - pmin) {idiv} 4 AS pk_hi,
             smin AS sk_lo, smin + (smax - smin) {idiv} 4 AS sk_hi
      FROM mm2
    ),
    lay AS (
      SELECT 'zorder' AS layout, zval {idiv} {_ZS_SHIFT} AS file_id,
             l_partkey, l_suppkey
      FROM z
      UNION ALL
      SELECT 'hash', l_orderkey % {_ZS_FILES}, l_partkey, l_suppkey
      FROM z
    ),
    f AS (
      SELECT layout, file_id, COUNT(*) AS n,
             MIN(l_partkey) AS pkmin, MAX(l_partkey) AS pkmax,
             MIN(l_suppkey) AS skmin, MAX(l_suppkey) AS skmax
      FROM lay GROUP BY layout, file_id
    )
    SELECT layout, COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN f.pkmin > p.pk_hi OR f.pkmax < p.pk_lo
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_skip_pk,
           CAST(SUM(CASE WHEN f.skmin > p.sk_hi OR f.skmax < p.sk_lo
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_skip_sk,
           ROUND(CAST(SUM(CASE WHEN f.pkmin > p.pk_hi
                               OR f.pkmax < p.pk_lo
                               THEN 0 ELSE f.n END) AS DOUBLE)
                 / SUM(f.n), 6) AS pk_scan_frac
    FROM f, pred p
    GROUP BY layout
    ORDER BY layout
    """


@register(
    "zorder_skipping_stats",
    _zstat_sql("lineitem", "//"),
    doc="Data-skipping payoff of the z-order layout: per-file min/max "
    f"key stats under the top-4-Morton-bit {_ZS_FILES}-file z-range "
    "assignment vs a hash layout, files skippable for a bottom-"
    "quartile predicate on EITHER key, and the scan fraction — the "
    "stats-collection pass a lakehouse writer persists next to the "
    "layout (extension).",
)
def zorder_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(layout, n_files, n_skip_pk, n_skip_sk, pk_scan_frac) for the
    z-range vs hash file assignments.

    Scale shape: the z-key subquery is the zorder_layout_keys plan
    (one broadcast scalar bounds aggregate, then row-local shifts);
    the per-file stats are a {files}-group map-side-combined
    aggregate per layout — the shuffle carries file-granularity
    stat rows, never data rows — and the skip classification joins
    those few rows against the 1-row predicate bounds. This is
    exactly the manifest-statistics pass of table maintenance: at
    100 TB the `f` frame IS the file manifest, and the query shows
    min/max pruning going from useless (hash layout, scan 100%) to
    ~quarter-scan on both keys at once (z-range layout).
    """.replace("{files}", str(_ZS_FILES))
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(_zstat_sql("{li}", "DIV"), li=li)
