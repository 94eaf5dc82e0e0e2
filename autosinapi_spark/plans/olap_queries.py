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
        F.round(F.col("s").cast("double"), 2).alias("receita"),
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
