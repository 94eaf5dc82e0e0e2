"""Python replays for the OLAP/analytic-window queries."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_price_change_analysis_window_replay(spark):
    """LAG / integer-ppm percent-rank / NTILE replayed in Python from
    the (part, month) revenue rollup."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import price_change_analysis

    rows = price_change_analysis(spark, SF_SMOKE).collect()
    got = {(r.part_key, r.periodo): r for r in rows}

    # independent rollup (rounded the same way)
    li = load(spark, SF_SMOKE, "lineitem")
    monthly = (
        li.groupBy(
            F.col("l_partkey").alias("pk"),
            F.date_format("l_shipdate", "yyyy-MM").alias("per"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(28,10)")
                ).cast("double"),
                2,
            ).alias("price"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    by_part = defaultdict(dict)
    by_month = defaultdict(list)
    for r in monthly:
        by_part[r.pk][r.per] = r.price
        by_month[r.per].append((r.price, r.pk))

    for r in monthly:
        g = got[(r.pk, r.per)]
        assert g.price == r.price and g.n_sales == r.n
        # LAG by period order within the part
        pers = sorted(by_part[r.pk])
        idx = pers.index(r.per)
        prev = by_part[r.pk][pers[idx - 1]] if idx else None
        assert g.prev_price == prev
        exp_change = round(r.price - (prev if prev is not None else r.price), 2)
        assert abs(g.mom_change - exp_change) < 1e-9
        # integer-ppm percent rank over (price, part) in the month
        month = sorted(by_month[r.per])
        n = len(month)
        rk = month.index((r.price, r.pk)) + 1
        exp_ppm = ((rk - 1) * 1_000_000) // (n - 1) if n > 1 else 0
        assert g.pct_rank_ppm == exp_ppm
        # NTILE(4): equal buckets, remainder to the first buckets
        base, rem = divmod(n, 4)
        bounds, pos = [], 0
        for b in range(4):
            pos += base + (1 if b < rem else 0)
            bounds.append(pos)
        exp_q = next(b + 1 for b, e in enumerate(bounds) if rk <= e)
        assert g.price_quartile == exp_q


def test_grouping_sets_revenue_set_structure(spark):
    """Exactly the three hand-picked sets appear, and the marginals
    are consistent: status marginals sum to the grand total, which
    equals the full orders rowcount."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.queries import grouping_sets_revenue

    rows = grouping_sets_revenue(spark, SF_SMOKE).collect()
    by_g = defaultdict(list)
    for r in rows:
        by_g[(r.g_ano, r.g_situacao)].append(r)
    # sets: (year,status) detail, status-only, grand total — and NO
    # year-only marginal (that would be (0, 1))
    assert set(by_g) == {(0, 0), (1, 0), (1, 1)}
    assert len(by_g[(1, 1)]) == 1
    grand = by_g[(1, 1)][0]
    n_orders = load(spark, SF_SMOKE, "orders").count()
    assert grand.n == n_orders
    assert sum(r.n for r in by_g[(1, 0)]) == grand.n
    assert sum(r.n for r in by_g[(0, 0)]) == grand.n
    # subtotal rows carry NULL for the rolled-up key; detail rows don't
    assert all(r.ano is None for r in by_g[(1, 0)])
    assert all(r.ano is not None and r.situacao is not None
               for r in by_g[(0, 0)])


def test_nation_market_share_invariants(spark):
    """Share is the quotient of the emitted sums; the measured
    nation's volume never exceeds the total."""
    from autosinapi_spark.plans.olap_queries import nation_market_share

    rows = nation_market_share(spark, SF_SMOKE).collect()
    assert rows, "market-share query returned no years"
    years = [r.ano for r in rows]
    assert years == sorted(years)
    for r in rows:
        assert 0.0 <= r.nation_volume <= r.total_volume
        assert 0.0 <= r.mkt_share <= 1.0
        # rounded-sum quotient tracks the emitted exact-sum quotient
        # to well inside the scale-2 rounding of the operands
        assert abs(r.mkt_share - r.nation_volume / r.total_volume) < 1e-4
