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
