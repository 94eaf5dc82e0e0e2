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


def test_order_priority_late_python_replay(spark):
    """Semi-join EXISTS replayed from raw orders/lineitem rows."""
    from datetime import datetime, timedelta

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q4_FROM,
        _Q4_LATE_DAYS,
        _Q4_TO,
        order_priority_late,
    )

    got = {
        r.o_orderpriority: r.n_orders
        for r in order_priority_late(spark, SF_SMOKE).collect()
    }

    lo = datetime.fromisoformat(_Q4_FROM)
    hi = datetime.fromisoformat(_Q4_TO)
    orders = [
        r
        for r in load(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .collect()
        if lo <= r.o_orderdate < hi
    ]
    ship = defaultdict(list)
    for r in (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        ship[r.l_orderkey].append(r.l_shipdate)
    exp = defaultdict(int)
    late = timedelta(days=_Q4_LATE_DAYS)
    for o in orders:
        if any(s > o.o_orderdate + late for s in ship.get(o.o_orderkey, ())):
            exp[o.o_orderpriority] += 1
    assert got == dict(exp) and got
    # counts are bounded by the quarter's per-priority order totals
    # (a sparse priority class can be entirely late, so <= not <)
    per_prio = defaultdict(int)
    for o in orders:
        per_prio[o.o_orderpriority] += 1
    assert all(got[p] <= per_prio[p] for p in got)
    assert sum(got.values()) < sum(per_prio.values())


def test_customer_order_distribution_python_replay(spark):
    """Q13 double aggregation replayed from raw orders/customer rows."""
    from collections import Counter

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q13_EXCLUDED_PRIO,
        customer_order_distribution,
    )

    rows = customer_order_distribution(spark, SF_SMOKE).collect()
    got = {r.c_count: r.custdist for r in rows}

    per_cust = Counter()
    for r in (
        load(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_orderpriority")
        .collect()
    ):
        if r.o_orderpriority != _Q13_EXCLUDED_PRIO:
            per_cust[r.o_custkey] += 1
    custkeys = [
        r.c_custkey
        for r in load(spark, SF_SMOKE, "customer").select("c_custkey").collect()
    ]
    exp = Counter(per_cust.get(k, 0) for k in custkeys)
    assert got == dict(exp)
    # the distribution covers every customer exactly once
    assert sum(got.values()) == len(custkeys)
    # emitted sorted by custdist desc then c_count desc
    keys = [(r.custdist, r.c_count) for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_large_volume_customers_python_replay(spark):
    """Q18 HAVING-threshold replayed per order from raw lineitem."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q18_MIN_QTY,
        large_volume_customers,
    )

    rows = large_volume_customers(spark, SF_SMOKE).collect()

    qty = defaultdict(float)
    for r in (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_quantity")
        .collect()
    ):
        qty[r.l_orderkey] += r.l_quantity  # integer-valued, exact
    exp_orders = {k for k, v in qty.items() if v > _Q18_MIN_QTY}
    assert {r.o_orderkey for r in rows} == exp_orders
    for r in rows:
        assert r.sum_qty == round(qty[r.o_orderkey], 2)
    # sorted by totalprice desc
    tp = [r.o_totalprice for r in rows]
    assert tp == sorted(tp, reverse=True)


def test_small_qty_order_revenue_python_replay(spark):
    """Q17 decorrelated-average threshold replayed in Python."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q17_BRAND,
        _Q17_MAX_SIZE,
        small_qty_order_revenue,
    )

    row = small_qty_order_revenue(spark, SF_SMOKE).collect()[0]

    keys = {
        r.p_partkey
        for r in load(spark, SF_SMOKE, "part").collect()
        if r.p_brand == _Q17_BRAND and r.p_size < _Q17_MAX_SIZE
    }
    li = [
        r
        for r in load(spark, SF_SMOKE, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .collect()
        if r.l_partkey in keys
    ]
    by_part = defaultdict(list)
    for r in li:
        by_part[r.l_partkey].append(r)
    total, n = 0.0, 0
    for pk, rs in by_part.items():
        avg = sum(x.l_quantity for x in rs) / len(rs)
        for x in rs:
            if x.l_quantity < 0.2 * avg:
                total += x.l_extendedprice
                n += 1
    assert row.n_lines == n
    assert abs(row.avg_yearly - total / 7.0) < 0.02


def test_dormant_rich_customers_python_replay(spark):
    """Q22 broadcast-scalar + anti-join replayed in Python."""
    from datetime import datetime

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q22_CUTOFF,
        dormant_rich_customers,
    )

    rows = dormant_rich_customers(spark, SF_SMOKE).collect()
    got = {r.c_mktsegment: (r.n_cust, r.total_bal) for r in rows}

    cust = load(spark, SF_SMOKE, "customer").collect()
    pos = [c.c_acctbal for c in cust if c.c_acctbal > 0]
    avg_bal = sum(pos) / len(pos)
    cutoff = datetime.fromisoformat(_Q22_CUTOFF)
    recent = {
        r.o_custkey
        for r in load(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_orderdate")
        .collect()
        if r.o_orderdate >= cutoff
    }
    exp = defaultdict(lambda: [0, 0.0])
    for c in cust:
        if c.c_acctbal > avg_bal and c.c_custkey not in recent:
            exp[c.c_mktsegment][0] += 1
            exp[c.c_mktsegment][1] += c.c_acctbal
    assert set(got) == set(exp) and got
    for seg, (n, tot) in exp.items():
        assert got[seg][0] == n
        assert abs(got[seg][1] - round(tot, 2)) < 0.02


def test_top_supplier_revenue_python_replay(spark):
    """Q15 max-revenue supplier replayed from raw lineitem."""
    from datetime import datetime

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q15_FROM,
        _Q15_TO,
        top_supplier_revenue,
    )

    rows = top_supplier_revenue(spark, SF_SMOKE).collect()

    lo, hi = (datetime.fromisoformat(d) for d in (_Q15_FROM, _Q15_TO))
    rev = defaultdict(float)
    for r in (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .collect()
    ):
        if lo <= r.l_shipdate < hi:
            rev[r.l_suppkey] += r.l_extendedprice * (1 - r.l_discount)
    best = max(rev.values())
    winners = {k for k, v in rev.items() if abs(v - best) < 1e-6}
    assert {r.s_suppkey for r in rows} == winners
    for r in rows:
        assert abs(r.total_revenue - rev[r.s_suppkey]) < 0.02
    names = {
        r.s_suppkey: r.s_name
        for r in load(spark, SF_SMOKE, "supplier").collect()
    }
    assert all(r.s_name == names[r.s_suppkey] for r in rows)


def test_bracket_revenue_disjunctive_python_replay(spark):
    """Q19 OR-of-conjuncts replayed row by row."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q19_BRACKETS,
        bracket_revenue_disjunctive,
    )

    row = bracket_revenue_disjunctive(spark, SF_SMOKE).collect()[0]

    parts = {
        r.p_partkey: r for r in load(spark, SF_SMOKE, "part").collect()
    }
    total, n = 0.0, 0
    for r in (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .collect()
    ):
        p = parts[r.l_partkey]
        if any(
            p.p_brand == b and 1 <= p.p_size <= mx and qlo <= r.l_quantity <= qhi
            for b, mx, qlo, qhi in _Q19_BRACKETS
        ):
            total += r.l_extendedprice * (1 - r.l_discount)
            n += 1
    assert row.n_lines == n and n > 0
    assert abs(row.revenue - total) < 0.02


def test_suppliers_kept_waiting_python_replay(spark):
    """Q21 double-EXISTS-as-aggregation replayed from raw rows."""
    from collections import Counter
    from datetime import timedelta

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q21_LATE_DAYS,
        _Q21_TOPN,
        suppliers_kept_waiting,
    )

    rows = suppliers_kept_waiting(spark, SF_SMOKE).collect()

    odate = {
        r.o_orderkey: r.o_orderdate
        for r in load(spark, SF_SMOKE, "orders").collect()
        if r.o_orderstatus == "F"
    }
    late = timedelta(days=_Q21_LATE_DAYS)
    supps, lates = defaultdict(set), defaultdict(set)
    for r in (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .collect()
    ):
        d = odate.get(r.l_orderkey)
        if d is None:
            continue
        supps[r.l_orderkey].add(r.l_suppkey)
        if r.l_shipdate > d + late:
            lates[r.l_orderkey].add(r.l_suppkey)
    numwait = Counter()
    for ok, ss in supps.items():
        if len(ss) > 1 and len(lates[ok]) == 1:
            numwait[next(iter(lates[ok]))] += 1
    exp = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q21_TOPN]
    assert [(r.s_suppkey, r.numwait) for r in rows] == exp and rows


def test_dominant_share_suppliers_python_replay(spark):
    """Q20 stacked aggregates replayed from raw rows."""
    from datetime import datetime

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _Q20_DEN,
        _Q20_FROM,
        _Q20_MAX_SIZE,
        _Q20_NUM,
        _Q20_TO,
        dominant_share_suppliers,
    )

    rows = dominant_share_suppliers(spark, SF_SMOKE).collect()

    keys = {
        r.p_partkey
        for r in load(spark, SF_SMOKE, "part").collect()
        if r.p_size < _Q20_MAX_SIZE
    }
    lo, hi = (datetime.fromisoformat(d) for d in (_Q20_FROM, _Q20_TO))
    sp = defaultdict(float)
    for r in (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
        .collect()
    ):
        if r.l_partkey in keys and lo <= r.l_shipdate < hi:
            sp[(r.l_suppkey, r.l_partkey)] += r.l_quantity
    pt = defaultdict(float)
    for (s, p), q in sp.items():
        pt[p] += q
    qual = {
        s for (s, p), q in sp.items() if q * _Q20_NUM > pt[p] * _Q20_DEN
    }
    assert {r.s_suppkey for r in rows} == qual and rows
    # the threshold must actually exclude someone
    all_supps = {s for s, _ in sp}
    assert qual < all_supps


def test_user_growth_curve_python_replay(spark):
    """First-seen + running-total replayed from raw events."""
    from collections import Counter

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.behavior_queries import user_growth_curve

    rows = user_growth_curve(spark, SF_SMOKE).collect()

    first = {}
    for r in (
        load(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    ):
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        us = int(h.timestamp() * 1_000_000)
        if r.user_id not in first or us < first[r.user_id]:
            first[r.user_id] = us
    hourly = Counter(first.values())
    exp, run = [], 0
    for h in sorted(hourly):
        run += hourly[h]
        exp.append((h, hourly[h], run))
    assert [(r.h_us, r.new_users, r.total_users) for r in rows] == exp
    assert rows[-1].total_users == len(first)


def test_skyline_pareto_brute_force_replay(spark):
    """Skyline must equal the O(n^2) strict-dominance filter."""
    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import skyline_pareto_parts

    got = {
        (r.p_partkey, r.price, r.size)
        for r in skyline_pareto_parts(spark, SF_SMOKE).collect()
    }
    pts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in load(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    want = set()
    for k, p, s in pts:
        dominated = any(
            (p2 <= p and s2 <= s and (p2 < p or s2 < s))
            for _, p2, s2 in pts
        )
        if not dominated:
            want.add((k, p, s))
    assert got == want
    assert got, "skyline must be non-empty"


def test_item_price_ewma_lag_chain_replay(spark):
    """preco_ewma re-derived in Python from the query's own monthly
    means: renormalized 2^-j decay over <= 8 trailing observations."""
    from collections import defaultdict

    from autosinapi_spark.plans.queries import (
        _EWMA_LOOKBACK,
        item_price_ewma,
    )

    rows = item_price_ewma(spark, SF_SMOKE).collect()
    series = defaultdict(list)
    for r in rows:  # already ordered by (item, periodo)
        series[r.item_codigo].append(r)
    assert series
    for hist in series.values():
        means = [r.preco_medio for r in hist]
        for t, r in enumerate(hist):
            lags = means[max(0, t - _EWMA_LOOKBACK + 1) : t + 1][::-1]
            num = sum(m * 2.0**-j for j, m in enumerate(lags))
            den = sum(2.0**-j for j in range(len(lags)))
            assert abs(r.preco_ewma - num / den) < 1e-6, (
                r.item_codigo,
                r.periodo,
            )


def test_distinct_kmv_hashlib_replay(spark):
    """KMV estimate replayed with hashlib bottom-k per flag; both the
    estimator branch and the under-k fallback must match."""
    import hashlib

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _KMV_K,
        _KMV_SEED,
        _KMV_SPACE,
        distinct_kmv_orders,
    )

    got = {r.l_returnflag: r for r in distinct_kmv_orders(spark, SF_SMOKE).collect()}
    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_orderkey"
    ).distinct().collect()
    per_flag = {}
    for r in li:
        h = int(
            hashlib.md5(
                f"{_KMV_SEED}:{r.l_orderkey}".encode()
            ).hexdigest()[:15],
            16,
        )
        per_flag.setdefault(r.l_returnflag, set()).add(h)
    assert set(got) == set(per_flag)
    for flag, hs in per_flag.items():
        bottom = sorted(hs)[:_KMV_K]
        if len(bottom) < _KMV_K:
            est = float(len(bottom))
        else:
            est = (_KMV_K - 1) / (bottom[-1] / _KMV_SPACE)
        r = got[flag]
        assert r.n_exact == len(hs)
        assert abs(r.n_est - round(est, 4)) < 1e-9, flag


def test_kmv_set_overlap_hashlib_replay(spark):
    """Theta-sketch union/intersection replayed with hashlib."""
    import hashlib

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.olap_queries import (
        _KMV2_K,
        _KMV_SEED,
        _KMV_SPACE,
        kmv_set_overlap,
    )

    r = kmv_set_overlap(spark, SF_SMOKE).collect()[0]
    li = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_orderkey")
        .where(F.col("l_returnflag").isin("A", "R"))
        .distinct()
        .collect()
    )
    sets = {"A": set(), "R": set()}
    for row in li:
        h = int(
            hashlib.md5(
                f"{_KMV_SEED}:{row.l_orderkey}".encode()
            ).hexdigest()[:15],
            16,
        )
        sets[row.l_returnflag].add(h)
    a, b = sets["A"], sets["R"]
    assert (r.n_a, r.n_r) == (len(a), len(b))
    assert r.n_union == len(a | b)
    assert r.n_inter == len(a & b)
    ska, skb = sorted(a)[:_KMV2_K], sorted(b)[:_KMV2_K]
    un = sorted(set(ska) | set(skb))[:_KMV2_K]
    theta_h, nk = un[-1], len(un)
    u = theta_h / _KMV_SPACE
    union_est = float(nk) if nk < _KMV2_K else (_KMV2_K - 1) / u
    inter_est = sum(
        1 for h in set(ska) & set(skb) if h <= theta_h
    ) / u
    assert abs(r.union_est - round(union_est, 4)) < 1e-9
    assert abs(r.inter_est - round(inter_est, 4)) < 1e-9


def test_zorder_skipping_beats_hash_layout(spark):
    """The z-range file assignment must actually prune: hash layout
    skips nothing (full scan), z-order skips most files on BOTH keys
    and scans a strict subset."""
    from autosinapi_spark.plans.olap_queries import zorder_skipping_stats

    rows = {
        r.layout: r for r in zorder_skipping_stats(spark, SF_SMOKE).collect()
    }
    h, z = rows["hash"], rows["zorder"]
    assert h.n_skip_pk == 0 and h.n_skip_sk == 0
    assert float(h.pk_scan_frac) == 1.0
    assert z.n_skip_pk > 0 and z.n_skip_sk > 0
    assert float(z.pk_scan_frac) < 1.0
    assert z.n_files <= 16 and h.n_files <= 16
