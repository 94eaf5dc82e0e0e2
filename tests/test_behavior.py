"""Python replays for the cohort-retention and funnel queries."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from tests.conftest import SF_SMOKE


def _events(spark):
    from autosinapi_spark.catalog import load

    return (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )


def test_user_retention_cohorts_python_replay(spark):
    from autosinapi_spark.plans.behavior_queries import (
        user_retention_cohorts,
    )

    rows = user_retention_cohorts(spark, SF_SMOKE).collect()
    got = {(r.cohort_day, r.day_offset): r for r in rows}
    assert len(got) == len(rows)  # (cohort, offset) cells unique

    act = {(r.user_id, r.ts.date()) for r in _events(spark)}
    first = {}
    for u, d in act:
        if u not in first or d < first[u]:
            first[u] = d
    cells = defaultdict(set)
    for u, d in act:
        cells[(first[u], (d - first[u]).days)].add(u)
    sizes = defaultdict(int)
    for u, c in first.items():
        sizes[c] += 1

    assert set(got) == set(cells)
    for key, users in cells.items():
        r = got[key]
        assert r.n_users == len(users)
        assert r.cohort_size == sizes[key[0]]
        assert r.retention_ppm == (len(users) * 1_000_000) // sizes[key[0]]
    # offset-0 cell is the full cohort by construction
    for c, sz in sizes.items():
        assert got[(c, 0)].n_users == sz


def test_funnel_conversion_python_replay(spark):
    from autosinapi_spark.plans.behavior_queries import (
        _FUNNEL,
        _FUNNEL_WINDOW_H,
        funnel_conversion,
    )

    rows = sorted(
        funnel_conversion(spark, SF_SMOKE).collect(),
        key=lambda r: r.step_no,
    )
    assert [r.step for r in rows] == list(_FUNNEL)

    by_user = defaultdict(list)
    for r in _events(spark):
        if r.event_type in _FUNNEL:
            by_user[r.user_id].append((r.ts, r.event_type))
    win = timedelta(hours=_FUNNEL_WINDOW_H)
    n = [0, 0, 0]
    for evs in by_user.values():
        t1 = min((t for t, e in evs if e == _FUNNEL[0]), default=None)
        if t1 is None:
            continue
        n[0] += 1
        t2 = min(
            (t for t, e in evs
             if e == _FUNNEL[1] and t1 < t <= t1 + win),
            default=None,
        )
        if t2 is None:
            continue
        n[1] += 1
        if any(
            e == _FUNNEL[2] and t2 < t <= t2 + win for t, e in evs
        ):
            n[2] += 1

    assert [r.n_users for r in rows] == n
    assert n[0] >= n[1] >= n[2]  # funnel monotonicity
    for r in rows:
        assert r.conv_ppm == (r.n_users * 1_000_000) // n[0]
    assert rows[0].conv_ppm == 1_000_000


def test_rolling_active_users_python_replay(spark):
    from datetime import timedelta

    from autosinapi_spark.plans.behavior_queries import (
        _WAU_DAYS,
        rolling_active_users,
    )

    rows = rolling_active_users(spark, SF_SMOKE).collect()
    got = {r.dia: (r.dau, r[f"wau{_WAU_DAYS}"]) for r in rows}

    act = {
        (r.user_id, r.ts.date())
        for r in _events(spark)
    }
    days = sorted({d for (_u, d) in act})
    for d in days:
        dau = len({u for (u, dd) in act if dd == d})
        wau = len(
            {
                u
                for (u, dd) in act
                if d - timedelta(days=_WAU_DAYS - 1) <= dd <= d
            }
        )
        assert got[d] == (dau, wau), d
    assert set(got) == set(days)
    # trailing window dominates the day itself
    assert all(w >= u for (u, w) in got.values())


def test_event_transition_matrix_python_replay(spark):
    """LEAD pairing + ppm normalization replayed in Python."""
    from collections import Counter, defaultdict

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.behavior_queries import (
        event_transition_matrix,
    )

    rows = event_transition_matrix(spark, SF_SMOKE).collect()
    got = {(r.event_type, r.next_type): (r.n, r.prob_ppm) for r in rows}

    ev = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    pairs = Counter()
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in pairs.items():
        row_tot[a] += n
    exp = {
        k: (n, n * 1_000_000 // row_tot[k[0]]) for k, n in pairs.items()
    }
    assert got == exp and got
    # each row of the matrix sums to ~1e6 (truncation undershoots by
    # at most the number of entries in the row)
    by_row = defaultdict(int)
    ents = defaultdict(int)
    for (a, _), (_, ppm) in got.items():
        by_row[a] += ppm
        ents[a] += 1
    for a, tot in by_row.items():
        assert 1_000_000 - ents[a] <= tot <= 1_000_000
