"""Invariants of tools/window_plan.py against the real repo state:
the proposal must satisfy exactly the two rules rotation_check.py
enforces (changed/new in-window, overdue in-window) and keep the
tail oldest-green-first so the pool head is always next round's
natural fill. Pure Python — reads the registry and the CORRECTNESS
artifacts, no Spark session."""

from __future__ import annotations

from tools.rotation_check import (
    WINDOW,
    fingerprints,
    last_greens,
    stale_bound,
)
from tools.window_plan import plan


def test_partition_is_exact():
    window, tail = plan()
    names = [n for n, _ in window] + [n for n, _ in tail]
    assert len(names) == len(set(names)), "duplicate names in plan"
    assert set(names) == set(fingerprints()), "plan must cover registry"
    assert len(window) == min(WINDOW, len(names))


def test_mandatory_rows_are_in_window():
    window, _ = plan()
    in_window = {n for n, _ in window}
    last, latest = last_greens()
    cur = fingerprints()
    bound = stale_bound(len(cur))
    never = {n for n in cur if n not in last}
    overdue = {
        n for n in cur if last.get(n, -(10**9)) <= latest - bound
    }
    mandatory = never | overdue
    # the plan can only fail this if mandatory rows alone exceed the
    # window — in which case main() prints the over-commit warning
    if len(mandatory) <= WINDOW:
        assert mandatory <= in_window


def test_overcommit_keeps_dropped_mandatory_rows_visible(monkeypatch):
    """r9 advice finding: with > WINDOW mandatory rows, the truncated
    window must not silently drop the overflow — they must appear in
    the tail (so --emit still covers the registry) and cohorts() must
    report the true pre-truncation mandatory count."""
    import tools.window_plan as wp

    names = [f"q{i:03d}" for i in range(WINDOW + 20)]
    fps = {n: f"fp-{n}" for n in names}
    # half the registry changed code, the other half never green:
    # mandatory = all of them > WINDOW
    last = {n: 9 for n in names[: WINDOW + 10]}
    monkeypatch.setattr(wp, "fingerprints", lambda: fps)
    monkeypatch.setattr(wp, "last_greens", lambda: (last, 9))
    monkeypatch.setattr(wp, "stale_bound", lambda n: 4)

    class _Snap:
        @staticmethod
        def exists():
            return True

        @staticmethod
        def read_text():
            import json

            # every green row's snapshot fingerprint mismatches
            return json.dumps({n: "stale" for n in last})

    monkeypatch.setattr(wp, "SNAP", _Snap)

    never, changed, overdue, fresh = wp.cohorts()
    assert len(never) + len(changed) + len(overdue) > WINDOW

    window, tail = wp.plan()
    assert len(window) == WINDOW
    all_names = [n for n, _ in window] + [n for n, _ in tail]
    assert sorted(all_names) == sorted(names), (
        "over-committed mandatory rows must not vanish from the plan"
    )
    # the dropped changed-code rows lead the tail (never-green ages
    # sort before any green round)
    dropped = set(names) - {n for n, _ in window}
    assert dropped <= {n for n, _ in tail}


def test_cohort_order_and_tail_age():
    window, tail = plan()
    rank = {
        "never-green": 0,
        "changed-code": 1,
        "overdue": 2,
        "due-next": 3,
        "stale fill": 4,
    }
    seen = [rank[c.split(" (")[0]] for _, c in window]
    assert seen == sorted(seen), "cohorts must be contiguous, in order"

    last, _ = last_greens()
    ages = [last.get(n, -(10**9)) for n, _ in tail]
    assert ages == sorted(ages), "tail must be oldest green first"
