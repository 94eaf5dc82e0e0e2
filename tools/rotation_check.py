"""Mechanical rotation rule for the driver's correctness window.

The round driver verifies only the first ~50 registry entries per
round, so ordering decides which queries get a hard oracle-parity
signal. The rule (adopted after r6, where two queries edited by
commit c3a406e sailed past the window with only a stale r4 green):
any query whose oracle text or plan-function source changed since the
last round's snapshot MUST be inside the first-``WINDOW`` entries of
the prioritized registry order, as must any query that has never had
a driver row.

Usage:
    python tools/rotation_check.py           # check (nonzero on fail)
    python tools/rotation_check.py --write   # refresh the snapshot
                                             # (run at round end, after
                                             # all query edits land)
"""

from __future__ import annotations

import hashlib
import inspect
import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

WINDOW = 50
SNAP = Path(__file__).resolve().parent / "registry_fingerprint.json"


def stale_bound(n_queries: int) -> int:
    """Max allowed rounds since a query's last green.

    Capacity-derived, not aspirational: the driver refreshes at most
    WINDOW queries per round, so N registered queries can only all be
    revisited every ceil(N / WINDOW) rounds — demanding better makes
    the check fail by arithmetic once N > 3 * WINDOW (at 189 queries
    a fixed bound of 3 would require ~63 refresh slots per round from
    r10 on, regardless of ordering). The floor of 3 preserves the
    original rigor while the registry is small.
    """
    return max(3, -(-n_queries // WINDOW))  # ceil division


def last_greens() -> tuple[dict[str, int], int]:
    """(query -> most recent green driver round, latest round seen),
    from the CORRECTNESS_r*.json artifacts at the repo root."""
    import glob

    last: dict[str, int] = {}
    latest = 0
    for f in sorted(glob.glob(str(_REPO / "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        latest = max(latest, rnd)
        for q, row in json.loads(Path(f).read_text()).items():
            # hash_match may be absent (rows-only checks) but an
            # explicit false is a FAILED compare, not a green
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            ):
                last[q] = max(last.get(q, 0), rnd)
    return last, latest


def fingerprints() -> dict[str, str]:
    """name -> hash of (oracle SQL, plan function source).

    Oracle text is the load-bearing half: shared SQL helpers
    (sql_dsum/sql_davg) expand into it, so an edit to a helper
    fingerprints every query whose oracle it feeds. Function source
    catches Spark-side edits. Shared Python helpers called from a fn
    body are the known blind spot — edit one, and its callers keep
    their fingerprint — so helper-level refactors still need a manual
    front-window promotion.
    """
    import __spark_entry__ as e

    out = {}
    for name, spec in e._registry().items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            src = ""
        payload = (spec.oracle or "") + "\x00" + src
        out[name] = hashlib.sha256(payload.encode()).hexdigest()[:16]
    return out


def main() -> int:
    cur = fingerprints()
    if "--write" in sys.argv[1:]:
        SNAP.write_text(json.dumps(cur, indent=0, sort_keys=True) + "\n")
        print(f"rotation: snapshot written ({len(cur)} queries)")
        return 0

    if not SNAP.exists():
        print("rotation: no snapshot yet — run with --write first")
        return 1
    snap = json.loads(SNAP.read_text())

    import __spark_entry__ as e

    order = list(e._registry())
    window = set(order[:WINDOW])
    changed = sorted(
        n for n, h in cur.items() if snap.get(n) != h and n not in window
    )
    if changed:
        print(
            f"rotation: FAIL — {len(changed)} changed/new quer"
            f"{'y is' if len(changed) == 1 else 'ies are'} outside the "
            f"first-{WINDOW} driver window: {', '.join(changed)}"
        )
        return 1
    # staleness bound: any query whose most recent green would be more
    # than stale_bound() rounds old at the NEXT driver check (next
    # round = latest+1, so last_green <= latest - bound) must be in
    # the window now; so must any registered query with no green ever.
    last, latest = last_greens()
    bound = stale_bound(len(cur))
    overdue = sorted(
        n
        for n in cur
        if last.get(n, -(10**9)) <= latest - bound and n not in window
    )
    if overdue:
        print(
            f"rotation: FAIL — {len(overdue)} quer"
            f"{'y' if len(overdue) == 1 else 'ies'} with last green <= "
            f"r{latest - bound} (or never green) outside the "
            f"first-{WINDOW} window: {', '.join(overdue)}"
        )
        return 1
    n_changed = sum(1 for n, h in cur.items() if snap.get(n) != h)
    n_stale_in = sum(
        1
        for n in set(list(cur)) & window
        if last.get(n, -(10**9)) <= latest - bound
    )
    print(
        f"rotation: ok — {n_changed} changed/new queries, all inside "
        f"the first-{WINDOW} window; {n_stale_in} overdue-stale "
        f"(<= r{latest - bound}, bound = {bound}) refreshed in-window"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
