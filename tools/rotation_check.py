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
    n_changed = sum(1 for n, h in cur.items() if snap.get(n) != h)
    print(
        f"rotation: ok — {n_changed} changed/new queries, all inside "
        f"the first-{WINDOW} window"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
