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


# Repo-defined code lives under these module prefixes; helper
# traversal stops at anything else (pyspark, stdlib, site-packages).
_PKG_PREFIXES: tuple[str, ...] = ("autosinapi_spark", "__spark_entry__")
# Helper-of-helper chains in this repo are shallow (plan fn -> module
# helper -> functions/ or plans/registry primitive); 3 levels covers
# them with a cycle guard for safety.
_HELPER_DEPTH = 3


def _code_names(code) -> set[str]:
    """All global names referenced by a code object, including inside
    nested code objects (lambdas, comprehensions, inner defs)."""
    import types

    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return names


def _helper_sources(fn, _seen=None, _depth=0) -> list[str]:
    """Sources of repo-defined functions/classes reachable from fn's
    referenced globals, recursively (bounded). This closes the r9
    blind spot: editing a shared Python helper (functions/vectors.py,
    plans/registry.dsum, a module-level _twin_corpus) now changes the
    fingerprint of every registered query whose plan function calls
    it, so rotation_check promotes the callers mechanically instead
    of relying on a hand promotion."""
    import types

    if _seen is None:
        _seen = set()
    code = getattr(fn, "__code__", None)
    g = getattr(fn, "__globals__", None)
    if code is None or g is None:
        return []
    names = _code_names(code)

    candidates = []
    for n in sorted(names):
        obj = g.get(n)
        if obj is None:
            continue
        if isinstance(obj, types.ModuleType):
            # attribute-style helper use (import m; m.helper(...)):
            # co_names carries both the module alias and the attr
            # names, so resolve every referenced name against every
            # repo module in scope. Over-approximates on name
            # collisions, which only makes fingerprints MORE
            # sensitive — never less.
            if getattr(obj, "__name__", "").startswith(_PKG_PREFIXES):
                for a in sorted(names):
                    attr = getattr(obj, a, None)
                    if attr is not None:
                        candidates.append(attr)
            continue
        candidates.append(obj)

    out: list[str] = []
    for obj in candidates:
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        mod = getattr(obj, "__module__", "") or ""
        if not mod.startswith(_PKG_PREFIXES):
            continue
        key = (mod, getattr(obj, "__qualname__", repr(obj)))
        if key in _seen:
            continue
        _seen.add(key)
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            continue
        out.append(f"{mod}.{key[1]}\x01{src}")
        if _depth < _HELPER_DEPTH and inspect.isfunction(obj):
            out.extend(_helper_sources(obj, _seen, _depth + 1))
    return out


def spec_fingerprint(oracle: str | None, fn) -> str:
    """Hash of (oracle SQL, plan fn source, reachable repo helper
    sources). Oracle text covers shared SQL helpers (sql_dsum/
    sql_davg expand into it); fn source covers Spark-side edits;
    the helper closure covers shared Python helpers.

    Deliberate consequence: editing a helper that feeds more than
    WINDOW queries (register, dsum, catalog.load, ...) re-fingerprints
    ALL its callers and over-commits the window — which is honest
    (they all genuinely need a recheck) but cannot be satisfied in one
    round. Handle it explicitly: stage the refresh across rounds via
    window_plan's tail (dropped mandatory rows lead it), or, for a
    provably behavior-neutral edit, regenerate the snapshot at a
    0-changed baseline and say so in the commit message."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = ""
    helpers = "\x00".join(sorted(_helper_sources(fn)))
    payload = (oracle or "") + "\x00" + src + "\x00" + helpers
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def fingerprints() -> dict[str, str]:
    """name -> spec_fingerprint for every registered query."""
    import __spark_entry__ as e

    return {
        name: spec_fingerprint(spec.oracle, spec.fn)
        for name, spec in e._registry().items()
    }


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
