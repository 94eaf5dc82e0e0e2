"""Round-over-round per-query bench diff.

Compares two bench_per_query_r{N}.json artifacts (written by bench.py
at every run) under the README drift rule: a delta is only READABLE
when both rounds measured the query with the same min-of-N budget
(`query_runs`-equal rows); everything else is listed separately so a
repeat-budget change is never mistaken for a plan regression.

Usage:
    python tools/bench_diff.py bench_per_query_r10.json \
        bench_per_query_r11.json [--threshold=1.2]

Prints: added/removed queries, the top regressions and recoveries
among comparable rows (ratio >= threshold), and the incomparable rows
(runs budget changed). Exit 0 always — this is a reading aid, not a
gate; regressions route through the solo min-of-3 protocol (README).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    threshold = 1.2
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1])

    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    qo, qn = old["queries"], new["queries"]
    ro, rn = old.get("query_runs", {}), new.get("query_runs", {})

    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print(f"added ({len(added)}):")
        for n in added:
            print(f"  {n:40s} {qn[n]:6.2f}s")
    if removed:
        print(f"removed ({len(removed)}):")
        for n in removed:
            print(f"  {n:40s} {qo[n]:6.2f}s")

    common = set(qn) & set(qo)
    comparable = sorted(
        n for n in common if ro.get(n) == rn.get(n)
    )
    skipped = sorted(n for n in common if ro.get(n) != rn.get(n))

    def rows(names, flip):
        out = []
        for n in names:
            a, b = qo[n], qn[n]
            if a <= 0 or b <= 0:
                continue
            ratio = (a / b) if flip else (b / a)
            if ratio >= threshold:
                out.append((ratio, n, a, b))
        return sorted(out, reverse=True)

    regs = rows(comparable, flip=False)
    recov = rows(comparable, flip=True)
    print(
        f"\ncomparable rows (query_runs equal): {len(comparable)}; "
        f"budget-changed rows skipped: {len(skipped)}"
    )
    print(f"regressions >= {threshold:.2f}x ({len(regs)}):")
    for ratio, n, a, b in regs:
        print(f"  {n:40s} {a:6.2f}s -> {b:6.2f}s  {ratio:4.2f}x")
    print(f"recoveries >= {threshold:.2f}x ({len(recov)}):")
    for ratio, n, a, b in recov:
        print(f"  {n:40s} {a:6.2f}s -> {b:6.2f}s  {ratio:4.2f}x")
    if skipped:
        print("budget-changed (unreadable deltas):")
        for n in skipped:
            print(
                f"  {n:40s} {qo[n]:6.2f}s (min-of-{ro.get(n)}) -> "
                f"{qn[n]:6.2f}s (min-of-{rn.get(n)})"
            )
    tot_o = sum(qo.values())
    tot_n = sum(qn.values())
    print(
        f"\ntotals: {tot_o:.1f}s ({len(qo)} queries) -> "
        f"{tot_n:.1f}s ({len(qn)} queries); "
        f"load_avg {old.get('load_avg_1m')} -> {new.get('load_avg_1m')}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
