"""Benchmark harness — times every registered query at the bench SF.

Run: ``python bench.py`` (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
Prints exactly ONE JSON line on stdout:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is materialized end-to-end through the ``noop`` sink
(executes the full physical plan on the executors without collecting
rows to the driver), which is the honest distributed cost — a
``.count()`` would let Catalyst prune the plan to a metadata scan for
some shapes.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _release_persistent(spark) -> None:
    """Release leftover persistent/localCheckpoint RDD blocks after a
    timed run completes (called OUTSIDE the timed region, after every
    run — repeats included, not just between queries).

    gc.collect() alone is NOT enough: the py4j detach only queues the
    JVM-side release, and the ContextCleaner's weak refs fire only
    after a JVM GC that a lightly-allocating driver may not run for
    minutes — measured (r14): 4 triangle runs left 8 persistent RDDs /
    781 MB of checkpoint blocks that survived gc.collect(), and a
    no-cleanup session stalled a 5s query (and its control) for
    100-200s on the accumulated pressure.

    Running it between REPEATS of one query (new in r15, closing the
    r14 verdict's warm-cache wrinkle) additionally drops any
    InMemoryRelation a query's internal .cache() created, so Spark's
    CacheManager cannot substitute run 1's cached data into run 2..n
    of the identical plan — min-of-n is a cold number for every row
    (affected rows: the bom/cluster-resolution/jsonl-source families,
    each <=~1s warmer before this fix).

    NOTE: the async release can race a straggler task completion from
    the just-finished query (DAGScheduler logs a benign
    accessNonExistentAccumulator ERROR stack to stderr when the task
    reports into an already-unregistered accumulator). Cosmetic only:
    results, timings, and exit codes are unaffected — the task already
    delivered its data; only its metric update has nowhere to land.
    """
    gc.collect()
    try:
        # Drop CacheManager entries FIRST: a query-internal .persist()/
        # .cache() registers an InMemoryRelation keyed on the logical
        # plan, and a later identical plan (the next repeat) would be
        # silently substituted with it — clearCache() removes the
        # entries AND unpersists their blocks, so every repeat
        # recomputes from the parquet inputs.
        spark.catalog.clearCache()
        # localCheckpoint RDDs are NOT in the CacheManager; release
        # them explicitly as before.
        jm = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jm.values()):
            rdd.unpersist(False)
    except Exception:  # cleanup must never kill the bench
        pass


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from autosinapi_spark.session import get_spark

    spark = get_spark(app_name="autosinapi_spark_bench")

    # JVM/codegen warm-up so the first measured query isn't charged
    # for class-loading; one tiny end-to-end job.
    t0 = time.perf_counter()
    _materialize(entrymod.entry(spark))
    warmup = time.perf_counter() - t0

    # Min-of-N per query: this box is shared, and co-tenant load has
    # been observed to inflate single-run walls 2-4x with identical
    # plans (r6's artifact showed phantom 3-4x regressions that
    # min-of-3 re-measurement disproved). The min is the honest cost
    # of the plan; repeats are capped for slow queries so the suite
    # stays inside the driver's budget, and per-query n_runs + 1-min
    # load are emitted so contaminated rows are identifiable.
    timings: dict[str, float] = {}
    runs: dict[str, int] = {}
    loads: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        loads[name] = round(os.getloadavg()[0], 2)
        t0 = time.perf_counter()
        try:
            _materialize(fn(spark, sf_dir))
        except Exception as exc:  # a broken query must not kill the bench
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            # query_runs counts SUCCESSFUL runs; zero succeeded here
            runs[name] = 0
            _release_persistent(spark)
            continue
        best = time.perf_counter() - t0
        _release_persistent(spark)
        # Repeat budget (retuned late r9): min-of-3 only for sub-2s
        # queries, where per-run overhead noise dominates the signal;
        # min-of-2 through 30s. At 188 registered queries the old
        # <=10s -> 3-run rule put the suite's true wall at ~931s
        # (sum n_i*t_i = 806s measured) — uncomfortably past the
        # ~790s the r8 bench ran inside the driver's budget; this
        # profile lands ~780s with query_runs still emitted per row.
        n = 3 if best <= 2.0 else (2 if best <= 30.0 else 1)
        samples = [best]
        for _ in range(n - 1):
            t0 = time.perf_counter()
            try:
                _materialize(fn(spark, sf_dir))
            except Exception as exc:  # flaky repeat: keep best good run
                print(f"bench: {name} repeat FAILED: {exc}", file=sys.stderr)
                _release_persistent(spark)
                continue
            samples.append(time.perf_counter() - t0)
            best = min(best, samples[-1])
            _release_persistent(spark)
        # Adaptive third run (r11): the first run of a query after
        # another query's eviction pressure is reproducibly 1.5-3x its
        # warm floor, so min-of-2 keeps one cold-adjacent sample often
        # — the source of every phantom "drift" r9-r11 re-measured and
        # disproved. When the two samples disagree the pair is telling
        # us one of them is contaminated: spend ONE more run on exactly
        # those rows (measured ~5-15 rows/suite, ~30-90s) instead of
        # min-of-3 everywhere (~+150s, the r9 budget problem).
        if n == 2 and len(samples) == 2 and max(samples) > 1.3 * best:
            t0 = time.perf_counter()
            try:
                _materialize(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
                best = min(best, samples[-1])
            except Exception as exc:
                print(f"bench: {name} repeat FAILED: {exc}", file=sys.stderr)
            _release_persistent(spark)
        timings[name] = round(best, 3)
        # Record SUCCESSFUL runs, not the planned budget: when a repeat
        # throws, the row got fewer samples than planned, and
        # bench_diff.py's query_runs-equal filter must see the budget
        # the measurement actually received (r11 ADVICE).
        runs[name] = len(samples)

    ok = {k: v for k, v in timings.items() if v >= 0}
    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "n_queries": len(timings),
        "n_failed": len(timings) - len(ok),
        "warmup_sec": round(warmup, 3),
        # per-query measurement conditions: seconds are min-of-n_runs
        # (n capped by first-run wall so the suite stays bounded;
        # n=3 on a 2-30s row means the adaptive disagreement run
        # fired — treat its delta vs a min-of-2 round as budget-
        # changed, which bench_diff.py does);
        # query_load_1m is the 1-min load average sampled just before
        # each query — read any residual swing against it.
        "query_runs": runs,
        "query_load_1m": loads,
        "load_avg_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))
    # The driver archives only the last ~2000 chars of stdout and
    # parses the LAST JSON line it finds there; the full line above
    # outgrew that in r7 (its artifact showed "parsed: null"). The r14
    # verdict asked for the final line to carry the per-query dict —
    # but the FULL 204-entry dict is 5757 chars at 2-decimal precision
    # (4133 chars of query names alone), so it physically cannot fit a
    # 2000-char tail under ANY serialization that keeps the real query
    # names. Compromise (r15): the final line now carries a `queries`
    # key (the name the driver's per-query machinery reads) with as
    # many entries as fit, slowest-first — the rows that matter for
    # round-over-round optimization diffs — plus `queries_in_line` so
    # a reader can tell line truncation from dropped queries
    # (`n_queries` stays the true registry count; every registered
    # query is still benched and the full dict is in the line above
    # and in the committed bench_per_query artifact).
    print(compact_summary(out, ok, timings))
    _write_per_query_artifact(out)
    return 0 if len(ok) == len(timings) else 1


def _write_per_query_artifact(out: dict) -> None:
    """Persist the FULL per-query record to the repo so round-over-round
    diffs survive the driver's 2000-char stdout tail (the r10 verdict
    could not compute a full 189-query regression diff from BENCH_r10
    alone). Named bench_per_query_r{N}.json where N defaults to the
    round the next driver snapshot will get (max existing BENCH_r* + 1);
    override with SPARK_GRAFT_ROUND. Committed at round close; diff two
    rounds with one jq over .queries, reading only query_runs-equal
    rows (README drift rule)."""
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if not rnd:
        seen = [
            int(m.group(1))
            for p in Path(_REPO).glob("BENCH_r*.json")
            if (m := re.match(r"BENCH_r(\d+)\.json", p.name))
        ]
        rnd = str(max(seen, default=0) + 1)
    path = Path(_REPO) / f"bench_per_query_r{int(rnd):02d}.json"
    try:
        path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    except OSError as exc:  # never let the artifact kill the bench line
        print(f"bench: artifact write failed: {exc}", file=sys.stderr)


def compact_summary(
    out: dict, ok: dict[str, float], timings: dict[str, float]
) -> str:
    """The final self-describing stdout line, HARD-CAPPED at 1900
    chars: the driver's tail capture keeps exactly 2000 (measured
    across BENCH_r02..r14), and a line that outgrows it reproduces the
    r7 truncation (the artifact showed "parsed: null"). Per the r14
    verdict's ask #2, the line carries a `queries` dict — as many
    entries as fit, SLOWEST first (the full 204-name dict is ~5.8k
    chars and cannot fit; `queries_in_line` marks the truncation) —
    shrinking until the serialized line fits; preflight exercises this
    against a worst-case registry so growth can't re-truncate
    unnoticed."""
    failed = sorted(k for k, v in timings.items() if v < 0)
    by_cost = sorted(ok.items(), key=lambda kv: -kv[1])
    for top_n in range(len(by_cost), -1, -1):
        queries = {k: v for k, v in by_cost[:top_n]}
        summary = {
            "metric": "total_query_wall_sec",
            "value": out["value"],
            "unit": "sec",
            "sf": out["sf"],
            "n_queries": out["n_queries"],
            "n_failed": out["n_failed"],
            "warmup_sec": out["warmup_sec"],
            "load_avg_1m": out["load_avg_1m"],
            "queries": queries,
            "queries_in_line": len(queries),
            "failed": failed[: max(1, top_n)],
        }
        line = json.dumps(summary)
        if len(line) <= 1900:
            return line
    return line  # 0-entry lists: structurally bounded well under cap


if __name__ == "__main__":
    sys.exit(main())
