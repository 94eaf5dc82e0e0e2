"""Capture .explain('formatted') for registered queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [--exec] [query ...]
  suffix: 'before' or 'after' (file name tag)
  --exec: materialize through the noop sink FIRST, so the captured
          AdaptiveSparkPlan is the runtime-final one
          (isFinalPlan=true). Without it the initial AQE plan is
          captured, which still shows ENSURE_REQUIREMENTS exchanges
          that AQE elides at runtime (e.g. above a cached frame whose
          partitioning is only known once the cache is built).
  query:  optional subset; default = every registered query.
  round dir: $SPARK_GRAFT_PLANS_ROUND (default r15).

Writes plans/r14/<query>_<suffix>.txt and prints a one-line red-flag
summary per query: #Exchange, join strategies, Python-eval nodes,
cartesian products, and whether the scan shows PushedFilters.
"""

from __future__ import annotations

import os
import re
import sys
import traceback
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    do_exec = "--exec" in names
    names = [n for n in names if n != "--exec"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from autosinapi_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    out_dir = Path(_REPO) / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)

    qs = entrymod.queries()
    if names:
        qs = {n: qs[n] for n in names}

    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            if do_exec:
                df.write.format("noop").mode("overwrite").save()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if do_exec:
                # mirror the bench's between-query cleanup so one
                # query's persisted frames don't linger into the next
                import gc

                gc.collect()
                spark.catalog.clearCache()
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist(False)
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(
                re.findall(
                    r"\b(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                    plan,
                )
            )
        )
        pyeval = sorted(
            set(
                re.findall(
                    r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                    r"FlatMapGroupsInPandas|MapInPandas)\b",
                    plan,
                )
            )
        )
        has_push = bool(re.search(r"PushedFilters: \[[^\]]", plan))
        print(
            f"{name}: Exchange={n_ex} joins={','.join(joins) or '-'} "
            f"pyeval={','.join(pyeval) or '-'} pushed={has_push}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
