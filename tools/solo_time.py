"""Solo per-query timing through the noop sink (guide §1.4).

Usage: python tools/solo_time.py <query> [query ...] [--n N]

Times each named query in ONE engine session (bench-identical
methodology: wall = plan construction + noop materialization), printing
every sample plus the min. A tiny warm-up job runs first so the first
query is not charged for JVM/codegen warm-up. The 1-min load average is
printed per sample so contaminated runs are identifiable.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1]) if "=" in a else n
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from autosinapi_spark.session import get_spark

    spark = get_spark(app_name="solo_time")
    t0 = time.perf_counter()
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    print(f"warmup {time.perf_counter() - t0:.2f}s")

    qs = entrymod.queries()
    for name in args:
        fn = qs[name]
        samples = []
        for _ in range(n):
            load1 = os.getloadavg()[0]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
            print(f"  {name}: {samples[-1]:.3f}s (load {load1:.2f})")
            # mirror bench.py's checkpoint-block cleanup between runs
            import gc

            gc.collect()
            try:
                jm = spark.sparkContext._jsc.getPersistentRDDs()
                for rdd in list(jm.values()):
                    rdd.unpersist(False)
            except Exception:
                pass
        print(f"{name}: min {min(samples):.3f}s of {samples}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
