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
    # parse --n=N and --n N (the bare-N form used to fall through as a
    # query name and crash at qs[name] — r14 ADVICE); any other
    # unknown flag is a hard error instead of a silent no-op
    argv = sys.argv[1:]
    args: list[str] = []
    n = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--n"):
            if "=" in a:
                n = int(a.split("=", 1)[1])
            else:
                i += 1
                if i >= len(argv):
                    print("usage: solo_time.py <query> [...] [--n N]")
                    return 2
                n = int(argv[i])
        elif a.startswith("--"):
            print(f"unknown flag {a!r}; usage: solo_time.py <query> [...] [--n N]")
            return 2
        else:
            args.append(a)
        i += 1
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
            # mirror bench.py's between-run cleanup: clear CacheManager
            # entries (query-internal .persist()/.cache() must not warm
            # the next repeat) and release localCheckpoint blocks
            import gc

            gc.collect()
            try:
                spark.catalog.clearCache()
                jm = spark.sparkContext._jsc.getPersistentRDDs()
                for rdd in list(jm.values()):
                    rdd.unpersist(False)
            except Exception:
                pass
        print(f"{name}: min {min(samples):.3f}s of {samples}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
