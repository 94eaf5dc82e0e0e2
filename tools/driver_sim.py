"""Simulate the driver's verify loop against __spark_entry__.

Creates a VANILLA SparkSession (none of the engine's tuned confs, like
the driver will), runs entry() + every queries() entry at the given
sf dir, runs each oracle_sql() in DuckDB over the same parquet, and
compares row count + name-sorted-column value multisets.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# The driver's value hash is ENGINE-TYPE-sensitive: DuckDB widening an
# integer SUM to HUGEINT (int128) hash-mismatches against Spark BIGINT
# even when every value is identical (all six round-5 FAILs). Python-
# value comparison cannot see this, so lint the oracle's planned result
# types instead: anything outside this allowlist is a hard failure.
ALLOWED_DUCK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN",
}

# Type CATEGORIES for the positional spark-vs-oracle check. Width
# differences inside a category (spark int vs oracle BIGINT) are
# empirically safe — dozens of driver-green queries have them (r04/r05
# hash_match=true for bm25_doc_ranking, dedup_lines_c4, tfidf_top_terms,
# cube_revenue, ...). Only a CATEGORY mismatch or a disallowed oracle
# type (HUGEINT et al.) is a hard failure.
_CAT = {
    "bigint": "i", "int": "i", "integer": "i", "smallint": "i",
    "tinyint": "i", "BIGINT": "i", "INTEGER": "i", "SMALLINT": "i",
    "TINYINT": "i",
    "double": "f", "float": "f", "DOUBLE": "f", "FLOAT": "f",
    "string": "s", "VARCHAR": "s",
    "date": "d", "DATE": "d",
    "timestamp": "t", "timestamp_ntz": "t", "TIMESTAMP": "t",
    "boolean": "b", "BOOLEAN": "b",
}


def type_lint(sdtypes, otypes):
    """Return (problems, warnings); problems non-empty = hard failure."""
    problems, warnings = [], []
    cols = [c for c, _ in sdtypes]
    for col, t in zip(cols, otypes):
        if t not in ALLOWED_DUCK_TYPES:
            problems.append(f"oracle col {col!r} has disallowed type {t}")
    if len(sdtypes) == len(otypes):
        for (col, st), ot in zip(sdtypes, otypes):
            sc, oc = _CAT.get(st), _CAT.get(ot)
            canon = {"string": "VARCHAR", "int": "INTEGER",
                     "timestamp_ntz": "TIMESTAMP"}.get(st, st.upper())
            if sc and oc and sc != oc:
                problems.append(f"col {col!r}: spark {st} vs oracle {ot}")
            elif sc and oc and canon != ot:
                warnings.append(f"col {col!r}: width {st}/{ot}")
    return problems, warnings


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # Compare float BITS, not Python ==: the driver hashes
                # representations, and -0.0 == 0.0 is True in Python
                # while their bytes differ (r6's embedding_covariance
                # red row passed this sim under ==). NaN folds to one
                # token since all NaN payloads stringify the same.
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = struct.pack(">d", v).hex()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    argv = [a for a in sys.argv[1:] if a != "--lint"]
    lint_only = "--lint" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
    )
    # Sweep-only escape hatch: the faithful gate stays the vanilla
    # session (env unset), but exploratory sweeps at sf0.1 need more
    # than the default 1g driver heap for broadcast builds.
    mem = os.environ.get("DRIVER_SIM_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fresh_duck():
        # bound DuckDB's footprint and let it SPILL instead of dying:
        # the default in-memory connection has no temp_directory (no
        # out-of-core) and a limit of ~80% of physical RAM — sharing
        # the box with the Spark JVM, a heavy oracle (e.g. the in-SQL
        # power iteration) can then hit a hard OutOfMemoryException
        # that a spill-enabled run absorbs. A FRESH connection per
        # query on top of that: one long-lived connection accumulates
        # buffer-manager state across the whole registry sweep and the
        # 64th query inherits 63 queries of pressure (a full-sweep run
        # died inside embedding_pca_top2's fetchall at the 32GB cap
        # even though the identical standalone query passes) —
        # reconnecting makes every oracle's budget independent, and
        # re-registering ten parquet views costs nothing.
        d = duckdb.connect()
        d.execute("SET temp_directory = '/tmp/duckdb_sim_spill'")
        d.execute("SET memory_limit = '32GB'")
        for t in TABLES:
            d.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        return d

    duck = fresh_duck()

    if not lint_only:
        print("== entry() smoke ==")
        t0 = time.time()
        n = e.entry(spark).count()
        print(f"entry rows={n} ({time.time() - t0:.1f}s)")
        assert n > 0

    qs, oracles = e.queries(), e.oracle_sql()
    # Staged-for-next-round queries are not in the registry yet, but
    # MUST pass the same compare (including the type lint) before they
    # flip to @register: resolve them when named explicitly, or run
    # all of them via the pseudo-name "--staged". Aggregates every
    # staged module's dict (all empty after their flips except the
    # current staging round's).
    if only:
        from autosinapi_spark.plans.staged_r9 import STAGED as _S9
        from autosinapi_spark.plans.staged_r11 import STAGED as _S11
        from autosinapi_spark.plans.staged_r12 import STAGED as _S12
        from autosinapi_spark.plans.staged_r13 import STAGED as _S13
        from autosinapi_spark.plans.staged_r13b import STAGED as _S13B
        from autosinapi_spark.plans.staged_r14 import STAGED as _S14
        from autosinapi_spark.plans.staged_r15 import STAGED as _S15

        staged_all: dict = {}
        for d in (_S9, _S11, _S12, _S13, _S13B, _S14, _S15):
            staged_all.update(d)
        if "--staged" in only:
            only.discard("--staged")
            only.update(staged_all)
        for n, spec in staged_all.items():
            if n in only and n not in qs:
                qs[n] = spec.fn
                if spec.oracle:
                    oracles[n] = spec.oracle
    failed = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        duck.close()
        duck = fresh_duck()
        # release the previous query's localCheckpoint blocks — a
        # 204-query session otherwise accumulates GBs of leaked
        # persistent RDDs (the bench.py r14 lesson: gc alone is not
        # enough, the JVM-side release waits on a JVM GC)
        # NOTE: the async release can race a straggler task completion
        # from the just-finished query (DAGScheduler logs a benign
        # accessNonExistentAccumulator ERROR stack to stderr when the task
        # reports into an already-unregistered accumulator). Cosmetic only:
        # results, timings, and exit codes are unaffected -- the task already
        # delivered its data; only its metric update has nowhere to land.
        try:
            # r15: also clear CacheManager entries — query-internal
            # .persist()/.cache() frames (graph loops) would otherwise
            # accumulate across the 204-query sweep
            spark.catalog.clearCache()
            jm = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in list(jm.values()):
                rdd.unpersist(False)
        except Exception:
            pass
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        if lint_only:
            if name not in oracles:
                print(f"{name}: rows-only (no oracle to lint)")
                continue
            rel = duck.sql(oracles[name])
            problems, warns = type_lint(
                list(sdf.dtypes), [str(t) for t in rel.types]
            )
            ocols = list(rel.columns)
            if list(sdf.columns) != ocols:
                problems.append(f"order {list(sdf.columns)} vs {ocols}")
            msg = "; ".join(problems) if problems else "types ok"
            if warns:
                msg += f" (warn: {'; '.join(warns)})"
            print(f"{name}: {msg}")
            if problems:
                failed.append(name)
            continue
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only rows={len(srows)} ({dt:.1f}s)")
            continue
        rel = duck.sql(oracles[name])
        ocols = list(rel.columns)
        otypes = [str(t) for t in rel.types]
        orows = [tuple(r) for r in rel.fetchall()]
        type_problems, _ = type_lint(list(sdf.dtypes), otypes)
        ok_cols = sorted(scols) == sorted(ocols)
        # The real driver's value hash is ORDER-sensitive even though
        # its schema check is name-sorted (round-4 embedding_quantize_
        # int8 lesson: identical values, different select-list order ->
        # hash mismatch). Enforce positional equality here too.
        ok_order = scols == ocols
        ok_cnt = len(srows) == len(orows)
        ok_vals = ok_cols and ok_cnt and canon(scols, srows) == canon(ocols, orows)
        ok_types = not type_problems
        status = (
            "OK"
            if (ok_cols and ok_order and ok_cnt and ok_vals and ok_types)
            else "MISMATCH"
        )
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"order={'ok' if ok_order else f'{scols} vs {ocols}'} "
            f"types={'ok' if ok_types else '; '.join(type_problems)} "
            f"vals={'ok' if ok_vals else 'DIFF'} ({dt:.1f}s)"
        )
        if status != "OK":
            failed.append(name)
            if not ok_order or ok_vals:
                continue
            s, o = canon(scols, srows), canon(ocols, orows)
            diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
            for a, b in diffs:
                print(f"   spark : {a}\n   oracle: {b}")
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL OK'}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
