"""Simulate the driver's verify loop against __spark_entry__.

Creates a VANILLA SparkSession (none of the engine's tuned confs, like
the driver will), runs entry() + every queries() entry at the given
sf dir, runs each oracle_sql() in DuckDB over the same parquet, and
compares row count + name-sorted-column value multisets.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
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


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    print("== entry() smoke ==")
    t0 = time.time()
    n = e.entry(spark).count()
    print(f"entry rows={n} ({time.time() - t0:.1f}s)")
    assert n > 0

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only rows={len(srows)} ({dt:.1f}s)")
            continue
        cur = duck.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = [tuple(r) for r in cur.fetchall()]
        ok_cols = sorted(scols) == sorted(ocols)
        # The real driver's value hash is ORDER-sensitive even though
        # its schema check is name-sorted (round-4 embedding_quantize_
        # int8 lesson: identical values, different select-list order ->
        # hash mismatch). Enforce positional equality here too.
        ok_order = scols == ocols
        ok_cnt = len(srows) == len(orows)
        ok_vals = ok_cols and ok_cnt and canon(scols, srows) == canon(ocols, orows)
        status = "OK" if (ok_cols and ok_order and ok_cnt and ok_vals) else "MISMATCH"
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"order={'ok' if ok_order else f'{scols} vs {ocols}'} "
            f"vals={'ok' if ok_vals else 'DIFF'} ({dt:.1f}s)"
        )
        if status != "OK":
            failed.append(name)
            if not ok_order:
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
