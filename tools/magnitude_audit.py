"""Audit double-emitting columns against the magnitude rule.

tests/test_engine_parity.py pins the root cause: DuckDB's
DECIMAL -> DOUBLE cast goes 1 ulp low once the decimal's significand
exceeds 2^53, while Spark stays correctly rounded — so any
double-emitting column only hash-matches while
|value| * 10^scale < 2^53 (~9e15). The repo rounds doubles at scale 6
(ratios, davg) or scale 2 (wide money), so the conservative budget on
the VALUE is 9e9 at scale 6.

This tool runs every registered query at the gate SF (sf0.01 unless
overridden), measures max|v| over every double column, and reports:

- BREACH:  max|v| >= 9e9   (could hash-mismatch at the gate today —
                            anything here is a latent driver red)
- WATCH:   max|v| >= 9e7   (two orders of magnitude of data growth
                            from the boundary; fine at the gate, but
                            a larger gate SF or corpus would cross)

Exit nonzero only on BREACH. Run alone (one Spark session).

Usage: python tools/magnitude_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SIG_BUDGET = 9.0e15  # ~2^53: max decimal significand a double holds
WATCH_FACTOR = 100.0  # flag columns within 100x of the budget


def _oracle_scales(oracle: str | None) -> dict[str, int]:
    """alias -> ROUND scale, parsed from the oracle SQL.

    The emission pattern is always ``ROUND(<expr>, <scale>) ... AS
    <alias>`` (dsum/davg expand to exactly that); a column without a
    parseable scale is audited at the conservative scale 6.
    """
    import re

    if not oracle:
        return {}
    out: dict[str, int] = {}
    # dsum/davg always expand to "..., <scale>) AS DOUBLE) AS <alias>";
    # also catch the bare "ROUND(..., <scale>) AS <alias>" ratio form
    # (no nested-paren parsing needed for either tail).
    for m in re.finditer(
        r",\s*(\d+)\)\s+AS\s+DOUBLE\)\s+AS\s+(\w+)",
        oracle,
        re.IGNORECASE,
    ):
        out[m.group(2).lower()] = int(m.group(1))
    for m in re.finditer(
        r"ROUND\(\s*([^()]+?),\s*(\d+)\)\s+AS\s+(\w+)",
        oracle,
        re.IGNORECASE,
    ):
        out.setdefault(m.group(3).lower(), int(m.group(2)))
    out.pop("double", None)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType
    from autosinapi_spark.session import get_spark

    spark = get_spark(app_name="magnitude_audit")
    oracles = entrymod.oracle_sql()
    breaches: list[tuple[str, str, float, int, float]] = []
    watches: list[tuple[str, str, float, int, float]] = []
    n_cols = 0
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:
            print(f"{name}: BUILD FAILED: {exc}", file=sys.stderr)
            continue
        dcols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, DoubleType)
        ]
        if not dcols:
            continue
        n_cols += len(dcols)
        scales = _oracle_scales(oracles.get(name))
        row = df.agg(
            *[F.max(F.abs(F.col(c))).alias(c) for c in dcols]
        ).collect()[0]
        for c in dcols:
            v = row[c]
            if v is None:
                continue
            scale = scales.get(c.lower(), 6)
            sig = v * 10**scale
            if sig >= SIG_BUDGET:
                breaches.append((name, c, v, scale, sig))
            elif sig * WATCH_FACTOR >= SIG_BUDGET:
                watches.append((name, c, v, scale, sig))
    print(f"audited {n_cols} double columns at {sf_dir}")
    for name, c, v, scale, sig in sorted(watches, key=lambda t: -t[4]):
        print(
            f"WATCH  {name}.{c}  max|v|={v:.6g} at scale {scale} -> "
            f"significand {sig:.3g} ({SIG_BUDGET / sig:.0f}x headroom)"
        )
    for name, c, v, scale, sig in sorted(breaches, key=lambda t: -t[4]):
        print(
            f"BREACH {name}.{c}  max|v|={v:.6g} at scale {scale} -> "
            f"significand {sig:.3g} >= 2^53"
        )
    if not breaches and not watches:
        print(
            "all double emissions >= 100x inside the 2^53 "
            "significand budget at their oracle ROUND scales"
        )
    return 1 if breaches else 0


if __name__ == "__main__":
    raise SystemExit(main())
