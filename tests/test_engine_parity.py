"""Bulk cross-engine parity sweeps for the portable primitives.

Every oracle-backed query rests on a handful of "these two engines
compute the SAME bits" claims that were each verified by hand when
first used (see .claude/skills/verify/SKILL.md and the staged-query
docstrings). This module executes those claims over fixed-seed random
sweeps — thousands of values per claim, including adversarial .5
boundaries and negatives — so a Spark or DuckDB behavior change (or a
helper edit) breaks a test here before it breaks a driver hash:

- cents conversion: CAST(ROUND(CAST(v AS DECIMAL(18,2)) * 100, 0) AS
  BIGINT) is bit-identical ON ITS CONTRACT DOMAIN — doubles carrying
  at most 2 fractional decimals (money), which is what every fixture
  column feeds it.
- the DOMAIN BOUNDARY is pinned too: a double with a third decimal on
  a half boundary (e.g. 963696.245) CASTs differently by design —
  Spark rounds the shortest decimal repr (963696.245 -> .25 half-up),
  DuckDB rounds the binary value (963696.24499999... -> .24). If the
  engines ever converge, the divergence test fails and the guard in
  the verify skill can be retired.
- exact-decimal product rounded in decimal THEN cast to double (the
  dsum/sql_dsum discipline) at scales 2 and 6.
- truncating integer division and modulo on BIGINT, negatives
  included (ppm emissions everywhere).
- minimal-length binary + shifts + low-bit isolation (HLL rho, DP
  trailing-zero sampler).

Doubles are compared BIT-exactly (struct.pack), matching the driver.
"""

from __future__ import annotations

import random
import struct

import pytest


def _bits(x: float) -> bytes:
    return struct.pack("<d", float(x))


def _register(spark, duck, rows, schema_spark: str, cols: str, view: str):
    df = spark.createDataFrame(rows, schema_spark)
    df.createOrReplaceTempView(view)
    duck.execute(
        f"CREATE OR REPLACE TABLE {view} AS SELECT * FROM (VALUES "
        + ",".join("(" + ",".join(repr(c) for c in r) + ")" for r in rows)
        + f") t({cols})"
    )


@pytest.fixture(scope="module")
def money_values(spark, duck):
    """Random 2-decimal money doubles in both engines, fixed seed —
    the contract domain of the cents-integerization pattern. Includes
    .x5 cent boundaries (exactly representable intent at scale 2) and
    negatives."""
    rng = random.Random(20260815)
    vals = [round(rng.uniform(-1e7, 1e7), 2) for _ in range(4000)]
    vals += [i + 0.25 for i in range(25)]
    vals += [-(i + 0.75) for i in range(25)]
    vals += [0.0, -0.0, 0.05, -0.05, 9999999.95]
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    _register(spark, duck, rows, "id long, v double", "id, v", "pv")
    return rows


def test_cents_conversion_parity(spark, duck, money_values):
    expr = "CAST(ROUND(CAST(v AS DECIMAL(18,2)) * 100, 0) AS BIGINT)"
    s = {r["id"]: r["c"] for r in spark.sql(
        f"SELECT id, {expr} AS c FROM pv").collect()}
    d = dict(duck.execute(f"SELECT id, {expr} FROM pv").fetchall())
    assert s == d
    # and the integerization is what Python says it is
    for i, v in money_values:
        assert s[i] == round(v * 100) or abs(s[i] - v * 100) < 0.51, (i, v)


def test_decimal_round_then_double_parity(spark, duck):
    # the dsum discipline: exact-decimal arithmetic, round IN DECIMAL
    # (exact HALF_UP), THEN cast to double. v*v of scale-2 decimals is
    # exact at scale 4; scale-2 rounding exercises true half-up ties
    # (x.xx25 etc.). Domain bound: the final decimal's significand
    # must fit a double (|value| * 10^scale < 2^53) AT THE LARGEST
    # EMITTED SCALE (6 here), hence |v| <= 8e4 so v^2 * 10^6 <=
    # 6.4e15 < 2^53 — see the divergence test below for what happens
    # past that.
    rng = random.Random(7342)
    vals = [round(rng.uniform(-8e4, 8e4), 2) for _ in range(4000)]
    vals += [1.05, -1.15, 12345.25, 0.0, 79999.95]
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    _register(spark, duck, rows, "id long, v double", "id, v", "qv")
    for scale in (2, 6):
        expr = (
            f"CAST(ROUND(CAST(v AS DECIMAL(18,2)) * "
            f"CAST(v AS DECIMAL(18,2)), {scale}) AS DOUBLE)"
        )
        s = {r["id"]: _bits(r["c"]) for r in spark.sql(
            f"SELECT id, {expr} AS c FROM qv").collect()}
        d = {i: _bits(c) for i, c in duck.execute(
            f"SELECT id, {expr} FROM qv").fetchall()}
        assert s == d, f"scale={scale}"


def test_decimal_to_double_cast_diverges_past_double_precision(spark, duck):
    """The other domain boundary, found BY this module's first sweep:
    casting a decimal whose significand exceeds 2^53 to DOUBLE is
    correctly rounded in Spark (bit-identical to Python's
    float('...')) but comes out 1 ulp LOW in DuckDB (e.g.
    95642690521205.61 -> ...d67 vs ...d66). This is why every
    double-emitting column keeps |value| * 10^scale under ~9e15 (the
    verify skill's magnitude rule) — sums bigger than that are
    emitted as integer cents/ppm instead. If this test fails, DuckDB
    fixed its conversion and the magnitude rule can be relaxed."""
    val = "95642690521205.61"
    s = spark.sql(
        f"SELECT CAST(CAST('{val}' AS DECIMAL(20,2)) AS DOUBLE) c"
    ).collect()[0]["c"]
    d = duck.execute(
        f"SELECT CAST(CAST('{val}' AS DECIMAL(20,2)) AS DOUBLE)"
    ).fetchone()[0]
    assert _bits(s) == _bits(float(val))  # Spark == correctly rounded
    assert _bits(s) != _bits(d), "DuckDB now rounds this correctly"


def test_double_to_decimal_cast_diverges_off_domain(spark, duck):
    """The domain boundary: sub-cent half-boundary doubles CAST to
    DECIMAL(18,2) differently (Spark: shortest-repr half-up; DuckDB:
    binary value). This is WHY the engine only ever integerizes
    columns whose values carry <= 2 fractional decimals. If this test
    ever fails, the engines converged and the guard can be retired."""
    vals = [963696.245, -203905.385, 0.005, -0.005, 1.115]
    rows = [(i, v) for i, v in enumerate(vals)]
    _register(spark, duck, rows, "id long, v double", "id, v", "xv")
    expr = "CAST(v AS DECIMAL(18,2))"
    s = {r["id"]: str(r["c"]) for r in spark.sql(
        f"SELECT id, {expr} AS c FROM xv").collect()}
    d = {i: str(c) for i, c in duck.execute(
        f"SELECT id, {expr} FROM xv").fetchall()}
    diverged = [i for i in s if s[i] != d[i]]
    assert diverged, "engines now agree on sub-cent half boundaries"


def test_truncating_div_mod_parity(spark, duck):
    rng = random.Random(4171)
    rows = [
        (
            i,
            rng.randint(-(10**17), 10**17),
            rng.choice([1, 2, 3, 7, 10, 97, 10**6, 10**9])
            * rng.choice([1, -1]),
        )
        for i in range(4000)
    ]
    _register(spark, duck, rows, "id long, a long, b long", "id, a, b", "dv")
    s = {r["id"]: (r["q"], r["m"]) for r in spark.sql(
        "SELECT id, a DIV b AS q, a % b AS m FROM dv").collect()}
    d = {i: (q, m) for i, q, m in duck.execute(
        "SELECT id, a // b, a % b FROM dv").fetchall()}
    assert s == d
    # and both equal Python truncation toward zero
    for i, a, b in rows:
        q = abs(a) // abs(b)
        if (a < 0) != (b < 0):
            q = -q
        assert s[i][0] == q, (a, b)


def test_bin_shift_lowbit_parity(spark, duck):
    rng = random.Random(9091)
    rows = [(i, rng.randint(0, (1 << 60) - 1), rng.randint(0, 12))
            for i in range(3000)]
    rows += [(len(rows), 0, 0), (len(rows) + 1, 1, 0),
             (len(rows) + 2, (1 << 60) - 1, 12)]
    _register(spark, duck, rows, "id long, h long, k int", "id, h, k", "bv")
    q = ("SELECT id, length(bin(h)) AS lb, h >> k AS sr, "
         "(h & -h) AS low FROM bv")
    s = {r["id"]: (r["lb"], r["sr"], r["low"])
         for r in spark.sql(q).collect()}
    d = {i: (lb, sr, low) for i, lb, sr, low in duck.execute(q).fetchall()}
    assert s == d
    # bin() is minimal-length in both: lb == bit_length (0 -> '0')
    for i, h, _ in rows:
        assert s[i][0] == (h.bit_length() if h else 1)


def test_double_round_and_ln_quantization_parity(spark, duck):
    # the davg / ratio / logprob emission pattern: a double quotient
    # (or ln of an exact-integer ratio) quantized with ROUND(x, 6).
    # Engines must agree bit-exactly WHEN the unrounded values agree
    # bit-exactly — i.e. ROUND(double, n) and ln(double) are the same
    # functions in both. Values stay inside the magnitude rule
    # (|x| * 1e6 < 2^53).
    rng = random.Random(55117)
    rows = [
        (i, rng.randint(1, 10**9), rng.randint(1, 10**9))
        for i in range(4000)
    ]
    _register(spark, duck, rows, "id long, a long, b long", "id, a, b", "lv")
    q = (
        "SELECT id, "
        "ROUND(CAST(a AS DOUBLE) / CAST(b AS DOUBLE), 6) AS r, "
        "ROUND(ln(CAST(a AS DOUBLE) / CAST(b AS DOUBLE)), 6) AS l "
        "FROM lv"
    )
    s = {r["id"]: (_bits(r["r"]), _bits(r["l"]))
         for r in spark.sql(q).collect()}
    d = {i: (_bits(r), _bits(l)) for i, r, l in duck.execute(q).fetchall()}
    assert s == d
