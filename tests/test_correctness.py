"""Spark-vs-DuckDB oracle compare for every registered query.

Mirrors the driver's CORRECTNESS check (row-count + schema + value
compare with name-sorted columns) at sf0.001 for speed; the driver
runs the same contract at sf0.01.
"""

from __future__ import annotations

import decimal
import math
import struct

import pytest

from tests.conftest import SF_SMOKE


def _registry():
    import __spark_entry__ as e

    return e._registry()


def _canon_cell(v):
    # Mirror the driver's hashed representation: Decimal and float must
    # canonicalize identically or decimal-typed outputs pass locally
    # while failing the driver hash (round-1 lesson).
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        # Distinct from the float repr on purpose: a Decimal on one
        # side vs a double on the other must FAIL here, because the
        # driver's hash treats them differently too.
        return ("dec", f"{float(v):.6f}")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Bit-exact: the driver hashes representations, and -0.0 vs
        # +0.0 hash differently even though Python == calls them equal
        # (r6's embedding_covariance red row slipped past ==).
        return struct.pack(">d", v).hex()
    return v


def _canon_rows(cols, rows):
    """Name-sort columns, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _ids():
    return sorted(_registry().keys())


@pytest.mark.parametrize("name", _ids())
def test_query_matches_oracle(spark, duck, name):
    spec = _registry()[name]
    sdf = spec.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    if spec.oracle is None:
        assert len(srows) > 0, f"{name}: rows-only query returned 0 rows"
        return

    ocur = duck.execute(spec.oracle)
    ocols = [d[0] for d in ocur.description]
    orows = [tuple(r) for r in ocur.fetchall()]

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    )
    s, o = _canon_rows(scols, srows), _canon_rows(ocols, orows)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() must be non-empty"
    assert set(os_) <= set(qs)
