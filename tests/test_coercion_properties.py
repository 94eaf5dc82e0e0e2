"""Property-based tests (hypothesis) for the coercion expressions.

Random pt-BR-formatted numbers must round-trip through
``decimal_comma_to_double`` exactly; ``normalize_code`` must accept
any junk without throwing (errors='coerce' semantics). One Spark job
per property run would be slow, so each property collects its cases
and runs a single DataFrame pass.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from autosinapi_spark.functions.coercion import (
    decimal_comma_to_double,
    normalize_code,
    upper_trim,
)

_settings = settings(max_examples=20, deadline=None)


def _roundtrip(spark, rows, expr_builder):
    df = spark.createDataFrame([(r,) for r in rows], "txt STRING")
    return [r["out"] for r in df.select(expr_builder("txt").alias("out")).collect()]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_decimal_comma_roundtrip(spark, pairs):
    # '<int>,<2-digit frac>' with pt-BR thousands dots inserted
    rows, want = [], []
    for whole, frac in pairs:
        grouped = f"{whole:,}".replace(",", ".")
        rows.append(f"{grouped},{frac:02d}")
        want.append(float(f"{whole}.{frac:02d}"))
    got = _roundtrip(spark, rows, decimal_comma_to_double)
    assert got == want


@given(st.lists(st.text(max_size=25), min_size=1, max_size=30))
@_settings
def test_normalize_code_never_throws(spark, texts):
    got = _roundtrip(spark, texts, normalize_code)
    for raw, out in zip(texts, got):
        if out is not None:
            # anything accepted must be the integer the text denotes
            assert float(raw.strip()) == float(out)


def test_normalize_code_control_chars_null(spark):
    # Round-3 falsifying example: Spark's bare string->double cast
    # Java-trims chars <= U+0020, accepting '0\x08' where pandas
    # to_numeric(errors='coerce') yields NaN. The validity gate must
    # null these out while keeping ordinary padded numerics.
    cases = ["0\x08", "1\x0b2", "\x0512", " 42 ", "+7", "3.5", "1e3", "abc"]
    got = _roundtrip(spark, cases, normalize_code)
    assert got == [None, None, None, 42, 7, 3, 1000, None]


@given(st.lists(st.text(alphabet=" abcXYZ", max_size=15), min_size=1, max_size=30))
@_settings
def test_upper_trim_matches_python(spark, texts):
    got = _roundtrip(spark, texts, upper_trim)
    assert got == [t.strip().upper() for t in texts]
