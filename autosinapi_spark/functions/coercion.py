"""Coercion / normalization column expressions.

Re-expresses the reference's pandas cleaning idioms as built-in Spark
Column expressions — zero Python UDFs, so everything stays inside
whole-stage codegen:

- decimal-comma numerics: ``/root/reference/autosinapi/core/processor.py:240-243``
- nullable-Int64 coercion (invalid -> NULL): ``processor.py:191-193,233-238``
- uppercase/trim text: ``processor.py:194-195,239``
- MM/yyyy -> first-of-month date: ``processor.py:188-190`` (format
  ``config.py:74``)
- TO_CHAR(date,'YYYY-MM') period key: ``database.py:208``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def decimal_comma_to_double(c: Column | str) -> Column:
    """'1.234,56' or '1,0' -> 1234.56 / 1.0; invalid -> NULL.

    Mirrors ``processor.py:241`` (str.replace(',', '.') + to_numeric
    coerce). Thousands dots are stripped first so pt-BR formatted
    numbers parse; try_cast gives the errors='coerce' semantics.
    """
    c = _col(c)
    # translate, not regexp_replace: the comma->dot step is a 1-char
    # map, so it can skip the regex engine (the thousands-dot strip
    # ahead of it still needs the lookahead regex)
    cleaned = F.translate(
        F.regexp_replace(c.cast("string"), r"\.(?=\d{3}(\D|$))", ""), ",", "."
    )
    return cleaned.try_cast("double")


# A string must LOOK numeric before we let the JVM cast touch it.
# Spark's string->double cast Java-trims every char <= U+0020 (so
# '0\x08' would cast to 0), but pandas to_numeric(errors='coerce')
# returns NaN for embedded control chars — the semantics we mirror.
# `$` (not `\z`) keeps parity for a single trailing newline, which
# both float() and to_numeric accept.
_NUMERIC_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def normalize_code(c: Column | str) -> Column:
    """Numeric-coerce an item code to nullable long (invalid -> NULL).

    pandas ``pd.to_numeric(errors='coerce').astype('Int64')``
    (``processor.py:191-193``).
    """
    s = F.trim(_col(c).cast("string"))
    return (
        F.when(s.rlike(_NUMERIC_RE), s)
        .try_cast("double")
        .try_cast("long")
    )


def upper_trim(c: Column | str) -> Column:
    """UPPER(TRIM(x)) — reference text normalization (processor.py:194-195)."""
    return F.upper(F.trim(_col(c)))


def first_of_month(c: Column | str, fmt: str = "MM/yyyy") -> Column:
    """Parse 'MM/yyyy' into a first-of-month DATE (processor.py:188-190)."""
    return F.try_to_timestamp(_col(c), F.lit(fmt)).cast("date")


def period_key(c: Column | str) -> Column:
    """'yyyy-MM' period bucket — TO_CHAR(date,'YYYY-MM') (database.py:208)."""
    return F.date_format(_col(c), "yyyy-MM")


def extract_code(c: Column | str, pattern: str = r",(\d+)\)$") -> Column:
    """C4: pull the composition code out of '...(DESC,12345)' tails.

    ``processor.py:384`` with ``CUSTOS_CODIGO_REGEX = r",(\\d+)\\)$"``
    (config.py:77) — comma, digits, closing paren at end of string;
    no match -> NULL (regexp_extract yields '' which try_cast nulls).
    """
    return F.regexp_extract(_col(c), pattern, 1).try_cast("long")
