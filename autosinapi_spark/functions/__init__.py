"""Column-expression helpers (all JVM-side, whole-stage-codegen friendly)."""

from .coercion import (  # noqa: F401
    decimal_comma_to_double,
    first_of_month,
    normalize_code,
    period_key,
    upper_trim,
)
