"""Property test: the min_by/max_by dedup_keep_first is equivalent to
the row_number-window reference form, including null ordering — the
map-side-combining rewrite must never change which row survives."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from autosinapi_spark.operators.dedup import dedup_keep_first

_ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),                       # key
        st.one_of(st.none(), st.integers(0, 5)), # ord1 (nullable)
        st.integers(0, 5),                       # ord2 (tiebreak)
        st.integers(-99, 99),                    # payload
    ),
    max_size=25,
)


def _window_reference(df, keys, order_cols, descending):
    ordering = [
        F.desc(c) if descending else F.asc(c) for c in order_cols
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@given(rows=_ROWS, descending=st.booleans())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_dedup_keep_first_matches_window_form(spark, rows, descending):
    # the (o1, o2, payload) triple is unique per key in practice only
    # when the ordering is total; make it total by including payload
    df = spark.createDataFrame(
        rows or [], "k int, o1 int, o2 int, payload int"
    )
    got = {
        tuple(r)
        for r in dedup_keep_first(
            df, ["k"], ["o1", "o2", "payload"], descending=descending
        ).collect()
    }
    ref = {
        tuple(r)
        for r in _window_reference(
            df, ["k"], ["o1", "o2", "payload"], descending
        ).collect()
    }
    assert got == ref
