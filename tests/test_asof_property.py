"""Randomized cross-check of both as-of join directions against
pandas.merge_asof — the reference implementation of the semantics —
under adversarial shapes: equal keys, exact-tie timestamps, left keys
with no right rows at all, empty sides, both tie policies.

The operator contract requires the right side unique per (key, ts)
(as SQL ASOF JOIN demands); generation enforces that with a dict key.
Left rows may duplicate freely.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from autosinapi_spark.operators.asof import asof_join, asof_join_forward

_KEYS = st.integers(min_value=0, max_value=3)
_TS = st.integers(min_value=0, max_value=15)
_VALS = st.integers(min_value=-99, max_value=99)

# narrow domains on purpose: with 4 keys x 16 timestamps, exact-tie
# collisions and key-without-quotes partitions occur in most examples
_LEFT = st.lists(st.tuples(_KEYS, _TS), max_size=20)
_RIGHT = st.dictionaries(st.tuples(_KEYS, _TS), _VALS, max_size=20)


def _spark_result(spark, left, right, direction, exact):
    ldf = spark.createDataFrame(
        [(k, t) for k, t in left] or [], "k int, ts int"
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right.items()] or [],
        "k int, ts int, v int",
    )
    fn = asof_join if direction == "backward" else asof_join_forward
    out = fn(ldf, rdf, on=["k"], ts_col="ts", value_cols=["v"],
             allow_exact_match=exact)
    return sorted(
        (r.k, r.ts, r.v) for r in out.collect()
    )


def _pandas_result(left, right, direction, exact):
    lpd = pd.DataFrame(left, columns=["k", "ts"]).sort_values(
        "ts", kind="mergesort"
    )
    rpd = pd.DataFrame(
        [(k, t, v) for (k, t), v in right.items()],
        columns=["k", "ts", "v"],
    ).sort_values("ts", kind="mergesort")
    if lpd.empty:
        return []
    if rpd.empty:
        return sorted((int(k), int(t), None) for k, t in left)
    m = pd.merge_asof(
        lpd,
        rpd,
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
    )
    return sorted(
        (int(r.k), int(r.ts), None if pd.isna(r.v) else int(r.v))
        for r in m.itertuples()
    )


@given(left=_LEFT, right=_RIGHT, exact=st.booleans())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_asof_backward_matches_merge_asof(spark, left, right, exact):
    assert _spark_result(spark, left, right, "backward", exact) == (
        _pandas_result(left, right, "backward", exact)
    )


@given(left=_LEFT, right=_RIGHT, exact=st.booleans())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_asof_forward_matches_merge_asof(spark, left, right, exact):
    assert _spark_result(spark, left, right, "forward", exact) == (
        _pandas_result(left, right, "forward", exact)
    )


def test_asof_exact_tie_and_empty_partition_handcrafted(spark):
    """The named adversarial cases, pinned deterministically: an exact
    timestamp tie under both policies, and a left key with no quotes."""
    left = [(1, 5), (1, 5), (2, 7)]
    right = {(1, 5): 50, (1, 3): 30}
    for exact, want_v in ((True, 50), (False, 30)):
        got = _spark_result(spark, left, right, "backward", exact)
        assert got == [(1, 5, want_v), (1, 5, want_v), (2, 7, None)]
    got = _spark_result(spark, left, right, "forward", True)
    assert got == [(1, 5, 50), (1, 5, 50), (2, 7, None)]
    got = _spark_result(spark, left, right, "forward", False)
    assert got == [(1, 5, None), (1, 5, None), (2, 7, None)]


@given(left=_LEFT, right=_RIGHT, exact=st.booleans())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_asof_nearest_matches_merge_asof(spark, left, right, exact):
    from autosinapi_spark.operators.asof import asof_join_nearest

    ldf = spark.createDataFrame(
        [(k, t) for k, t in left] or [], "k int, ts int"
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right.items()] or [],
        "k int, ts int, v int",
    )
    got = sorted(
        (r.k, r.ts, r.v)
        for r in asof_join_nearest(
            ldf, rdf, on=["k"], ts_col="ts", value_cols=["v"],
            allow_exact_match=exact,
        ).collect()
    )
    assert got == _pandas_result(left, right, "nearest", exact)


def test_asof_nearest_tie_prefers_backward(spark):
    from autosinapi_spark.operators.asof import asof_join_nearest

    ldf = spark.createDataFrame([(1, 10)], "k int, ts int")
    rdf = spark.createDataFrame(
        [(1, 8, 100), (1, 12, 200)], "k int, ts int, v int"
    )
    out = asof_join_nearest(ldf, rdf, ["k"], "ts", ["v"]).collect()
    assert [(r.k, r.ts, r.v) for r in out] == [(1, 10, 100)]
