"""Round-13-registered queries, second module (plans/staged_r13b.py):
Python replays + structural invariants.

The Spark-vs-DuckDB oracle compare for this cohort lives in
tests/test_correctness.py since the r13 flip registered them (a
duplicate compare ran here while they were staged in r12); what
stays is what the registry compare can't express — independent
pure-Python replays of the novel arithmetic (the Hilbert xy2d state
machine with its unit-step adjacency property; the peel loop on
plain dicts) and plan-shape pins."""

from __future__ import annotations

from collections import defaultdict

from autosinapi_spark.plans.staged_r13b import (
    _HB_BITS,
    _HB_FILES,
    _HB_N,
    _KC_ROUNDS,
)
from tests.conftest import SF_SMOKE


# --- Hilbert xy2d: the public reference state machine ----------------

def _py_xy2d(n: int, x: int, y: int) -> int:
    """Wikipedia's public-domain xy2d (Butz's algorithm), the exact
    integer arithmetic both engines' generated CTE chain runs."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_unit_step_adjacency():
    """THE property that distinguishes Hilbert from Morton (and the
    reason the layout row exists): consecutive d-values are always
    Manhattan-distance-1 neighbors. Checked exhaustively on the 64x64
    grid (the same state machine at 6 bits instead of 16)."""
    n = 64
    by_d = {}
    for x in range(n):
        for y in range(n):
            by_d[_py_xy2d(n, x, y)] = (x, y)
    assert sorted(by_d) == list(range(n * n))  # a bijection
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d

    # contrast: Morton has non-unit jumps (so this is not vacuous)
    def morton(x, y):
        z = 0
        for i in range(6):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    by_z = {}
    for x in range(n):
        for y in range(n):
            by_z[morton(x, y)] = (x, y)
    jumps = sum(
        1
        for z in range(n * n - 1)
        if abs(by_z[z][0] - by_z[z + 1][0])
        + abs(by_z[z][1] - by_z[z + 1][1])
        > 1
    )
    assert jumps > 0


def test_hilbert_matches_python_replay(spark, duck):
    """Full replay from raw keys: the range normalization and the
    16-bit xy2d, re-derived independently in pure Python."""
    from autosinapi_spark.plans.staged_r13b import hilbert_layout_keys

    rows = duck.execute(
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey "
        "FROM lineitem"
    ).fetchall()
    pmin, pmax, smin, smax = duck.execute(
        "SELECT MIN(l_partkey), MAX(l_partkey), "
        "MIN(l_suppkey), MAX(l_suppkey) FROM lineitem"
    ).fetchone()

    def norm(v, lo, hi):
        return 0 if hi == lo else ((v - lo) * (_HB_N - 1)) // (hi - lo)

    expect = sorted(
        (
            ok,
            ln,
            pk,
            sk,
            _py_xy2d(_HB_N, norm(pk, pmin, pmax), norm(sk, smin, smax)),
        )
        for ok, ln, pk, sk in rows
    )
    collected = hilbert_layout_keys(spark, SF_SMOKE).collect()
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.l_partkey, r.l_suppkey, r.hval)
        for r in collected
    )
    assert got == expect
    # bucket is derived, bounded
    hb = {r.hbucket for r in collected}
    assert hb <= set(range(_HB_FILES))


def test_hilbert_keys_fill_the_bit_budget(spark):
    """Same guarantee the z-order row pins: the max key must land on
    cell 2^bits - 1, so domains wider than 2^bits never alias."""
    from pyspark.sql import functions as F

    from autosinapi_spark.plans.staged_r13b import hilbert_layout_keys

    df = hilbert_layout_keys(spark, SF_SMOKE)
    mx = df.agg(F.max("hval")).collect()[0][0]
    # d ranges over [0, 4^bits); the fixture's 200-part key domain
    # still reaches the top normalized cell on at least one axis
    assert 0 < mx < (1 << (2 * _HB_BITS))


def test_hilbert_plan_never_shuffles_the_fact_table(spark, no_rebalance):
    """Row-local after the 1-row min/max scalar broadcast — identical
    exchange budget to test_zorder_layout_never_shuffles_the_fact_table."""
    from autosinapi_spark.plans.staged_r13b import hilbert_layout_keys

    plan = (
        hilbert_layout_keys(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_hilbert_beats_morton_on_file_envelopes(duck):
    """The measurable claim the contrast row exists for: cutting each
    curve order into 64 equal-count files over the REAL fixture keys,
    the total per-file bounding-box area (the min/max envelope file
    skipping prunes against) must be strictly smaller under Hilbert.
    Measured 1.83x tighter at sf0.001; assert a conservative 1.3x so
    fixture regeneration noise can't flake the pin."""
    rows = duck.execute(
        "SELECT l_partkey, l_suppkey FROM lineitem"
    ).fetchall()
    pmin = min(r[0] for r in rows)
    pmax = max(r[0] for r in rows)
    smin = min(r[1] for r in rows)
    smax = max(r[1] for r in rows)

    def norm(v, lo, hi):
        return 0 if hi == lo else ((v - lo) * (_HB_N - 1)) // (hi - lo)

    def morton(x, y):
        z = 0
        for i in range(_HB_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [
        (norm(pk, pmin, pmax), norm(sk, smin, smax)) for pk, sk in rows
    ]

    def envelope_total(keyfn, files=_HB_FILES):
        order = sorted(range(len(pts)), key=lambda i: keyfn(*pts[i]))
        per = len(order) // files
        tot = 0
        for f in range(files):
            hi = (f + 1) * per if f < files - 1 else len(order)
            chunk = [pts[i] for i in order[f * per:hi]]
            xs = [c[0] for c in chunk]
            ys = [c[1] for c in chunk]
            tot += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return tot

    h = envelope_total(lambda x, y: _py_xy2d(_HB_N, x, y))
    z = envelope_total(morton)
    assert z > 1.3 * h, f"hilbert {h} vs morton {z}"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from autosinapi_spark.plans.staged_r13b import _HB_QT, _HB_ST

    @settings(max_examples=500, deadline=None)
    @given(
        x=st.integers(min_value=0, max_value=(1 << 16) - 1),
        y=st.integers(min_value=0, max_value=(1 << 16) - 1),
    )
    def test_automaton_equals_reference_xy2d(x, y):
        """The packed-table automaton (the arithmetic both engines
        run) must equal the literal rotate/reflect reference for ANY
        16-bit point — the exhaustive 64x64 pin plus this random
        16-bit sweep covers both the small exhaustive and the full
        domain."""
        stt = 0
        d = 0
        for i in range(15, -1, -1):
            dgt = (((x >> i) & 1) << 1) | ((y >> i) & 1)
            idx = (stt * 4 + dgt) * 2
            d = d * 4 + ((_HB_QT >> idx) & 3)
            stt = (_HB_ST >> idx) & 3
        assert d == _py_xy2d(1 << 16, x, y)

except ImportError:  # pragma: no cover - hypothesis ships in the image
    pass


# --- onion decomposition replay --------------------------------------

def test_kcore_onion_matches_python_replay(spark, duck):
    """The peel loop on plain dicts: distinct directed edges, K = E
    // N, alive-degree recount per round, removal stats."""
    from autosinapi_spark.plans.staged_r13b import kcore_onion_layers

    pairs = duck.execute(
        "SELECT DISTINCT a.l_partkey, b.l_partkey "
        "FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey "
        "WHERE a.l_partkey != b.l_partkey"
    ).fetchall()
    nodes = {
        r[0]
        for r in duck.execute(
            "SELECT DISTINCT l_partkey FROM lineitem"
        ).fetchall()
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
    e_cnt = sum(len(v) for v in adj.values())
    k = e_cnt // len(nodes)

    alive = set(nodes)
    expect = []
    for r in range(1, _KC_ROUNDS + 1):
        deg = {n: len(adj[n] & alive) for n in alive}
        rm = {n for n in alive if deg[n] < k}
        if rm:
            expect.append(
                (
                    r,
                    k,
                    len(rm),
                    sum(deg[n] for n in rm),
                    len(alive) - len(rm),
                )
            )
        alive -= rm

    got = [
        (
            r.peel_round,
            r.k_threshold,
            r.n_removed,
            r.sum_alive_deg,
            r.n_alive_after,
        )
        for r in kcore_onion_layers(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # the fixture must actually erode over >= 2 rounds AND converge
    # strictly inside the cap, or the round budget needs retuning
    assert 2 <= len(expect) < _KC_ROUNDS
    # conservation: removals partition the node set down each round
    for (r1, _, n1, _, a1), (r2, _, n2, _, a2) in zip(
        expect, expect[1:]
    ):
        assert a1 == n2 + a2


def test_kcore_cascade_and_surviving_core(spark, tmp_path):
    """The fixture graph fully erodes, so pin the two behaviors it
    can't exercise: a multi-round CASCADE (a node above threshold
    dies only after its neighbors leave) and a NONEMPTY surviving
    core at fixpoint. Graph: parts 1-6 form a clique (orders with
    each pair), part 7 hangs off 8/9/10 (deg 3), 8/9/10 are pendants
    (deg 1). N=10, E=36 directed, K = 36//10 = 3: round 1 removes the
    pendants (7 survives at deg 3), round 2 removes 7 at alive-deg 0,
    round 3 removes nothing — the clique is the surviving 5-core."""
    from autosinapi_spark.plans.staged_r13b import kcore_onion_layers

    orders = []
    ok = 0
    for a in range(1, 7):
        for b in range(a + 1, 7):
            ok += 1
            orders += [(ok, a), (ok, b)]
    for pend in (8, 9, 10):
        ok += 1
        orders += [(ok, 7), (ok, pend)]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(o, 1, p, 1, 1) for o, p in orders],
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_suppkey long, l_quantity long",
    ).write.parquet(f"{sf}/lineitem.parquet")

    rows = [
        (
            r.peel_round,
            r.k_threshold,
            r.n_removed,
            r.sum_alive_deg,
            r.n_alive_after,
        )
        for r in kcore_onion_layers(spark, sf).collect()
    ]
    assert rows == [
        (1, 3, 3, 3, 7),  # pendants 8/9/10 die at deg 1 each
        (2, 3, 1, 0, 6),  # 7 cascades out at alive-deg 0
    ]


def test_kcore_plan_shape(spark):
    """No data-by-data cartesian: the only nested-loop joins are the
    1-row scalar broadcasts (K threshold per round)."""
    from autosinapi_spark.plans.staged_r13b import kcore_onion_layers

    plan = (
        kcore_onion_layers(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
