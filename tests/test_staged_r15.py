"""Round-15-staged queries (plans/staged_r15.py): the full
Spark-vs-DuckDB oracle compare (the duplicate-compare convention
every staged cohort uses before its registration flip — once these
register at r15, tests/test_correctness.py takes this over) plus
independent pure-Python replays (the complete Kneser-Ney arithmetic
from raw texts; the complete k-truss peel trace from raw lineitem
rows and on a planted clique fixture; the full aHash banding with a
brute-force recall check; the complete HLL register/estimate
arithmetic including the merged-union row; the complete HyperBall
register-merge rounds with an exact-BFS accuracy envelope) and
plan-shape pins."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

import pytest

from autosinapi_spark.plans.staged_r15 import (
    _KN_TOP,
    _KT_ROUNDS,
    STAGED,
)
from tests.conftest import SF_SMOKE
from tests.test_correctness import _canon_rows


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, duck, name):
    spec = STAGED[name]
    sdf = spec.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    assert len(srows) > 0, f"{name}: 0 rows trivially matches — invalid"

    ocur = duck.execute(spec.oracle)
    ocols = [d[0] for d in ocur.description]
    orows = [tuple(r) for r in ocur.fetchall()]

    assert scols == ocols, f"{name}: column order {scols} != {ocols}"
    assert len(srows) == len(orows), (
        f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    )
    assert _canon_rows(scols, srows) == _canon_rows(ocols, orows), (
        f"{name}: value mismatch"
    )


# --- Kneser-Ney: full Python replay -----------------------------------

def _py_kn_rows(texts: list[str]) -> list[tuple]:
    """The exact integer KN arithmetic from raw texts: whitespace
    tokens, bigram/marginal/continuation counts, D = 3/4 as the
    closed ppm form ((4c-3)*T + 3*n1r*n1l) // (4*cl*T)."""
    big: Counter = Counter()
    for t in texts:
        ts = " ".join(t.split()).split(" ") if t and t.split() else []
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
    cl: Counter = Counter()
    n1r: Counter = Counter()
    n1l: Counter = Counter()
    for (a, b), c in big.items():
        cl[a] += c
        n1r[a] += 1
        n1l[b] += 1
    T = len(big)
    rows = []
    for (a, b), c in big.items():
        pkn = ((4 * c - 3) * T + 3 * n1r[a] * n1l[b]) * 1_000_000 // (
            4 * cl[a] * T
        )
        cont = n1l[b] * 1_000_000 // T
        rows.append((a, b, c, pkn, cont))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:_KN_TOP]


def test_kneser_ney_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r15 import kneser_ney_bigram_ppm

    texts = [
        r[0]
        for r in duck.execute("SELECT text FROM documents").fetchall()
    ]
    expect = _py_kn_rows(texts)
    got = [
        (r.prev, r.cur, r.n_bigram, r.pkn_ppm, r.cont_ppm)
        for r in kneser_ney_bigram_ppm(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # the head must exercise both terms: some row where the
    # continuation probability is a visible share of the estimate
    assert any(r[4] > 0 for r in expect)


def test_kneser_ney_probabilities_sum_under_one():
    """Model sanity on a tiny corpus: for a fixed context w1, the KN
    probabilities over OBSERVED continuations must sum < 1e6 ppm
    (the remaining mass backs off to unseen continuations) and every
    term must be positive — the discount never zeroes an observed
    bigram at D = 3/4."""
    texts = ["a b a b a c", "b a b a", "c a c a b"]
    rows = _py_kn_rows(texts)
    by_ctx: dict[str, int] = defaultdict(int)
    for a, _, _, pkn, _ in rows:
        assert pkn > 0
        by_ctx[a] += pkn
    for ctx, total in by_ctx.items():
        assert total < 1_000_000, (ctx, total)


# --- k-truss: full Python replay --------------------------------------

def _py_truss_trace(
    edges: set[tuple[int, int]], rounds: int
) -> list[tuple[int, int, int, int]]:
    """(peel_round, n_edges, n_removed, n_tri) over the exact
    simultaneous-peel iteration the query runs, with the peel bar
    derived as round-0's integer-mean edge support."""

    def tris(es: set[tuple[int, int]]):
        nbrs: dict[int, set[int]] = defaultdict(set)
        for u, v in es:
            nbrs[u].add(v)
        out = []
        for u, v in es:
            for w in nbrs[u] & nbrs.get(v, set()):
                out.append((u, v, w))
        return out

    trace = []
    cur = set(edges)
    prev_n = None
    thr = None
    for r in range(rounds + 1):
        t = tris(cur)
        n_removed = 0 if prev_n is None else prev_n - len(cur)
        trace.append((r, len(cur), n_removed, len(t)))
        prev_n = len(cur)
        if r < rounds:
            sup: Counter = Counter()
            for a, b, c in t:
                sup[(a, b)] += 1
                sup[(a, c)] += 1
                sup[(b, c)] += 1
            if thr is None:
                thr = (3 * len(t)) // len(sup) if sup else 1
            cur = {e for e in cur if sup[e] >= thr}
    return trace


def test_ktruss_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r15 import ktruss_peel_trace

    rows = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets: dict[int, set[int]] = defaultdict(set)
    for o, p in rows:
        baskets[o].add(p)
    edges = {
        (a, b)
        for ps in baskets.values()
        for a, b in combinations(sorted(ps), 2)
    }
    expect = _py_truss_trace(edges, _KT_ROUNDS)

    got = [
        (r.peel_round, r.n_edges, r.n_removed, r.n_tri)
        for r in ktruss_peel_trace(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # the peel must do real work on the fixture AND converge inside
    # the fixed round budget (final round removes nothing) — the
    # registered-trace honesty condition in the docstring
    assert got[1][2] > 0, "round 1 removed no edges — trivial fixture"
    assert got[-1][2] == 0, (
        f"not converged in {_KT_ROUNDS} rounds: {got}"
    )


def test_ktruss_planted_clique(spark, tmp_path):
    """A planted 5-clique survives the peel entirely (every clique
    edge sits on 3 triangles >= the derived bar of 2); the dangling
    triangle (support 1) and pendant edge (support 0) peel off in
    round 1 — ground truth enumerable by hand: round-0 mean support
    = (3 * 11 triangles) // 13 supported edges = 2."""
    from autosinapi_spark.plans.staged_r15 import ktruss_peel_trace

    # orders as baskets: one 5-clique {1..5}, one triangle {10,11,12}
    # (support 1 each -> peels in round 1), one pendant pair {20,21}
    baskets = [
        (1, [1, 2, 3, 4, 5]),
        (2, [10, 11, 12]),
        (3, [20, 21]),
    ]
    rows = [
        (o, i + 1, p, 1)
        for o, ps in baskets
        for i, p in enumerate(ps)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_suppkey long",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    got = [
        (r.peel_round, r.n_edges, r.n_removed, r.n_tri)
        for r in ktruss_peel_trace(spark, str(tmp_path)).collect()
    ]
    # round 0: C(5,2) + 3 + 1 = 14 edges, C(5,3) + 1 = 11 triangles;
    # round 1 removes the triangle's 3 edges (support 1) and the
    # pendant edge (support 0) -> the 10-edge clique, stable after
    expect0 = (0, 14, 0, 11)
    assert got[0] == expect0
    assert got[1] == (1, 10, 4, 10)
    for r in range(2, _KT_ROUNDS + 1):
        assert got[r] == (r, 10, 0, 10)


def test_ktruss_is_subgraph_of_kcore():
    """Containment property (Cohen 2008): the support-t peel
    fixpoint (the (t+2)-truss) sits inside the (t+1)-core — checked
    for t = 2 on a deterministic pseudo-random graph."""
    import random

    t = 2
    rng = random.Random(7)
    edges = set()
    for _ in range(120):
        a, b = rng.randrange(25), rng.randrange(25)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    trace_edges = set(edges)
    # peel to the fixpoint: support = common undirected neighbors
    for _ in range(30):
        und: dict[int, set[int]] = defaultdict(set)
        for u, v in trace_edges:
            und[u].add(v)
            und[v].add(u)
        nxt = {
            (u, v)
            for u, v in trace_edges
            if len(und[u] & und[v]) >= t
        }
        if nxt == trace_edges:
            break
        trace_edges = nxt
    assert trace_edges, "fixture peeled to empty — pick a denser seed"
    # (t+1)-core of the original graph
    core = set(edges)
    while True:
        deg: Counter = Counter()
        for u, v in core:
            deg[u] += 1
            deg[v] += 1
        bad = {x for x, d in deg.items() if d < t + 1}
        if not bad:
            break
        core = {
            (u, v) for u, v in core if u not in bad and v not in bad
        }
    core_vertices = {x for e in core for x in e}
    for u, v in trace_edges:
        assert u in core_vertices and v in core_vertices


# --- plan pins ---------------------------------------------------------

def test_kneser_ney_plan_shape(spark):
    from autosinapi_spark.plans.staged_r15 import kneser_ney_bigram_ppm

    plan = (
        kneser_ney_bigram_ppm(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_ktruss_plan_shape(spark):
    """No cartesian anywhere; the only BroadcastNestedLoopJoins are
    the 1-row trace-count crossJoins (scalar broadcasts)."""
    from autosinapi_spark.plans.staged_r15 import ktruss_peel_trace

    plan = (
        ktruss_peel_trace(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


# --- media aHash near-dup: replay + brute-force recall ----------------

def _py_ahash_bands(texts: dict[int, str]) -> dict[int, tuple]:
    """The exact aHash arithmetic from raw texts: stride-5 prefix
    samples, integer mean threshold, 4 x 16-bit INTERLEAVED band
    packing (band k = bit positions {k, k+4, ..., k+60})."""
    out = {}
    for mid, t in texts.items():
        b = t.encode("utf-8")
        if not b:
            continue
        sm = [b[min(5 * i, len(b) - 1)] for i in range(64)]
        tot = sum(sm)
        bits = [1 if 64 * s > tot else 0 for s in sm]
        out[mid] = tuple(
            sum(bits[k + 4 * j] << j for j in range(16))
            for k in range(4)
        )
    return out


def test_media_ahash_matches_python_replay_and_recall(spark, duck):
    """Replay the full pipeline in Python AND check the pigeonhole
    recall claim: banded candidates must contain EVERY brute-force
    pair within the Hamming bar (100% recall by construction)."""
    from autosinapi_spark.plans.staged_r15 import (
        _PH_MAX_HAM,
        media_ahash_near_dup,
    )

    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    bands = _py_ahash_bands(texts)

    def ham(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x, y))

    ids = sorted(bands)
    brute = sorted(
        (a, b, ham(bands[a], bands[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(bands[a], bands[b]) <= _PH_MAX_HAM
    )
    got = [
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in media_ahash_near_dup(spark, SF_SMOKE).collect()
    ]
    assert got == brute
    assert len(brute) > 0, "fixture produced no near-dup pairs"
    # every brute pair must share >= 1 exact band (the pigeonhole
    # fact the candidate join relies on)
    for a, b, _ in brute:
        assert any(
            bands[a][k] == bands[b][k] for k in range(4)
        ), (a, b)


def test_media_ahash_planted_twins(spark, tmp_path):
    """Two payloads differing in ONE byte inside the sampled strip
    are Hamming-1 twins; an unrelated payload pairs with neither."""
    from autosinapi_spark.plans.staged_r15 import media_ahash_near_dup

    base = "the quick brown fox jumps over the lazy dog " * 12
    twin = base[:100] + ("Z" if base[100] != "Z" else "Q") + base[101:]
    other = "".join(
        chr(65 + (i * 7) % 26) if i % 3 else " " for i in range(400)
    )
    spark.createDataFrame(
        [(1, base, "en", "s", len(base)),
         (2, twin, "en", "s", len(twin)),
         (3, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = [
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in media_ahash_near_dup(spark, str(tmp_path)).collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(1, 2)]
    assert got[0][2] <= 1


def test_media_ahash_plan_shape(spark):
    """No cartesian: every candidate join is a band-keyed equi-join
    plus the id inequality, and the verify joins are id-keyed."""
    from autosinapi_spark.plans.staged_r15 import media_ahash_near_dup

    plan = (
        media_ahash_near_dup(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


# --- HLL distinct union: replay + merge property ----------------------

def _py_hll_rows(pairs: list[tuple[str, int]]) -> list[tuple]:
    """The exact HLL arithmetic from raw (status, custkey) pairs:
    seeded-md5 60-bit hash, reg = h mod 64, rho = tz + 1 of the
    54-bit payload, register max, the ALL row as register-wise max,
    and the one-integer-division estimate."""
    import hashlib

    from autosinapi_spark.plans.staged_r15 import (
        _HLL_ALPHA_NUM,
        _HLL_BOUND_PPM,
        _HLL_CAP,
        _HLL_M,
    )

    regs: dict[str, dict[int, int]] = defaultdict(dict)
    exact: dict[str, set] = defaultdict(set)
    for flag, ck in pairs:
        h = int(
            hashlib.md5(f"hll:{ck}".encode()).hexdigest()[:15], 16
        )
        reg, w = h % _HLL_M, h >> 6
        rho = _HLL_CAP if w == 0 else (w & -w).bit_length()
        regs[flag][reg] = max(regs[flag].get(reg, 0), rho)
        exact[flag].add(ck)
        exact["ALL"].add(ck)
    merged: dict[int, int] = {}
    for flag in list(regs):
        for reg, m_j in regs[flag].items():
            merged[reg] = max(merged.get(reg, 0), m_j)
    regs["ALL"] = merged
    rows = []
    for flag in sorted(regs):
        rs = regs[flag]
        s = sum(1 << (_HLL_CAP - m_j) for m_j in rs.values()) + (
            _HLL_M - len(rs)
        ) * (1 << _HLL_CAP)
        n_est = _HLL_ALPHA_NUM // (s * 1_000_000)
        n_ex = len(exact[flag])
        err = abs(n_est - n_ex) * 1_000_000 // n_ex
        rows.append(
            (flag, _HLL_M - len(rs), n_ex, n_est, err,
             err <= _HLL_BOUND_PPM)
        )
    return rows


def test_hll_matches_python_replay(spark, duck):
    """Replay the complete sketch in Python (hashlib md5, pure-int
    register/estimate arithmetic) and require bit-identical rows —
    including the merged ALL row, whose registers must equal the
    element-wise max of the per-status registers (mergeability)."""
    from autosinapi_spark.plans.staged_r15 import hll_distinct_union

    pairs = duck.execute(
        "SELECT o_orderstatus, o_custkey FROM orders"
    ).fetchall()
    expect = _py_hll_rows(pairs)
    got = [
        tuple(r) for r in hll_distinct_union(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # the union is a real union, not a sum: overlapping customer
    # sets make sum(per-status exact) strictly exceed the ALL exact
    per_status = {r[0]: r[2] for r in expect}
    assert sum(v for k, v in per_status.items() if k != "ALL") > (
        per_status["ALL"]
    )
    assert all(r[5] for r in expect), "estimate outside 3-sigma"


def test_hll_plan_shape(spark):
    """The sketch shuffle is bounded: MAX per (set, reg) is
    map-side combinable and no join side exceeds the 4-row
    estimate/exact frames — no cartesian anywhere."""
    from autosinapi_spark.plans.staged_r15 import hll_distinct_union

    plan = (
        hll_distinct_union(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


# --- HyperBall: replay + exact-BFS accuracy ---------------------------

def _py_hyperball_rows(
    lineitem_pairs: list[tuple[int, int]]
) -> tuple[list[tuple], list[int]]:
    """The exact HyperBall arithmetic from raw (orderkey, partkey)
    rows: basket edges, per-vertex seeded-md5 HLL registers,
    register-wise-MAX merge rounds, per-vertex integer estimate —
    plus the exact BFS neighborhood function for the accuracy check."""
    import hashlib

    from autosinapi_spark.plans.staged_r15 import (
        _HB_ALPHA_NUM,
        _HB_CAP,
        _HB_M,
        _HB_ROUNDS,
    )

    baskets: dict[int, set[int]] = defaultdict(set)
    for o, p in lineitem_pairs:
        baskets[o].add(p)
    nbrs: dict[int, set[int]] = defaultdict(set)
    for ps in baskets.values():
        for a, b in combinations(sorted(ps), 2):
            nbrs[a].add(b)
            nbrs[b].add(a)

    def regs_of(v: int) -> list[int]:
        h = int(
            hashlib.md5(f"hb:{v}".encode()).hexdigest()[:15], 16
        )
        reg, w = h % _HB_M, h >> 4
        rho = _HB_CAP if w == 0 else (w & -w).bit_length()
        return [rho if i == reg else 0 for i in range(_HB_M)]

    st = {v: regs_of(v) for v in nbrs}

    def n_of(state: dict[int, list[int]]) -> int:
        tot = 0
        for ms in state.values():
            s = sum(1 << (_HB_CAP - mj) for mj in ms)
            tot += _HB_ALPHA_NUM // (s * 1_000_000)
        return tot

    rows = [(0, n_of(st))]
    for r in range(1, _HB_ROUNDS + 1):
        st = {
            v: [
                max(st[v][i], *(st[u][i] for u in nbrs[v]))
                for i in range(_HB_M)
            ]
            for v in nbrs
        }
        rows.append((r, n_of(st)))

    exact = []
    for r in range(_HB_ROUNDS + 1):
        tot = 0
        for v in nbrs:
            ball = {v}
            for _ in range(r):
                ball = ball | {x for y in ball for x in nbrs[y]}
            tot += len(ball)
        exact.append(tot)
    return rows, exact


def test_hyperball_matches_python_replay_and_accuracy(spark, duck):
    """Replay the complete pipeline in Python (hashlib md5, pure-int
    register merge) and require bit-identical rows; then check the
    r >= 1 estimates land within the summed-sketch error envelope of
    the exact BFS neighborhood function (the r = 0 row is the
    documented raw-estimator small-range regime, excluded)."""
    from autosinapi_spark.plans.staged_r15 import (
        _HB_ROUNDS,
        hyperball_neighborhood,
    )

    pairs = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    expect, exact = _py_hyperball_rows(pairs)
    got = [
        tuple(r)
        for r in hyperball_neighborhood(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # monotone: balls only grow
    assert all(
        got[i][1] <= got[i + 1][1] for i in range(_HB_ROUNDS)
    )
    for r in range(1, _HB_ROUNDS + 1):
        rel = abs(got[r][1] - exact[r]) / exact[r]
        assert rel < 0.30, (r, got[r][1], exact[r], rel)


def test_hyperball_plan_shape(spark):
    """Each round is one edge-vs-state equi-join plus one grouped
    MAX — no cartesian, and register state never explodes per edge
    (the m registers ride as m INT columns)."""
    from autosinapi_spark.plans.staged_r15 import (
        hyperball_neighborhood,
    )

    plan = (
        hyperball_neighborhood(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Generate explode" not in plan


# --- hypothesis properties (pure Python, no Spark) --------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        c=st.integers(1, 10**9),
        cl_extra=st.integers(0, 10**9),
        n1r=st.integers(1, 10**6),
        n1l=st.integers(1, 10**6),
        t_extra=st.integers(0, 10**9),
    )
    def test_kn_closed_form_equals_textbook_rational(
        c, cl_extra, n1r, n1l, t_extra
    ):
        """The single-division KN closed form the query emits,
        ((4c - 3)T + 3*n1r*n1l) * 1e6 // (4*cl*T), must equal the
        floor of the textbook two-term formula
        (c - D)/cl + D*(n1r/cl)*(n1l/T) at D = 3/4 evaluated in
        EXACT rational arithmetic — for any consistent counts
        (cl >= c since the context's total includes this bigram;
        T >= 1)."""
        from fractions import Fraction

        cl = c + cl_extra
        t = max(n1l, 1) + t_extra  # T >= n1l by construction
        d = Fraction(3, 4)
        textbook = (Fraction(c) - d) / cl + d * Fraction(
            n1r, cl
        ) * Fraction(n1l, t)
        closed = ((4 * c - 3) * t + 3 * n1r * n1l) * 1_000_000 // (
            4 * cl * t
        )
        assert closed == (textbook * 1_000_000).__floor__()
        # and the probability is positive and bounded
        assert 0 < textbook

    @settings(max_examples=300, deadline=None)
    @given(
        regs=st.lists(
            st.integers(0, 55), min_size=64, max_size=64
        )
    )
    def test_hll_integer_estimate_equals_rational_formula(regs):
        """The one-division integer HLL estimate,
        alpha_num // (1e6 * S) with S = sum 2^(CAP - M_j), must
        equal the floor of the textbook alpha_m * m^2 / sum 2^-M_j
        in exact rational arithmetic, for ANY register state —
        and S must stay inside BIGINT (the no-overflow budget the
        docstring claims)."""
        from fractions import Fraction

        from autosinapi_spark.plans.staged_r15 import (
            _HLL_ALPHA_NUM,
            _HLL_CAP,
            _HLL_M,
        )

        s = sum(1 << (_HLL_CAP - m_j) for m_j in regs)
        assert s < 2**63
        est = _HLL_ALPHA_NUM // (s * 1_000_000)
        alpha = Fraction(709379, 1_000_000)
        textbook = (
            alpha
            * _HLL_M
            * _HLL_M
            / sum(Fraction(1, 1 << m_j) for m_j in regs)
        )
        assert est == textbook.__floor__()

    @settings(max_examples=300, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            max_size=40,
        )
    )
    def test_cc_incident_support_identity(edges):
        """The reduction the clustering query rests on: for every
        vertex, the sum of per-edge triangle supports over incident
        edges equals exactly 2x the triangle count at that vertex —
        on ANY simple graph (self-loops dropped, duplicates
        collapsed, orientation normalized like the query's edge
        build)."""
        es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        nbrs: dict[int, set[int]] = defaultdict(set)
        for u, v in es:
            nbrs[u].add(v)
            nbrs[v].add(u)
        sup = {
            (u, v): len(nbrs[u] & nbrs[v]) for u, v in es
        }
        for v, ns in nbrs.items():
            tri = sum(
                1
                for x, y in combinations(sorted(ns), 2)
                if y in nbrs[x]
            )
            ss = sum(
                s
                for (a, b), s in sup.items()
                if v in (a, b)
            )
            assert ss == 2 * tri, (v, ss, tri)

except ImportError:  # pragma: no cover - hypothesis ships in the image
    pass


# --- clustering coefficients: replay + planted fixture ----------------

def test_clustering_coeff_matches_python_brute_force(spark, duck):
    """Brute-force per-vertex triangle/degree arithmetic from raw
    lineitem rows must reproduce the emitted head exactly."""
    from autosinapi_spark.plans.staged_r15 import (
        _CC_TOP,
        local_clustering_coeff,
    )

    rows = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets: dict[int, set[int]] = defaultdict(set)
    for o, p in rows:
        baskets[o].add(p)
    nbrs: dict[int, set[int]] = defaultdict(set)
    for ps in baskets.values():
        for a, b in combinations(sorted(ps), 2):
            nbrs[a].add(b)
            nbrs[b].add(a)
    expect = []
    for v, ns in nbrs.items():
        d = len(ns)
        if d < 2:
            continue
        tri = sum(
            1
            for x, y in combinations(sorted(ns), 2)
            if y in nbrs[x]
        )
        expect.append(
            (v, d, tri, 2 * tri * 1_000_000 // (d * (d - 1)))
        )
    expect.sort(key=lambda r: (-r[3], r[0]))
    got = [
        tuple(r)
        for r in local_clustering_coeff(spark, SF_SMOKE).collect()
    ]
    assert got == expect[:_CC_TOP]
    assert len(got) > 0


def test_clustering_coeff_planted(spark, tmp_path):
    """Hand-enumerable fixture: a 4-clique (cc = 1), a path middle
    vertex (deg 2, no triangle, cc = 0), and a vertex bridging two
    disjoint edges (deg 2 via two baskets, cc = 0)."""
    from autosinapi_spark.plans.staged_r15 import local_clustering_coeff

    baskets = [
        (1, [1, 2, 3, 4]),  # 4-clique: deg 3, tri 3, cc = 1e6
        (2, [10, 11]),      # path 10-11-12: vertex 11 deg 2 tri 0
        (3, [11, 12]),
    ]
    rows = [
        (o, i + 1, p, 1)
        for o, ps in baskets
        for i, p in enumerate(ps)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_suppkey long",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    got = [
        tuple(r)
        for r in local_clustering_coeff(spark, str(tmp_path)).collect()
    ]
    # clique vertices lead (cc 1e6, vertex-ordered); then vertex 11
    # (deg 2, 0 triangles); path endpoints have deg 1 -> excluded
    assert got == [
        (1, 3, 3, 1_000_000),
        (2, 3, 3, 1_000_000),
        (3, 3, 3, 1_000_000),
        (4, 3, 3, 1_000_000),
        (11, 2, 0, 0),
    ]


def test_clustering_coeff_plan_shape(spark):
    from autosinapi_spark.plans.staged_r15 import local_clustering_coeff

    plan = (
        local_clustering_coeff(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan
