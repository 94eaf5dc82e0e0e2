"""Round-12-registered queries (plans/staged_r12.py): Python replays +
structural invariants.

The Spark-vs-DuckDB oracle compare for this cohort lives in
tests/test_correctness.py since the r12 flip registered them (a
duplicate compare ran here while they were staged in r11); what stays
here is what the registry compare can't express — independent
pure-Python replays of the novel arithmetic (water-filling cut,
integer PageRank with the epsilon stop, stopword argmax confusion),
plan-shape pins, and hypothesis property tests over the UniMax
closed form.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from autosinapi_spark.plans.staged_r12 import (
    _PRC_BASE,
    _PRC_EPS,
    _PRC_INIT,
    _PRC_MAX_IT,
    _PRC_TOP,
    _SW_LISTS,
    _UMX_BUDGET_DEN,
    _UMX_BUDGET_NUM,
    _UMX_EPOCHS,
)
from tests.conftest import SF_SMOKE


def _py_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text or "").strip().split(" ")


def test_unimax_matches_python_replay(spark, duck):
    """Full water-filling replay from raw texts: per-source token
    sums, the ascending-order prefix cut, and both allocation
    branches, re-derived independently in pure Python."""
    from autosinapi_spark.plans.staged_r12 import (
        unimax_source_allocation,
    )

    rows = duck.execute("SELECT source, text FROM documents").fetchall()
    n_docs: Counter = Counter()
    n_tok: Counter = Counter()
    for source, text in rows:
        n_docs[source] += 1
        n_tok[source] += len(_py_tokens(text))

    c = _UMX_EPOCHS
    order = sorted(n_tok, key=lambda s: (n_tok[s], s))
    k = len(order)
    total = sum(n_tok.values())
    b = (_UMX_BUDGET_NUM * total) // _UMX_BUDGET_DEN

    # prefix cut: running-AND of the cap-fits flag in ascending order
    t_star, cum = 0, 0
    cum_t = 0
    for i, s in enumerate(order, start=1):
        if c * n_tok[s] * (k - i + 1) <= b - c * cum:
            t_star, cum_t = i, cum + n_tok[s]
        else:
            break
        cum += n_tok[s]

    expect = {}
    for i, s in enumerate(order, start=1):
        if i <= t_star:
            alloc = c * n_tok[s]
        elif k > t_star:
            alloc = (b - c * cum_t) // (k - t_star)
        else:
            alloc = 0
        expect[s] = (
            n_docs[s],
            n_tok[s],
            c * n_tok[s],
            alloc,
            alloc * 1000 // n_tok[s],
            i <= t_star,
        )

    got = {
        r.source: (
            r.n_docs,
            r.n_tok,
            r.cap_tok,
            r.alloc_tok,
            r.epochs_pm,
            r.capped,
        )
        for r in unimax_source_allocation(spark, SF_SMOKE).collect()
    }
    assert got == expect

    # semantic invariants of a valid water-filling solution: the
    # budget is conserved up to the truncating-division remainder,
    # no source exceeds its cap, and the fixture's budget choice
    # (1x < B/T < Cx) exercises BOTH branches.
    allocated = sum(v[3] for v in expect.values())
    assert allocated <= b
    # every allocation respects its cap — for the uncapped tail the
    # uniform share U is strictly below the first uncapped cap by the
    # cut condition, and caps grow along the ascending order
    assert all(v[3] <= v[2] for v in expect.values())
    if k > t_star:
        # unspent budget is only the truncating-division remainder
        assert b - allocated < k - t_star
        uncapped_alloc = {v[3] for v in expect.values() if not v[5]}
        assert len(uncapped_alloc) == 1  # uniform share for the tail
    assert 0 < t_star < k, (
        "fixture must exercise both branches — retune _UMX_BUDGET if "
        "the testdata distribution changed"
    )


def test_pagerank_convergence_matches_python_replay(spark, duck):
    """Integer PageRank with the epsilon stop, replayed on plain
    dicts: edge set, truncating-division shares, per-round max delta,
    the first-converged round, and the top-100 competition ranks."""
    from autosinapi_spark.plans.staged_r12 import (
        pagerank_convergence_eps,
    )

    li = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = defaultdict(set)
    for ok, pk in li:
        baskets[ok].add(pk)
    edges = set()
    for ps in baskets.values():
        for a in ps:
            for bpart in ps:
                if a != bpart:
                    edges.add((a, bpart))
    outdeg: Counter = Counter(src for src, _ in edges)
    nodes = {pk for _, pk in li}

    ranks = {n: _PRC_INIT for n in nodes}
    n_iters = _PRC_MAX_IT
    for t in range(1, _PRC_MAX_IT + 1):
        incoming: Counter = Counter()
        for src, dst in edges:
            incoming[dst] += ranks[src] // outdeg[src]
        new = {
            n: _PRC_BASE + (85 * incoming.get(n, 0)) // 100
            for n in nodes
        }
        maxd = max(abs(new[n] - ranks[n]) for n in nodes)
        ranks = new
        if maxd <= _PRC_EPS:
            n_iters = t
            break

    head = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_PRC_TOP
    ]
    expect = []
    for pos, (pk, pr) in enumerate(head, start=1):
        # competition rank: ties share the first position
        rank_pos = (
            expect[-1][2]
            if expect and expect[-1][1] == pr
            else pos
        )
        expect.append((pk, pr, rank_pos, n_iters))

    got = sorted(
        (
            (r.part_key, r.pagerank_units, r.rank_pos, r.n_iters)
            for r in pagerank_convergence_eps(spark, SF_SMOKE).collect()
        ),
        key=lambda t4: (-t4[1], t4[0]),
    )
    assert got == expect
    assert 1 <= n_iters < _PRC_MAX_IT, (
        "fixture must converge strictly before the cap so the "
        "early-out contrast is actually exercised"
    )


def test_confusion_matches_python_replay(spark, duck):
    """Stopword votes, the lex-order argmax tie-break, and the ppm
    shares, replayed in pure Python."""
    from autosinapi_spark.plans.staged_r12 import (
        lang_id_stopword_confusion,
    )

    rows = duck.execute("SELECT lang, text FROM documents").fetchall()
    cells: Counter = Counter()
    for lang, text in rows:
        ts = _py_tokens(text)
        votes = [
            (sum(1 for t in ts if t in set(ws)), code)
            for code, ws in _SW_LISTS
        ]
        maxh = max(v for v, _ in votes)
        if maxh == 0:
            pred = "und"
        else:
            pred = next(code for v, code in votes if v == maxh)
        cells[(lang, pred)] += 1
    label_tot: Counter = Counter()
    for (lang, _), n in cells.items():
        label_tot[lang] += n
    expect = {
        (lang, pred): (
            n,
            label_tot[lang],
            n * 1_000_000 // label_tot[lang],
        )
        for (lang, pred), n in cells.items()
    }
    got = {
        (r.lang, r.pred_lang): (r.n_docs, r.label_total, r.share_ppm)
        for r in lang_id_stopword_confusion(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # per-label shares must tile the label up to ppm truncation
    for lang, tot in label_tot.items():
        s = sum(v[2] for (lg, _), v in expect.items() if lg == lang)
        assert 1_000_000 - len(
            [1 for (lg, _) in expect if lg == lang]
        ) < s <= 1_000_000


def test_staged_plan_shapes(spark):
    """Pin the staged cohort's exchange budgets: UniMax is one
    corpus aggregate plus sources-sized single-partition math, the
    confusion matrix is one corpus aggregate plus a cells-sized
    label window, and the convergence PageRank's per-round loop
    matches the registered fixed-iteration query's shapes (checked
    structurally there; here we pin the final-plan head only since
    the loop runs eagerly)."""
    from autosinapi_spark.plans.staged_r12 import (
        lang_id_stopword_confusion,
        unimax_source_allocation,
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p_umx = plan(unimax_source_allocation(spark, SF_SMOKE))
    p_cnf = plan(lang_id_stopword_confusion(spark, SF_SMOKE))
    for p in (p_umx, p_cnf):
        assert "CartesianProduct" not in p
    # UniMax: the corpus-keyed aggregate is checkpointed, so the
    # final plan holds NO corpus-sized exchange and exactly one
    # corpus scan overall (the checkpointed RDD replaces the scan);
    # everything downstream is SinglePartition over the sources-sized
    # frame.
    assert p_umx.count("hashpartitioning") == 0
    assert p_umx.count("documents.parquet") == 0  # behind the checkpoint
    # Confusion: one corpus-keyed agg pair (lang, pred) plus the
    # cells-sized lang window repartition.
    assert p_cnf.count("hashpartitioning") <= 4
    assert p_cnf.count("documents.parquet") == 1


# --- water-filling closed form: property tests over random inputs ----

def _py_waterfill(
    sizes: dict[str, int], c: int, b: int
) -> dict[str, tuple[int, bool]]:
    """The exact integer arithmetic both engines run (mirrors
    _umx_sql / unimax_source_allocation), as a pure function:
    source -> (alloc, capped)."""
    order = sorted(sizes, key=lambda s: (sizes[s], s))
    k = len(order)
    t_star, cum, cum_t = 0, 0, 0
    for i, s in enumerate(order, start=1):
        if c * sizes[s] * (k - i + 1) <= b - c * cum:
            t_star, cum_t = i, cum + sizes[s]
        else:
            break
        cum += sizes[s]
    out = {}
    for i, s in enumerate(order, start=1):
        if i <= t_star:
            out[s] = (c * sizes[s], True)
        elif k > t_star:
            out[s] = ((b - c * cum_t) // (k - t_star), False)
        else:
            out[s] = (0, False)
    return out


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        sizes=st.lists(
            st.integers(min_value=1, max_value=10**12),
            min_size=1,
            max_size=40,
        ),
        c=st.integers(min_value=1, max_value=8),
        bud_num=st.integers(min_value=1, max_value=40),
    )
    def test_waterfill_invariants(sizes, c, bud_num):
        """For ANY size distribution, epoch cap, and budget: every
        allocation respects its cap, the capped set is a prefix of
        the ascending order, unspent budget is only the truncating
        remainder (or the whole surplus when everything capped),
        allocations are monotone in source size, and the cut is
        maximal (t_star + 1 genuinely fails the cap-fits test)."""
        named = {f"s{i:03d}": v for i, v in enumerate(sizes)}
        total = sum(sizes)
        b = bud_num * total // 8  # 0.125x .. 5x the corpus
        out = _py_waterfill(named, c, b)
        order = sorted(named, key=lambda s: (named[s], s))
        k = len(order)

        capped_flags = [out[s][1] for s in order]
        # prefix property
        assert capped_flags == sorted(capped_flags, reverse=True)
        # caps respected
        assert all(out[s][0] <= c * named[s] for s in order)
        allocated = sum(v for v, _ in out.values())
        t_star = sum(capped_flags)
        if t_star < k:
            # remainder-only slack, uniform tail, tail below its caps
            assert 0 <= b - allocated < k - t_star
            tail = {out[s][0] for s in order if not out[s][1]}
            assert len(tail) == 1
            # maximal cut: the first uncapped source genuinely fails
            s_next = order[t_star]
            cum_t = sum(named[s] for s in order[:t_star])
            assert (
                c * named[s_next] * (k - t_star)
                > b - c * cum_t
            )
        else:
            # everything capped: allocation is exactly C tokens/source
            assert allocated == c * total <= b
        # monotone: a bigger source never receives less
        allocs = [out[s][0] for s in order]
        assert allocs == sorted(allocs)

except ImportError:  # pragma: no cover - hypothesis ships in the image
    pass


def test_pagerank_convergence_head_plan(spark):
    """The returned head must be a TakeOrdered cut over the converged
    (id, pr) frame — never a global sort or a cartesian — and the
    loop must have stopped strictly before the cap on the fixture
    (n_iters constant-folded into the plan as a literal)."""
    from autosinapi_spark.plans.staged_r12 import (
        pagerank_convergence_eps,
    )

    df = pagerank_convergence_eps(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
