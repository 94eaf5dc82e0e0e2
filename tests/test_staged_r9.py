"""Round-9-registered queries (plans/staged_r9.py): Python replays +
structural invariants.

The Spark-vs-DuckDB oracle compare for this cohort lives in
tests/test_correctness.py since the r9 flip registered them (a
duplicate compare ran here while they were staged in r8); what stays
here is what the registry compare can't express — independent
pure-Python replays of the iterative operators and structural
invariants for the sketches and the packing plan.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.test_correctness import _canon_rows


def _r9_cohort() -> dict:
    """name -> QuerySpec for every query defined in plans/staged_r9."""
    import __spark_entry__ as e

    return {
        n: spec
        for n, spec in e._registry().items()
        if spec.fn.__module__.endswith("staged_r9")
    }


# --- BPE: pure-Python replay of the whole training loop --------------


def _py_bpe(texts: list[str], rounds: int):
    freq: Counter = Counter()
    for t in texts:
        for w in re.sub("[ \\t\\n\\r\\f\\v]+", " ", t or "").strip().split(
            " "
        ):
            if w:
                freq[w] += 1
    dic = [(list(w), f) for w, f in freq.items()]
    merges = []
    for r in range(1, rounds + 1):
        cnt: Counter = Counter()
        for syms, f in dic:
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        if not cnt:
            break
        (x, y), n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, x, y, x + y, n))
        new = []
        for syms, f in dic:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new.append((out, f))
        dic = new
    return merges


def test_bpe_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _BPE_ROUNDS,
        bpe_train_merges,
    )

    texts = [r[0] for r in duck.execute("SELECT text FROM documents").fetchall()]
    expect = _py_bpe(texts, _BPE_ROUNDS)
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.merged, r.pair_n)
        for r in bpe_train_merges(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # merge-table invariants: counts never increase round-over-round
    # (a merge only splits/renames existing adjacencies), merged is
    # the concatenation, and no pair repeats (its adjacencies were
    # consumed by its own merge round)
    ns = [r[4] for r in got]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert all(r[3] == r[1] + r[2] for r in got)
    assert len({(r[1], r[2]) for r in got}) == len(got)


# --- personalized PageRank: pure-Python integer replay ---------------


def test_ppr_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _PPR_BASE,
        _PPR_INIT,
        _PPR_ITERS,
        _PPR_NATION,
        _PPR_TOP,
        personalized_pagerank_nation,
    )

    li = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    edges = set()
    for ps in baskets.values():
        for a in ps:
            for b in ps:
                if a != b:
                    edges.add((a, b))
    outdeg = Counter(s for s, _ in edges)
    nodes = {p for _, p in li}
    seeds = {
        r[0]
        for r in duck.execute(
            f"""
            SELECT DISTINCT l.l_partkey FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = '{_PPR_NATION}'
            """
        ).fetchall()
    }
    assert seeds and seeds < nodes  # fixture exercises a strict subset
    pr = {n: (_PPR_INIT if n in seeds else 0) for n in nodes}
    for _ in range(_PPR_ITERS):
        inc: dict = defaultdict(int)
        for s, d in edges:
            inc[d] += pr[s] // outdeg[s]
        pr = {
            n: (_PPR_BASE if n in seeds else 0) + 85 * inc.get(n, 0) // 100
            for n in nodes
        }
    order = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:_PPR_TOP]
    expect = [
        (p, units, i + 1, p in seeds)
        for i, (p, units) in enumerate(order)
    ]
    got = [
        (r.part_key, r.ppr_units, r.rank_pos, r.is_seed)
        for r in personalized_pagerank_nation(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # mass reaches beyond the seed set (propagation actually happened)
    assert any(not r[3] and r[1] > 0 for r in got)


# --- streaming KMV: both estimator paths are exercised ---------------


def test_skmv_exact_path_at_smoke(spark):
    # sf0.001 has < k distinct users per day, so every window takes
    # the nk < k exact branch: estimate == exact, zero error
    from autosinapi_spark.plans.staged_r9 import streaming_kmv_distinct

    rows = streaming_kmv_distinct(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.n_est == float(r.n_exact) for r in rows)
    assert all(r.rel_err == 0.0 and r.within_bound for r in rows)


def test_skmv_estimate_path_at_correct(spark):
    # sf0.01 has ~125-141 distinct users per day > k=64: every window
    # estimates from the k-th hash, and the 3-sigma bound holds
    from autosinapi_spark.plans.staged_r9 import streaming_kmv_distinct

    rows = streaming_kmv_distinct(spark, SF_CORRECT).collect()
    assert rows
    est_rows = [r for r in rows if r.n_est != float(r.n_exact)]
    assert est_rows, "estimate path never exercised at sf0.01"
    assert all(r.within_bound for r in rows)


# --- compaction planner: packing invariants --------------------------


def test_compaction_packing_invariants(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _CP_FILES,
        _CP_ROW,
        _CP_TARGET,
        compaction_bin_packing,
    )

    rows = compaction_bin_packing(spark, SF_SMOKE).collect()
    assert rows
    n_small = duck.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT strftime(l_shipdate, '%Y-%m') m,
                 l_orderkey % {_CP_FILES} f,
                 CAST(SUM({_CP_ROW}) AS BIGINT) AS bytes
          FROM lineitem GROUP BY 1, 2
        ) WHERE bytes < {_CP_TARGET}
        """
    ).fetchone()[0]
    # every candidate file lands in exactly one bin
    assert sum(r.n_files for r in rows) == n_small
    by_month = defaultdict(list)
    for r in rows:
        by_month[r.part_month].append(r)
    for m, rs in by_month.items():
        bins = sorted(r.bin for r in rs)
        # bins are contiguous from 0 (prefix-sum binning leaves no gap)
        assert bins == list(range(len(bins))), m
        for r in rs:
            # next-fit overflow is bounded by a single file
            assert r.bin_bytes < _CP_TARGET + r.max_file_bytes, (m, r.bin)
            assert r.min_file_bytes <= r.max_file_bytes


# --- CUSUM: the window identity matches the textbook recursion -------


def test_cusum_matches_python_recursion(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _CUSUM_C,
        cusum_changepoints,
    )

    m = duck.execute(
        """
        SELECT n.n_name, year(o.o_orderdate) y, month(o.o_orderdate) mo,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,10)))
                          * 100, 0) AS BIGINT) cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """
    ).fetchall()
    series = defaultdict(list)
    for name, y, mo, cents in m:
        series[name].append((y, mo, cents))
    expect = []
    for name in sorted(series):
        rows = series[name]
        n = len(rows)
        tot = sum(c for _, _, c in rows)
        dd = [n * c - tot for _, _, c in rows]
        a = sum(abs(x) for x in dd)
        spos = sneg = 0
        for (y, mo, cents), d in zip(rows, dd):
            # textbook recursions; the query computes them via the
            # prefix-sum identity instead
            spos = max(0, spos + d)
            sneg = max(0, sneg - d)
            expect.append(
                (
                    name,
                    f"{y:04d}-{mo:02d}",
                    cents,
                    spos,
                    sneg,
                    spos * n > _CUSUM_C * a or sneg * n > _CUSUM_C * a,
                )
            )
    got = [tuple(r) for r in cusum_changepoints(spark, SF_SMOKE).collect()]
    assert got == expect
    # the fixture must exercise both alarm outcomes
    flags = {r[5] for r in got}
    assert flags == {True, False}


# --- expectations report: planted violations -------------------------


def test_quality_report_planted_violations(spark):
    from pyspark.sql import functions as F

    from autosinapi_spark.operators.quality import expectations_report

    df = spark.createDataFrame(
        [
            (1, "a", 5),
            (1, "a", 7),  # dup key for uniqueness:k
            (2, None, 3),  # null v -> completeness:v
            (3, "b", -1),  # negative x -> nonneg:x
            (9, "c", 2),  # k=9 missing from ref -> ref:k
        ],
        "k int, v string, x int",
    )
    ref = spark.createDataFrame([(1,), (2,), (3,)], "rk int")
    rows = {
        r.check_name: r
        for r in expectations_report(
            df,
            row_checks=[
                ("completeness:v", F.col("v").isNull()),
                ("nonneg:x", F.col("x").isNull() | (F.col("x") < 0)),
            ],
            unique_checks=[("uniqueness:k", ["k"])],
            ref_checks=[("ref:k", ["k"], ref, ["rk"])],
        ).collect()
    }
    assert rows["completeness:v"].n_violations == 1
    assert rows["completeness:v"].observed_ppm == 800000
    assert not rows["completeness:v"].passed
    assert rows["nonneg:x"].n_violations == 1
    assert rows["uniqueness:k"].n_violations == 1  # 5 rows, 4 distinct k
    assert rows["ref:k"].n_violations == 1
    assert all(not r.passed for r in rows.values())


def test_quality_report_all_green(spark):
    from pyspark.sql import functions as F

    from autosinapi_spark.operators.quality import expectations_report

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    rows = expectations_report(
        df,
        row_checks=[("completeness:v", F.col("v").isNull())],
        unique_checks=[("uniqueness:k", ["k"])],
    ).collect()
    assert all(r.passed and r.observed_ppm == 1000000 for r in rows)


# --- SSSP: pure-Python Bellman-Ford replay ---------------------------


def test_sssp_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _SSSP_ROUNDS,
        _SSSP_SCALE,
        _SSSP_SEEDS,
        sssp_weighted_distances,
    )

    li = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    cnt: Counter = Counter()
    for ps in baskets.values():
        for a in ps:
            for b in ps:
                if a < b:
                    cnt[(a, b)] += 1
    wed = defaultdict(list)
    for (u, v), c in cnt.items():
        w = _SSSP_SCALE // c
        wed[u].append((v, w))
        wed[v].append((u, w))
    seeds = sorted(wed)[:_SSSP_SEEDS]
    dist = {(s, s): 0 for s in seeds}
    for _ in range(_SSSP_ROUNDS):
        new = dict(dist)
        for (s, n), d in dist.items():
            for m, w in wed[n]:
                k = (s, m)
                if k not in new or d + w < new[k]:
                    new[k] = d + w
        dist = new
    expect = sorted((s, n, d) for (s, n), d in dist.items())
    got = [
        (r.seed, r.node, r.dist_units)
        for r in sssp_weighted_distances(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # weighted ordering differs from hop ordering somewhere: some
    # 2-edge path must beat a direct edge or the weights are inert
    direct = {}
    for (u, v), c in cnt.items():
        w = _SSSP_SCALE // c
        direct[(u, v)] = w
        direct[(v, u)] = w
    beat = [
        (s, n)
        for (s, n), d in dist.items()
        if (s, n) in direct and d < direct[(s, n)]
    ]
    assert beat, "no multi-edge path ever beat a direct edge"


# --- IVM: refresh is bit-identical to a full recompute ---------------


def test_ivm_equals_full_recompute(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _IVM_CUTOFF,
        _IVM_DELKEY,
        incremental_agg_maintenance,
    )

    got = [
        (r.month, r.n_orders, r.revenue_cents)
        for r in incremental_agg_maintenance(spark, SF_SMOKE).collect()
    ]
    # the final logical state: history minus retractions, plus the
    # post-cutoff batch == everything except deleted old orders
    expect = duck.execute(
        f"""
        SELECT printf('%04d-%02d', year(o_orderdate), month(o_orderdate))
                 AS month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
                          * 100, 0) AS BIGINT) AS revenue_cents
        FROM orders
        WHERE NOT (o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
                   AND o_orderkey % {_IVM_DELKEY} = 0)
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert got == [tuple(r) for r in expect]
    # the fixture must exercise both delta kinds
    n_del = duck.execute(
        f"""SELECT COUNT(*) FROM orders
            WHERE o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
              AND o_orderkey % {_IVM_DELKEY} = 0"""
    ).fetchone()[0]
    n_ins = duck.execute(
        f"""SELECT COUNT(*) FROM orders
            WHERE o_orderdate >= TIMESTAMP '{_IVM_CUTOFF}'"""
    ).fetchone()[0]
    assert n_del > 0 and n_ins > 0


# --- MAD outliers: pure-Python median/MAD replay ---------------------


def test_mad_matches_python_replay(spark, duck):
    import statistics

    from autosinapi_spark.plans.staged_r9 import (
        _MAD_K,
        mad_outlier_flags,
    )

    m = duck.execute(
        """
        SELECT n.n_name, year(o.o_orderdate) y, month(o.o_orderdate) mo,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,10)))
                          * 100, 0) AS BIGINT) cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """
    ).fetchall()
    series = defaultdict(list)
    for name, y, mo, cents in m:
        series[name].append((y, mo, cents))
    expect = []
    for name in sorted(series):
        vals = [float(c) for _, _, c in series[name]]
        med = statistics.median(vals)
        mad = statistics.median(abs(v - med) for v in vals)
        for (y, mo, cents) in series[name]:
            adev = abs(float(cents) - med)
            expect.append(
                (
                    name,
                    f"{y:04d}-{mo:02d}",
                    cents,
                    round(med, 6),
                    round(mad, 6),
                    adev > _MAD_K * mad,
                )
            )
    got = [tuple(r) for r in mad_outlier_flags(spark, SF_SMOKE).collect()]
    assert got == expect
    flags = {r[5] for r in got}
    assert flags == {True, False}  # both outcomes exercised


# --- plan-shape pins for the staged set ------------------------------


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_staged_plans_are_scale_safe(spark):
    """The shapes that make the r9-cohort queries 100 TB-safe must
    survive future edits. CartesianProduct is banned everywhere; the
    1-row broadcast scalars (BPE argmax, watermark, orphan count)
    are the repo's sanctioned BroadcastNestedLoopJoin exemption; the
    metric-grain window queries must never collapse to an
    unpartitioned (SinglePartition) exchange."""
    cohort = _r9_cohort()
    assert len(cohort) == 20, sorted(cohort)

    for name in cohort:
        plan = _plan(cohort[name].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name

    for name in (
        "compaction_bin_packing",
        "cusum_changepoints",
        "mad_outlier_flags",
        # the sketch/DP/rules/fold queries must never collapse to an
        # unpartitioned exchange either (systematic_weighted_sample's
        # block-offset window and histogram_quantile_cents' tiny
        # percentile frames are the sanctioned exceptions: the frames
        # under those windows are metadata-scale by construction)
        # (association_rules_2item keeps its sanctioned 1-row
        # SinglePartition: the global n_baskets scalar broadcast)
        "hll_distinct_flags",
        "dp_noisy_counts",
        "holt_trend_forecast",
        # every OLS aggregate is keyed by nation; the 25-row final
        # sort is a range exchange, never a single partition
        # (chi2/PMI keep their sanctioned 1-row scalar broadcasts)
        "ols_trend_fit",
    ):
        plan = _plan(cohort[name].fn(spark, SF_SMOKE))
        assert "SinglePartition" not in plan, name


# --- HLL: pure-Python replay of the register sketch ------------------


def test_hll_matches_python_replay(spark, duck):
    import hashlib

    from autosinapi_spark.plans.staged_r9 import (
        _HLL_C,
        _HLL_M,
        _HLL_SEED,
        _HLL_WBITS,
        hll_distinct_flags,
    )

    base = duck.execute(
        "SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem"
    ).fetchall()
    regs: defaultdict = defaultdict(dict)
    exact: Counter = Counter()
    for flag, okey in base:
        exact[flag] += 1
        h = int(
            hashlib.md5(f"{_HLL_SEED}:{okey}".encode()).hexdigest()[:15],
            16,
        )
        b, w = h % _HLL_M, h >> 6
        rho = (_HLL_WBITS + 1) - w.bit_length() if w else _HLL_WBITS + 1
        regs[flag][b] = max(regs[flag].get(b, 0), rho)
    rows = {r.l_returnflag: r for r in hll_distinct_flags(spark, SF_SMOKE).collect()}
    assert sorted(rows) == sorted(regs)
    for flag, rg in regs.items():
        z = sum(1 << (_HLL_WBITS + 1 - r) for r in rg.values())
        z += (_HLL_M - len(rg)) * (1 << (_HLL_WBITS + 1))
        r = rows[flag]
        assert r.z_scaled == z, flag
        assert r.v_empty == _HLL_M - len(rg), flag
        assert r.n_exact == exact[flag], flag
        assert r.n_est == round(_HLL_C / z, 4), flag
        # the standard error of a 64-register HLL is ~1.04/8 = 13%;
        # a 50% miss means the sketch, not sampling luck, is broken
        assert r.rel_err < 0.5, (flag, r.rel_err)


# --- DP geometric mechanism: exact integer replay --------------------


def test_dp_matches_python_replay(spark, duck):
    import hashlib

    from autosinapi_spark.plans.staged_r9 import (
        _DP_SEED_A,
        _DP_SEED_B,
        dp_noisy_counts,
    )

    def tz(seed: int, key: str) -> int:
        h = int(
            hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16
        )
        if h == 0:
            return 60
        return (h & -h).bit_length() - 1

    truth = dict(
        (tuple(k), n)
        for *k, n in duck.execute(
            "SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem"
            " GROUP BY 1, 2"
        ).fetchall()
    )
    rows = dp_noisy_counts(spark, SF_SMOKE).collect()
    assert {(r.l_returnflag, r.l_linestatus) for r in rows} == set(truth)
    saw_nonzero = False
    for r in rows:
        key = f"{r.l_returnflag}|{r.l_linestatus}"
        noise = tz(_DP_SEED_A, key) - tz(_DP_SEED_B, key)
        assert r.n_true == truth[(r.l_returnflag, r.l_linestatus)]
        assert r.noise == noise
        assert r.n_released == max(0, r.n_true + noise)
        saw_nonzero = saw_nonzero or noise != 0
    # with 6 groups the chance every noise draw is zero is (1/3)^6;
    # if it happens the sampler is almost surely broken
    assert saw_nonzero


# --- association rules: pure-Python Apriori replay --------------------


def test_association_rules_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _AR_MINSUP,
        _AR_TOP,
        association_rules_2item,
    )

    baskets = defaultdict(set)
    for okey, pkey in duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        baskets[okey].add(pkey)
    supp: Counter = Counter()
    pair: Counter = Counter()
    for items in baskets.values():
        for x in items:
            supp[x] += 1
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                pair[(x, y)] += 1
    n = len(baskets)
    expected = []
    for (x, y), sp in pair.items():
        if sp < _AR_MINSUP:
            continue
        for a, c in ((x, y), (y, x)):
            expected.append(
                (
                    a,
                    c,
                    sp,
                    supp[a],
                    supp[c],
                    sp * 1_000_000 // supp[a],
                    sp * n * 1_000_000 // (supp[a] * supp[c]),
                )
            )
    expected.sort(key=lambda r: (-r[6], r[0], r[1]))
    got = [
        tuple(r) for r in association_rules_2item(spark, SF_SMOKE).collect()
    ]
    assert got == expected[:_AR_TOP]
    # confidence is a probability: never above 1e6 ppm
    assert all(r[5] <= 1_000_000 for r in got)


# --- CMS F2 estimate: replay + the overestimate invariant ------------


def test_join_size_cms_matches_python_replay(spark, duck):
    import hashlib

    from autosinapi_spark.plans.staged_r9 import (
        _F2_SEEDS,
        _F2_W,
        join_size_cms_estimate,
    )

    counts = dict(
        duck.execute(
            "SELECT l_partkey, COUNT(*) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    f2_exact = sum(c * c for c in counts.values())
    ests = {}
    for s in _F2_SEEDS:
        buckets: Counter = Counter()
        for k, c in counts.items():
            h = int(
                hashlib.md5(f"{s}:{k}".encode()).hexdigest()[:15], 16
            )
            buckets[h % _F2_W] += c
        ests[s] = sum(c * c for c in buckets.values())
    rows = join_size_cms_estimate(spark, SF_SMOKE).collect()
    assert [r.seed for r in rows] == sorted(_F2_SEEDS)
    best = min(ests.values())
    for r in rows:
        assert r.f2_exact == f2_exact
        assert r.f2_est_depth == ests[r.seed], r.seed
        # CMS inner-product estimates only ever overestimate
        assert r.f2_est_depth >= f2_exact
        assert r.f2_est == best
        assert r.err_ppm == (best - f2_exact) * 1_000_000 // f2_exact
        assert r.max_cnt == max(counts.values())
        assert r.max_key == min(
            k for k, c in counts.items() if c == r.max_cnt
        )


# --- systematic PPS sample: integer replay + PPS invariants ----------


def test_systematic_sample_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _SYS_K,
        systematic_weighted_sample,
    )

    docs = duck.execute(
        "SELECT doc_id, n_chars FROM documents ORDER BY doc_id"
    ).fetchall()
    w_total = sum(w for _, w in docs)
    expected = []
    cum = 0
    for did, w in docs:
        before, cum = cum, cum + w
        if (cum * _SYS_K) // w_total > (before * _SYS_K) // w_total:
            expected.append(
                (did, w, before, (before * _SYS_K) // w_total)
            )
    got = [
        tuple(r)
        for r in systematic_weighted_sample(spark, SF_SMOKE).collect()
    ]
    assert got == expected
    # systematic PPS: at most K selections, strata strictly increase,
    # and any document heavier than one stratum MUST be selected
    assert len(got) <= _SYS_K
    strata = [r[3] for r in got]
    assert strata == sorted(strata) and len(set(strata)) == len(strata)
    heavy = {d for d, w in docs if w * _SYS_K >= w_total}
    assert heavy <= {r[0] for r in got}


# --- histogram quantile sketch: replay + bracketing ------------------


def test_histogram_quantile_matches_python_replay(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _HQ_BINS,
        _HQ_PCTS,
        histogram_quantile_cents,
    )

    rows = duck.execute(
        "SELECT l_returnflag,"
        " CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * 100, 0)"
        " AS BIGINT) FROM lineitem"
    ).fetchall()
    lo = min(c for _, c in rows)
    hi = max(c for _, c in rows)
    span = hi - lo + 1
    by_flag = defaultdict(list)
    for f, c in rows:
        by_flag[f].append(c)
    got = histogram_quantile_cents(spark, SF_SMOKE).collect()
    assert len(got) == len(by_flag) * len(_HQ_PCTS)
    for r in got:
        cs = by_flag[r.l_returnflag]
        bins = Counter((c - lo) * _HQ_BINS // span for c in cs)
        target = (len(cs) * r.pct + 99) // 100
        cum = 0
        qbin = None
        for b in sorted(bins):
            cum += bins[b]
            if cum >= target:
                qbin = b
                break
        assert r.n_rows == len(cs)
        assert r.approx_lo_cents == lo + qbin * span // _HQ_BINS
        # the sketch bin must BRACKET the exact ceil-rank value
        exact_rank_val = sorted(cs)[target - 1]
        assert (
            r.approx_lo_cents
            <= exact_rank_val
            <= lo + (qbin + 1) * span // _HQ_BINS
        )
        # the dictionary-grain exact arm must reproduce the standard
        # linear-interpolation quantile (numpy's default)
        import numpy as np

        assert r.exact_cents == round(
            float(np.percentile(np.array(cs, dtype=np.int64), r.pct)), 6
        )


# --- Holt smoothing: replay of the textbook recursion ----------------


def test_holt_matches_python_recursion(spark, duck):
    from autosinapi_spark.plans.staged_r9 import (
        _HOLT_MIN_MONTHS,
        holt_trend_forecast,
    )

    def tdiv(a: int, b: int) -> int:
        # truncating division, matching DuckDB // and Spark DIV
        q = abs(a) // b
        return -q if a < 0 else q

    series = defaultdict(list)
    for item, per, cents in duck.execute(
        """
        SELECT l_partkey, strftime(l_shipdate, '%Y-%m'),
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
                          * 100, 0) AS BIGINT)
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall():
        series[item].append(cents)
    expected = []
    for item in sorted(series):
        xs = series[item]
        if len(xs) < _HOLT_MIN_MONTHS:
            continue
        lvl, trd = xs[0], 0
        for x in xs[1:]:
            nl = tdiv(3 * x + 7 * (lvl + trd), 10)
            trd = tdiv(3 * (nl - lvl) + 7 * trd, 10)
            lvl = nl
        expected.append(
            (item, len(xs), xs[-1], lvl, trd, lvl + trd)
        )
    got = [
        tuple(r) for r in holt_trend_forecast(spark, SF_SMOKE).collect()
    ]
    assert got == expected
    # the trend term must actually exercise negative values somewhere,
    # or the truncating-division parity claim goes untested
    assert any(r[4] < 0 for r in got)


# --- ANN recall eval: metric consistency invariants ------------------


def test_ann_recall_eval_invariants(spark):
    from autosinapi_spark.plans.similarity_queries import _TOP_K
    from autosinapi_spark.plans.staged_r9 import ann_recall_eval

    rows = ann_recall_eval(spark, SF_SMOKE).collect()
    assert rows
    macro = rows[0].macro_recall_ppm
    assert all(r.macro_recall_ppm == macro for r in rows)
    assert (
        sum(r.recall_ppm for r in rows) // len(rows) == macro
    )
    for r in rows:
        assert r.n_brute == _TOP_K
        assert 0 <= r.n_hits <= r.n_brute
        assert r.recall_ppm == r.n_hits * 1_000_000 // r.n_brute
    # a working LSH index must find SOMETHING on the probe set
    assert any(r.n_hits > 0 for r in rows)


# --- OLS: independent numpy least-squares replay ---------------------


def test_ols_matches_numpy_replay(spark, duck):
    import numpy as np

    from autosinapi_spark.plans.staged_r9 import ols_trend_fit

    got = {r.n_name: r for r in ols_trend_fit(spark, SF_SMOKE).collect()}
    assert got
    pts = duck.execute(
        """
        SELECT n.n_name,
               (year(o.o_orderdate) - 1990) * 12
                 + month(o.o_orderdate) - 1 AS x,
               CAST(SUM(CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,2))
                                   * 100, 0) AS BIGINT)) AS BIGINT) AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    series = defaultdict(list)
    for name, x, y in pts:
        series[name].append((x, y))
    for name, xy in series.items():
        if len(xy) < 2:
            assert name not in got  # den = 0 rows are filtered
            continue
        xs = np.array([x for x, _ in xy], dtype=float)
        ys = np.array([y for _, y in xy], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        r = got[name]
        assert r.n_months == len(xy)
        assert r.sum_revenue_cents == int(ys.sum())
        # ppm truncation + float fit noise: generous absolute floor
        assert abs(r.slope_ppm / 1e6 - slope) <= max(
            1e-5 * abs(slope), 1e-2
        ), name
        assert abs(r.intercept_cents - intercept) <= max(
            1e-5 * abs(intercept), 2.0
        ), name
        r2 = float(np.corrcoef(xs, ys)[0, 1] ** 2)
        assert r.r2_ppm is not None
        assert abs(r.r2_ppm / 1e6 - r2) <= 1e-4, name
        assert 0 <= r.r2_ppm <= 1_000_000, name


# --- chi-square: exact Fraction replay of every term -----------------


def test_chi2_matches_fraction_replay(spark, duck):
    from fractions import Fraction
    from math import trunc

    from autosinapi_spark.plans.staged_r9 import chi2_independence_ppm

    rows = chi2_independence_ppm(spark, SF_SMOKE).collect()
    assert rows
    obs = {(r.priority, r.status): r.obs for r in rows}
    total = sum(obs.values())
    rp = defaultdict(int)
    cs = defaultdict(int)
    for (p, s), o in obs.items():
        rp[p] += o
        cs[s] += o
    chi2_sum = 0
    for r in rows:
        rc = rp[r.priority] * cs[r.status]
        exact = Fraction((r.obs * total - rc) ** 2, rc * total)
        assert r.term_ppm == trunc(exact * 10**6), (r.priority, r.status)
        exp_exact = Fraction(rc, total)
        assert r.expected_milli == trunc(exp_exact * 1000)
        chi2_sum += r.term_ppm
    assert all(r.chi2_ppm == chi2_sum for r in rows)
    assert all(r.n_cells == len(rows) for r in rows)
    # float cross-check of the statistic itself
    f = sum(
        (o - rp[p] * cs[s] / total) ** 2 / (rp[p] * cs[s] / total)
        for (p, s), o in obs.items()
    )
    assert abs(chi2_sum / 1e6 - f) <= len(rows) * 1e-6 + 1e-9 * abs(f)


# --- PMI: pure-Python Counter replay ---------------------------------


def test_pmi_matches_python_replay(spark, duck):
    import math
    import re as _re

    from autosinapi_spark.plans.staged_r9 import (
        _PMI_MIN,
        _PMI_TOPK,
        collocation_pmi_bigrams,
    )

    rows = collocation_pmi_bigrams(spark, SF_SMOKE).collect()
    assert rows
    texts = [
        t for (t,) in duck.execute("SELECT text FROM documents").fetchall()
    ]
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in texts:
        ws = _re.sub(r"\s+", " ", t or "").strip().split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n1 = sum(uni.values())
    n2 = sum(big.values())

    def pmi(w1, w2):
        c2 = big[(w1, w2)]
        return math.log(
            float(c2 * n1 * n1) / float(n2 * uni[w1] * uni[w2])
        )

    assert len(rows) == min(
        _PMI_TOPK, sum(1 for c in big.values() if c >= _PMI_MIN)
    )
    floor_pmi = min(r.pmi for r in rows)
    for r in rows:
        assert big[(r.w1, r.w2)] == r.pair_count
        assert uni[r.w1] == r.w1_count
        assert uni[r.w2] == r.w2_count
        assert r.pair_count >= _PMI_MIN
        assert abs(r.pmi - pmi(r.w1, r.w2)) <= 1.5e-6
    # top-k correctness up to the rounding quantum: nothing excluded
    # may beat the returned floor by more than the quantum
    returned = {(r.w1, r.w2) for r in rows}
    if len(rows) == _PMI_TOPK:
        for (w1, w2), c in big.items():
            if c >= _PMI_MIN and (w1, w2) not in returned:
                assert pmi(w1, w2) <= floor_pmi + 1.5e-6, (w1, w2)
