"""Round-11-registered queries (plans/staged_r11.py): Python replays +
structural invariants.

The Spark-vs-DuckDB oracle compare for this cohort lives in
tests/test_correctness.py since the r11 flip registered them (a
duplicate compare ran here while they were staged in r10); what stays
here is what the registry compare can't express — independent
pure-Python replays of the novel arithmetic, plan-shape pins, a
cross-query consistency check against the registered dedup, and the
DLT N <= K boundary on a tiny fixture.
"""

from __future__ import annotations

import hashlib
import re

from autosinapi_spark.plans.staged_r11 import (
    _QLS_DIM,
    _QLS_SEED,
    _QLS_SPAN,
    _TUNE_CONFIGS,
)
from tests.conftest import SF_SMOKE


def _py_hash(seed: int, s: str) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def _py_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text or "").strip().split(" ")


def test_quality_scorer_matches_python_replay(spark, duck):
    """Weight derivation + per-doc fold, replayed in pure Python."""
    from autosinapi_spark.plans.staged_r11 import quality_linear_scorer

    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    got = {
        r.doc_id: (r.n_tokens, r.w_sum, r.score_pmil, r.pred_keep)
        for r in quality_linear_scorer(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        ts = _py_tokens(text)
        w_sum = sum(
            (_py_hash(_QLS_SEED, t) % _QLS_DIM) % _QLS_SPAN - 1000
            for t in ts
        )
        q = abs(w_sum) * 1000 // len(ts)
        score = -q if w_sum < 0 else q  # truncation toward zero
        assert got[doc_id] == (
            len(ts),
            w_sum,
            score,
            1 if score >= 0 else 0,
        ), f"doc {doc_id}"


def test_novelty_matches_python_replay(spark, duck):
    """Corpus-wide df and the per-doc novelty fraction, in Python."""
    from collections import Counter

    from autosinapi_spark.plans.staged_r11 import ngram_novelty_score

    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    grams = {}
    for doc_id, text in texts.items():
        ts = _py_tokens(text)
        if len(ts) < 3:
            continue
        grams[doc_id] = {
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        }
    df = Counter(g for sg in grams.values() for g in sg)
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty_ppm)
        for r in ngram_novelty_score(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(grams)
    for doc_id, sg in grams.items():
        n_novel = sum(1 for g in sg if df[g] == 1)
        assert got[doc_id] == (
            len(sg),
            n_novel,
            n_novel * 1_000_000 // len(sg),
        ), f"doc {doc_id}"


def test_band_tuning_costs_shape_and_monotonicity(spark):
    """Structural invariants: one row per config; candidate volume is
    non-increasing in rows-per-band (more rows per band = stricter
    collision requirement AND fewer lottery tickets, so (6,2) is the
    loosest config and (2,6) the strictest); the bucket histogram is
    internally consistent."""
    from autosinapi_spark.plans.staged_r11 import lsh_band_tuning_costs

    rows = {
        (r.bands, r.rows_per_band): r
        for r in lsh_band_tuning_costs(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(_TUNE_CONFIGS)
    by_r = sorted(rows.values(), key=lambda r: r.rows_per_band)
    pairs = [r.n_cand_pairs for r in by_r]
    assert pairs == sorted(pairs, reverse=True), (
        f"candidate volume must fall as rows-per-band grows: "
        f"{[(r.bands, r.rows_per_band, r.n_cand_pairs) for r in by_r]}"
    )
    for r in rows.values():
        assert r.max_bucket >= 1
        assert r.n_cand_pairs >= r.max_bucket * (r.max_bucket - 1) // 2
        # a bucket holds >= 1 member, so buckets <= bands * corpus
        assert r.n_buckets <= r.bands * 2 * 500 * 2  # twin corpus cap


def test_staged_plan_shapes(spark, no_rebalance):
    """Pin the cohort's exchange budgets: the scorer is shuffle-free,
    fertility is one language-keyed agg, novelty's flag-then-aggregate
    shape holds at 3 (gram agg, gram join probe, doc agg), and the
    tuning table reduces all four configs in two agg exchanges over
    one localCheckpointed signature pass."""
    from autosinapi_spark.plans.staged_r11 import (
        lsh_band_tuning_costs,
        ngram_novelty_score,
        quality_linear_scorer,
        token_fertility_by_lang,
    )

    def exchanges(fn):
        plan = (
            fn(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        return plan.count("Exchange")

    assert exchanges(quality_linear_scorer) == 0
    assert exchanges(token_fertility_by_lang) == 1
    assert exchanges(ngram_novelty_score) == 3
    assert exchanges(lsh_band_tuning_costs) == 2


def test_tuning_table_consistent_with_registered_dedup(spark):
    """Cross-query consistency: the (4,3) tuning row measures the cost
    of exactly the configuration near_dedup_minhash runs, so its
    candidate-pair volume (sum of C(n,2) over band buckets, counted
    once per band collision) must bound the registered query's output
    (distinct verified pairs at J >= 0.5) from above."""
    from autosinapi_spark.plans.near_dedup_queries import (
        near_dedup_minhash,
    )
    from autosinapi_spark.plans.staged_r11 import lsh_band_tuning_costs

    tuning = {
        (r.bands, r.rows_per_band): r.n_cand_pairs
        for r in lsh_band_tuning_costs(spark, SF_SMOKE).collect()
    }
    n_out = near_dedup_minhash(spark, SF_SMOKE).count()
    assert n_out > 0
    assert tuning[(4, 3)] >= n_out, (
        f"registered config enumerates {tuning[(4, 3)]} candidates but "
        f"emits {n_out} verified pairs — impossible"
    )


def test_priority_sample_matches_python_replay(spark, duck):
    """Full DLT replay: hash-deterministic priorities, top-K
    membership, rank order, and the max(w, tau) estimator."""
    from decimal import Decimal

    from autosinapi_spark.plans.staged_r11 import (
        _PRI_K,
        _PRI_SEED,
        _PRI_TAU_CLAMP,
        _PRI_U,
        priority_sample_orders,
    )

    rows = duck.execute(
        "SELECT o_orderkey, o_totalprice FROM orders"
    ).fetchall()
    assert len(rows) > _PRI_K  # the replay below assumes N > K
    scored = []
    for key, price in rows:
        w_cents = int(Decimal(repr(price)) * 100)
        h = _py_hash(_PRI_SEED, str(key)) % _PRI_U + 1
        q = (float(w_cents) * float(_PRI_U)) / float(h)
        scored.append((key, w_cents, q))
    scored.sort(key=lambda t: (-t[2], t[0]))
    head = scored[: _PRI_K + 1]
    tau = min(q for _, _, q in head)
    tau_cents = int(min(tau, _PRI_TAU_CLAMP) // 1)
    expect = {
        key: (w, rank + 1, max(w, tau_cents))
        for rank, (key, w, _) in enumerate(head[:_PRI_K])
    }

    got = {
        r.o_orderkey: (r.w_cents, r.rank, r.est_cents)
        for r in priority_sample_orders(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # unbiasedness precondition: every estimate >= its raw weight
    assert all(e >= w for w, _, e in got.values())


def test_priority_sample_whole_population_tau_zero(spark, tmp_path):
    """DLT boundary (N <= K): when the whole population is sampled,
    tau must be 0 and every estimate must equal its raw weight — the
    kept-item min(q) would overestimate (q >= w always since h <= U).
    Unreachable on the TPC-H fixtures (orders >> K), so pinned here on
    a 5-row orders table."""
    from autosinapi_spark.plans.staged_r11 import priority_sample_orders

    spark.createDataFrame(
        [(i, float(100 + i)) for i in range(1, 6)],
        "o_orderkey bigint, o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = priority_sample_orders(spark, str(tmp_path)).collect()
    assert len(got) == 5
    assert {r.o_orderkey for r in got} == {1, 2, 3, 4, 5}
    for r in got:
        assert r.est_cents == r.w_cents, (
            f"order {r.o_orderkey}: est {r.est_cents} != w {r.w_cents} "
            "— tau must be 0 when N <= K"
        )
