"""Physical-plan regression tests for the round-4 similarity/dedup
operators: the shapes that make them 100 TB-safe must survive future
edits — no cartesian products in candidate generation, broadcast on
the correct (small) sides, and pure equi-joins on the LSH keys."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from autosinapi_spark.operators.near_dedup import ngram_jaccard_pairs
from autosinapi_spark.plans.near_dedup_queries import _corpus
from autosinapi_spark.plans.similarity_queries import (
    ann_lsh_topk,
    near_dedup_embedding,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_ngram_jaccard_no_cartesian(spark):
    plan = _plan(ngram_jaccard_pairs(_corpus(spark, SF_SMOKE)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_lsh_is_equijoin_with_broadcast_queries(spark):
    plan = _plan(ann_lsh_topk(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the few-rows query side broadcasts into the corpus-side join
    assert "BroadcastHashJoin" in plan


def test_embedding_dedup_no_cartesian(spark):
    plan = _plan(near_dedup_embedding(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_brute_force_is_the_only_nested_loop(spark):
    """ann_bruteforce_topk is the documented O(N*Q) baseline — it is
    ALLOWED a nested-loop broadcast join; this test documents that the
    exemption is deliberate and unique to it."""
    from autosinapi_spark.plans.similarity_queries import ann_bruteforce_topk

    plan = _plan(ann_bruteforce_topk(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan


def test_behavior_and_gapfill_plans_are_scale_safe(spark):
    """Round-6 behavior/time-series/drift queries: no cartesian
    products; the only nested-loop joins are the pinned broadcasts of
    1-row stat frames (bounds / corpus total / funnel head)."""
    from autosinapi_spark.plans.behavior_queries import (
        funnel_conversion,
        user_retention_cohorts,
    )
    from autosinapi_spark.plans.corpus_queries import source_token_kl
    from autosinapi_spark.plans.queries import events_gap_fill

    for fn, n_nlj in (
        (funnel_conversion, 1),  # 1-row head frame
        (user_retention_cohorts, 0),
        (events_gap_fill, 1),  # 1-row bounds frame
        (source_token_kl, 1),  # 1-row corpus total
    ):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, fn.__name__
        # crossJoin(broadcast(1-row)) plans as BroadcastNestedLoopJoin;
        # anything beyond the declared count is an accidental cross
        assert plan.count("BroadcastNestedLoopJoin") <= n_nlj, fn.__name__


def test_nation_market_share_pushes_filter_and_broadcasts_dims(spark):
    from autosinapi_spark.plans.olap_queries import nation_market_share

    plan = _plan(nation_market_share(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # bounded dims ride broadcast joins; p_type reaches the part scan
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan and "p_type" in plan


def test_snapshot_diff_is_single_keyed_full_outer(spark):
    """CDC diff must stay one PK-keyed full-outer join: no cartesian,
    no nested loop, and the join itself keyed (SortMergeJoin or
    ShuffledHashJoin FullOuter) so bucketing can remove the shuffle."""
    from autosinapi_spark.plans.sink_queries import snapshot_diff_cdc

    plan = _plan(snapshot_diff_cdc(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan


def test_no_new_unpartitioned_windows():
    """Grep gate: an unpartitioned Window.orderBy sorts its ENTIRE
    input in one task, so one over an unbounded-cardinality frame
    (catalog, vocabulary, corpus) is a 100 TB scale-killer. Every
    existing site is bounded by construction (calendar hours, a
    prior ``limit(N)``, or a fixed language set); adding a new one
    requires justifying the bound here."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "autosinapi_spark"
    # (file, count) of known-bounded unpartitioned windows:
    allowed = {
        # rank over the 100-row TakeOrdered head of pagerank
        "plans/graph_analytics_queries.py": 1,
        # cumulative sum over calendar-bounded hourly buckets
        "plans/behavior_queries.py": 1,
        # rank over the N-row Gumbel top (follows .limit), plus the
        # three RRF rank assignments over .limit(ARM_TOP)/.limit(TOP)
        # shortlists (<= 50 rows each)
        "plans/corpus_queries.py": 4,
        # Hamilton remainder ranking over the fixed language set
        "plans/curation_queries.py": 1,
        # skyline bucket-boundary cumulative min over the
        # <= _SKY_BUCKETS (64) range-bucket partial mins
        "plans/olap_queries.py": 1,
        # staged r9: PPR rank over the 100-row TakeOrdered head, and
        # the systematic-sampling exclusive block-offset prefix sum
        # over the rows/256 block-grain frame (the hierarchical
        # prefix-sum pattern; a second level absorbs extreme scale)
        "plans/staged_r9.py": 2,
        # staged r11: priority-sampling rank over the (K+1)-row
        # TakeOrdered head (bounded by the prior limit)
        "plans/staged_r11.py": 1,
        # staged r12: UniMax water-filling math over the
        # |sources|-sized aggregate (bounded by the source count),
        # and the PageRank rank over the 100-row TakeOrdered head
        "plans/staged_r12.py": 2,
        # staged r13: suffix-rank exclusive block-offset prefix sum
        # over the <= _SFX_NBLK (4096) value-range block counts
        "plans/staged_r13.py": 1,
    }
    pat = re.compile(r"Window\s*(\(\s*\))?\s*\.\s*orderBy")
    found: dict[str, int] = {}
    for f in pkg.rglob("*.py"):
        n = len(pat.findall(f.read_text()))
        if n:
            found[str(f.relative_to(pkg))] = n
    assert found == allowed, (
        f"unpartitioned Window.orderBy sites changed: {found} != "
        f"{allowed} — if the new site is bounded, document it in the "
        f"allowlist; if not, use TakeOrdered / partitioned windows"
    )


def test_hard_negative_mining_is_broadcast_equijoin(spark):
    """The r7 scale fix must hold: anchors broadcast into a bucket
    equi-join (1.3x at 10x data) — never a cartesian/corpus scan, and
    never the IVF O(N*sqrt(N)) coarse-assignment route."""
    from autosinapi_spark.plans.similarity_queries import (
        hard_negative_mining,
    )

    plan = _plan(hard_negative_mining(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_inverted_index_postings_state_is_bounded(spark):
    """Per-term aggregation state must stay at the K-id head: the
    full-postings collect_set form held corpus-df-sized buffers and
    measured 19x wall at 10x data."""
    from autosinapi_spark.plans.corpus_queries import (
        inverted_index_postings,
    )

    plan = _plan(inverted_index_postings(spark, SF_SMOKE))
    assert "collect_set" not in plan
    assert "collect_list" in plan  # K-head only, null-filtered
    assert "CartesianProduct" not in plan


def test_zorder_layout_never_shuffles_the_fact_table(spark, no_rebalance):
    """The Morton value is row-local after a 1-row min/max scalar is
    broadcast back: the fact table itself must never be exchanged —
    the only allowed exchanges are the scalar aggregate's
    single-partition gather and its broadcast."""
    from autosinapi_spark.plans.olap_queries import zorder_layout_keys

    plan = _plan(zorder_layout_keys(spark, SF_SMOKE))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_zorder_keys_fill_the_bit_budget(spark):
    """Range normalization must spread any key domain across the full
    2^bits cell space — a key domain wider than 2^bits must NOT alias
    (the max normalized cell is 2^bits - 1, reached by the max key)."""
    from pyspark.sql import functions as F

    from autosinapi_spark.plans.olap_queries import (
        _Z_BITS,
        zorder_layout_keys,
    )

    df = zorder_layout_keys(spark, SF_SMOKE)
    row = df.agg(
        F.max("zval").alias("hi"), F.min("zval").alias("lo")
    ).collect()[0]
    # the row holding the max l_suppkey normalizes its sx to
    # 2^bits - 1, whose top interleaved bit is bit 2*bits - 1 — so the
    # max zval must reach at least 2^(2*bits - 1) (we do NOT require
    # one row to hold BOTH key maxima), and every zval stays inside
    # the 2*bits budget
    assert row["hi"] >= 1 << (2 * _Z_BITS - 1)
    assert row["hi"] < 1 << (2 * _Z_BITS)
    assert row["lo"] >= 0


def test_imi_pq_has_no_cartesian_and_broadcast_probes(spark):
    """IMI-PQ composition: the corpus cell map must meet the probe
    list through a broadcast equi-join on the product-cell key — no
    cartesian anywhere, and the only nested-loop join allowed is the
    1-row codebook scalar broadcast."""
    from autosinapi_spark.plans.similarity_queries import ann_imi_pq_topk

    plan = _plan(ann_imi_pq_topk(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_kcore_rounds_are_keyed_joins(spark):
    from autosinapi_spark.plans.graph_analytics_queries import (
        kcore_item_graph,
    )

    plan = _plan(kcore_item_graph(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_localcheckpoint_partitioning_survives_only_without_aqe(spark):
    """Engine boundary (found r8, the test_engine_parity spirit):
    ``Dataset.localCheckpoint`` captures the executed plan's
    outputPartitioning into LogicalRDD — but under AQE the captured
    plan is AdaptiveSparkPlanExec, whose partitioning is UNKNOWN at
    capture time, so the pinned layout is lost and a downstream join
    re-exchanges the checkpointed side (2 exchanges). With AQE off
    the partitioning survives and the join exchanges only the probe
    side (1 exchange). Consequence for the iterative graph queries
    (pagerank, BFS, LPA, SSSP): their
    ``.repartition(join_key).localCheckpoint()`` edge frames are NOT
    a per-round shuffle elision on this AQE-on engine — the measured
    benefit (interleaved min-of-4 at sf0.1: BFS 7.3s unpinned vs
    6.5s pinned, and much lower variance) comes from materializing
    the checkpoint pre-balanced at the canonical partition width
    (the symmetrizing union otherwise doubles the partition count);
    on an AQE-off session the pin additionally removes the per-round
    edge-side exchange outright, which this test pins."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        counts = {}
        for aqe_on in (True, False):
            spark.conf.set(
                "spark.sql.adaptive.enabled", str(aqe_on).lower()
            )
            edges = (
                spark.range(0, 1000)
                .select(
                    (F.col("id") % 97).alias("src"),
                    (F.col("id") % 89).alias("dst"),
                )
                .repartition("src")
                .localCheckpoint(eager=False)
            )
            frontier = spark.range(0, 10).select(
                F.col("id").alias("node")
            )
            plan = _plan(
                frontier.join(edges, frontier["node"] == edges["src"])
            )
            counts[aqe_on] = plan.count("Exchange hashpartitioning")
        assert counts[True] == 2, counts  # AQE drops the partitioning
        assert counts[False] == 1, counts  # non-AQE preserves it
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_persisted_repartition_keeps_partitioning_under_aqe(spark):
    """Engine boundary (r15, the persist-elision optimization): unlike
    ``localCheckpoint`` (whose LogicalRDD reports UNKNOWN partitioning
    under AQE — the r8 boundary pinned above), an InMemoryRelation
    over ``repartition(key)`` PRESERVES the HashPartitioning
    (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning``
    defaults to false), so a downstream join on that key exchanges
    ONLY the probe side. This is what makes the iterative graph
    queries' per-round edge joins exchange-free after the r15 switch
    from ``.repartition(k).localCheckpoint()`` to
    ``.repartition(k).persist()`` — if an engine upgrade breaks this,
    every loop silently regains one exchange per round."""
    from pyspark.sql import functions as F

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    edges = (
        spark.range(0, 1000)
        .select(
            (F.col("id") % 97).alias("src"),
            (F.col("id") % 89).alias("dst"),
        )
        .repartition("src")
        .persist()
    )
    try:
        frontier = spark.range(0, 10).select(F.col("id").alias("node"))
        df = frontier.join(edges, frontier["node"] == edges["src"])
        df.write.format("noop").mode("overwrite").save()
        plan = _plan(df)
        # one ENSURE_REQUIREMENTS exchange (the probe side); the
        # cached side must read straight from InMemoryTableScan. The
        # REPARTITION_BY_COL exchange inside the InMemoryRelation's
        # pictured build plan doesn't count — strip the picture.
        runtime = plan.split("InMemoryRelation")[0]
        assert runtime.count("Exchange hashpartitioning") == 1, plan
        assert "InMemoryTableScan" in plan
    finally:
        edges.unpersist()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_association_rules_reuses_exchanges_at_runtime(spark):
    """association_rules_2item deliberately does NOT checkpoint its
    basket/pair frames: the checkpointed variant measured 36% slower
    at 10x because Spark unifies the duplicated canonically-identical
    subtrees via ReusedExchange at runtime. That reuse is the load-
    bearing assumption — if an engine change stopped unifying them,
    the four basket consumers would each recompute the distinct scan.
    The static plan cannot show it (reuse is decided at runtime), so
    execute the frame and assert on the final adaptive plan."""
    import io
    from contextlib import redirect_stdout

    from autosinapi_spark.plans.staged_r9 import association_rules_2item

    df = association_rules_2item(spark, SF_SMOKE)
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan
