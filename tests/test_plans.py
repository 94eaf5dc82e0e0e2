"""Physical-plan regression tests (.explain audits).

Correctness says what a query returns; these pin HOW it runs — filter
pushdown reaching the parquet scan, column pruning, broadcast sides,
shuffle counts — so a refactor that silently de-optimizes a plan
fails loudly. This is the 100 TB design contract, checkable at any SF.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_SMOKE


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as e

    return e._registry()


def _q(registry, spark, name):
    return registry[name].fn(spark, SF_SMOKE)


def test_pricing_summary_pushdown_and_pruning(registry, spark, no_rebalance):
    plan = _plan(_q(registry, spark, "pricing_summary"))
    # the shipdate filter must reach the parquet scan...
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # ...and the scan must not read columns the query never touches
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    # map-side combine: partial aggregation must run BEFORE the
    # exchange so the shuffle carries 6 rows per task, not 6M
    simple = _plan(_q(registry, spark, "pricing_summary"), "simple")
    assert "partial_sum" in simple
    assert simple.index("partial_sum") > simple.index("Exchange")


def test_cost_lookup_broadcasts_catalog(registry, spark):
    plan = _plan(_q(registry, spark, "cost_lookup"))
    assert "BroadcastHashJoin" in plan
    # catalog-side filter pushed into its scan
    assert "LessThanOrEqual(p_size,10)" in plan.replace(" ", "")


def test_union_view_has_no_shuffle(registry, spark, no_rebalance):
    plan = _plan(_q(registry, spark, "union_view_itens"))
    assert "Exchange" not in plan  # pure scan+project union


def test_exact_dedup_shuffles_digest_not_text(registry, spark):
    plan = _plan(_q(registry, spark, "exact_dedup_documents"), "simple")
    # partial aggregation before the exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2
    # the shuffled key is the 64-hex digest, never the document text
    exchange = next(l for l in plan.splitlines() if "Exchange" in l)
    assert "text" not in exchange


def test_latest_event_single_window_shuffle(registry, spark, no_rebalance):
    plan = _plan(_q(registry, spark, "latest_event_per_user"), "simple")
    assert plan.count("Exchange") == 1  # one hash partitioning for the window


def test_ann_lsh_broadcasts_query_side(registry, spark):
    plan = _plan(_q(registry, spark, "ann_lsh_topk"))
    assert "BroadcastHashJoin" in plan


def test_no_python_row_udfs_in_relational_queries(registry, spark):
    # mapInPandas appears ONLY in the multimodal media queries; every
    # relational/text/vector plan must stay JVM-side
    for name, spec in registry.items():
        if name.startswith("media_"):
            continue
        plan = _plan(spec.fn(spark, SF_SMOKE), "simple")
        assert "BatchEvalPython" not in plan, f"{name} uses a row UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF"


def test_range_join_avoids_nested_loop(registry, spark):
    plan = _plan(_q(registry, spark, "range_join_windows"), "simple")
    # the binned form must hash-join on (key, bin), never nested-loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_window_pass(registry, spark):
    plan = _plan(_q(registry, spark, "asof_latest_quote"), "simple")
    # union-window form: no join node at all, one window over the union
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_forward_is_single_window_pass(registry, spark):
    plan = _plan(_q(registry, spark, "asof_next_quote"), "simple")
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_forward_exact_match_semantics(spark):
    """Tie at equal timestamps: allow_exact_match picks the same-ts
    right row; strict mode skips to the next one."""
    from datetime import datetime

    from autosinapi_spark.operators.asof import asof_join_forward

    TS = datetime
    left = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10)), (1, TS(2024, 1, 1, 12))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10), 100.0), (1, TS(2024, 1, 1, 11), 110.0)],
        "k int, ts timestamp, v double",
    )
    inc = {
        (r.k, r.ts.hour): r.v
        for r in asof_join_forward(left, right, ["k"], "ts", ["v"]).collect()
    }
    assert inc == {(1, 10): 100.0, (1, 12): None}
    strict = {
        (r.k, r.ts.hour): r.v
        for r in asof_join_forward(
            left, right, ["k"], "ts", ["v"], allow_exact_match=False
        ).collect()
    }
    assert strict == {(1, 10): 110.0, (1, 12): None}


def test_range_join_drops_inverted_intervals(spark):
    """end <= start can never contain a point; an inverted pair must be
    filtered BEFORE the bin explode (a descending F.sequence would
    otherwise replicate one corrupt row into every bin between the two
    timestamps — e.g. an epoch-zero end = ~470k hourly bins)."""
    from datetime import datetime

    from autosinapi_spark.operators.ranges import binned_range_join

    pts = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 12, 30))], "k string, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 2), datetime(1970, 1, 1), "inverted"),
            ("k", datetime(2024, 1, 1), datetime(2024, 1, 1), "empty"),
            ("k", datetime(2024, 1, 1), datetime(2024, 1, 2), "good"),
        ],
        "k string, start timestamp, end timestamp, tag string",
    )
    out = binned_range_join(pts, iv, ["k"], "ts", "start", "end")
    assert [r["tag"] for r in out.collect()] == ["good"]


def test_q3_prunes_and_take_ordered(registry, spark):
    plan = _plan(_q(registry, spark, "top_unshipped_orders"))
    # the segment filter is pushed to the customer scan; the customer
    # arm carries no broadcast HINT (fact-scale side — the optimizer
    # decides), but at test scale it must still come out broadcast
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan.replace(" ", "")
    # top-N must be TakeOrdered (per-partition heap + driver merge),
    # never a global Sort + Limit
    assert "TakeOrderedAndProject" in plan
    # date filters reach both fact scans
    assert "o_orderdate" in plan and "l_shipdate" in plan


def test_q5_bounded_dims_broadcast_no_cartesian(registry, spark):
    plan = _plan(_q(registry, spark, "regional_supplier_volume"))
    # the bounded region->nation map is PINNED broadcast down both
    # arms; fact-scale arms are optimizer-chosen (broadcast at this
    # scale). Never a cartesian anywhere, and the region filter is
    # pushed to its scan.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan.replace(" ", "")


def test_pagerank_no_cartesian_and_partial_aggs(registry, spark):
    plan = _plan(_q(registry, spark, "item_cooccurrence_pagerank"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # contribution sums must partial-aggregate map-side
    simple = _plan(_q(registry, spark, "item_cooccurrence_pagerank"), "simple")
    assert "partial_sum" in simple


def test_entity_resolution_plan_shape(registry, spark):
    """The final ER plan (the matcher lineage itself sits behind the
    CC operator's localCheckpoint, so assert on what the explain can
    see): column-pruned part scan, broadcast map-backs, no cartesian.
    The dictionary-before-matcher property is pinned semantically by
    tests/test_graph_analytics.py's union-find replay."""
    plan = _plan(_q(registry, spark, "entity_resolution_parts"))
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas and all("p_name" in s for s in schemas)
    # pruning: no scan reads columns the query never touches
    assert all("p_retailprice" not in s for s in schemas)
    assert all("p_size" not in s for s in schemas)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # entity map broadcast-joins back


def test_cms_estimation_joins_broadcast_counters(registry, spark):
    plan = _plan(_q(registry, spark, "cms_token_frequency"))
    # tracked-term estimation joins the tiny counter table broadcast;
    # the total rides a broadcast scalar — no shuffle join anywhere
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q13_aggregates_orders_before_outer_join(registry, spark):
    plan = _plan(_q(registry, spark, "customer_order_distribution"))
    simple = _plan(
        _q(registry, spark, "customer_order_distribution"), "simple"
    )
    # the priority filter reaches the orders scan
    assert "o_orderpriority" in plan
    assert "PushedFilters" in plan
    # the fact side collapses to per-custkey counts BEFORE the outer
    # join: a partial_count must appear, and no plan node may join raw
    # order rows (LeftOuter join is against the aggregated frame)
    assert "partial_count" in simple
    # customer scan reads only the join key
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    cust_read = next(l for l in read if "c_custkey" in l)
    assert "c_mktsegment" not in cust_read and "c_acctbal" not in cust_read


def test_q17_broadcasts_filtered_part_sliver(registry, spark):
    plan = _plan(_q(registry, spark, "small_qty_order_revenue"))
    # pinned broadcast of the brand/size-filtered part keys
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(p_brand,Brand#13)" in plan.replace(" ", "")
    assert "LessThan(p_size,15)" in plan.replace(" ", "")
    assert "CartesianProduct" not in plan
    # part scan is pruned to the key + filter columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    part_read = next(l for l in read if "p_partkey" in l)
    assert "p_retailprice" not in part_read and "p_name" not in part_read


def test_q18_single_fact_exchange(registry, spark):
    simple = _plan(_q(registry, spark, "large_volume_customers"), "simple")
    # the lineitem sum is partial-aggregated before its exchange, and
    # lineitem is scanned exactly ONCE (the original Q18 re-join of
    # lineitem for the output sum is elided)
    assert "partial_sum" in simple
    assert simple.count("lineitem.parquet") == 1


def test_q22_anti_join_and_broadcast_scalar(registry, spark):
    plan = _plan(_q(registry, spark, "dormant_rich_customers"))
    # NOT EXISTS arm is a left-anti hash join, never nested-loop over
    # the fact; the recent-order window is pushed to the orders scan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan.replace(" ", "")
    # orders arm reads only the custkey + date
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    ord_read = next(l for l in read if "o_custkey" in l)
    assert "o_totalprice" not in ord_read


def test_q4_semi_join_with_date_pruning(registry, spark):
    plan = _plan(_q(registry, spark, "order_priority_late"))
    # EXISTS decorrelated to a LEFT SEMI hash join with the lateness
    # predicate as residual; quarter window pushed to the orders scan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan.replace(" ", "")
    # lineitem scan reads only the join key + shipdate
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    li_read = next(l for l in read if "l_shipdate" in l)
    assert "l_extendedprice" not in li_read


def test_q15_broadcast_max_and_date_pruning(registry, spark):
    plan = _plan(_q(registry, spark, "top_supplier_revenue"))
    simple = _plan(_q(registry, spark, "top_supplier_revenue"), "simple")
    # quarter window pushed to the lineitem scan; partial agg before
    # the suppkey exchange; global max joins as a broadcast, never a
    # sort-based top-1
    assert "GreaterThanOrEqual(l_shipdate" in plan.replace(" ", "")
    assert "partial_sum" in simple
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "GlobalLimit" not in plan  # ties must survive


def test_q19_pushes_single_table_factors(registry, spark):
    plan = _plan(_q(registry, spark, "bracket_revenue_disjunctive"))
    flat = plan.replace(" ", "")
    # the part-only disjunction reaches the part scan...
    assert "Or(And(EqualTo(p_brand,Brand#12)" in flat
    # ...and the quantity hull reaches the lineitem scan
    from autosinapi_spark.plans.olap_queries import _Q19_BRACKETS

    qlo = min(q for _, _, q, _ in _Q19_BRACKETS)
    qhi = max(q for _, _, _, q in _Q19_BRACKETS)
    assert f"GreaterThanOrEqual(l_quantity,{qlo}" in flat
    assert f"LessThanOrEqual(l_quantity,{qhi}" in flat
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q21_single_lineitem_scan(registry, spark):
    simple = _plan(_q(registry, spark, "suppliers_kept_waiting"), "simple")
    plan = _plan(_q(registry, spark, "suppliers_kept_waiting"))
    # the EXISTS / NOT EXISTS pair must NOT become lineitem self-joins:
    # exactly one lineitem scan feeds the per-order aggregation
    assert simple.count("lineitem.parquet") == 1
    # status filter pushed to the orders scan; top-N via TakeOrdered
    assert "EqualTo(o_orderstatus,F)" in plan.replace(" ", "")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_dsir_two_token_passes(registry, spark):
    """The importance model fits in ONE pass (dims materialized) and
    scoring is the second — never a pass per model consumer."""
    simple = _plan(_q(registry, spark, "dsir_importance_weights"), "simple")
    assert simple.count("documents.parquet") <= 2
    plan = _plan(_q(registry, spark, "dsir_importance_weights"))
    assert "CartesianProduct" not in plan
    assert "partial_" in simple  # model fit map-side combines


def test_dsir_gumbel_resample_take_ordered(registry, spark):
    plan = _plan(_q(registry, spark, "dsir_gumbel_resample"))
    # the top-n selection is a distributed heap, never global sort+limit
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_single_scan_no_shuffle_to_assign(registry, spark, no_rebalance):
    """Final-iteration plan: ONE embeddings scan (prior iterations sit
    behind checkpoints) and no corpus exchange for the argmin — the
    only exchanges belong to the tiny centroid aggregates."""
    simple = _plan(_q(registry, spark, "kmeans_cluster_assign"), "simple")
    assert simple.count("embeddings.parquet") == 1
    assert "CartesianProduct" not in simple
    assert simple.count("Exchange") <= 2


# --- round-6 TPC-H gap shapes + triangle counting --------------------


def test_q2_window_min_no_self_join(registry, spark):
    """The correlated MIN is a window over the aggregated cost
    relation — lineitem scanned once, no cost-vs-cost self-join,
    no cartesian; region/nation pinned broadcast."""
    simple = _plan(_q(registry, spark, "min_cost_supplier_per_part"), "simple")
    assert simple.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in simple
    assert "Window" in simple
    assert "BroadcastHashJoin" in simple


def test_q7_nation_slivers_pushed(registry, spark):
    """Both arms prune to the two named nations before the fact
    joins; nation broadcast under both roles."""
    plan = _plan(_q(registry, spark, "nation_pair_trade_volume"))
    assert "CartesianProduct" not in plan
    # the 2-of-25 nation filter reaches the nation scan
    assert "In(n_name" in plan.replace(" ", "") or "n_name" in plan
    simple = _plan(_q(registry, spark, "nation_pair_trade_volume"), "simple")
    assert simple.count("nation.parquet") == 2  # one scan per role


def test_q9_substring_filter_prunes_part_arm(registry, spark):
    plan = _plan(_q(registry, spark, "product_profit_by_nation"))
    # the %substring% predicate is applied on the part arm (it cannot
    # be a parquet pushed filter, but must sit below the join)
    assert "StringContains" in plan or "Contains" in plan
    assert "CartesianProduct" not in plan


def test_q10_takeordered_and_late_attribute_join(registry, spark):
    simple = _plan(_q(registry, spark, "returned_item_top_customers"), "simple")
    assert "TakeOrderedAndProject" in simple
    # returnflag filter reaches the lineitem scan
    plan = _plan(_q(registry, spark, "returned_item_top_customers"))
    assert "EqualTo(l_returnflag,R)" in plan.replace(" ", "")


def test_q11_threshold_is_broadcast_scalar(registry, spark):
    """The global mean is a 1-row aggregate over the rollup, crossed
    back in broadcast — exactly one lineitem scan feeding BOTH the
    rollup and the threshold via exchange reuse is not required, but
    there must be no non-broadcast nested loop."""
    simple = _plan(_q(registry, spark, "part_revenue_concentration"), "simple")
    assert "BroadcastNestedLoopJoin" in simple
    assert "CartesianProduct" not in simple


def test_q14_single_pass_conditional_agg(registry, spark):
    """Numerator and denominator come from ONE aggregate over one
    lineitem-part join pass."""
    simple = _plan(_q(registry, spark, "promo_revenue_share"), "simple")
    assert simple.count("lineitem.parquet") == 1
    assert simple.count("part.parquet") == 1
    # part scan pruned to the 2 needed columns
    plan = _plan(_q(registry, spark, "promo_revenue_share"))
    read = [l for l in plan.splitlines() if "ReadSchema" in l and "p_type" in l]
    assert read and all("p_retailprice" not in l for l in read)


def test_q16_anti_join_broadcast_denylist(registry, spark):
    simple = _plan(_q(registry, spark, "supplier_count_by_part_attrs"), "simple")
    assert "BroadcastHashJoin" in simple and "LeftAnti" in simple
    # distinct-aggregate expansion keeps partial aggregation
    assert "partial_count" in simple or "Expand" in simple


def test_triangles_adjacency_intersection_no_wedge_join(spark):
    """The triangle count is the adjacency-intersection form: edges
    join VERTEX adjacency lists (two hash joins), intersect
    row-locally — never the edge-vs-edge wedge-path join whose
    output is sum(outdeg^2) rows. Inspect the ckpt-free lineage
    (localCheckpoint hides upstream plan behind an ExistingRDD)."""
    from autosinapi_spark.plans.graph_analytics_queries import _triangles

    simple = _plan(_triangles(spark, SF_SMOKE, ckpt=False), "simple")
    assert "CartesianProduct" not in simple
    assert "array_intersect" in simple
    # two edge-vs-adjacency joins per union branch (the ckpt-free
    # lineage shows the withI subtree twice; the registered query
    # checkpoints it so the joins run once), never a third
    # (edge-vs-edge) join in either branch
    njoin = sum(
        simple.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert njoin <= 4


def test_oriented_triangles_match_id_oriented_counts(spark):
    """(degree, id) orientation is just a different acyclic edge
    direction over the same undirected graph: per-vertex triangle
    counts must be IDENTICAL to the id-oriented query's."""
    from autosinapi_spark.plans.graph_analytics_queries import (
        item_cooccurrence_triangles,
        item_cooccurrence_triangles_oriented,
    )

    base = {
        (r.part_key, r.n_triangles)
        for r in item_cooccurrence_triangles(spark, SF_SMOKE).collect()
    }
    oriented = {
        (r.part_key, r.n_triangles)
        for r in item_cooccurrence_triangles_oriented(
            spark, SF_SMOKE
        ).collect()
    }
    assert len(base) > 0
    assert oriented == base


def test_inverted_index_bounded_state_single_scan(registry, spark):
    """One documents scan; bigrams build row-locally; per-term
    aggregation state is BOUNDED at the K-id head (r7: the full-list
    collect_set form held corpus-df-sized buffers and measured 19x
    wall at 10x data — a term-partitioned window now ranks doc ids
    and only rn <= K is collected)."""
    simple = _plan(_q(registry, spark, "inverted_index_postings"), "simple")
    assert simple.count("documents.parquet") == 1
    assert "CartesianProduct" not in simple
    assert "collect_set" not in simple
    assert "collect_list" in simple


def test_proportional_allocation_broadcast_quotas(registry, spark):
    """The allocation arithmetic runs on the tiny stratum frame and
    reaches the corpus only as broadcast quota/scalar joins."""
    simple = _plan(_q(registry, spark, "proportional_allocation_sample"), "simple")
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" in simple  # 1-row scalar attach
    assert "BroadcastHashJoin" in simple  # quota-by-lang attach


def test_lpa_communities_coalesce_and_plan_is_keyed(spark):
    """After 3 synchronous rounds the label space must have coalesced
    (strictly fewer distinct communities than vertices — neighbors
    adopt shared labels), every vertex keeps exactly one label, and
    the per-round plan stays keyed (no cartesian)."""
    from autosinapi_spark.plans.graph_analytics_queries import (
        label_propagation_communities,
    )

    df = label_propagation_communities(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    assert len({r.part_key for r in rows}) == len(rows)
    n_comm = len({r.community for r in rows})
    assert 0 < n_comm < len(rows)
    assert "CartesianProduct" not in _plan(df, "simple")


def test_asof_nearest_single_shuffle_no_join(registry, spark, no_rebalance):
    """Nearest direction keeps the union-window discipline: no join
    node, and BOTH direction windows ride one key exchange — the only
    other hash exchange is the upstream quote dedup's (user_id, ts)
    window, exactly as in the backward/forward queries."""
    plan = _plan(_q(registry, spark, "asof_nearest_quote"), "simple")
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 2
