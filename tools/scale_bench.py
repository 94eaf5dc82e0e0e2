"""sf1 spot-bench: 10x-replicate the sf0.1 fixtures and time the
heaviest queries at both scales in one warm session.

/root/testdata is read-only and ships no sf1, so the sf1-equivalent
corpus is synthesized into /tmp by concatenating 10 key-offset copies
of the sf0.1 tables the heavy queries read (documents, embeddings,
lineitem, part), preserving the original parquet schemas byte-for-type
(including the INT64 TIMESTAMP(NANOS) quirk catalog.load handles):

- documents: doc_id offset per copy; a per-copy token is appended to
  the text so replicas are near- but not byte-identical (exercises the
  exact-Jaccard verify stage rather than trivial identity).
- embeddings: vec_id offset; +0.01*copy added to every element so
  replica directions differ slightly (keeps LSH buckets realistic
  instead of 10 exact-cosine-1 twins per vector).
- lineitem: l_orderkey offset, l_partkey SHARED — every copy
  reproduces the same baskets, so the co-occurrence GRAPH the graph
  queries build is bit-identical at sf1 (1,196,000 distinct edges at
  both scales, verified); their rows measure the 10x edge-build in
  front of constant-size rounds.
- part: p_partkey offset — each copy forms its own BOM forest.
  bom_explode_auto_roots therefore does true 10x frontier work;
  bom_cost_rollup (roots pinned < 10) sees 10x edge build + copy-0
  explosion only, and both are reported.

Run: python tools/scale_bench.py  [--rebuild] [--runs=N] [query ...]
Prints one line per (query, sf) plus the sf1/sf0.1 ratio; each cell is
min-of-N (default 2) with checkpoint-block release between runs.
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SRC = Path("/root/testdata/sf0.1")
DST = Path("/tmp/sf1_scale")
COPIES = 10

QUERIES = [
    "near_dedup_minhash",
    "coercion_ptbr_roundtrip",
    "near_dedup_embedding",  # = the derived-parameter auto path since r5
    "near_dedup_ngram_jaccard",  # output grows ~166x: replicas form 20-cliques
    "ann_lsh_topk",
    "doc_simhash",
    "bom_cost_rollup",
    "bom_explode_auto_roots",
    "decontaminate_ngram_overlap",  # eval split replicates too (10x bcast)
    "doc_repetition_filter",
    "sessionize_events",
    "dedup_cluster_resolution",  # 3-gen twin corpus + CC rounds
    "dedup_lines_c4",  # corpus-global line window
    "tfidf_top_terms",
    "doc_unigram_logprob",
    "near_dedup_incremental",  # old x new cross-side LSH
    "dedup_substring_spans",  # rolling L-gram spans
    "embedding_covariance",  # single-pass Gramian: should be ~IO-bound
    "item_cooccurrence_pagerank",  # identical graph; 10x edge-build input
    "entity_resolution_parts",  # 10x rows, same 64-name dictionary
    "ann_ivf_pq_topk",  # sqrt(N) cells + probe-bounded ADC
    "ann_ivf_topk",  # flat O(N^1.5) contrast row (deregistered late r9)
    "source_token_kl",  # (source, term) count + vocab-keyed join
    "events_gap_fill",  # grid-sized agg; spine constant, counts 10x
    "user_retention_cohorts",  # 10x users, same 30-day window
    "funnel_conversion",  # user-keyed cascade over 10x users
    "nation_market_share",  # Q8 star join: 10x facts, shared dims
    "grouping_sets_revenue",  # 3-way set expansion over 10x orders
    "dsir_importance_weights",  # two token passes + 64-row model bcast
    "kmeans_cluster_assign",  # row-local argmin x2 Lloyd; aggs K-bounded
    "suppliers_kept_waiting",  # Q21 single-scan aggregation form
    "large_volume_customers",  # Q18 orderkey agg over 10x lineitem
    # round-6 late additions (r7: first 10x rows)
    "min_cost_supplier_per_part",  # Q2 shape: min-per-part over partsupp-ish join
    "nation_pair_trade_volume",  # Q7 shape: 10x facts, dim-pair group
    "product_profit_by_nation",  # Q9 shape: part-filtered star join
    "returned_item_top_customers",  # Q10 shape: returnflag agg + top-N
    "part_revenue_concentration",  # revenue share concentration per part
    "promo_revenue_share",  # Q14 shape: conditional agg ratio
    "supplier_count_by_part_attrs",  # Q16 shape: distinct-count by attrs
    "item_cooccurrence_triangles",  # identical graph; 10x edge-build input
    "inverted_index_postings",  # postings explode over 10x docs
    "proportional_allocation_sample",  # Hamilton quotas over 10x docs
    "dominant_share_suppliers",  # Q20 shape: share predicate per supplier
    "user_growth_curve",  # calendar-bounded cumulative curve, 10x events
    "streaming_session_replay",  # watermarked replay over 10x sessions
    # round-7 additions
    "embedding_covariance_hd",  # d=64 Arrow Gramian: constant-size partials
    "kcore_item_graph",  # bounded peel rounds over the identical graph
    "hard_negative_mining",  # LSH-bucket-keyed negative sampling
    "bpe_pair_merge_counts",  # dictionary-weighted pair counts
    "ann_imi_topk",  # N^(1/4) half-codebooks: sub-O(N^1.5) assignment
    # round-8 additions
    "ann_imi_pq_topk",  # IMI coarse routing + ADC: no O(N^1.5) stage left
    "inverted_index_postings_full",  # full lists, block-bounded buffers
    "item_cooccurrence_triangles_oriented",  # degree-oriented adj lists
    "ann_lsh_topk_auto",  # derived bits/tables off the strided master
    "zorder_layout_keys",  # min/max-normalized Morton keys, row-local
    "decontaminate_bloom_prefilter",  # fixed 8KB bitmap, survivor verify
    "label_propagation_communities",  # bounded sync rounds, keyed joins
    "asof_nearest_quote",  # two direction windows, one key shuffle
    "mmr_diverse_sample",  # K bounded argmax rounds, 1-row broadcasts
    "inverted_index_positional",  # per-(term,doc) bounded position lists
    "phrase_match_positional",  # trigram top-1 + positional adjacency joins
    "skyline_pareto_parts",  # hierarchical prefix-min, groupBy-dominated
    "item_price_ewma",  # part-keyed lag window over monthly agg
    "distinct_kmv_orders",  # bottom-k sketch; 10x distinct orderkeys
    "bfs_khop_distances",  # frontier joins over the identical graph
    "ann_sq8_topk",  # 1-row range reduce + row-local dequant scan
    "kmv_set_overlap",  # everything after the distinct is sketch-sized
    "zorder_skipping_stats",  # file-granularity stat rows only
    "hybrid_search_rrf",  # two arm plans + ARM_TOP-row fusion join
    "hybrid_pooled_recall_eval",  # r9 harness: arm plans + 50-row pool math
    # round-8 staged-for-r9 additions (plans/staged_r9.py)
    "bpe_train_merges",  # dictionary-sized rounds; in-plan broadcast argmax
    "personalized_pagerank_nation",  # seeded PR over the identical graph
    "streaming_kmv_distinct",  # k-bounded sketch state per day window
    "compaction_bin_packing",  # file-metadata grain; sf1 files near target
    "cusum_changepoints",  # star rollup data-bound; windows metric-grain
    "data_quality_expectations",  # one scan + distinct expansion + anti join
    "sssp_weighted_distances",  # Bellman-Ford rounds over the identical graph
    "incremental_agg_maintenance",  # group-grain merge; arms scan-bound
    "mad_outlier_flags",  # star rollup data-bound; percentiles metric-grain
    "hll_distinct_flags",  # fixed 64-register state; no distinct pass
    "dp_noisy_counts",  # map-combinable count; noise on 6-row aggregate
    "association_rules_2item",  # Apriori prune ahead of basket self-join
    "join_size_cms_estimate",  # fixed 5x512 sketch grid; exact arm keyed
    "systematic_weighted_sample",  # hierarchical prefix sum, block windows
    "histogram_quantile_cents",  # fixed 64-bin grid; windows on histogram
    "holt_trend_forecast",  # series-grain fold; monthly agg data-bound
    "ann_recall_eval",  # probe-set bounded; inherits the two ANN arms
    "ols_trend_fit",  # star rollup data-bound; sums at group grain
    "chi2_independence_ppm",  # one scan; cells/margins cardinality-bounded
    "collocation_pmi_bigrams",  # vocab-keyed counts; top-k never global
    # round-12 staged-for-r13 additions (plans/staged_r13.py, _r13b.py)
    "suffix_window_rank",  # prefix-doubling ranks; Θ(n)-row round shuffles
    "hilbert_layout_keys",  # min/max-normalized Hilbert keys, row-local
    "kcore_onion_layers",  # mean-degree peel rounds over the identical graph
    # round-13 staged-for-r14 additions (plans/staged_r14.py)
    "layout_skipping_equalcount",  # block-rank file cuts; file-grain stats
    "butterfly_item_bipartite",  # basket-bounded pair counts; top-k head
    "streaming_dedup_replay",  # one keyed window pass; type-grain rollup
    # round-14 staged-for-r15 additions (plans/staged_r15.py)
    "kneser_ney_bigram_ppm",  # bigram-type frame + vocab-keyed marginals
    "ktruss_peel_trace",  # shrinking support rounds; round 0 dominates
    "media_ahash_near_dup",  # one Arrow hash pass; band-keyed LSH joins
    "hll_distinct_union",  # map-side-combinable register max; 4x64-row shuffle
    "hyperball_neighborhood",  # per-vertex HLL merge rounds; n x m cells/round
    "local_clustering_coeff",  # ktruss round-0 support pass + vertex aggregate
]


def _offset_col(t: pa.Table, name: str, off: int) -> pa.Table:
    i = t.schema.get_field_index(name)
    col = pc.add(t.column(name), pa.scalar(off, t.schema.field(name).type))
    return t.set_column(i, t.schema.field(name), col.cast(t.schema.field(name).type))


def _replicate(name: str, tweak) -> None:
    t = pq.read_table(SRC / f"{name}.parquet")
    parts = [tweak(t, c) for c in range(COPIES)]
    out = pa.concat_tables(parts)
    if COPIES <= 10:
        # chunk merge halves read amplification at the default scale;
        # at --copies=100 the merged copy would double peak memory on
        # the biggest tables for no measured read-side difference
        out = out.combine_chunks()
    pq.write_table(out, DST / f"{name}.parquet")
    print(f"built {name}: {t.num_rows} -> {out.num_rows} rows", file=sys.stderr)


def build() -> None:
    DST.mkdir(parents=True, exist_ok=True)

    def doc_tweak(t, c):
        off = c * (pc.max(t.column("doc_id")).as_py() + 1)
        t2 = _offset_col(t, "doc_id", off)
        if c:
            i = t2.schema.get_field_index("text")
            text = pc.binary_join_element_wise(
                t2.column("text").cast(pa.string()), f" c{c}", ""
            )
            t2 = t2.set_column(i, t2.schema.field("text"), text.cast(t2.schema.field("text").type))
        return t2

    def emb_tweak(t, c):
        # stride must clear the twin band: _twin_corpus plants
        # near-dup twins at vec_id + 100000, so a plain (max+1) stride
        # makes copies 51+ reuse the twins' id space (measured at
        # --copies=100: the duplicated ids blow up the pair/dup joins
        # of every twin-corpus query — a harness artifact, not an
        # operator cost). Each copy gets a 2*100000 block so real ids
        # and twin ids never collide at any copy count; documents are
        # already safe (ID_OFFSET=1e6 vs 5e5 ids at 100 copies).
        from autosinapi_spark.plans.similarity_queries import _TWIN_OFFSET

        # max_id + 1 + _TWIN_OFFSET always clears the twin band
        # regardless of where max_id sits; the earlier
        # max(max_id + 1, 2 * _TWIN_OFFSET) form silently collided
        # again for any base fixture whose ids landed inside
        # [_TWIN_OFFSET, 2 * _TWIN_OFFSET) (r9 advice finding).
        stride = pc.max(t.column("vec_id")).as_py() + 1 + _TWIN_OFFSET
        off = c * stride
        t2 = _offset_col(t, "vec_id", off)
        if c:
            i = t2.schema.get_field_index("embedding")
            col = t2.column("embedding").combine_chunks()
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            # per-ELEMENT +-0.01c jitter, NOT a uniform +0.01c shift:
            # the uniform shift points every high-c copy at the
            # all-ones direction, and cosine-space queries collapse
            # (measured at --copies=100: one semdedup product cell
            # held 54k of 400k vectors, sum(occ^2) 312x the balanced
            # ideal, vs a perfectly balanced 81/81 cells at 1 copy).
            # Row-and-element-varying signs keep replica directions as
            # diverse as the base corpus at any copy count; magnitude
            # 0.01c keeps each copy distinct from copy 0, as before.
            import numpy as np

            rng = np.random.default_rng(c)
            jit = (
                rng.integers(0, 2, size=len(arr.values)) * 2 - 1
            ) * (0.01 * c)
            vals = pc.add(arr.values, pa.array(jit))
            new = pa.ListArray.from_arrays(arr.offsets, vals.cast(arr.values.type))
            t2 = t2.set_column(i, t2.schema.field("embedding"), new.cast(t2.schema.field("embedding").type))
        return t2

    # orders and lineitem must share ONE per-copy key offset or the
    # replicated orderkeys stop joining; orders' max is the superset
    # (every l_orderkey references an order)
    okey_base = (
        pc.max(
            pq.read_table(
                SRC / "orders.parquet", columns=["o_orderkey"]
            ).column("o_orderkey")
        ).as_py()
        + 1
    )

    def li_tweak(t, c):
        return _offset_col(t, "l_orderkey", c * okey_base)

    def orders_tweak(t, c):
        # o_custkey stays: 10x orders over the SHARED customer base —
        # the realistic fact-growth shape for the star joins
        return _offset_col(t, "o_orderkey", c * okey_base)

    def part_tweak(t, c):
        off = c * (pc.max(t.column("p_partkey")).as_py() + 1)
        return _offset_col(t, "p_partkey", off)

    def ev_tweak(t, c):
        # offset user_id too: each copy is its own user population, so
        # sessionization state/keys scale 10x (not 10 interleaved
        # duplicates of the same users' timelines)
        off = c * (pc.max(t.column("event_id")).as_py() + 1)
        uoff = c * (pc.max(t.column("user_id")).as_py() + 1)
        return _offset_col(_offset_col(t, "event_id", off), "user_id", uoff)

    _replicate("documents", doc_tweak)
    _replicate("embeddings", emb_tweak)
    _replicate("lineitem", li_tweak)
    _replicate("orders", orders_tweak)
    _replicate("part", part_tweak)
    _replicate("events", ev_tweak)

    # bounded dimensions ship verbatim: they stay dimension-scale at
    # any SF (that is the point of broadcasting them)
    import shutil

    for dim in ("customer", "supplier", "nation", "region"):
        shutil.copyfile(SRC / f"{dim}.parquet", DST / f"{dim}.parquet")


def main() -> int:
    # --copies=N: replicate N copies instead of 10 (e.g. --copies=100
    # is a 100x "sf10" spot-check — the two-decade scaling probe; the
    # replica corpus lands in its own /tmp dir so the default sf1 set
    # stays cached). The ratio column is then sfN/10 vs sf0.1.
    global COPIES, DST
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            COPIES = max(2, int(a.split("=", 1)[1]))
            if COPIES != 10:
                DST = Path(f"/tmp/sf_scale_x{COPIES}")

    if "--rebuild" in sys.argv or not (DST / "part.parquet").exists():
        build()

    import __spark_entry__ as entrymod
    from autosinapi_spark.session import get_spark

    qs = dict(entrymod.queries())
    # staged-for-next-round queries are measurable before registration
    # (both dicts are empty since their flips — staged_r9 at r9,
    # staged_r11 at r11 — but the hook stays for any future staging)
    from autosinapi_spark.plans.staged_r9 import STAGED as STAGED_R9
    from autosinapi_spark.plans.staged_r11 import STAGED as STAGED_R11
    from autosinapi_spark.plans.staged_r12 import STAGED as STAGED_R12
    from autosinapi_spark.plans.staged_r13 import STAGED as STAGED_R13
    from autosinapi_spark.plans.staged_r13b import STAGED as STAGED_R13B
    from autosinapi_spark.plans.staged_r14 import STAGED as STAGED_R14
    from autosinapi_spark.plans.staged_r15 import STAGED as STAGED_R15

    for staged in (
        STAGED_R9,
        STAGED_R11,
        STAGED_R12,
        STAGED_R13,
        STAGED_R13B,
        STAGED_R14,
        STAGED_R15,
    ):
        qs.update({n: spec.fn for n, spec in staged.items() if n not in qs})
    # deregistered contrast rows stay measurable: the flat-IVF O(N^1.5)
    # row backs the IMI-vs-flat scale story in README even though no
    # user-facing query maps to it any more (r9 retirement)
    from autosinapi_spark.plans.similarity_queries import (
        ann_ivf_pq_topk,
        ann_ivf_topk,
    )

    qs.setdefault("ann_ivf_pq_topk", ann_ivf_pq_topk)
    qs.setdefault("ann_ivf_topk", ann_ivf_topk)

    # --all: the full-coverage sweep — every registered query, the
    # curated heavy rows first, the rest in name order. All fact
    # tables are replicated (dims ship verbatim by design), so every
    # query is runnable at sf1; the curated list stays the default so
    # the headline gate keeps its documented composition.
    universe = list(QUERIES)
    if "--all" in sys.argv:
        universe += sorted(n for n in qs if n not in QUERIES)

    # optional subset: any non-flag argv names restrict the run
    subset = [a for a in sys.argv[1:] if not a.startswith("--")]
    unknown = [a for a in subset if a not in universe]
    if unknown:
        print(
            f"unknown queries: {', '.join(unknown)} "
            f"(choose from: {', '.join(universe)})",
            file=sys.stderr,
        )
        return 2
    queries = [q for q in universe if q in subset] if subset else universe

    spark = get_spark(app_name="scale_bench")

    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = max(1, int(a.split("=", 1)[1]))

    def run(name: str, sf_dir: str, n: int = 1) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            # Release localCheckpoint blocks before the next
            # measurement (the bench.py lesson): at sf1 the graph
            # queries each pin edge-sized block sets against the 16g
            # local-mode heap, and without the release later rows in
            # one session inflate 3-5x from eviction/spill pressure,
            # not from their own plans. gc.collect() alone is NOT
            # enough (r14 measurement in bench.py) — the JVM-side
            # release waits on a JVM GC — so unpersist leftovers
            # explicitly; every query is finished once materialized.
            gc.collect()
            # NOTE: the async release can race a straggler task completion
            # from the just-finished query (DAGScheduler logs a benign
            # accessNonExistentAccumulator ERROR stack to stderr when the task
            # reports into an already-unregistered accumulator). Cosmetic only:
            # results, timings, and exit codes are unaffected -- the task already
            # delivered its data; only its metric update has nowhere to land.
            try:
                jm = spark.sparkContext._jsc.getPersistentRDDs()
                for rdd in list(jm.values()):
                    rdd.unpersist(False)
            except Exception:
                pass
        return best

    # warm-up pass at sf0.1 so neither scale pays JVM/codegen cold start
    for name in queries:
        run(name, str(SRC))

    big_label = f"sf{COPIES / 10:g}"
    print(f"{'query':28s} {'sf0.1':>8s} {big_label:>8s} {'ratio':>6s}")
    worst = 0.0
    for name in queries:
        # min-of-N per scale: single runs on this shared box carry
        # ±30-50% co-tenant swings in BOTH directions (a 1.3s query
        # has measured 4.9s, a 5.9s one 21.2s); the min is the honest
        # cost of the plan, same rationale as bench.py.
        small = run(name, str(SRC), runs)
        big = run(name, str(DST), runs)
        ratio = big / small
        # excluded from the gate: the exact Jaccard join, whose
        # QUALIFYING OUTPUT grows ~166x here by construction (every
        # replicated doc forms a 20-member near-dup clique with its
        # copies+twins; runtime stays sublinear in that output, which
        # is the optimal shape for an exact join)
        if name != "near_dedup_ngram_jaccard":
            worst = max(worst, ratio)
        print(f"{name:28s} {small:7.2f}s {big:7.2f}s {ratio:5.1f}x")
    print(
        f"worst ratio for {COPIES}x data: {worst:.1f}x",
        file=sys.stderr,
    )
    return 0 if worst < COPIES else 1


if __name__ == "__main__":
    raise SystemExit(main())
