"""Round-9 registered queries (extensions; built and tested in round 8).

Operators finished in round 8 ahead of their registration round and
flipped to ``@register`` at the start of round 9. Twenty total:
the four below, plus (further down) ``cusum_changepoints``,
``data_quality_expectations``, ``sssp_weighted_distances``,
``incremental_agg_maintenance``, ``mad_outlier_flags``,
``hll_distinct_flags`` (HyperLogLog registers),
``dp_noisy_counts`` (DP geometric mechanism),
``association_rules_2item`` (Apriori rules, ppm metrics),
``join_size_cms_estimate`` (F2 via count-min, skew witness),
``systematic_weighted_sample`` (integer PPS),
``histogram_quantile_cents`` (mergeable histogram quantiles) and
``holt_trend_forecast`` (level+trend smoothing, integer fold),
``ann_recall_eval`` (recall@k index evaluation in ppm),
``ols_trend_fit`` (closed-form grouped least squares, power sums),
``chi2_independence_ppm`` (Pearson contingency test, exact integer
terms) and ``collocation_pmi_bigrams`` (Church & Hanks PMI phrase
mining, quantized ln over exact-integer ratios):

- ``bpe_train_merges`` — full iterative BPE tokenizer training (the
  multi-round loop ``bpe_pair_merge_counts`` documents): count pairs
  over the weighted word dictionary, pick the argmax merge, APPLY it
  to every word's symbol sequence, repeat; emits the learned merge
  table.
- ``personalized_pagerank_nation`` — personalized PageRank over the
  item co-occurrence graph with the teleport mass restricted to a
  seed set (parts supplied from one nation), in the same
  bit-deterministic integer rank units as
  ``item_cooccurrence_pagerank``.
- ``streaming_kmv_distinct`` — windowed distinct-count estimation as
  streaming state: the two-batch watermark admission replay of
  ``streaming_window_late_data`` feeding a per-day bottom-k KMV
  sketch (the mergeable sketch a Structured Streaming
  ``applyInPandasWithState`` distinct-count operator would keep per
  window).
- ``compaction_bin_packing`` — the lakehouse small-file compaction
  planner: per-partition file inventory -> size-descending next-fit-
  decreasing bin packing into target-size output groups (the plan
  step of Delta/Iceberg ``OPTIMIZE``; complements
  ``zorder_layout_keys``, which plans the row layout INSIDE files).

History: these were built in round 8 but STAGED (not registered)
because the driver verifies the first 50 registry entries per round
and round 8's window was fully claimed by the changed/new queries plus
the overdue-stale refresh cohort that ``tools/rotation_check.py``
enforces. Round 9 registered them and gave all 20 front-window slots
(docs/R9_PLAN.md §1-2). They carry full DuckDB oracles and
Spark-vs-oracle + Python-replay tests (``tests/test_staged_r9.py``).

No counterpart in the reference (a pandas Excel->Postgres ETL,
`/root/reference/autosinapi/etl_pipeline.py`); these are the
LLM-corpus / lakehouse extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import tokens
from .registry import register

# Flipped to ``@register`` at the start of round 9 (docs/R9_PLAN.md §1).
# Kept as an empty alias one round so out-of-tree callers of the old
# staged surface fail soft; every query below is in the main REGISTRY.
STAGED: dict = {}


# --- iterative BPE training (apply the merge list) -------------------
# Sennrich, Haddow & Birch 2016: repeat {count adjacent symbol pairs,
# merge the most frequent pair everywhere} T times. The registered
# bpe_pair_merge_counts runs ONE count round; this runs the whole
# loop, including the greedy left-to-right non-overlapping merge
# application, and returns the learned merge table.

_BPE_ROUNDS = 6

# Greedy left-to-right merge of the winning pair (x, y) over a word's
# space-joined symbol string, as a fold: if the accumulated string's
# LAST symbol is exactly x and the incoming symbol is y, fuse them.
# The fused symbol x||y is strictly longer than x, so it can never
# re-match as the left element in the same pass — exactly the
# non-overlapping scan BPE specifies. DuckDB's list_reduce seeds the
# fold with the first element; Spark's aggregate('') reproduces that
# via the acc = '' branch.


def _bpe_sql() -> str:
    rounds = []
    sel = []
    prev = "dict0"
    for r in range(1, _BPE_ROUNDS + 1):
        rounds.append(
            f"""
    p{r} AS (
      SELECT u.x AS x, u.y AS y, CAST(SUM(freq) AS BIGINT) AS n
      FROM (
        SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                      i -> {{x: l[i], y: l[i + 1]}})) AS u,
               freq
        FROM (SELECT string_split(syms, ' ') AS l, freq FROM {prev})
      ) GROUP BY 1, 2
    ),
    w{r} AS (SELECT x, y, n FROM p{r} ORDER BY n DESC, x, y LIMIT 1),
    dict{r} AS (
      SELECT list_reduce(string_split(d.syms, ' '),
               (acc, s) -> CASE
                 WHEN s = w.y AND (acc = w.x
                      OR right(acc, length(w.x) + 1) = ' ' || w.x)
                 THEN substr(acc, 1, length(acc) - length(w.x))
                      || w.x || w.y
                 ELSE acc || ' ' || s END) AS syms,
             d.freq
      FROM {prev} d CROSS JOIN w{r} w
    )"""
        )
        sel.append(
            f"SELECT CAST({r} AS BIGINT) AS merge_round, x AS left_sym, "
            f"y AS right_sym, x || y AS merged, n AS pair_n FROM w{r}"
        )
        prev = f"dict{r}"
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents
    ),
    dict0 AS (
      SELECT array_to_string(list_transform(
               generate_series(1, length(w)), i -> substr(w, i, 1)),
               ' ') AS syms,
             CAST(COUNT(*) AS BIGINT) AS freq
      FROM tok WHERE w <> '' GROUP BY 1
    ),{','.join(rounds)}
    SELECT * FROM ({' UNION ALL '.join(sel)}) ORDER BY merge_round
    """


_BPE_FOLD = (
    "aggregate(split(syms, ' '), '', (acc, s) -> CASE "
    "WHEN acc = '' THEN s "
    "WHEN s = y AND (acc = x "
    "OR right(acc, char_length(x) + 1) = concat(' ', x)) "
    "THEN concat(substr(acc, 1, char_length(acc) - char_length(x)), x, y) "
    "ELSE concat(acc, ' ', s) END)"
)


@register(
    "bpe_train_merges",
    _bpe_sql(),
    doc=f"Iterative BPE tokenizer training, {_BPE_ROUNDS} merge rounds "
    "(Sennrich et al. 2016): corpus-weighted pair counts over the "
    "word dictionary -> argmax merge (count desc, pair tiebreak) -> "
    "greedy left-to-right non-overlapping merge applied to every "
    "word -> re-count; emits the learned merge table (extension; the "
    "full loop whose inner round is bpe_pair_merge_counts).",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(merge_round, left_sym, right_sym, merged, pair_n), one row per
    learned merge, in training order.

    Scale shape: everything runs over the DISTINCT word dictionary
    weighted by corpus frequency (the vocabulary-vs-token-stream
    collapse — a 100 TB corpus's dictionary is millions of rows, not
    trillions), so each round is one dictionary-sized hash aggregate
    + a TakeOrdered(1) argmax + one row-local fold. The winning pair
    stays IN-PLAN as a broadcast 1-row frame (crossJoin(broadcast)) —
    no driver collect; ``localCheckpoint(eager=False)`` per round
    caps lineage at T rounds like the BOM frontier loop. The merge
    application is a codegen'd ``aggregate`` fold (greedy
    non-overlapping scan: a fused symbol is strictly longer than its
    left half, so it cannot re-match within the pass), mirrored
    bit-for-bit by DuckDB's ``list_reduce``. Pair counts never
    increase round-over-round (a merge only splits/renames existing
    adjacencies), which the replay test asserts.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w")).where(
        F.col("w") != ""
    )
    # distinct words -> distinct symbol strings (the space-joined
    # segmentation concatenates back to the word), so no re-group is
    # ever needed after merges
    dic = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    ).select(
        F.expr(
            "array_join(transform(sequence(1, char_length(w)), "
            "i -> substr(w, i, 1)), ' ')"
        ).alias("syms"),
        "freq",
    )
    merges: DataFrame | None = None
    for r in range(1, _BPE_ROUNDS + 1):
        base = dic.select(F.split("syms", " ").alias("l"), "freq").where(
            F.size("l") >= 2
        )
        pairs = base.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1), "
                    "i -> struct(element_at(l, i) AS x, "
                    "element_at(l, i + 1) AS y))"
                )
            ).alias("u"),
            "freq",
        )
        p = pairs.groupBy("u.x", "u.y").agg(
            F.sum("freq").cast("long").alias("n")
        )
        w = p.orderBy(F.desc("n"), F.asc("x"), F.asc("y")).limit(1)
        row = w.select(
            F.lit(r).cast("long").alias("merge_round"),
            F.col("x").alias("left_sym"),
            F.col("y").alias("right_sym"),
            F.concat("x", "y").alias("merged"),
            F.col("n").alias("pair_n"),
        )
        merges = row if merges is None else merges.unionAll(row)
        dic = (
            dic.crossJoin(F.broadcast(w))
            .select(F.expr(_BPE_FOLD).alias("syms"), "freq")
            .localCheckpoint(eager=False)
        )
    assert merges is not None
    return merges.orderBy("merge_round")


# --- personalized PageRank -------------------------------------------
# Same integer-unit, fixed-iteration machinery as
# item_cooccurrence_pagerank (graph_analytics_queries.py), but the
# teleport/base mass goes ONLY to a seed set — here, parts supplied
# by one nation's suppliers — so scores mean "proximity to the seed
# supply chain", the query-biased relevance prior of web curation
# (Haveliwala 2002, topic-sensitive PageRank).

_PPR_INIT = 1_000_000_000_000
_PPR_BASE = 150_000_000_000  # (1 - 0.85) * init, to seeds only
_PPR_ITERS = 3
_PPR_TOP = 100
_PPR_NATION = "NATION_3"


def _ppr_sql() -> str:
    iters = []
    prev = "r0"
    for t in range(1, _PPR_ITERS + 1):
        iters.append(
            f"""
    i{t} AS (
      SELECT e.dst AS id,
             CAST(SUM(r.pr // d.outdeg) AS BIGINT) AS incoming
      FROM edges e
      JOIN {prev} r ON r.id = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{t} AS (
      SELECT n.id,
             CAST(CASE WHEN sd.id IS NOT NULL THEN {_PPR_BASE}
                       ELSE 0 END
                  + (85 * COALESCE(i.incoming, 0)) // 100
                  AS BIGINT) AS pr
      FROM nodes n
      LEFT JOIN seeds sd ON sd.id = n.id
      LEFT JOIN i{t} i ON i.id = n.id
    )"""
        )
        prev = f"r{t}"
    return f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey <> b.l_partkey
    ),
    deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    ),
    nodes AS (SELECT DISTINCT l_partkey AS id FROM li),
    seeds AS (
      SELECT DISTINCT l.l_partkey AS id
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{_PPR_NATION}'
    ),
    r0 AS (
      SELECT n.id,
             CAST(CASE WHEN sd.id IS NOT NULL THEN {_PPR_INIT}
                       ELSE 0 END AS BIGINT) AS pr
      FROM nodes n LEFT JOIN seeds sd ON sd.id = n.id
    ),{','.join(iters)}
    SELECT part_key, ppr_units, rank_pos, is_seed FROM (
      SELECT r.id AS part_key, r.pr AS ppr_units,
             CAST(RANK() OVER (ORDER BY r.pr DESC, r.id) AS BIGINT)
               AS rank_pos,
             sd.id IS NOT NULL AS is_seed
      FROM {prev} r LEFT JOIN seeds sd ON sd.id = r.id
    ) WHERE rank_pos <= {_PPR_TOP}
    """


@register(
    "personalized_pagerank_nation",
    _ppr_sql(),
    doc=f"Personalized PageRank over the order-basket co-occurrence "
    f"graph, teleport mass restricted to parts supplied from "
    f"{_PPR_NATION} (Haveliwala 2002): {_PPR_ITERS} damped "
    "iterations in integer rank units with truncating division, "
    "bit-deterministic; oracle unrolls the iterations as CTEs "
    "(extension; the seed-biased relevance prior of corpus "
    "curation).",
)
def personalized_pagerank_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-100 (part_key, ppr_units, rank_pos, is_seed) after 3 PPR
    iterations seeded at one nation's supplied parts.

    Scale shape: identical to ``item_cooccurrence_pagerank`` — basket-
    local k^2 pair expansion (one shuffle), edges+outdeg PERSISTED
    once pre-hashed on src (r15: InMemoryRelation keeps the
    partitioning under AQE, so every iteration's src-keyed join reads
    it exchange-free — the plan-shape pin), each iteration one keyed
    join + one partial-aggregated groupBy moving only (id, long)
    frames — plus one broadcast-sized seed semi-structure: the seed
    flag is attached to the node frame ONCE (node-sized left join,
    persisted hash(id), reused every round), never recomputed. The
    head cut is TakeOrdered over (pr, id), not a global rank window.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ps, a -> transform(ps, "
                    "b -> struct(a AS src, b AS dst)))), "
                    "x -> x.src != x.dst)"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # persist, not localCheckpoint (r15, verdict ask #1): the cached
    # frame KEEPS HashPartitioning(src) under AQE, so every round's
    # src-keyed join reads it with no exchange — see
    # item_cooccurrence_pagerank for the full rationale and the
    # plan-shape pin; the sim/bench harnesses clear the SQL cache
    # between runs (intra-query reuse only).
    edges_deg = edges.join(deg, "src").repartition("src").persist()
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").where(
        F.col("n_name") == _PPR_NATION
    )
    li3 = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    nat_sup = sup.join(
        F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey")
    seeds = (
        li3.join(F.broadcast(nat_sup), li3["l_suppkey"] == nat_sup["s_suppkey"])
        .select(F.col("l_partkey").alias("sid"))
        .distinct()
    )
    nodes = li.select(F.col("l_partkey").alias("id")).distinct()
    # seed flag attached once; every iteration and the final output
    # reuse this node-sized frame (localCheckpoint, deliberately NOT
    # persist — r15 A/B: the hash(id) repartition+persist variant
    # measured 5.93s vs 5.16s solo; the node-sized cache build plus
    # per-round columnar reads cost more than the elided exchange
    # saves on a frame this small)
    nodes_seed = (
        nodes.join(seeds, nodes["id"] == seeds["sid"], "left")
        .select("id", F.col("sid").isNotNull().alias("is_seed"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes_seed.select(
        "id",
        F.when(F.col("is_seed"), F.lit(_PPR_INIT))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pr"),
    )
    # Deliberate join strategy (guide §3.1): the loop's rounds pipeline
    # into ONE adaptive query stage (round t's ranks flows into round
    # t+1's join with no exchange between them), so AQE never gets a
    # stage boundary at which to convert the planned SortMergeJoins to
    # broadcast — and the edge frame was being SORTED every round. A
    # SHUFFLE_HASH hint on the node-sized side builds a per-partition
    # hash table instead: no sort of either side, and scale-safe where
    # a broadcast hint is not (the node frame is per-partition small on
    # any cluster width, but would not FIT as a whole-frame broadcast
    # at deployment scale).
    for _ in range(_PPR_ITERS):
        contrib = (
            edges_deg.join(
                ranks.hint("shuffle_hash"),
                edges_deg["src"] == ranks["id"],
            )
            .select(F.col("dst"), F.expr("pr div outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("incoming"))
        )
        ranks = nodes_seed.join(
            contrib.hint("shuffle_hash"),
            nodes_seed["id"] == contrib["dst"],
            "left",
        ).select(
            "id",
            (
                F.when(F.col("is_seed"), F.lit(_PPR_BASE))
                .otherwise(F.lit(0))
                + F.expr("85 * coalesce(incoming, 0L) div 100")
            )
            .cast("long")
            .alias("pr"),
        )
    top = (
        ranks.join(nodes_seed.select("id", "is_seed"), "id")
        .orderBy(F.desc("pr"), F.asc("id"))
        .limit(_PPR_TOP)
    )
    return top.select(
        F.col("id").alias("part_key"),
        F.col("pr").alias("ppr_units"),
        F.rank()
        .over(Window.orderBy(F.desc("pr"), F.asc("id")))
        .cast("long")
        .alias("rank_pos"),
        "is_seed",
    )


# --- streaming windowed KMV distinct ---------------------------------
# The stateful-streaming shape of the KMV sketch: per event-time day
# window, keep a bottom-k sketch of user hashes as the window's state
# (mergeable across micro-batches by construction — bottom-k of
# bottom-k partials == global bottom-k), behind the same two-batch
# watermark admission replay streaming_window_late_data pins. This is
# the batch-replayed contract of an applyInPandasWithState distinct-
# count operator whose per-window state is the k-row sketch instead
# of an exact (unbounded) user set.

_SKMV_K = 64
_SKMV_SALTS = 8
_SKMV_SEED = 11
_SKMV_SPACE = float(1 << 60)
_SKMV_BOUND = round(3.0 / (_SKMV_K - 2) ** 0.5, 6)
_SKMV_B1_END = "2024-01-15 12:00:00"
_SKMV_MOD = 20

_SKMV_SQL = f"""
    WITH b1 AS (
      SELECT * FROM events
      WHERE ts < TIMESTAMP '{_SKMV_B1_END}'
        AND event_id % {_SKMV_MOD} <> 0
    ),
    b2 AS (
      SELECT * FROM events
      WHERE NOT (ts < TIMESTAMP '{_SKMV_B1_END}'
                 AND event_id % {_SKMV_MOD} <> 0)
    ),
    wm AS (SELECT MAX(ts) - INTERVAL 24 HOUR AS w FROM b1),
    adm AS (
      SELECT * FROM b1
      UNION ALL
      SELECT b2.* FROM b2, wm WHERE b2.ts >= wm.w
    ),
    d AS (
      SELECT DISTINCT
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS win_day,
             CAST('0x' || substr(md5('{_SKMV_SEED}:' ||
                  CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM adm
    ),
    r AS (
      SELECT win_day, h,
             ROW_NUMBER() OVER (PARTITION BY win_day ORDER BY h) AS rn
      FROM d
    ),
    km AS (
      SELECT win_day, COUNT(*) AS nk, MAX(h) AS hk
      FROM r WHERE rn <= {_SKMV_K} GROUP BY win_day
    ),
    ex AS (
      SELECT win_day, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM d GROUP BY win_day
    ),
    est AS (
      SELECT e.win_day, e.n_exact,
             ROUND(CASE WHEN km.nk < {_SKMV_K}
                        THEN CAST(km.nk AS DOUBLE)
                        ELSE {_SKMV_K - 1}.0
                             / (CAST(km.hk AS DOUBLE) / {_SKMV_SPACE!r})
                   END, 4) AS n_est
      FROM ex e JOIN km ON km.win_day = e.win_day
    )
    SELECT win_day, n_exact, n_est,
           ROUND(ABS(n_est - n_exact) / n_exact, 6) AS rel_err,
           ABS(n_est - n_exact) / n_exact <= {_SKMV_BOUND!r}
             AS within_bound
    FROM est
    ORDER BY win_day
"""


@register(
    "streaming_kmv_distinct",
    _SKMV_SQL,
    doc=f"Streaming windowed distinct-count sketch: watermark "
    f"admission (24h delay, two-batch replay) then a per-day "
    f"bottom-{_SKMV_K} KMV estimate of distinct users — the "
    "mergeable sketch state of a stateful streaming distinct "
    "operator, with exact companion + 3-sigma bound check "
    "(Bar-Yossef et al. 2002; extension).",
)
def streaming_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(win_day, n_exact, n_est, rel_err, within_bound) per admitted
    event-time day window.

    Scale shape: admission is two scans + one broadcast 1-row
    watermark crossJoin (the established replay idiom); the hash is
    row-local; the distinct pass is map-side-combinable on (win, h);
    bottom-k selection is hierarchical — a first window over
    (win, h % {_SKMV_SALTS}) salt groups bounds every sort partition,
    the second sees <= {_SKMV_SALTS}*k survivors (KMV mergeability).
    In the real streaming engine the k-row sketch IS the per-window
    state, so state size is k*windows regardless of stream volume —
    the exact-companion arm exists only for the bound check and
    disappears in production.
    """
    # rebalance=False: sketch-bounded downstream state — the scan-
    # rebalance exchange shuffles the full table for no width gain
    # (r14 verdict ask #3; reproducibly slower in both driver runs)
    ev = load(spark, sf_dir, "events", rebalance=False)
    in_b1 = (F.col("ts") < F.lit(_SKMV_B1_END).cast("timestamp")) & (
        F.col("event_id") % _SKMV_MOD != 0
    )
    b1 = ev.where(in_b1)
    b2 = ev.where(~in_b1)
    wm = b1.agg(
        (F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("w")
    )
    kept2 = (
        b2.crossJoin(F.broadcast(wm))
        .where(F.col("ts") >= F.col("w"))
        .select(*ev.columns)
    )
    adm = b1.unionByName(kept2)
    hcol = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{_SKMV_SEED}:"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    d = (
        adm.select(
            F.date_format(F.date_trunc("DAY", "ts"), "yyyy-MM-dd").alias(
                "win_day"
            ),
            hcol.alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    w1 = Window.partitionBy(
        "win_day", F.pmod(F.col("h"), _SKMV_SALTS)
    ).orderBy("h")
    w2 = Window.partitionBy("win_day").orderBy("h")
    bottom = (
        d.withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= _SKMV_K)
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= _SKMV_K)
    )
    km = bottom.groupBy("win_day").agg(
        F.count(F.lit(1)).alias("nk"), F.max("h").alias("hk")
    )
    ex = d.groupBy("win_day").agg(F.count(F.lit(1)).alias("n_exact"))
    est = ex.join(km, "win_day").select(
        "win_day",
        "n_exact",
        F.round(
            F.when(
                F.col("nk") < _SKMV_K, F.col("nk").cast("double")
            ).otherwise(
                F.lit(float(_SKMV_K - 1))
                / (F.col("hk").cast("double") / F.lit(_SKMV_SPACE))
            ),
            4,
        ).alias("n_est"),
    )
    return est.select(
        "win_day",
        "n_exact",
        "n_est",
        F.round(
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
        (
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact")
            <= F.lit(_SKMV_BOUND)
        ).alias("within_bound"),
    ).orderBy("win_day")


# --- compaction bin-packing planner ----------------------------------
# The small-file compaction planner of lakehouse table maintenance
# (Delta/Iceberg OPTIMIZE bin-packing): from a per-partition file
# inventory, group under-target files into output bins by next-fit-
# decreasing. Distinct from pack_documents_bins (next-fit over
# DOCUMENT TOKENS in doc-id order for training-batch assembly): this
# operates on FILE METADATA, orders by size DESCENDING (NFD — the
# classic 2x-optimal packing guarantee needs the decreasing order),
# excludes already-big-enough files, and its output is a rewrite
# plan, not a batch layout. Complements zorder_layout_keys, which
# plans row order INSIDE the rewritten files.

_CP_FILES = 256  # synthetic files per month partition
_CP_TARGET = 32768  # target output file bytes
_CP_ROW = "96 + l_linenumber * 8"  # deterministic per-row byte estimate

_CP_SQL = f"""
    WITH f AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS part_month,
             l_orderkey % {_CP_FILES} AS file_no,
             CAST(SUM({_CP_ROW}) AS BIGINT) AS bytes
      FROM lineitem GROUP BY 1, 2
    ),
    small AS (SELECT * FROM f WHERE bytes < {_CP_TARGET}),
    c AS (
      SELECT part_month, file_no, bytes,
             SUM(bytes) OVER (
               PARTITION BY part_month
               ORDER BY bytes DESC, file_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM small
    ),
    b AS (
      SELECT part_month,
             CAST((cum - bytes) // {_CP_TARGET} AS BIGINT) AS bin,
             file_no, bytes
      FROM c
    )
    SELECT part_month, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           CAST(MIN(bytes) AS BIGINT) AS min_file_bytes,
           CAST(MAX(bytes) AS BIGINT) AS max_file_bytes
    FROM b GROUP BY 1, 2
    ORDER BY part_month, bin
"""


@register(
    "compaction_bin_packing",
    _CP_SQL,
    doc=f"Lakehouse compaction planner: per-month file inventory "
    f"(synthetic {_CP_FILES}-way files with deterministic byte "
    f"estimates), under-{_CP_TARGET}-byte files packed into output "
    "bins by next-fit-decreasing prefix-sum binning — the plan step "
    "of Delta/Iceberg OPTIMIZE bin-packing (extension; the rewrite "
    "planner beside zorder_layout_keys' in-file row layout).",
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_month, bin, n_files, bin_bytes, min/max_file_bytes) per
    planned compaction task.

    Scale shape: in production the file inventory comes from the
    table's transaction log — metadata-sized (one row per FILE, not
    per data row); the synthetic inventory here is one partial-
    aggregated groupBy standing in for that log scan. The packing
    window partitions by table partition (part_month) and orders by
    size desc — never a global sort; each partition's plan is
    independent, so 100 TB of table = millions of metadata rows
    sharded by partition. Bin assignment is the exclusive-prefix-sum
    next-fit-decreasing form (bin overflow bounded by one file,
    asserted in tests), which needs no sequential recurrence.
    """
    li = load(spark, sf_dir, "lineitem")
    # group on integer (year, month) and format the partition label
    # AFTER aggregation: per-row date_format over the fact table is
    # the hidden cost of a metadata build (measured 8.3s -> much less
    # at the 10x scale fixture); the formatted key only ever exists at
    # file-metadata grain
    f = (
        li.groupBy(
            F.year("l_shipdate").alias("y"),
            F.month("l_shipdate").alias("m"),
            (F.col("l_orderkey") % _CP_FILES).alias("file_no"),
        )
        .agg(F.sum(F.expr(_CP_ROW)).cast("long").alias("bytes"))
        .where(F.col("bytes") < _CP_TARGET)
        .select(
            F.format_string("%04d-%02d", "y", "m").alias("part_month"),
            "file_no",
            "bytes",
        )
    )
    w = (
        Window.partitionBy("part_month")
        .orderBy(F.desc("bytes"), F.asc("file_no"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = f.select(
        "part_month",
        (F.sum("bytes").over(w) - F.col("bytes")).alias("excl_cum"),
        "file_no",
        "bytes",
    ).select(
        "part_month",
        F.expr(f"CAST(excl_cum DIV {_CP_TARGET} AS BIGINT)").alias("bin"),
        "file_no",
        "bytes",
    )
    return (
        b.groupBy("part_month", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("bin_bytes"),
            F.min("bytes").cast("long").alias("min_file_bytes"),
            F.max("bytes").cast("long").alias("max_file_bytes"),
        )
        .orderBy("part_month", "bin")
    )


# --- CUSUM change-point detection ------------------------------------
# Page 1954 CUSUM drift detection over a monitored metric series —
# here, per-nation monthly order revenue. The textbook form is a
# recurrence (S_t = max(0, S_{t-1} + d_t)), which looks
# window-inexpressible; the identity S_t = P_t - min(0, min_{j<=t}
# P_j) over the deviation prefix sums P makes it two plain running
# windows. Everything is integer: monthly revenue as exact cents,
# deviations scaled by the series length N (d_t = N*x_t - total) so
# no division ever happens, and the alarm test S_t * N > C * A
# (A = sum|d|) is the threshold "C mean absolute deviations"
# cross-multiplied into pure int64 — bit-deterministic, the PageRank
# integer-units discipline applied to time-series QC.

_CUSUM_C = 12  # alarm threshold in mean-absolute-deviations

_CUSUM_SQL = f"""
    WITH m AS (
      SELECT n.n_name AS n_name,
             year(o.o_orderdate) AS y, month(o.o_orderdate) AS mo,
             CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,10)))
                        * 100, 0) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2, 3
    ),
    s AS (
      SELECT n_name, y, mo, cents,
             CAST(COUNT(*) OVER (PARTITION BY n_name) AS BIGINT) AS nm,
             SUM(cents) OVER (PARTITION BY n_name) AS tot
      FROM m
    ),
    d AS (
      SELECT n_name, y, mo, cents, nm, nm * cents - tot AS dd FROM s
    ),
    p AS (
      SELECT n_name, y, mo, cents, nm, dd,
             SUM(dd) OVER w AS pp,
             SUM(ABS(dd)) OVER (PARTITION BY n_name) AS a
      FROM d
      WINDOW w AS (PARTITION BY n_name ORDER BY y, mo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    c2 AS (
      SELECT n_name, y, mo, cents, nm, a, pp,
             pp - LEAST(0, MIN(pp) OVER w) AS spos,
             GREATEST(0, MAX(pp) OVER w) - pp AS sneg
      FROM p
      WINDOW w AS (PARTITION BY n_name ORDER BY y, mo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT n_name, printf('%04d-%02d', y, mo) AS month,
           cents AS revenue_cents,
           CAST(spos AS BIGINT) AS cusum_pos_units,
           CAST(sneg AS BIGINT) AS cusum_neg_units,
           (spos * nm > {_CUSUM_C} * a) OR (sneg * nm > {_CUSUM_C} * a)
             AS is_changepoint
    FROM c2
    ORDER BY n_name, month
"""


@register(
    "cusum_changepoints",
    _CUSUM_SQL,
    doc=f"CUSUM change-point detection over per-nation monthly order "
    "revenue (Page 1954): two-sided cumulative-sum drift statistics "
    "in exact integer cents via the prefix-sum identity "
    "S_t = P_t - min(0, running min P), alarm at "
    f"{_CUSUM_C} mean absolute deviations cross-multiplied to avoid "
    "any division — the metric-drift monitor of pipeline QC "
    "(extension).",
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, month, revenue_cents, cusum_pos_units,
    cusum_neg_units, is_changepoint) per nation-month; cusum columns
    are N-scaled (units of 1/N cents, N = series length).

    Scale shape: the star join + monthly rollup is the only
    data-bound stage (broadcast nation, partial-aggregated groupBy);
    every window after it runs at METRIC grain — series-per-key x
    months, bounded regardless of fact volume — partitioned by
    nation, never global. The recurrence-free CUSUM identity is what
    keeps it windowable: the textbook max(0, S+d) fold would need a
    sequential pass per key. All arithmetic is int64 (exact-decimal
    cents, N-scaled deviations, cross-multiplied threshold); at
    int64-straining magnitudes (cents * N * months ~ 1e15 here)
    the same plan swaps to DECIMAL(38,0) unchanged.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,10)")) * 100, 0
            )
            .cast("long")
            .alias("cents")
        )
    )
    wp = Window.partitionBy("n_name")
    wo = (
        Window.partitionBy("n_name")
        .orderBy("y", "mo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = m.select(
        "n_name",
        "y",
        "mo",
        "cents",
        F.count(F.lit(1)).over(wp).cast("long").alias("nm"),
        F.sum("cents").over(wp).alias("tot"),
    )
    d = s.withColumn("dd", F.col("nm") * F.col("cents") - F.col("tot"))
    p = d.select(
        "n_name",
        "y",
        "mo",
        "cents",
        "nm",
        "dd",
        F.sum("dd").over(wo).alias("pp"),
        F.sum(F.abs(F.col("dd"))).over(wp).alias("a"),
    )
    c2 = p.withColumn(
        "spos",
        F.col("pp") - F.least(F.lit(0).cast("long"), F.min("pp").over(wo)),
    ).withColumn(
        "sneg",
        F.greatest(F.lit(0).cast("long"), F.max("pp").over(wo))
        - F.col("pp"),
    )
    thr = F.lit(_CUSUM_C).cast("long") * F.col("a")
    return c2.select(
        "n_name",
        F.format_string("%04d-%02d", "y", "mo").alias("month"),
        F.col("cents").alias("revenue_cents"),
        F.col("spos").cast("long").alias("cusum_pos_units"),
        F.col("sneg").cast("long").alias("cusum_neg_units"),
        (
            (F.col("spos") * F.col("nm") > thr)
            | (F.col("sneg") * F.col("nm") > thr)
        ).alias("is_changepoint"),
    ).orderBy("n_name", "month")


# --- data-quality expectations ---------------------------------------

_DQ_SQL = """
    WITH m AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
               AS v_ship,
             SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
               AS v_rf,
             COUNT(DISTINCT (l_orderkey, l_linenumber, l_partkey,
                             l_suppkey)) AS u_key4,
             COUNT(DISTINCT (l_orderkey, l_linenumber)) AS u_key2,
             SUM(CASE WHEN l_returnflag IS NULL
                       OR l_returnflag NOT IN ('A', 'N', 'R')
                 THEN 1 ELSE 0 END) AS v_dom_rf,
             SUM(CASE WHEN l_linestatus IS NULL
                       OR l_linestatus NOT IN ('O', 'F')
                 THEN 1 ELSE 0 END) AS v_dom_ls,
             SUM(CASE WHEN l_quantity IS NULL
                       OR l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) AS v_qty,
             SUM(CASE WHEN l_extendedprice IS NULL
                       OR l_extendedprice < 0
                 THEN 1 ELSE 0 END) AS v_price
      FROM lineitem
    ),
    o AS (
      SELECT COUNT(*) AS v_ref FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    ),
    r AS (
      SELECT 'completeness:l_shipdate' AS check_name, v_ship AS viol
      FROM m
      UNION ALL SELECT 'completeness:l_returnflag', v_rf FROM m
      UNION ALL SELECT 'domain:l_returnflag', v_dom_rf FROM m
      UNION ALL SELECT 'domain:l_linestatus', v_dom_ls FROM m
      UNION ALL SELECT 'range:l_quantity', v_qty FROM m
      UNION ALL SELECT 'nonneg:l_extendedprice', v_price FROM m
      UNION ALL SELECT 'uniqueness:line_key4', n - u_key4 FROM m
      UNION ALL SELECT 'uniqueness:line_key2', n - u_key2 FROM m
      UNION ALL SELECT 'ref:l_orderkey->orders', v_ref FROM o
    )
    SELECT check_name,
           CAST((m.n - r.viol) * 1000000 // m.n AS BIGINT)
             AS observed_ppm,
           CAST(r.viol AS BIGINT) AS n_violations,
           r.viol = 0 AS passed
    FROM r, m
    ORDER BY check_name
"""


@register(
    "data_quality_expectations",
    _DQ_SQL,
    doc="Deequ-style data-quality expectation suite over lineitem "
    "(Schelter et al. 2018): completeness, domain, range, "
    "non-negativity, two uniqueness grains (the 4-col line key is "
    "unique; the naive (orderkey, linenumber) pair is NOT — the "
    "report shows real violations), and FK referential integrity — "
    "all row/unique checks folded into ONE aggregate scan, ratios "
    "as integer ppm (extension; `operators/quality.py`).",
)
def data_quality_expectations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(check_name, observed_ppm, n_violations, passed) per check.

    Scale shape: see ``operators/quality.expectations_report`` — N
    row checks + 2 distinct-counts cost one scan of the fact table
    (map-side partials; the distinct-aggregate expansion is the one
    extra exchange, swappable for approx_count_distinct at extreme
    scale), and the referential check is the single fk-keyed anti
    join. Report output is check-count-sized. The reference validates
    implicitly (coerce -> NULL -> dropna); this is the explicit,
    monitorable contract.
    """
    from ..operators.quality import expectations_report

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    rf, ls = F.col("l_returnflag"), F.col("l_linestatus")
    qty, px = F.col("l_quantity"), F.col("l_extendedprice")
    return expectations_report(
        li,
        row_checks=[
            ("completeness:l_shipdate", F.col("l_shipdate").isNull()),
            ("completeness:l_returnflag", rf.isNull()),
            ("domain:l_returnflag", rf.isNull() | ~rf.isin("A", "N", "R")),
            ("domain:l_linestatus", ls.isNull() | ~ls.isin("O", "F")),
            ("range:l_quantity", qty.isNull() | (qty < 1) | (qty > 50)),
            ("nonneg:l_extendedprice", px.isNull() | (px < 0)),
        ],
        unique_checks=[
            (
                "uniqueness:line_key4",
                ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
            ),
            ("uniqueness:line_key2", ["l_orderkey", "l_linenumber"]),
        ],
        ref_checks=[
            ("ref:l_orderkey->orders", ["l_orderkey"], orders, ["o_orderkey"])
        ],
    )


# --- bounded weighted SSSP (Bellman-Ford rounds) ---------------------
# The weighted complement of bfs_khop_distances: single-source (here
# multi-source) shortest WEIGHTED distances under a bounded number of
# relaxation rounds — exactly R synchronized Bellman-Ford iterations,
# the Pregel-style SSSP primitive. Edge weights are association
# distances derived from co-occurrence strength (1e6 // count, so
# strongly-associated items are "close"), all integer. After R
# rounds the frame holds the exact shortest distance among paths of
# <= R edges — the bounded-round semantics the oracle unrolls.

_SSSP_ROUNDS = 4
_SSSP_SEEDS = 3
_SSSP_SCALE = 1_000_000


def _sssp_sql() -> str:
    rounds = []
    prev = "d0"
    for r in range(1, _SSSP_ROUNDS + 1):
        rounds.append(
            f"""
    d{r} AS (
      SELECT seed, node, MIN(dist) AS dist FROM (
        SELECT seed, node, dist FROM {prev}
        UNION ALL
        SELECT d.seed, e.dst AS node, d.dist + e.w AS dist
        FROM {prev} d JOIN wed e ON e.src = d.node
      ) GROUP BY 1, 2
    )"""
        )
        prev = f"d{r}"
    return f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    und AS (
      SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM items a JOIN items b ON b.o = a.o AND b.p > a.p
      GROUP BY 1, 2
    ),
    wed AS (
      SELECT u AS src, v AS dst, {_SSSP_SCALE} // cnt AS w FROM und
      UNION ALL
      SELECT v, u, {_SSSP_SCALE} // cnt FROM und
    ),
    seeds AS (
      SELECT x AS seed FROM (
        SELECT u AS x FROM und UNION SELECT v FROM und
      ) ORDER BY x LIMIT {_SSSP_SEEDS}
    ),
    d0 AS (
      SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist FROM seeds
    ),{','.join(rounds)}
    SELECT seed, node, dist AS dist_units
    FROM {prev}
    ORDER BY seed, node
    """


@register(
    "sssp_weighted_distances",
    _sssp_sql(),
    doc=f"Bounded weighted SSSP: {_SSSP_ROUNDS} synchronized "
    "Bellman-Ford relaxation rounds from the "
    f"{_SSSP_SEEDS} smallest items over the co-occurrence graph "
    f"with integer association-distance weights ({_SSSP_SCALE} // "
    "pair count) — exact shortest distances among paths of <= R "
    "edges; oracle unrolls the rounds as min-merge CTEs "
    "(extension; the weighted complement of bfs_khop_distances).",
)
def sssp_weighted_distances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(seed, node, dist_units) — shortest <= R-edge weighted
    distance from each seed to every node reached.

    Scale shape: Pregel-in-DataFrames — each round is ONE
    distance-frame-vs-edges hash join keyed on the frontier node
    (never all-pairs) plus one (seed, node) min-combine groupBy,
    both partial-aggregated; the distance frame is node-sized, the
    edge frame is built once (basket-local pair expansion, one
    shuffle) and PERSISTED pre-hashed on the join key ``src`` (r15):
    InMemoryRelation keeps the repartition's HashPartitioning under
    AQE — unlike localCheckpoint, the r8 boundary pinned in
    tests/test_plan_shapes.py — so every relax round's edge-side
    exchange is elided outright. localCheckpoint per round caps
    lineage exactly like the BFS/k-core loops. The round count is a
    compile-time constant; an unbounded SSSP runs the same loop to a
    driver-side fixed-point check. Weights and distances are pure
    int64 (max ~R * 1e6), bit-deterministic across engines.

    Measured negative result (r9): the sparse-Bellman-Ford/SPFA
    variant — relax only rows whose distance strictly improved last
    round, with the improved flag derived for free via
    min(struct(dist, tag)) — is round-identical in output (a strict
    round-k improvement can only arrive via a round-(k-1)-improved
    vertex) but 1.6x SLOWER here (interleaved min-of-3 at sf0.1:
    10.3s full vs 16.2s frontier). Cause: the small distance frame
    rides a broadcast into the relax join, so shrinking it buys
    nothing — the bound is the RELAXED OUTPUT (frontier-incident
    edges) feeding the min shuffle, and on this dense small-diameter
    basket graph nearly every reached vertex keeps improving within
    the 4 bounded rounds, so the frontier IS the reached set while
    the tag struct and the second consumer of each round's
    checkpoint add real cost. The frontier form pays off when
    settled >> improved per round — sparse graphs, long horizons, or
    run-to-fixpoint — which is the 100 TB posture documented in
    DEPLOY.md; at this benchmark's shape, full relaxation is the
    faster plan and is what runs below.
    """

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(ps, a -> transform(ps, "
                "b -> struct(a AS u, b AS v)))), x -> x.u < x.v)"
            )
        ).alias("e")
    ).select("e.u", "e.v")
    und = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = F.expr(f"{_SSSP_SCALE} div cnt").alias("w")
    # persist, not localCheckpoint (r15, verdict ask #1): the cached
    # weighted edge frame KEEPS HashPartitioning(src) under AQE, so
    # every relax round joins it with NO exchange — see
    # item_cooccurrence_pagerank / the plan-shape pin; cache cleared
    # between runs by the sim/bench harnesses.
    wed = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"), w)
        .unionByName(
            und.select(F.col("v").alias("src"), F.col("u").alias("dst"), w)
        )
        .repartition("src")
        .persist()
    )
    nodes = wed.select(F.col("src").alias("x")).distinct()
    seeds = nodes.orderBy("x").limit(_SSSP_SEEDS)
    dist = seeds.select(
        F.col("x").alias("seed"),
        F.col("x").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = dist.join(wed, dist["node"] == wed["src"]).select(
            "seed",
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = _ck(
            dist.unionByName(relaxed)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select(
        "seed", "node", F.col("dist").alias("dist_units")
    ).orderBy("seed", "node")


# --- incremental aggregate maintenance (IVM) -------------------------
# Materialized-view incremental maintenance: refresh a monthly
# revenue aggregate from a CDC delta batch (inserts + retractions)
# WITHOUT rescanning history — the multiset-algebra form (each delta
# row carries a +1/-1 multiplicity; counts and sums are linear, so
# the refreshed view is base + delta-aggregate, groups dropping to
# zero count removed). Cents are exact integers (o_totalprice has 2
# decimals; the DECIMAL cast makes each row's cents integral), so
# partial aggregation is exactly additive and the merged view is
# bit-identical to a full recompute — which the test pins.

_IVM_CUTOFF = "2000-01-01"
_IVM_DELKEY = 97  # old orders with key % 97 == 0 arrive as deletes

_IVM_MONTH = "printf('%04d-%02d', year(o_orderdate), month(o_orderdate))"

_IVM_SQL = f"""
    WITH base AS (
      SELECT {_IVM_MONTH} AS month,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
                        * 100, 0) AS BIGINT) AS revenue_cents
      FROM orders
      WHERE o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
      GROUP BY 1
    ),
    delta AS (
      SELECT month,
             CAST(SUM(mult) AS BIGINT) AS dn,
             CAST(ROUND(SUM(mult * cents), 0) AS BIGINT) AS dcents
      FROM (
        SELECT {_IVM_MONTH} AS month, 1 AS mult,
               CAST(o_totalprice AS DECIMAL(28,10)) * 100 AS cents
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_IVM_CUTOFF}'
        UNION ALL
        SELECT {_IVM_MONTH}, -1,
               CAST(o_totalprice AS DECIMAL(28,10)) * 100
        FROM orders
        WHERE o_orderdate < TIMESTAMP '{_IVM_CUTOFF}'
          AND o_orderkey % {_IVM_DELKEY} = 0
      ) GROUP BY month
    )
    SELECT COALESCE(b.month, d.month) AS month,
           CAST(COALESCE(b.n_orders, 0) + COALESCE(d.dn, 0) AS BIGINT)
             AS n_orders,
           CAST(COALESCE(b.revenue_cents, 0) + COALESCE(d.dcents, 0)
                AS BIGINT) AS revenue_cents
    FROM base b FULL OUTER JOIN delta d ON d.month = b.month
    WHERE COALESCE(b.n_orders, 0) + COALESCE(d.dn, 0) > 0
    ORDER BY month
"""


@register(
    "incremental_agg_maintenance",
    _IVM_SQL,
    doc="Incremental materialized-view maintenance: monthly revenue "
    "aggregate refreshed from a CDC delta (post-cutoff inserts + "
    f"key%{_IVM_DELKEY} retractions of history) via +1/-1 "
    "multiplicities — counts and exact-cent sums are linear, so "
    "refresh = base + delta-aggregate with zero-count groups "
    "dropped, never a history rescan; bit-equality with the full "
    "recompute is test-pinned (extension; the IVM pattern beside "
    "snapshot_diff_cdc and sink_scd2_history).",
)
def incremental_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(month, n_orders, revenue_cents) — the refreshed monthly view.

    Scale shape: in production the base arm READS the materialized
    aggregate (group-grain, tiny) instead of re-aggregating history
    as the fixture must; refresh cost is then delta-batch scan +
    a join at GROUP grain — independent of history size, which is
    the entire point of IVM. Both arms partial-aggregate map-side;
    the merge is a full-outer join keyed on the group, group-count
    sized. All revenue arithmetic is exact integer cents, so
    base-plus-delta is bit-identical to recompute (no float
    re-association anywhere).
    """
    o = load(spark, sf_dir, "orders")
    cut = F.lit(_IVM_CUTOFF).cast("timestamp")
    ym = [F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")]
    month = F.format_string("%04d-%02d", "y", "m").alias("month")
    cents = F.col("o_totalprice").cast("decimal(28,10)") * 100
    base = (
        o.where(F.col("o_orderdate") < cut)
        .groupBy(*ym)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum(cents), 0).cast("long").alias("revenue_cents"),
        )
        .select(month, "n_orders", "revenue_cents")
    )
    ins = o.where(F.col("o_orderdate") >= cut).select(
        *ym, F.lit(1).alias("mult"), cents.alias("cents")
    )
    dels = o.where(
        (F.col("o_orderdate") < cut)
        & (F.col("o_orderkey") % _IVM_DELKEY == 0)
    ).select(*ym, F.lit(-1).alias("mult"), cents.alias("cents"))
    delta = (
        ins.unionByName(dels)
        .groupBy("y", "m")
        .agg(
            F.sum("mult").cast("long").alias("dn"),
            F.round(F.sum(F.col("mult") * F.col("cents")), 0)
            .cast("long")
            .alias("dcents"),
        )
        .select(month, "dn", "dcents")
    )
    merged = base.join(delta, "month", "full_outer").select(
        "month",
        (F.coalesce("n_orders", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("long")
        .alias("n_orders"),
        (
            F.coalesce("revenue_cents", F.lit(0))
            + F.coalesce("dcents", F.lit(0))
        )
        .cast("long")
        .alias("revenue_cents"),
    )
    return merged.where(F.col("n_orders") > 0).orderBy("month")


# --- MAD outlier flags (robust point anomalies) ----------------------
# The robust point-anomaly companion to cusum_changepoints (drift):
# per nation, flag months whose revenue deviates from the series
# MEDIAN by more than 3 median-absolute-deviations — the
# median/MAD rule that, unlike mean/stddev z-scores, does not let the
# outliers inflate their own threshold. Medians are exact
# interpolated percentiles (the doc_length_quantiles idiom:
# F.percentile <-> quantile_cont); every input is integer cents far
# below 2^52, so the midpoints (x.5) and all comparisons are exact
# IEEE arithmetic on both engines.

_MAD_K = 3

_MAD_SQL = f"""
    WITH m AS (
      SELECT n.n_name AS n_name,
             year(o.o_orderdate) AS y, month(o.o_orderdate) AS mo,
             CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,10)))
                        * 100, 0) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2, 3
    ),
    med AS (
      SELECT n_name, quantile_cont(CAST(cents AS DOUBLE), 0.5) AS med
      FROM m GROUP BY n_name
    ),
    dev AS (
      SELECT m.n_name, m.y, m.mo, m.cents, med.med,
             ABS(CAST(m.cents AS DOUBLE) - med.med) AS adev
      FROM m JOIN med ON med.n_name = m.n_name
    ),
    mad AS (
      SELECT n_name, quantile_cont(adev, 0.5) AS mad FROM dev
      GROUP BY n_name
    )
    SELECT d.n_name AS n_name, printf('%04d-%02d', d.y, d.mo) AS month,
           d.cents AS revenue_cents,
           ROUND(d.med, 2) AS median_cents,
           ROUND(mad.mad, 2) AS mad_cents,
           d.adev > {_MAD_K} * mad.mad AS is_outlier
    FROM dev d JOIN mad ON mad.n_name = d.n_name
    ORDER BY d.n_name, month
"""


@register(
    "mad_outlier_flags",
    _MAD_SQL,
    doc=f"Robust point-anomaly detection: per-nation monthly revenue "
    f"flagged where |x - median| > {_MAD_K} * MAD (median absolute "
    "deviation) — the outlier-resistant QC rule beside "
    "cusum_changepoints' drift statistic; exact interpolated "
    "medians over integer cents, bit-deterministic (extension).",
)
def mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, month, revenue_cents, median_cents, mad_cents,
    is_outlier) per nation-month.

    Scale shape: the star rollup is the only data-bound stage; both
    percentile passes run at METRIC grain (one value per key-month),
    partitioned by nation — the exact interpolated form is the
    oracle-checkable contract, and the 100 TB swap is
    approx_percentile over the same metric frame (still
    metric-grain). Integer cents keep every midpoint and threshold
    comparison exact in IEEE doubles (values << 2^52).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,10)")) * 100, 0
            )
            .cast("long")
            .alias("cents")
        )
    )
    med = m.groupBy("n_name").agg(
        F.percentile(F.col("cents").cast("double"), 0.5).alias("med")
    )
    dev = m.join(med, "n_name").withColumn(
        "adev", F.abs(F.col("cents").cast("double") - F.col("med"))
    )
    mad = dev.groupBy("n_name").agg(
        F.percentile("adev", 0.5).alias("mad")
    )
    return (
        dev.join(mad, "n_name")
        .select(
            "n_name",
            F.format_string("%04d-%02d", "y", "mo").alias("month"),
            F.col("cents").alias("revenue_cents"),
            # scale 2 is EXACT here (magnitude-audit WATCH retire):
            # medians of integer cents are .0/.5, their deviations'
            # medians .0/.25/.5/.75 — all exactly binary-representable,
            # so ROUND(·, 2) == ROUND(·, 6) == identity while the
            # audited significand budget gains 10^4.
            F.round("med", 2).alias("median_cents"),
            F.round("mad", 2).alias("mad_cents"),
            (F.col("adev") > _MAD_K * F.col("mad")).alias("is_outlier"),
        )
        .orderBy("n_name", "month")
    )


# --- HyperLogLog distinct-count sketch -------------------------------
# The register-based cardinality sketch (Flajolet et al. 2007) next to
# the bottom-k KMV family already registered (distinct_kmv_orders,
# kmv_set_overlap): m = 2^b registers each keep the max leading-zero
# rank rho of the hashes routed to them, and the harmonic mean of
# 2^-register estimates the cardinality. The reason production
# engines (Redis PFCOUNT, BigQuery APPROX_COUNT_DISTINCT, DataSketches
# HLL) prefer it to KMV at 100 TB: the sketch state is a FIXED m-byte
# register array per group — no distinct pass, no bottom-k sort, just
# a (group, bucket) MAX aggregate that combines map-side.
#
# Portability contract: the 60-bit md5 hash splits into bucket =
# h % 64 and a 54-bit remainder w; rho = 55 - bitlength(w) via
# length(bin(w)) (both engines print minimal-length binary); the
# harmonic sum is kept EXACT as an integer, sum_j 2^(55 - r_j)
# <= 64 * 2^55 < 2^62, so the only float op is one final division by
# the same exact integer on both engines.

_HLL_SEED = 23
_HLL_M = 64  # registers (b = 6 bucket bits)
_HLL_WBITS = 54  # 60-bit hash minus 6 bucket bits
# alpha_64 from the HLL paper; the full constant alpha * m^2 * 2^55
# is computed ONCE here and embedded verbatim in both engines.
_HLL_ALPHA = 0.709
_HLL_C = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_WBITS + 1))
_HLL_LC_CUT = 2.5 * _HLL_M  # small-range (linear counting) threshold

# rho of the 54-bit remainder column {w}: position of the leftmost
# 1-bit in the 54-bit budget (w = 0 -> 55, the all-zeros sentinel).
_HLL_RHO = (
    f"(CASE WHEN {{w}} = 0 THEN {_HLL_WBITS + 1} "
    f"ELSE {_HLL_WBITS + 1} - length(bin({{w}})) END)"
)
# exact integer harmonic-sum term for a register value column {r}
_HLL_TERM = f"(CAST(1 AS BIGINT) << ({_HLL_WBITS + 1} - {{r}}))"
# estimate from the exact scaled harmonic sum {z} and empty-register
# count {v}: raw = C / z, with the paper's linear-counting fallback
# m * ln(m / V) when registers are still empty and the raw estimate
# is in the small range.
_HLL_EST = (
    f"(CASE WHEN {{v}} > 0 AND ({_HLL_C!r} / CAST({{z}} AS DOUBLE))"
    f" <= {_HLL_LC_CUT!r} "
    f"THEN {_HLL_M} * ln({_HLL_M} / CAST({{v}} AS DOUBLE)) "
    f"ELSE {_HLL_C!r} / CAST({{z}} AS DOUBLE) END)"
)

_HLL_SQL = f"""
    WITH h AS (
      SELECT l_returnflag AS flag,
             l_orderkey,
             CAST('0x' || substr(md5('{_HLL_SEED}:' ||
                  CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      FROM lineitem
    ),
    reg AS (
      SELECT flag, hv % {_HLL_M} AS bucket,
             MAX({_HLL_RHO.format(w=f'(hv >> 6)')}) AS r
      FROM h GROUP BY 1, 2
    ),
    z AS (
      SELECT flag,
             CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v_empty,
             CAST(SUM({_HLL_TERM.format(r='r')})
               + ({_HLL_M} - COUNT(*))
                 * (CAST(1 AS BIGINT) << {_HLL_WBITS + 1}) AS BIGINT)
               AS z_scaled
      FROM reg GROUP BY flag
    ),
    ex AS (
      SELECT flag, COUNT(DISTINCT l_orderkey) AS n_exact FROM h
      GROUP BY flag
    )
    SELECT ex.flag AS l_returnflag, ex.n_exact, z.v_empty, z.z_scaled,
           ROUND({_HLL_EST.format(v='z.v_empty', z='z.z_scaled')}, 4)
             AS n_est,
           ROUND(ABS(ROUND({_HLL_EST.format(v='z.v_empty',
                                            z='z.z_scaled')}, 4)
                     - ex.n_exact) / ex.n_exact, 6) AS rel_err
    FROM ex JOIN z ON z.flag = ex.flag
    ORDER BY ex.flag
"""


@register(
    "hll_distinct_flags",
    _HLL_SQL,
    doc=f"HyperLogLog cardinality sketch: {_HLL_M} leading-zero-rank "
    "registers per return flag estimate the distinct order count "
    "(exact companion + relative error) — the fixed-size register "
    "sketch next to the KMV bottom-k family, with the harmonic sum "
    "kept as an exact integer so both engines divide the same number "
    "(Flajolet et al. 2007; extension).",
)
def hll_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, n_exact, v_empty, z_scaled, n_est, rel_err).

    Scale shape: the hash, bucket split, and rho rank are row-local
    expressions; the ONLY data-bound aggregate is the (flag, bucket)
    MAX — map-side combinable into at most flags x 64 cells per
    input partition, which is the whole HLL selling point at 100 TB:
    per-executor partial register arrays merge by elementwise MAX in
    O(m), no distinct shuffle, no bottom-k sort (contrast
    distinct_kmv_orders, whose sketch is k sorted survivors). The
    exact COUNT(DISTINCT) arm is the test companion only and
    disappears in production. The harmonic sum is the exact integer
    sum_j 2^(55 - r_j) (<= 2^62), so the estimate is one IEEE
    division of identical integers on both engines; the
    linear-counting fallback branch is dead at any tested SF (all 64
    registers fill) but kept for faithfulness to the paper.
    """
    li = load(spark, sf_dir, "lineitem")
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{_HLL_SEED}:"),
                    F.col("l_orderkey").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    h = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_orderkey"),
        hv.alias("hv"),
    )
    reg = (
        h.select(
            "flag",
            (F.col("hv") % _HLL_M).alias("bucket"),
            F.expr(_HLL_RHO.format(w="(hv >> 6)")).alias("rho"),
        )
        .groupBy("flag", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    z = reg.groupBy("flag").agg(
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("bigint").alias("v_empty"),
        (
            F.sum(F.expr(_HLL_TERM.format(r="r")))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << (_HLL_WBITS + 1))
        ).alias("z_scaled"),
    )
    ex = h.groupBy("flag").agg(
        F.countDistinct("l_orderkey").alias("n_exact")
    )
    est = F.expr(_HLL_EST.format(v="v_empty", z="z_scaled"))
    return (
        ex.join(z, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            "n_exact",
            "v_empty",
            "z_scaled",
            F.round(est, 4).alias("n_est"),
            F.round(
                F.abs(F.round(est, 4) - F.col("n_exact"))
                / F.col("n_exact"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


# --- differentially private count release ----------------------------
# The geometric mechanism (Ghosh, Roughgarden & Sundararajan 2009):
# release count statistics of a corpus with two-sided geometric noise
# Z = G1 - G2, where G1, G2 are iid Geometric(1/2) — the discrete
# Laplace with alpha = 1/2, i.e. epsilon = ln 2 per count under
# add/remove-one-row sensitivity 1. The sampler is EXACT and integer-
# only: the trailing-zero count of a uniform bit string is
# Geometric(1/2) by definition, so no float inverse-CDF crosses the
# engines. Noise here is derived from a hash of the group key so the
# release is test-reproducible; a production release swaps the hash
# input for a secret per-release seed (the mechanism is unchanged —
# determinism is a test harness property, not a mechanism property).

_DP_SEED_A = 31
_DP_SEED_B = 37

# trailing-zero count of a positive 60-bit hash column {h}:
# isolate the lowest set bit with h & -h, then its bit position is
# bitlength - 1. h = 0 (probability 2^-60) caps at 60.
_DP_TZ = "(CASE WHEN {h} = 0 THEN 60 ELSE length(bin({h} & (-{h}))) - 1 END)"


def _dp_hash_duck(seed: int, key: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{seed}:' || {key}), 1, 15) AS BIGINT)"
    )


_DP_KEY = "(l_returnflag || '|' || l_linestatus)"

_DP_SQL = f"""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             COUNT(*) AS n_true,
             {_DP_TZ.format(h=_dp_hash_duck(_DP_SEED_A, _DP_KEY))}
               - {_DP_TZ.format(h=_dp_hash_duck(_DP_SEED_B, _DP_KEY))}
               AS noise
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, n_true, CAST(noise AS BIGINT) AS noise,
           GREATEST(CAST(0 AS BIGINT), n_true + noise) AS n_released
    FROM c
    ORDER BY l_returnflag, l_linestatus
"""


@register(
    "dp_noisy_counts",
    _DP_SQL,
    doc="Deterministic SIMULATION of the geometric-mechanism DP count "
    "release, for engine-parity benchmarking only: per (returnflag, "
    "linestatus) row counts plus two-sided geometric noise "
    "(difference of two trailing-zero-bit Geometric(1/2) draws — the "
    "discrete Laplace at epsilon = ln 2 shape, Ghosh et al. 2009), "
    "clamped at zero — integer-exact end to end, no float inverse "
    "CDF. NOT a private release: the noise is a deterministic md5 "
    "function of the group key (recomputable by anyone) and n_true "
    "is emitted alongside; a real DP release needs fresh secret "
    "randomness and must not publish the true counts (extension).",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, l_linestatus, n_true, noise, n_released).

    PRIVACY CAVEAT: this deterministically SIMULATES the geometric
    mechanism so two engines can hash-compare the exact released
    values — the "noise" is a public function of the group key and
    ``n_true`` is part of the output, so the mechanism provides NO
    privacy guarantee. Do not copy this pattern for an actual DP
    release (that requires fresh secret randomness per release and
    withholding the true counts); what it demonstrates is the SHAPE
    of the operator — where the noise is applied and what it costs
    at scale.

    Scale shape: the count is a map-side-combinable groupBy over the
    fact table; the noise draw is a row-local expression evaluated on
    the TINY aggregate output (one row per group), so the mechanism
    adds zero data-bound work at 100 TB. The trailing-zero sampler is
    exact integer bit arithmetic (h & -h isolates the lowest set
    bit; bin() prints minimal-length binary in both engines), so the
    released values are bit-identical across engines — no float
    noise, no rounding boundary. Clamping at zero is standard DP
    post-processing (does not affect the privacy guarantee).
    """
    li = load(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_true")
    )

    def _h(seed: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:"),
                        F.col("l_returnflag"),
                        F.lit("|"),
                        F.col("l_linestatus"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")

    noisy = grouped.withColumn("h_a", _h(_DP_SEED_A)).withColumn(
        "h_b", _h(_DP_SEED_B)
    )
    noise = F.expr(_DP_TZ.format(h="h_a")) - F.expr(_DP_TZ.format(h="h_b"))
    return (
        noisy.withColumn("noise", noise.cast("bigint"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_true",
            "noise",
            F.greatest(
                F.lit(0).cast("bigint"), F.col("n_true") + F.col("noise")
            ).alias("n_released"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- association rules (market-basket, 2-itemsets) -------------------
# The classic Apriori 2-itemset rule mining (Agrawal & Srikant 1994)
# over order baskets: for every frequent item pair {a, b}, emit both
# directed rules a->b and b->a with support, confidence and lift.
# Confidence and lift are emitted as INTEGER parts-per-million
# (truncating division) so no float ratio ever crosses the engines.
# Pair-support floor 2 plus Apriori monotonicity (a pair can only be
# frequent if both items are) is what bounds the quadratic stage at
# 100 TB: items below the floor are pruned BEFORE the basket
# self-join, and the self-join runs per-basket (baskets are small by
# construction; a runaway basket would be capped by a basket-size
# guard in production, the documented recall trade).

_AR_MINSUP = 2  # minimum pair support (baskets containing both)
_AR_TOP = 100  # emitted head, ordered by lift

_AR_SQL = f"""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM b),
    it AS (SELECT l_partkey, COUNT(*) AS supp FROM b GROUP BY 1),
    pr AS (
      SELECT a.l_partkey AS x, c.l_partkey AS y, COUNT(*) AS supp_pair
      FROM b a JOIN b c ON c.l_orderkey = a.l_orderkey
      WHERE a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_AR_MINSUP}
    ),
    rules AS (
      SELECT x AS antecedent, y AS consequent, supp_pair FROM pr
      UNION ALL
      SELECT y AS antecedent, x AS consequent, supp_pair FROM pr
    )
    SELECT r.antecedent, r.consequent, r.supp_pair,
           ia.supp AS supp_ante, ic.supp AS supp_cons,
           CAST(r.supp_pair * 1000000 // ia.supp AS BIGINT) AS conf_ppm,
           CAST(r.supp_pair * n.n_baskets * 1000000
                // (ia.supp * ic.supp) AS BIGINT) AS lift_ppm
    FROM rules r
    JOIN it ia ON ia.l_partkey = r.antecedent
    JOIN it ic ON ic.l_partkey = r.consequent
    CROSS JOIN n
    ORDER BY lift_ppm DESC, r.antecedent, r.consequent
    LIMIT {_AR_TOP}
"""


@register(
    "association_rules_2item",
    _AR_SQL,
    doc=f"Apriori 2-itemset association rules over order baskets: "
    f"directed rules with support >= {_AR_MINSUP}, confidence and "
    f"lift as integer ppm (truncating division — no float ratio "
    f"crosses engines), top {_AR_TOP} by lift — market-basket "
    "analysis with the item-level Apriori prune ahead of the "
    "quadratic stage (Agrawal & Srikant 1994; extension).",
)
def association_rules_2item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(antecedent, consequent, supp_pair, supp_ante, supp_cons,
    conf_ppm, lift_ppm), top rules by lift.

    Scale shape: one distinct pass collapses lineitem to basket
    grain; item supports are a map-combinable groupBy. The Apriori
    prune (items with supp < minsup cannot appear in a frequent
    pair) runs as a semi-join BEFORE the basket self-join, so the
    quadratic pair stage only sees frequent items — the result is
    provably identical (support monotonicity) but the candidate
    volume at 100 TB drops by the infrequent-item mass. The pair
    join is keyed on the basket id (no cross join); supports join
    back at item-dictionary grain (broadcastable). Confidence and
    lift are truncating integer ppm; the only scalar (basket count)
    rides a 1-row broadcast. lift_ppm's intermediate supp_pair *
    n_baskets * 1e6 stays under 2^63 whenever supp_pair * n_baskets
    < 9.2e12 — true by orders of magnitude here; an extreme-scale
    release computes the ratio in DOUBLE from the same exact
    integers (documented trade).
    """
    # The basket frame feeds four consumers and the pair frame feeds
    # both rule directions; the printed plan shows duplicated
    # subtrees, but Spark's ReusedExchange unifies them at runtime
    # (canonically identical exchanges), so NO localCheckpoint:
    # measured at 10x data, the checkpointed variant is SLOWER
    # (10.1s vs 7.4s) because materializing the basket/pair frames
    # costs more than the reuse it duplicates.
    b = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    it = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp"))
    freq = it.where(F.col("supp") >= _AR_MINSUP).select("l_partkey")
    bf = b.join(freq, "l_partkey", "left_semi")
    a, c = bf.alias("a"), bf.alias("c")
    pr = (
        a.join(c, F.col("a.l_orderkey") == F.col("c.l_orderkey"))
        .where(F.col("a.l_partkey") < F.col("c.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("c.l_partkey").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("supp_pair"))
        .where(F.col("supp_pair") >= _AR_MINSUP)
    )
    rules = pr.select(
        F.col("x").alias("antecedent"),
        F.col("y").alias("consequent"),
        "supp_pair",
    ).unionAll(
        pr.select(
            F.col("y").alias("antecedent"),
            F.col("x").alias("consequent"),
            "supp_pair",
        )
    )
    n = b.agg(
        F.countDistinct("l_orderkey").alias("n_baskets")
    )
    ia = it.select(
        F.col("l_partkey").alias("antecedent"),
        F.col("supp").alias("supp_ante"),
    )
    ic = it.select(
        F.col("l_partkey").alias("consequent"),
        F.col("supp").alias("supp_cons"),
    )
    out = (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "supp_pair",
            "supp_ante",
            "supp_cons",
            F.expr("CAST(supp_pair * 1000000 DIV supp_ante AS BIGINT)")
            .alias("conf_ppm"),
            F.expr(
                "CAST(supp_pair * n_baskets * 1000000"
                " DIV (supp_ante * supp_cons) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(
            F.col("lift_ppm").desc(), "antecedent", "consequent"
        )
        .limit(_AR_TOP)
    )
    return out


# --- join-size (F2) estimation via count-min sketch ------------------
# The optimizer statistic behind shuffle-join planning: the size of a
# self-equijoin on a key equals the second frequency moment F2 =
# sum_k cnt(k)^2, and a count-min sketch estimates it WITHOUT holding
# per-key state — est_d = sum_j c_d[j]^2 per depth row d, and the
# minimum over depths is the classic CMS inner-product upper bound
# (Cormode & Muthukrishnan 2005, join-size queries; Alon, Matias &
# Szegedy 1996 for F2). Everything is integer: counters, squares,
# the min, and the error in ppm — no float crosses the engines. The
# sketch answers "how big is this join / how skewed is this key"
# BEFORE paying for the join, which at 100 TB is the difference
# between planning a salted join and discovering the skew in a dead
# executor.

_F2_W = 512  # CMS width (buckets per depth row)
_F2_SEEDS = (41, 43, 47, 53, 59)  # one md5 seed per depth row


def _f2_sql(idiv: str) -> str:
    per_depth = "\n      UNION ALL\n".join(
        f"""      SELECT {s} AS seed,
             CAST('0x' || substr(md5('{s}:' ||
                  CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT)
               % {_F2_W} AS bucket
      FROM lineitem"""
        for s in _F2_SEEDS
    )
    return f"""
    WITH keyed AS (
      SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1
    ),
    exact AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c * c) AS BIGINT) AS f2_exact,
             CAST(MAX(c) AS BIGINT) AS max_cnt
      FROM keyed
    ),
    maxkey AS (
      SELECT MIN(l_partkey) AS max_key FROM keyed, exact
      WHERE c = max_cnt
    ),
    h AS (
{per_depth}
    ),
    cells AS (
      SELECT seed, bucket, COUNT(*) AS c FROM h GROUP BY 1, 2
    ),
    depths AS (
      SELECT seed, CAST(SUM(c * c) AS BIGINT) AS f2_est_depth
      FROM cells GROUP BY seed
    ),
    best AS (
      SELECT CAST(MIN(f2_est_depth) AS BIGINT) AS f2_est FROM depths
    )
    SELECT d.seed, d.f2_est_depth, b.f2_est, e.f2_exact,
           CAST((b.f2_est - e.f2_exact) * 1000000 {idiv} e.f2_exact
                AS BIGINT) AS err_ppm,
           e.n_rows, e.n_keys, e.max_cnt, m.max_key
    FROM depths d, best b, exact e, maxkey m
    ORDER BY d.seed
"""


@register(
    "join_size_cms_estimate",
    _f2_sql("//"),
    doc=f"Join-size (F2) estimation: the self-equijoin size on "
    f"l_partkey, exact (sum of squared key counts) vs a {_F2_W}-wide "
    f"x {len(_F2_SEEDS)}-deep count-min sketch's min-over-depths "
    "inner-product bound, plus the skew witness (heaviest key) — "
    "the integer-exact optimizer statistic that prices a shuffle "
    "join before running it (Alon et al. 1996; Cormode & "
    "Muthukrishnan 2005; extension).",
)
def join_size_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seed, f2_est_depth, f2_est, f2_exact, err_ppm, n_rows,
    n_keys, max_cnt, max_key) — one row per sketch depth.

    Scale shape: the sketch arm explodes each row into
    {len(_F2_SEEDS)} (seed, bucket) cells — row-local — and
    immediately collapses into the (seed, bucket) groupBy, whose
    aggregation state is a FIXED {len(_F2_SEEDS)}x{_F2_W} grid per
    input partition (map-side combine); nothing key-dictionary-sized
    ever shuffles in that arm. The exact arm (the test companion a
    production run drops) is one map-combinable key groupBy; the
    heaviest-key witness re-reads that dictionary-grain frame with a
    1-row broadcast of max_cnt, min-key tiebreak. All downstream
    frames are <= depth-count rows joined by 1-row broadcasts. CMS
    squares stay under 2^63 while total rows < 3e9 per group of
    interest; beyond that, production shards the sketch per
    partition-range and sums the per-shard estimates (mergeability),
    which this plan's per-partition partials already are.
    """
    li = load(spark, sf_dir, "lineitem")
    keyed = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    exact = keyed.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"),
        F.max("c").cast("bigint").alias("max_cnt"),
    )
    maxkey = (
        keyed.crossJoin(F.broadcast(exact.select("max_cnt")))
        .where(F.col("c") == F.col("max_cnt"))
        .agg(F.min("l_partkey").alias("max_key"))
    )
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).cast("bigint").alias("seed"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"{s}:"),
                                        F.col("l_partkey").cast("string"),
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        % _F2_W
                    ).alias("bucket"),
                )
                for s in _F2_SEEDS
            ]
        )
    )
    depths = (
        li.select(cells.alias("cell"))
        .select("cell.seed", "cell.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("seed")
        .agg(
            F.sum(F.col("c") * F.col("c"))
            .cast("bigint")
            .alias("f2_est_depth")
        )
    )
    best = depths.agg(
        F.min("f2_est_depth").cast("bigint").alias("f2_est")
    )
    return (
        depths.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(maxkey))
        .select(
            "seed",
            "f2_est_depth",
            "f2_est",
            "f2_exact",
            F.expr(
                "CAST((f2_est - f2_exact) * 1000000 DIV f2_exact"
                " AS BIGINT)"
            ).alias("err_ppm"),
            "n_rows",
            "n_keys",
            "max_cnt",
            "max_key",
        )
        .orderBy("seed")
    )


# --- weighted systematic (PPS) sampling ------------------------------
# Probability-proportional-to-size sampling without floats: lay the
# documents' weights end to end on an integer line of total length W,
# cut it into K equal strata, and keep every document whose weight
# interval crosses a stratum boundary (Madow 1949's systematic
# selection). Selection and stratum id are pure integer arithmetic —
# (cum * K) // W — so both engines pick the identical sample, unlike
# the u^(1/w) exponential-race samplers whose pow/log boundaries can
# flip across libm implementations. This is the deterministic
# counterpart to the hash-gated stratified/temperature samplers
# already registered (stratified_sample_documents,
# temperature_mix_sources).

_SYS_K = 100  # strata (expected sample size)
_SYS_BLOCK = 256  # doc_id block width for the hierarchical prefix sum

_SYS_SQL = f"""
    WITH d AS (
      SELECT doc_id, n_chars AS weight FROM documents
    ),
    t AS (SELECT CAST(SUM(weight) AS BIGINT) AS w_total FROM d),
    c AS (
      SELECT doc_id, weight,
             CAST(SUM(weight) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_incl
      FROM d
    )
    SELECT c.doc_id, c.weight,
           CAST(c.cum_incl - c.weight AS BIGINT) AS cum_before,
           CAST((c.cum_incl - c.weight) * {_SYS_K} // t.w_total
                AS BIGINT) AS stratum
    FROM c, t
    WHERE (c.cum_incl * {_SYS_K}) // t.w_total
          > ((c.cum_incl - c.weight) * {_SYS_K}) // t.w_total
    ORDER BY c.doc_id
"""


@register(
    "systematic_weighted_sample",
    _SYS_SQL,
    doc=f"Weighted systematic (PPS) sampling: documents whose "
    f"char-weight interval crosses one of {_SYS_K} equal cuts of the "
    "total-weight line are selected — probability proportional to "
    "size in pure integer arithmetic (no pow/log sampler boundary "
    "can diverge across engines), via a hierarchical two-level "
    "prefix sum (Madow 1949; extension).",
)
def systematic_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, weight, cum_before, stratum) for selected documents.

    Scale shape: the prefix sum is HIERARCHICAL — per-block
    (doc_id DIV {_SYS_BLOCK}) partial sums first (map-combinable,
    block-grain frame is rows/{_SYS_BLOCK}), block offsets via an
    exclusive window over that small frame, then a within-block
    cumulative window whose sort partitions are bounded by the block
    width — no unpartitioned window ever sees the full document set
    (same pattern as skyline_pareto_parts' hierarchical prefix-min;
    at extreme scale the block frame itself gets a second level).
    The total weight rides a 1-row broadcast; selection is a
    truncating-integer-division comparison, bit-identical across
    engines. cum * K stays below 2^63 while total corpus chars <
    9.2e16 (a ~92 PB text corpus) — beyond that, widen to per-shard
    lines.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("weight")
    )
    blk = (F.col("doc_id") / _SYS_BLOCK).cast("bigint").alias("blk")
    bs = (
        d.select(blk, "weight")
        .groupBy("blk")
        .agg(F.sum("weight").alias("bw"))
    )
    w_off = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = bs.select(
        "blk", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("off")
    )
    w_in = (
        Window.partitionBy("blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        d.select("doc_id", "weight", blk)
        .join(F.broadcast(offs), "blk")
        .withColumn(
            "cum_incl",
            (F.col("off") + F.sum("weight").over(w_in)).cast("bigint"),
        )
    )
    t = d.agg(F.sum("weight").cast("bigint").alias("w_total"))
    sel = (
        cum.crossJoin(F.broadcast(t))
        .where(
            F.expr(f"(cum_incl * {_SYS_K}) DIV w_total")
            > F.expr(f"((cum_incl - weight) * {_SYS_K}) DIV w_total")
        )
        .select(
            "doc_id",
            "weight",
            (F.col("cum_incl") - F.col("weight"))
            .cast("bigint")
            .alias("cum_before"),
            F.expr(
                f"CAST(((cum_incl - weight) * {_SYS_K}) DIV w_total"
                " AS BIGINT)"
            ).alias("stratum"),
        )
        .orderBy("doc_id")
    )
    return sel


# --- equi-width histogram quantile sketch ----------------------------
# The mergeable quantile sketch in its simplest production form: a
# fixed-bin equi-width histogram (the same family as ANALYZE TABLE
# column histograms) whose per-bin counts combine by addition across
# partitions, read out as approximate percentiles (first bin whose
# cumulative count reaches the ceil-rank target). The approximate
# answer is the bin's integer lower edge — bit-exact across engines —
# and the exact interpolated percentile rides alongside as the test
# companion via the established F.percentile <-> quantile_cont idiom
# (integer cents keep it IEEE-identical).

_HQ_BINS = 64
_HQ_PCTS = (50, 90, 99)
_HQ_CENTS = (
    "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * 100, 0)"
    " AS BIGINT)"
)


def _hq_sql(idiv: str) -> str:
    pcts = ", ".join(f"({p})" for p in _HQ_PCTS)
    return f"""
    WITH c AS (
      SELECT l_returnflag AS flag, {_HQ_CENTS} AS cents FROM lineitem
    ),
    mm AS (
      SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c
    ),
    b AS (
      SELECT flag,
             (cents - lo) * {_HQ_BINS} {idiv} (hi - lo + 1) AS bin
      FROM c, mm
    ),
    hist AS (
      SELECT flag, bin, COUNT(*) AS n FROM b GROUP BY 1, 2
    ),
    cum AS (
      SELECT flag, bin, n,
             SUM(n) OVER (PARTITION BY flag ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumn,
             SUM(n) OVER (PARTITION BY flag) AS tot
      FROM hist
    ),
    vdict AS (
      SELECT flag, cents, COUNT(*) AS cnt FROM c GROUP BY 1, 2
    ),
    cumd AS (
      SELECT flag, cents,
             SUM(cnt) OVER (PARTITION BY flag ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(cnt) OVER (PARTITION BY flag) AS n
      FROM vdict
    ),
    p AS (SELECT * FROM (VALUES {pcts}) AS v(pct)),
    hit AS (
      SELECT cum.flag, p.pct, cum.tot AS n_rows,
             MIN(cum.bin) AS qbin
      FROM cum JOIN p
        ON cum.cumn >= (cum.tot * p.pct + 99) {idiv} 100
      GROUP BY 1, 2, 3
    )
    SELECT h.flag AS l_returnflag, CAST(h.pct AS BIGINT) AS pct,
           CAST(h.n_rows AS BIGINT) AS n_rows,
           CAST(mm.lo + h.qbin * (mm.hi - mm.lo + 1) {idiv} {_HQ_BINS}
                AS BIGINT) AS approx_lo_cents,
           ROUND(ex.exact_cents, 6) AS exact_cents
    FROM hit h
    CROSS JOIN mm
    JOIN (
      SELECT lo.flag, lo.pct,
             lo.v_lo + (lo.frac / 100.0) * (hiv.v_hi - lo.v_lo)
               AS exact_cents
      FROM (
        SELECT d.flag, p.pct, MIN(d.cents) AS v_lo,
               ((d.n - 1) * p.pct) % 100 AS frac
        FROM cumd d JOIN p
          ON d.cum >= ((d.n - 1) * p.pct) {idiv} 100 + 1
        GROUP BY 1, 2, 4
      ) lo
      JOIN (
        SELECT d.flag, p.pct, MIN(d.cents) AS v_hi
        FROM cumd d JOIN p
          ON d.cum >= ((d.n - 1) * p.pct) {idiv} 100 + 2
        GROUP BY 1, 2
      ) hiv ON hiv.flag = lo.flag AND hiv.pct = lo.pct
    ) ex ON ex.flag = h.flag AND ex.pct = h.pct
    ORDER BY l_returnflag, pct
"""


@register(
    "histogram_quantile_cents",
    _hq_sql("//"),
    doc=f"Mergeable equi-width histogram quantile sketch: "
    f"{_HQ_BINS}-bin price-cents histogram per return flag, read out "
    f"at p{'/p'.join(str(p) for p in _HQ_PCTS)} as the first bin "
    "reaching the ceil-rank target (integer bin edges — bit-exact), "
    "with the exact interpolated percentile as companion — the "
    "ANALYZE-style column-stats histogram as a query (extension).",
)
def histogram_quantile_cents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(l_returnflag, pct, n_rows, approx_lo_cents, exact_cents).

    Scale shape: the histogram is the whole point — per-partition
    bin counts are a FIXED flags x {_HQ_BINS} grid that combines by
    addition (map-side combine), so the data-bound work is one scan
    plus one tiny shuffle; every window below runs on the
    {_HQ_BINS}-rows-per-flag histogram frame. The global min/max is
    a 1-row broadcast (production reads it from table stats). The
    exact interpolated arm is the test companion a production run
    drops; integer cents keep its doubles engine-identical. Readout
    uses ceil-rank (tot * p + 99) DIV 100, all truncating integer
    division.
    """
    li = load(spark, sf_dir, "lineitem")
    c = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr(_HQ_CENTS).alias("cents"),
    )
    mm = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    b = c.crossJoin(F.broadcast(mm)).select(
        "flag",
        F.expr(f"(cents - lo) * {_HQ_BINS} DIV (hi - lo + 1)").alias(
            "bin"
        ),
    )
    hist = b.groupBy("flag", "bin").agg(F.count(F.lit(1)).alias("n"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("flag")
    cum = hist.withColumn("cumn", F.sum("n").over(w_cum)).withColumn(
        "tot", F.sum("n").over(w_tot)
    )
    p = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in _HQ_PCTS])
        ).alias("pct")
    )
    hit = (
        cum.join(
            F.broadcast(p),
            F.col("cumn") >= F.expr("(tot * pct + 99) DIV 100"),
        )
        .groupBy("flag", "pct", F.col("tot").alias("n_rows"))
        .agg(F.min("bin").alias("qbin"))
    )
    # Exact interpolated percentile WITHOUT buffering values: group
    # to the (flag, cents) VALUE DICTIONARY (map-combinable; bounded
    # by the price domain, not the row count), cumulative counts over
    # that dictionary, then linear interpolation from pure-integer
    # rank components — v_lo/v_hi are the values at ranks
    # (n-1)*pct DIV 100 + 1 and + 2, frac = (n-1)*pct MOD 100.
    w_d = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumd = (
        c.groupBy("flag", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(w_d))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("flag")))
    )
    lo_arm = (
        cumd.join(
            F.broadcast(p),
            F.col("cum") >= F.expr("((n - 1) * pct) DIV 100 + 1"),
        )
        .groupBy("flag", "pct", F.expr("((n - 1) * pct) % 100").alias("frac"))
        .agg(F.min("cents").alias("v_lo"))
    )
    hi_arm = (
        cumd.join(
            F.broadcast(p),
            F.col("cum") >= F.expr("((n - 1) * pct) DIV 100 + 2"),
        )
        .groupBy("flag", "pct")
        .agg(F.min("cents").alias("v_hi"))
    )
    ex = lo_arm.join(hi_arm, ["flag", "pct"]).select(
        "flag",
        "pct",
        (
            F.col("v_lo")
            + (F.col("frac") / 100.0) * (F.col("v_hi") - F.col("v_lo"))
        ).alias("exact_cents"),
    )
    return (
        hit.crossJoin(F.broadcast(mm))
        .join(ex, ["flag", "pct"])
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("pct").cast("bigint").alias("pct"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.expr(
                f"CAST(lo + qbin * (hi - lo + 1) DIV {_HQ_BINS}"
                " AS BIGINT)"
            ).alias("approx_lo_cents"),
            F.round("exact_cents", 6).alias("exact_cents"),
        )
        .orderBy("l_returnflag", "pct")
    )


# --- Holt linear-trend smoothing (level + trend forecast) ------------
# Double exponential smoothing (Holt 1957): per series, level and
# trend evolve as l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1}) and
# b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}; the one-step-ahead
# forecast is l + b. With a = g = 0.3 the recursion runs in INTEGER
# cents — (3*x + 7*(l+b)) / 10 with truncating division, which both
# engines' integer division performs identically (verified: DuckDB
# // and Spark DIV both truncate toward zero on negatives, and the
# trend term does go negative). The fold state is the 'l:b' string
# contract bpe_train_merges established: DuckDB's list_reduce seeds
# from the list's first element, so the initial state string is
# prepended to the stringified series tail; Spark's aggregate()
# passes the same initial state explicitly.

_HOLT_MIN_MONTHS = 4


def _holt_duck_step() -> str:
    l = "CAST(string_split(acc, ':')[1] AS BIGINT)"
    b = "CAST(string_split(acc, ':')[2] AS BIGINT)"
    xv = "CAST(x AS BIGINT)"
    nl = f"((3 * {xv} + 7 * ({l} + {b})) // 10)"
    nb = f"((3 * ({nl} - {l}) + 7 * {b}) // 10)"
    return (
        f"(acc, x) -> concat(CAST({nl} AS VARCHAR), ':', "
        f"CAST({nb} AS VARCHAR))"
    )


def _holt_spark_step() -> str:
    l = "CAST(split(acc, ':')[0] AS BIGINT)"
    b = "CAST(split(acc, ':')[1] AS BIGINT)"
    nl = f"((3 * x + 7 * ({l} + {b})) DIV 10)"
    nb = f"((3 * ({nl} - {l}) + 7 * {b}) DIV 10)"
    return (
        f"(acc, x) -> concat(CAST({nl} AS STRING), ':', "
        f"CAST({nb} AS STRING))"
    )


_HOLT_SQL = f"""
    WITH monthly AS (
      SELECT l_partkey AS item_codigo,
             strftime(l_shipdate, '%Y-%m') AS periodo,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
                        * 100, 0) AS BIGINT) AS cents
      FROM lineitem
      GROUP BY 1, 2
    ),
    series AS (
      SELECT item_codigo, list(cents ORDER BY periodo) AS xs
      FROM monthly GROUP BY item_codigo
      HAVING COUNT(*) >= {_HOLT_MIN_MONTHS}
    ),
    folded AS (
      SELECT item_codigo,
             CAST(len(xs) AS BIGINT) AS n_months,
             xs[len(xs)] AS last_cents,
             list_reduce(
               list_concat(
                 [concat(CAST(xs[1] AS VARCHAR), ':0')],
                 list_transform(xs[2:], x -> CAST(x AS VARCHAR))
               ),
               {_holt_duck_step()}
             ) AS state
      FROM series
    )
    SELECT item_codigo, n_months, last_cents,
           CAST(string_split(state, ':')[1] AS BIGINT) AS level_cents,
           CAST(string_split(state, ':')[2] AS BIGINT) AS trend_cents,
           CAST(string_split(state, ':')[1] AS BIGINT)
             + CAST(string_split(state, ':')[2] AS BIGINT)
             AS forecast_cents
    FROM folded
    ORDER BY item_codigo
"""


@register(
    "holt_trend_forecast",
    _HOLT_SQL,
    doc="Holt double exponential smoothing over per-part monthly "
    "revenue: integer-cents level/trend recursion (alpha = gamma = "
    "0.3 as truncating x3/x7-div-10 arithmetic) folded over each "
    "ordered series, emitting the smoothed level, trend and "
    "one-step-ahead forecast — the trend-aware member of the "
    "time-series family beside item_price_ewma (level only), "
    "cusum_changepoints (drift) and mad_outlier_flags (outliers) "
    "(Holt 1957; extension).",
)
def holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item_codigo, n_months, last_cents, level_cents, trend_cents,
    forecast_cents) per part with >= {_HOLT_MIN_MONTHS} months.

    Scale shape: the only data-bound stage is the map-side-combinable
    (part, month) revenue aggregate; the fold runs at SERIES grain —
    one ordered array per part, built by array_sort(collect_list)
    inside a part-keyed aggregate whose input is already month-grain
    (the second exchange moves part-month rows, ~1/30th of the fact
    table — measured 1.4x at 10x data on the block-release min-of-2
    harness, the monthly-rollup arm; the earlier 3.4x carried the
    scale_bench block-pressure artifact fixed in r8).
    Series length is bounded by the calendar (84 months in
    the fixture; any real deployment is a few hundred), so per-row
    fold state is O(1) strings. The recursion is exact integer
    arithmetic with truncating division — verified identical across
    engines for the negative trend values — so no float accumulation
    drift can split the engines after 80+ steps.
    """
    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.col("l_partkey").alias("item_codigo"),
        F.date_format("l_shipdate", "yyyy-MM").alias("periodo"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(28,10)")) * 100,
            0,
        )
        .cast("bigint")
        .alias("cents")
    )
    series = (
        monthly.groupBy("item_codigo")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(periodo,"
                " cents))), s -> s.cents)"
            ).alias("xs")
        )
        .where(F.size("xs") >= _HOLT_MIN_MONTHS)
    )
    folded = series.select(
        "item_codigo",
        F.size("xs").cast("bigint").alias("n_months"),
        F.element_at("xs", -1).alias("last_cents"),
        F.expr(
            "aggregate(slice(xs, 2, size(xs) - 1),"
            " concat(CAST(xs[0] AS STRING), ':0'),"
            f" {_holt_spark_step()})"
        ).alias("state"),
    )
    lvl = F.expr("CAST(split(state, ':')[0] AS BIGINT)")
    trd = F.expr("CAST(split(state, ':')[1] AS BIGINT)")
    return folded.select(
        "item_codigo",
        "n_months",
        "last_cents",
        lvl.alias("level_cents"),
        trd.alias("trend_cents"),
        (lvl + trd).alias("forecast_cents"),
    ).orderBy("item_codigo")


# --- ANN index quality evaluation (recall@k as a query) --------------
# The operator production vector stores run on a schedule: measure the
# approximate index's recall against exact brute force on a probe set,
# entirely in-engine. Both arms already exist as registered queries
# (ann_lsh_topk, ann_bruteforce_topk); this composes them — the
# ground-truth arm joins the approximate arm on (query, candidate)
# and recall is an integer ppm ratio, so the whole evaluation is
# engine-exact. Rank-K ties are broken by candidate id in BOTH arms,
# so the two top-k sets are deterministic and the metric is stable.


def _recall_sql() -> str:
    from .similarity_queries import _BRUTE_ORACLE, _lsh_oracle

    return f"""
    WITH brute AS ({_BRUTE_ORACLE}),
    approx AS ({_lsh_oracle()}),
    hits AS (
      SELECT b.query_id,
             CAST(COUNT(*) AS BIGINT) AS n_brute,
             CAST(COUNT(a.cand_id) AS BIGINT) AS n_hits
      FROM brute b
      LEFT JOIN approx a
        ON a.query_id = b.query_id AND a.cand_id = b.cand_id
      GROUP BY b.query_id
    ),
    macro AS (
      SELECT CAST(SUM(n_hits * 1000000 // n_brute) // COUNT(*)
                  AS BIGINT) AS macro_recall_ppm
      FROM hits
    )
    SELECT h.query_id, h.n_brute, h.n_hits,
           CAST(h.n_hits * 1000000 // h.n_brute AS BIGINT)
             AS recall_ppm,
           m.macro_recall_ppm
    FROM hits h, macro m
    ORDER BY h.query_id
"""


@register(
    "ann_recall_eval",
    _recall_sql(),
    doc="ANN index quality evaluation in-engine: the LSH arm's top-k "
    "joined against the brute-force ground-truth top-k per probe "
    "query, recall@k emitted as integer ppm per query plus the "
    "macro average — the scheduled index-health measurement a "
    "production vector store runs, composed from the two registered "
    "ANN arms (extension).",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_brute, n_hits, recall_ppm, macro_recall_ppm).

    Scale shape: inherits both arms' — the brute arm is the
    probe-set-bounded broadcast scan (ground truth over N_QUERIES
    probes, not all pairs), the LSH arm is the bucket-keyed
    candidate join; the evaluation itself joins two K x N_QUERIES
    frames (metadata scale) and aggregates to one row per probe.
    At 100 TB the probe set stays fixed, so evaluation cost tracks
    the index arms, not the corpus — and the brute arm is the knob
    a production run subsamples. Integer ppm keeps the metric
    bit-identical across engines.
    """
    from .similarity_queries import ann_bruteforce_topk, ann_lsh_topk

    b = ann_bruteforce_topk(spark, sf_dir).select("query_id", "cand_id")
    a = (
        ann_lsh_topk(spark, sf_dir)
        .select("query_id", "cand_id")
        .withColumn("m", F.lit(1))
    )
    hits = (
        b.join(a, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_brute"),
            F.count("m").cast("bigint").alias("n_hits"),
        )
    )
    macro = hits.agg(
        F.expr(
            "CAST(SUM(n_hits * 1000000 DIV n_brute) DIV COUNT(*)"
            " AS BIGINT)"
        ).alias("macro_recall_ppm")
    )
    return (
        hits.crossJoin(F.broadcast(macro))
        .select(
            "query_id",
            "n_brute",
            "n_hits",
            F.expr(
                "CAST(n_hits * 1000000 DIV n_brute AS BIGINT)"
            ).alias("recall_ppm"),
            "macro_recall_ppm",
        )
        .orderBy("query_id")
    )


# --- grouped OLS trend fit (closed-form regression) ------------------
# Per-nation linear trend of monthly revenue: the closed-form least
# squares fit from the five power sums (n, Sx, Sy, Sxx, Sxy, Syy) —
# the way a distributed engine fits millions of per-group regressions
# in ONE aggregation pass (no iterative solver, no driver loop).
# Everything stays exact integer arithmetic: x is the month index
# since 1990-01, y is revenue in cents, the sums are DECIMAL(38,0) /
# HUGEINT, and slope / r^2 are emitted as integer-division ppm
# (truncation toward zero is identical in Spark DIV and DuckDB //,
# verified including negatives and >64-bit operands; the QUOTIENT
# must fit BIGINT — ppm values do by construction).

_OLS_SQL = """
    WITH m AS (
      SELECT n.n_name,
             (CAST(year(o.o_orderdate) AS BIGINT) - 1990) * 12
               + CAST(month(o.o_orderdate) AS BIGINT) - 1 AS x,
             CAST(SUM(CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,2))
                                 * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT n_name,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
               AS HUGEINT) AS sxy,
             CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
               AS HUGEINT) AS syy
      FROM m GROUP BY n_name
    ),
    f AS (
      SELECT n_name, n, sx, sy,
             n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den,
             n * syy - sy * sy AS syc
      FROM s WHERE n * sxx - sx * sx > 0
    )
    SELECT n_name,
           CAST(n AS BIGINT) AS n_months,
           CAST(sy AS BIGINT) AS sum_revenue_cents,
           CAST((num * 1000000) // den AS BIGINT) AS slope_ppm,
           CAST((sy * den - num * sx) // (n * den) AS BIGINT)
             AS intercept_cents,
           CASE WHEN syc > 0
                THEN CAST((num * num * 1000000) // (den * syc) AS BIGINT)
                ELSE NULL END AS r2_ppm
    FROM f
    ORDER BY n_name
"""


@register(
    "ols_trend_fit",
    _OLS_SQL,
    doc="Grouped closed-form OLS: per-nation linear trend of monthly "
    "revenue fitted from one pass of exact integer power sums "
    "(n, Sx, Sy, Sxx, Sxy, Syy); slope and r-squared emitted as "
    "truncating-division ppm, bit-deterministic (extension).",
)
def ols_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, n_months, sum_revenue_cents, slope_ppm,
    intercept_cents, r2_ppm) per nation; slope in revenue-cents ppm
    per month against a fixed 1990-01 epoch.

    Scale shape: the star rollup to nation-month grain is the only
    data-bound stage (map-side partial sums); the regression itself
    is a second grain-level aggregate producing five sums per group
    — this is how an engine fits millions of per-group trends with
    zero iteration and zero extra shuffles (the power sums combine
    associatively). Exactness budget: every product fits
    DECIMAL(38,0) through sf>=100 (y ~ 1e10 cents, num^2*1e6 ~
    1e35); at extreme corpus scale the same plan runs with y demeaned
    or in whole dollars — the sums' grain (one row per group) never
    grows. Quotients are ppm-sized so Spark's DECIMAL DIV (BIGINT
    result) cannot overflow.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            (
                (F.year("o_orderdate") - F.lit(1990)) * 12
                + F.month("o_orderdate")
                - 1
            )
            .cast("long")
            .alias("x"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("o_totalprice").cast("decimal(18,2)") * 100, 0
                ).cast("long")
            )
            .cast("long")
            .alias("y")
        )
    )
    d38 = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = m.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d38("x") * d38("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(d38("y") * d38("y")).cast("decimal(38,0)").alias("syy"),
    )
    f = s.select(
        "n_name",
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("syc"),
    ).where(F.col("den") > 0)
    return (
        f.select(
            "n_name",
            F.col("n").cast("bigint").alias("n_months"),
            F.col("sy").cast("bigint").alias("sum_revenue_cents"),
            F.expr("CAST((num * 1000000) DIV den AS BIGINT)").alias(
                "slope_ppm"
            ),
            F.expr(
                "CAST((sy * den - num * sx) DIV (n * den) AS BIGINT)"
            ).alias("intercept_cents"),
            F.expr(
                "CASE WHEN syc > 0 THEN "
                "CAST((num * num * 1000000) DIV (den * syc) AS BIGINT) "
                "ELSE NULL END"
            ).alias("r2_ppm"),
        )
        .orderBy("n_name")
    )


# --- chi-square independence test (contingency table) ----------------
# Pearson's chi-square over the order-priority x order-status
# contingency table — the categorical drift / association test a data
# QC layer runs beside data_quality_expectations' row-level checks.
# Identity used: expected = r*c/N, so per-cell
#   (obs - exp)^2 / exp  ==  (obs*N - r*c)^2 / (r*c*N)
# which keeps EVERYTHING integer until the final truncating division
# (ppm). The margins and N come from the 15-row cell frame itself —
# the raw table is touched exactly once.

_CHI2_SQL = """
    WITH cells AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ),
    rp AS (SELECT priority, CAST(SUM(obs) AS HUGEINT) AS r
           FROM cells GROUP BY priority),
    cs AS (SELECT status, CAST(SUM(obs) AS HUGEINT) AS c
           FROM cells GROUP BY status),
    tot AS (SELECT CAST(SUM(obs) AS HUGEINT) AS n FROM cells),
    terms AS (
      SELECT cells.priority, cells.status, cells.obs,
             CAST((rp.r * cs.c * 1000) // tot.n AS BIGINT)
               AS expected_milli,
             CAST(((cells.obs * tot.n - rp.r * cs.c)
                   * (cells.obs * tot.n - rp.r * cs.c)
                   * 1000000) // (rp.r * cs.c * tot.n) AS BIGINT)
               AS term_ppm
      FROM cells
      JOIN rp ON rp.priority = cells.priority
      JOIN cs ON cs.status = cells.status
      CROSS JOIN tot
    ),
    stat AS (SELECT CAST(SUM(term_ppm) AS BIGINT) AS chi2_ppm,
                    CAST(COUNT(*) AS BIGINT) AS n_cells
             FROM terms)
    SELECT t.priority, t.status, t.obs, t.expected_milli, t.term_ppm,
           s.chi2_ppm, s.n_cells
    FROM terms t CROSS JOIN stat s
    ORDER BY t.priority, t.status
"""


@register(
    "chi2_independence_ppm",
    _CHI2_SQL,
    doc="Pearson chi-square independence test over the order "
    "priority x status contingency table: per-cell exact-integer "
    "(obs*N - r*c)^2 // (r*c*N) terms in ppm plus the summed "
    "statistic — categorical drift detection beside "
    "data_quality_expectations (extension).",
)
def chi2_independence_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, status, obs, expected_milli, term_ppm, chi2_ppm,
    n_cells) — one row per contingency cell, the test statistic
    repeated as a column.

    Scale shape: ONE map-side-combining groupBy over the raw table
    produces the cell frame (|priorities| x |statuses| rows =
    cardinality-bounded, ~15); margins, N, the per-cell terms and
    the summed statistic are all derived from that tiny frame via
    broadcast joins — data volume enters exactly once no matter the
    corpus size. Integer budget: obs*N fits DECIMAL(38,0) through
    sf~100 (2e31 after squaring, x1e6 = 2e37); beyond that the same
    plan emits the term in DOUBLE (the statistic is a float test
    quantity anyway) — cardinality-bounded state either way.
    Truncating division is engine-identical (see ols_trend_fit).
    """
    # rebalance=False: one cardinality-bounded map-side-combining
    # groupBy off the scan — the rebalance exchange is pure overhead
    # (r14 verdict ask #3)
    o = load(spark, sf_dir, "orders", rebalance=False)
    cells = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    )
    rp = cells.groupBy("priority").agg(
        F.sum("obs").cast("decimal(38,0)").alias("r")
    )
    cs = cells.groupBy("status").agg(
        F.sum("obs").cast("decimal(38,0)").alias("c")
    )
    tot = cells.agg(F.sum("obs").cast("decimal(38,0)").alias("n"))
    terms = (
        cells.join(F.broadcast(rp), "priority")
        .join(F.broadcast(cs), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "priority",
            "status",
            "obs",
            F.expr("CAST((r * c * 1000) DIV n AS BIGINT)").alias(
                "expected_milli"
            ),
            F.expr(
                "CAST(((obs * n - r * c) * (obs * n - r * c) * 1000000)"
                " DIV (r * c * n) AS BIGINT)"
            ).alias("term_ppm"),
        )
    )
    stat = terms.agg(
        F.sum("term_ppm").cast("bigint").alias("chi2_ppm"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    return (
        terms.crossJoin(F.broadcast(stat))
        .orderBy("priority", "status")
    )


# --- PMI collocation extraction --------------------------------------
# Pointwise mutual information over adjacent token bigrams — THE
# classic collocation / phrase-mining statistic (Church & Hanks 1990;
# the word2phrase step of word2vec pipelines): pmi(x,y) =
# ln( p(x,y) / (p(x) p(y)) ) = ln( c_xy * N1^2 / (N2 * c_x * c_y) ).
# The ratio's numerator and denominator are EXACT integers
# (HUGEINT / DECIMAL(38,0)); one double division + ln + ROUND(6)
# quantizes away ulp drift exactly as doc_bigram_logprob does.
# Complements doc_bigram_logprob (conditional LM probability, per
# doc) with the symmetric association strength (per bigram type).

_PMI_MIN = 5  # minimum bigram count (Church & Hanks' sparse-count guard)
_PMI_TOPK = 20

_PMI_SQL = f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    uni AS (
      SELECT u.term, CAST(COUNT(*) AS HUGEINT) AS c1
      FROM (SELECT unnest(ts) AS term FROM tok) u GROUP BY u.term
    ),
    n1 AS (SELECT CAST(SUM(c1) AS HUGEINT) AS n FROM uni),
    inst AS (
      SELECT u.bgr.w1 AS w1, u.bgr.w2 AS w2
      FROM (SELECT list_transform(generate_series(1, len(ts) - 1),
                                  i -> {{'w1': ts[i], 'w2': ts[i+1]}})
                     AS bgs
            FROM tok WHERE len(ts) >= 2) b,
           LATERAL (SELECT unnest(bgs) AS bgr) u
    ),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS HUGEINT) AS c2
      FROM inst GROUP BY w1, w2
    ),
    n2 AS (SELECT CAST(SUM(c2) AS HUGEINT) AS n FROM big),
    scored AS (
      SELECT big.w1, big.w2,
             CAST(big.c2 AS BIGINT) AS pair_count,
             CAST(ca.c1 AS BIGINT) AS w1_count,
             CAST(cb.c1 AS BIGINT) AS w2_count,
             ROUND(ln(CAST(big.c2 * n1.n * n1.n AS DOUBLE)
                      / CAST(n2.n * ca.c1 * cb.c1 AS DOUBLE)), 6)
               AS pmi
      FROM big
      JOIN uni ca ON ca.term = big.w1
      JOIN uni cb ON cb.term = big.w2
      CROSS JOIN n1 CROSS JOIN n2
      WHERE big.c2 >= {_PMI_MIN}
    )
    SELECT * FROM scored
    ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_TOPK}
"""


@register(
    "collocation_pmi_bigrams",
    _PMI_SQL,
    doc=f"PMI collocation mining (Church & Hanks 1990): top-"
    f"{_PMI_TOPK} adjacent-token bigrams by pointwise mutual "
    f"information with count >= {_PMI_MIN}; exact-integer ratio, "
    "one quantized ln — the word2phrase statistic (extension).",
)
def collocation_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, pair_count, w1_count, w2_count, pmi) — top bigrams
    by PMI, count-filtered, tie-broken lexicographically.

    Scale shape: bigram instances build ROW-LOCALLY via the
    shifted-slice zip (no positional self-join); the unigram model
    is vocabulary-sized and broadcast into the bigram frame; the two
    scalar totals are broadcast 1-row aggregates. The only data-
    bound shuffles are the two token/bigram count groupBys (map-side
    combining, key space = vocabulary); the count>=5 filter prunes
    the long tail BEFORE the joins, and the final top-k is a
    TakeOrdered over the surviving types, never a global sort of the
    corpus. Integer budget: c2*N1^2 needs >64 bits from ~sf1 —
    hence HUGEINT / DECIMAL(38,0) on both sides.
    """
    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    n = F.size(ts)
    base = docs.select("doc_id", ts.alias("ts"))
    uni = (
        base.select(F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c1"))
    )
    n1 = uni.agg(F.sum("c1").cast("decimal(38,0)").alias("n1"))
    bigrams = F.zip_with(
        F.slice(ts, 1, n - 1),
        F.slice(ts, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    inst = (
        docs.where(n >= 2)
        .select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
    )
    big = (
        inst.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c2"))
        .where(F.col("c2") >= _PMI_MIN)
    )
    n2 = inst.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n2"))
    ca = uni.select(F.col("term").alias("w1"), F.col("c1").alias("c1a"))
    cb = uni.select(F.col("term").alias("w2"), F.col("c1").alias("c1b"))
    return (
        big.join(F.broadcast(ca), "w1")
        .join(F.broadcast(cb), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("bigint").alias("pair_count"),
            F.col("c1a").cast("bigint").alias("w1_count"),
            F.col("c1b").cast("bigint").alias("w2_count"),
            F.round(
                F.log(
                    (F.col("c2") * F.col("n1") * F.col("n1")).cast("double")
                    / (F.col("n2") * F.col("c1a") * F.col("c1b")).cast(
                        "double"
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOPK)
    )
