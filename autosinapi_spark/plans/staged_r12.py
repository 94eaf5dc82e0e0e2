"""Round-12-registered queries (built and oracle-tested in round 11).

History: staged (NOT registered) through round 11 because that round's
correctness window was already fully committed; flipped from ``stage``
to ``@register`` at the round-12 window rewrite (docs/R12_PLAN.md §1).
At 195 + 3 = 198 registered the staleness bound
``max(3, ceil(N/50))`` stays 4; it flips to 5 past 200 registered,
which docs/R13_PLAN.md takes deliberately (registering 3 more in r13
ends the zero-margin rotation treadmill). The cohort — the r10
verdict's ask #5:

- ``unimax_source_allocation`` — UniMax epoch-capped budget
  allocation across corpus sources (Chung et al. 2023, "UniMax:
  Fairer and More Effective Language Sampling for Large-Scale
  Multilingual Pretraining"): give every source up to C epochs of
  its own tokens, then spread the remaining token budget uniformly
  over the still-uncapped sources (water-filling). The closed form
  is ALL-INTEGER: sort sources ascending by size, a source is capped
  iff its cap fits under the running uniform share, and the capped
  set is a prefix of that order — enforced structurally here with a
  running-AND window rather than assumed, so both engines agree even
  on degenerate size distributions. Completes the sampling family
  next to ``temperature_mix_sources`` (rate-based) and
  ``priority_sample_orders`` (weighted-without-replacement).

- ``pagerank_convergence_eps`` — the convergence-to-epsilon contrast
  row to the registered fixed-iteration ``item_cooccurrence_pagerank``
  (plans/graph_analytics_queries.py): the SAME integer rank units,
  damping and truncating division, but the loop stops at the first
  iteration whose max |rank_t - rank_{t-1}| <= EPS (driver-delta
  check per round, the ``operators/graph.py`` pattern), capped at
  MAX_IT. The oracle unrolls MAX_IT iterations as CTEs, computes the
  per-iteration max delta, and reads out the FIRST converged
  iteration — so the data-dependent stopping point itself is
  oracle-checked, not just the final ranks.

- ``lang_id_stopword_confusion`` — confusion matrix of a 5-list
  stopword argmax classifier (de/en/es/fr/pt) against the metadata
  ``lang`` labels, with per-label shares in integer ppm.
  DEPLOYMENT-GATED, NOT FIXTURE-TUNED: the fixture's ``lang`` labels
  are text-independent metadata (every doc draws one shared
  English-ish vocabulary — see plans/staged_r11.py
  ``lang_id_quality_eval``), so the matrix here diagnoses the CORPUS
  (most mass lands in pred 'en'/'und' regardless of label), which is
  exactly the reading a real mislabeled dataset would get. 'zh'
  carries no stopword list because whitespace tokenization cannot
  represent Chinese stopwords; at deployment you swap token lists,
  never thresholds.

Each entry carries a full DuckDB oracle; since the r12 flip the
registry compare in tests/test_correctness.py owns the oracle check
(a duplicate compare ran in tests/test_staged_r12.py while they were
staged in r11); the pure-Python replays of the novel arithmetic stay
there.

Reference parity note: the reference engine (a single-process pandas
ETL, /root/reference/autosinapi/) has no sampling, graph, or lang-id
operators — all three are extensions for the 100 TB curation target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import EN_STOPWORDS, PT_STOPWORDS, tokens
from .registry import register

# Kept for import compatibility with round-11 tooling snapshots; the
# cohort now registers directly into plans.registry.REGISTRY.
STAGED: dict = {}


# --- UniMax epoch-capped source allocation ----------------------------

# C: per-source epoch cap (a source contributes at most C passes over
# its own tokens — UniMax's defense against rare-source overfitting).
_UMX_EPOCHS = 4
# Budget B = (_UMX_BUDGET_NUM * total_tokens) // _UMX_BUDGET_DEN.
# 3.5x the corpus sits strictly between 1x (everything uniform) and
# Cx (everything capped), so the fixture exercises BOTH branches of
# the water-filling cut; B < C*T also guarantees the uncapped tail is
# non-empty, making the leftover division well-defined (still guarded).
_UMX_BUDGET_NUM = 7
_UMX_BUDGET_DEN = 2

_UMX_TOKENS_SQL = (
    "CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),"
    " ' ')) AS BIGINT)"
)


def _umx_sql() -> str:
    c = _UMX_EPOCHS
    return f"""
    WITH per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_UMX_TOKENS_SQL}) AS BIGINT) AS n_tok
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_tok) AS BIGINT) AS t_tok,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM per_src
    ),
    seq AS (
      SELECT p.source, p.n_docs, p.n_tok, t.k,
             ({_UMX_BUDGET_NUM} * t.t_tok) // {_UMX_BUDGET_DEN} AS b,
             CAST(ROW_NUMBER() OVER (ORDER BY p.n_tok, p.source)
                  AS BIGINT) AS idx,
             CAST(COALESCE(SUM(p.n_tok) OVER (
                    ORDER BY p.n_tok, p.source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_prev
      FROM per_src p CROSS JOIN tot t
    ),
    pref AS (
      SELECT *,
             MIN(CASE WHEN {c} * n_tok * (k - idx + 1)
                        <= b - {c} * cum_prev
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prefix_ok
      FROM seq
    ),
    cut AS (
      SELECT CAST(COALESCE(MAX(CASE WHEN prefix_ok = 1 THEN idx END), 0)
                  AS BIGINT) AS t_star,
             CAST(COALESCE(MAX(CASE WHEN prefix_ok = 1
                                    THEN cum_prev + n_tok END), 0)
                  AS BIGINT) AS cum_t
      FROM pref
    ),
    alloc AS (
      SELECT p.source, p.n_docs, p.n_tok,
             {c} * p.n_tok AS cap_tok,
             CASE WHEN p.idx <= c2.t_star THEN {c} * p.n_tok
                  WHEN p.k > c2.t_star
                    THEN (p.b - {c} * c2.cum_t) // (p.k - c2.t_star)
                  ELSE CAST(0 AS BIGINT) END AS alloc_tok,
             p.idx <= c2.t_star AS capped
      FROM pref p CROSS JOIN cut c2
    )
    SELECT source, n_docs, n_tok, cap_tok, alloc_tok,
           alloc_tok * 1000 // n_tok AS epochs_pm,
           capped
    FROM alloc
    """


@register(
    "unimax_source_allocation",
    _umx_sql(),
    doc=f"UniMax epoch-capped token-budget allocation across sources "
    f"(Chung et al. 2023): each source gets at most {_UMX_EPOCHS} "
    f"epochs of its own tokens, the rest of the "
    f"{_UMX_BUDGET_NUM}/{_UMX_BUDGET_DEN}x-corpus budget spreads "
    "uniformly over uncapped sources (water-filling, all-integer "
    "closed form with a structural prefix guard). Completes the "
    "sampling family (extension).",
)
def unimax_source_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source (n_docs, n_tok, cap_tok, alloc_tok, epochs_pm, capped)
    under UniMax water-filling.

    Scale shape: ONE language/source-keyed map-combined aggregate over
    the corpus (text never shuffles; only per-row token counts), then
    all allocation math runs on the |sources|-sized frame — the two
    unpartitioned windows and the scalar cut are bounded by the source
    count (tens-to-thousands at any scale, never corpus-sized), the
    same groups-sized-recipe rationale as ``temperature_mix_sources``.
    At 100 TB the emitted (source, alloc_tok) table drives the ingest
    sampler exactly like temperature mixing's rate table.

    All-integer arithmetic (BIGINT counts, truncating division on
    non-negative values in both engines), so the oracle compare is
    exact by construction. The capped set under water-filling is a
    prefix of the ascending size order; rather than assume the
    monotonicity, both engines enforce it with a running-AND window
    (MIN of the 0/1 cap-fits flag), so a pathological distribution
    degrades to a smaller capped prefix instead of diverging.
    """
    c = _UMX_EPOCHS
    docs = load(spark, sf_dir, "documents")
    # The sources-sized aggregate feeds BOTH the totals and the main
    # frame: checkpoint it so the corpus-wide token count runs once,
    # not once per consumer (the pin in test_staged_r12 holds this).
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("n_tok"),
    ).localCheckpoint(eager=False)
    tot = per_src.agg(
        F.sum("n_tok").alias("t_tok"),
        F.count(F.lit(1)).alias("k"),
    )
    # Unpartitioned windows over the |sources|-sized aggregate only
    # (bounded by construction; allowlisted in test_plan_shapes.py).
    w = Window.orderBy("n_tok", "source")
    seq = (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn(
            "b",
            F.expr(
                f"({_UMX_BUDGET_NUM} * t_tok) div {_UMX_BUDGET_DEN}"
            ),
        )
        .withColumn("idx", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("n_tok").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
    )
    pref = seq.withColumn(
        "prefix_ok",
        F.min(
            F.when(
                F.lit(c) * F.col("n_tok") * (F.col("k") - F.col("idx") + 1)
                <= F.col("b") - F.lit(c) * F.col("cum_prev"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    cut = pref.agg(
        F.coalesce(
            F.max(F.when(F.col("prefix_ok") == 1, F.col("idx"))),
            F.lit(0).cast("long"),
        ).alias("t_star"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("prefix_ok") == 1,
                    F.col("cum_prev") + F.col("n_tok"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("cum_t"),
    )
    alloc_col = (
        F.when(F.col("idx") <= F.col("t_star"), F.lit(c) * F.col("n_tok"))
        .when(
            F.col("k") > F.col("t_star"),
            F.expr(f"(b - {c} * cum_t) div (k - t_star)"),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    return (
        pref.crossJoin(F.broadcast(cut))
        .withColumn("alloc_tok", alloc_col)
        .select(
            "source",
            "n_docs",
            "n_tok",
            (F.lit(c) * F.col("n_tok")).alias("cap_tok"),
            "alloc_tok",
            F.expr("alloc_tok * 1000 div n_tok").alias("epochs_pm"),
            (F.col("idx") <= F.col("t_star")).alias("capped"),
        )
    )


# --- PageRank until convergence (contrast row) ------------------------

# Same integer rank-unit scheme as item_cooccurrence_pagerank
# (plans/graph_analytics_queries.py): 1e12 units/node, damping as
# (85 * x) // 100, truncating division everywhere.
_PRC_INIT = 1_000_000_000_000
_PRC_BASE = 150_000_000_000
# Stop when no rank moved by more than EPS units (1e-4 of the initial
# mass). The fixture graph mixes fast (max delta shrinks ~10x per
# round: 6.9e11 after round 1, 8.7e7 by round 5 at sf0.01), so the
# loop stops at 5-6 rounds across fixture scales — well under the cap.
_PRC_EPS = 100_000_000
_PRC_MAX_IT = 10
_PRC_TOP = 100
# rounds built lazily between driver-synchronous convergence probes
# (one barrier per batch instead of per round; see the loop comment)
_PRC_PROBE_BATCH = 3


def _prc_sql() -> str:
    # Every unrolled CTE is referenced more than once (the next
    # iteration, the ranks union, the delta join), so each is pinned
    # AS MATERIALIZED: without it DuckDB may inline, and inlining a
    # 3-reference 10-level chain re-expands the whole upstream tree
    # per reference — measured as a >6 GB spill at sf0.01 vs
    # sub-second materialized.
    iters = []
    prev = "r0"
    for t in range(1, _PRC_MAX_IT + 1):
        iters.append(
            f"""
    i{t} AS MATERIALIZED (
      SELECT e.dst AS id,
             CAST(SUM(r.pr // d.outdeg) AS BIGINT) AS incoming
      FROM edges e
      JOIN {prev} r ON r.id = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{t} AS MATERIALIZED (
      SELECT n.id,
             CAST({_PRC_BASE} + (85 * COALESCE(i.incoming, 0)) // 100
                  AS BIGINT) AS pr
      FROM nodes n LEFT JOIN i{t} i ON i.id = n.id
    )"""
        )
        prev = f"r{t}"
    ranks_all = " UNION ALL ".join(
        f"SELECT {t} AS it, id, pr FROM r{t}"
        for t in range(1, _PRC_MAX_IT + 1)
    )
    return f"""
    WITH li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey <> b.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT l_partkey AS id FROM li),
    r0 AS MATERIALIZED (
      SELECT id, CAST({_PRC_INIT} AS BIGINT) AS pr FROM nodes
    ),{','.join(iters)},
    ranks_all AS MATERIALIZED ({ranks_all}),
    prev_all AS (
      SELECT 0 AS it, id, pr FROM r0
      UNION ALL
      SELECT it, id, pr FROM ranks_all WHERE it < {_PRC_MAX_IT}
    ),
    deltas AS (
      SELECT a.it, MAX(ABS(a.pr - p.pr)) AS maxd
      FROM ranks_all a
      JOIN prev_all p ON p.it = a.it - 1 AND p.id = a.id
      GROUP BY a.it
    ),
    conv AS (
      SELECT CAST(COALESCE(MIN(it), {_PRC_MAX_IT}) AS BIGINT)
               AS n_iters
      FROM deltas WHERE maxd <= {_PRC_EPS}
    )
    SELECT part_key, pagerank_units, rank_pos, n_iters FROM (
      SELECT ra.id AS part_key, ra.pr AS pagerank_units,
             CAST(RANK() OVER (ORDER BY ra.pr DESC, ra.id) AS BIGINT)
               AS rank_pos,
             c.n_iters
      FROM ranks_all ra JOIN conv c ON ra.it = c.n_iters
    ) WHERE rank_pos <= {_PRC_TOP}
    """


@register(
    "pagerank_convergence_eps",
    _prc_sql(),
    doc="Convergence-to-epsilon PageRank over the order-basket item "
    "co-occurrence graph — the contrast row to the registered "
    f"fixed-iteration form: same integer rank units, stop at the "
    f"first round with max |delta| <= {_PRC_EPS} units (cap "
    f"{_PRC_MAX_IT}). The oracle unrolls the cap, computes every "
    "round's max delta, and reads out the FIRST converged round, so "
    "the data-dependent stopping point is itself checked (extension).",
)
def pagerank_convergence_eps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-100 (part_key, pagerank_units, rank_pos, n_iters) at the
    first epsilon-converged PageRank round.

    The driver-delta pattern (``operators/graph.py``): each round
    lazily localCheckpoints the new ranks frame and ONE
    driver-synchronous job — ``.limit(1).count()`` over rows that
    moved more than EPS — both materializes it and decides
    termination. Early-out beats the fixed-iteration form whenever
    the graph mixes faster than the pinned T; the delta probe costs
    one (id-keyed) join per round, nothing corpus-sized reaches the
    driver. Edge list, degrees, and nodes are checkpointed once
    outside the loop, so every round is one src-keyed join + one
    dst-keyed partial-aggregated sum + the probe join, regardless of
    how many rounds the epsilon needs; frames carry only (id, long)
    pairs. See item_cooccurrence_pagerank
    (plans/graph_analytics_queries.py) for the basket-local pair
    generation and the AQE/localCheckpoint partitioning caveat —
    both apply unchanged here.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
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
    # frames KEEP their HashPartitioning under AQE, so each round's
    # src-keyed edge join and id-keyed rank rebuild read them with no
    # exchange — see item_cooccurrence_pagerank for the rationale and
    # the plan-shape pin; the sim/bench harnesses clear the SQL cache
    # between runs (intra-query reuse only).
    edges_deg = edges.join(deg, "src").repartition("src").persist()
    nodes = (
        li.select(F.col("l_partkey").alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select(
        "id", F.lit(_PRC_INIT).cast("long").alias("pr")
    )
    n_iters = _PRC_MAX_IT

    # SHUFFLE_HASH on the node-sized side (guide §3.1, r14): the
    # batched rounds pipeline into one adaptive query stage, so AQE
    # cannot convert the planned SortMergeJoins at a stage boundary —
    # the hint removes the per-round sort of the edge frame and is
    # scale-safe where a broadcast hint is not.
    def _step(r: DataFrame) -> DataFrame:
        contrib = (
            edges_deg.join(
                r.hint("shuffle_hash"), edges_deg["src"] == r["id"]
            )
            .select(
                F.col("dst"),
                F.expr("pr div outdeg").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("incoming"))
        )
        return (
            nodes.join(
                contrib.hint("shuffle_hash"),
                nodes["id"] == contrib["dst"],
                "left",
            )
            .select(
                "id",
                (
                    F.lit(_PRC_BASE)
                    + F.expr("85 * coalesce(incoming, 0L) div 100")
                )
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )

    # Probe-batched convergence loop (r14 optimization): build
    # _PRC_PROBE_BATCH rounds lazily, then ONE driver-synchronous job
    # computes every round-in-batch's moved flag (a union of
    # limit(1)-bounded delta probes tagged by round), so the driver
    # barrier count drops from one-per-round to one-per-batch — at
    # cluster scale each sync is a full-cluster barrier, so batching
    # matters MORE there, and the checkpoints materialize under the
    # probe job exactly as before. n_iters semantics are unchanged:
    # the first round whose delta probe returns no row is the
    # converged round, rounds past it inside the batch are discarded
    # (bounded waste: < batch size extra rounds, only at the tail).
    t = 0
    while t < _PRC_MAX_IT:
        batch: list[tuple[int, DataFrame, DataFrame]] = []
        r_in = ranks
        while t < _PRC_MAX_IT and len(batch) < _PRC_PROBE_BATCH:
            t += 1
            r_out = _step(r_in)
            batch.append((t, r_in, r_out))
            r_in = r_out
        # Materialize the batch's LAST frame first: computing r_{t+G}
        # pins every intermediate round's lazy checkpoint IN ORDER
        # (each is a dependency of the next), so the probe union below
        # only reads stored blocks. Skipping this lets the union's
        # independent branches race to compute the same lazy
        # checkpoints concurrently (round t is read by two probes) —
        # the documented lazy-checkpoint concurrency trap, measured
        # 2x slower than the per-round loop this replaces.
        batch[-1][2].write.format("noop").mode("overwrite").save()
        probes = None
        for rnd, prev, new in batch:
            p = (
                new.join(prev.withColumnRenamed("pr", "pr_prev"), "id")
                .where(F.abs(F.col("pr") - F.col("pr_prev")) > _PRC_EPS)
                .limit(1)
                .select(F.lit(rnd).alias("rnd"))
            )
            probes = p if probes is None else probes.unionByName(p)
        moved_rounds = {row["rnd"] for row in probes.collect()}
        converged = next(
            (rnd for rnd, _, _ in batch if rnd not in moved_rounds), None
        )
        if converged is not None:
            n_iters = converged
            ranks = next(new for rnd, _, new in batch if rnd == converged)
            break
        ranks = batch[-1][2]
    # TakeOrderedAndProject head; rank window runs over 100 rows only
    # (bounded by the prior limit; allowlisted in test_plan_shapes.py).
    top = ranks.orderBy(F.desc("pr"), F.asc("id")).limit(_PRC_TOP)
    return top.select(
        F.col("id").alias("part_key"),
        F.col("pr").alias("pagerank_units"),
        F.rank()
        .over(Window.orderBy(F.desc("pr"), F.asc("id")))
        .cast("long")
        .alias("rank_pos"),
        F.lit(n_iters).cast("long").alias("n_iters"),
    )


# --- stopword-vote lang-id confusion matrix ---------------------------

# Five Latin-script stopword lists: en/pt reuse the shared helpers'
# canonical tuples (functions/text.py); de/es/fr are the standard
# top-frequency function words. Kept LOCAL to this module so the
# shared helper file (a fingerprint-closure source for every
# registered text query) stays untouched until the r12 flip.
_DE_STOPWORDS = (
    "der", "die", "das", "und", "ist", "mit", "von", "den",
    "nicht", "ein",
)
_ES_STOPWORDS = (
    "el", "la", "los", "las", "es", "en", "por", "con", "una", "del",
)
_FR_STOPWORDS = (
    "le", "la", "les", "des", "et", "est", "une", "dans", "pour",
    "qui",
)
# lex order of the vote columns — ties break toward the first.
_SW_LISTS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("de", _DE_STOPWORDS),
    ("en", EN_STOPWORDS),
    ("es", _ES_STOPWORDS),
    ("fr", _FR_STOPWORDS),
    ("pt", PT_STOPWORDS),
)


def _sw_sql_list(ws: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in ws)


def _sw_confusion_sql() -> str:
    votes = ",\n             ".join(
        f"len(list_filter(ts, t -> t IN ({_sw_sql_list(ws)})))"
        f" AS {lang}_h"
        for lang, ws in _SW_LISTS
    )
    greatest = "GREATEST(" + ", ".join(
        f"{lang}_h" for lang, _ in _SW_LISTS
    ) + ")"
    whens = "\n             ".join(
        f"WHEN {lang}_h = {greatest} THEN '{lang}'"
        for lang, _ in _SW_LISTS
    )
    return f"""
    WITH tok AS (
      SELECT lang,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    votes AS (
      SELECT lang,
             {votes}
      FROM tok
    ),
    pred AS (
      SELECT lang,
           CASE WHEN {greatest} = 0 THEN 'und'
             {whens}
           END AS pred_lang
      FROM votes
    ),
    cells AS (
      SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY lang, pred_lang
    )
    SELECT lang, pred_lang, n_docs,
           CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
             AS label_total,
           CAST(n_docs * 1000000
                // SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
             AS share_ppm
    FROM cells
    """


@register(
    "lang_id_stopword_confusion",
    _sw_confusion_sql(),
    doc="Confusion matrix of the 5-list stopword argmax classifier "
    "(de/en/es/fr/pt; lex-order tie-break, zero votes -> 'und') "
    "against the metadata lang labels, shares in integer ppm. "
    "Deployment-gated: the fixture's labels are text-independent, "
    "so the matrix diagnoses the corpus, not the heuristic "
    "(extension; see module docstring).",
)
def lang_id_stopword_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(lang, pred_lang, n_docs, label_total, share_ppm) confusion
    cells for the stopword-vote classifier.

    Scale shape: the votes and the argmax are pure row-local Column
    expressions over the token array (text never shuffles); ONE
    (label, pred)-keyed map-combined aggregate reduces the corpus to
    at most |langs| x (|lists|+1) cells, and the per-label window
    runs on that cells-sized frame. Extending ``doc_lang_id``'s
    2-way en/pt vote to the 5-way argmax adds zero exchanges.

    The argmax tie-break is lexicographic over the vote-column order
    (de < en < es < fr < pt) in BOTH engines — a deterministic
    convention, stated rather than hidden, because shared function
    words ('la' in es+fr, 'des' in fr+de prefixes) make exact vote
    ties common on short texts.

    Tokenize ONCE into a real column, then filter it per list:
    calling ``stopword_hits`` five times would re-run the
    regexp+split tokenizer per list (Catalyst does not CSE the five
    copies across the select) — measured 3.89s vs 2.75s at 10x for
    identical output.
    """
    docs = load(spark, sf_dir, "documents")
    toked = docs.select("lang", tokens(F.col("text")).alias("ts"))

    def hits(ws: tuple[str, ...]):
        return F.size(F.filter(F.col("ts"), lambda t: t.isin(*ws)))

    votes = toked.select(
        "lang",
        *[hits(ws).alias(f"{lang}_h") for lang, ws in _SW_LISTS],
    )
    maxh = F.greatest(*[F.col(f"{lang}_h") for lang, _ in _SW_LISTS])
    pred = F.when(maxh == 0, F.lit("und"))
    for lang, _ in _SW_LISTS:
        pred = pred.when(F.col(f"{lang}_h") == maxh, F.lit(lang))
    cells = (
        votes.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    wl = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.sum("n_docs").over(wl).alias("label_total"),
        F.expr(
            "n_docs * 1000000 div sum(n_docs) over "
            "(partition by lang)"
        ).alias("share_ppm"),
    )
