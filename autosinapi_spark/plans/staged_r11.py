"""Round-11-registered queries (built and oracle-tested in round 10).

History: staged (NOT registered) through round 10 because that round's
driver window was fully claimed by the overdue-refresh cohort plus
changed-code promotions (docs/R10_PLAN.md arithmetic). Flipped to
``@register`` at the round-11 window rewrite (docs/R11_PLAN.md §1):
at 189 + 6 = 195 registered the staleness bound stays
max(3, ceil(195/50)) = 4 (it flips to 5 past 200 registered). While
staged, each ran a duplicate Spark-vs-DuckDB compare in
tests/test_staged_r11.py; since the flip, tests/test_correctness.py
owns that compare and the staged-test module keeps only what the
registry compare can't express (pure-Python replays + plan pins).

- ``quality_linear_scorer`` — fastText-shaped linear quality
  classifier (Joulin et al. 2016): hashed unigram features against a
  deterministic weight table, per-doc mean score. All INTEGER
  arithmetic (hash-derived weights, truncating-div per-mil score), so
  the oracle compare is exact by construction.
- ``token_fertility_by_lang`` — per-language tokenizer fertility
  (BPE-ish tokens per whitespace word, ppm): the tokenizer-health
  metric multilingual pipelines track per language (high fertility =
  the tokenizer fragments that language's text).
- ``ngram_novelty_score`` — per-document novelty: fraction of its
  distinct word trigrams appearing in NO other document (corpus
  df = 1), in ppm. The inverse of boilerplate: low novelty flags
  template/duplicated content that per-pair dedup misses.
- ``lsh_band_tuning_costs`` — the COST side of the LSH tuning loop
  (``near_dedup_recall_eval`` is the quality side): for every (bands,
  rows) factorization of the K=12 signature, the realized bucket
  histogram and candidate-pair volume on the actual corpus — pick the
  config from measured cost-vs-recall, not the textbook S-curve.
- ``priority_sample_orders`` — Duffield-Lund-Thorup priority
  sampling: hash-deterministic top-K by priority w/u with the
  unbiased max(w, tau) subset-sum estimator — the weighted sample
  whose estimates aggregate correctly, completing the sampling
  family (stratified / PPS / systematic / temperature / reservoir).
- ``lang_id_quality_eval`` — per-label recall of the registered
  ``doc_lang_id`` heuristic against the fixture's ``lang`` labels.
  Reading the numbers honestly: on THIS corpus every document draws
  from one shared English-ish vocabulary and the labels are
  independent metadata, so predictions land 'en'/'und' regardless of
  label (en recall 73%, others 0 at sf0.01) — the harness is
  measuring label-text independence in the fixture, which is exactly
  the diagnosis it would give a real mislabeled corpus. At deployment
  with genuinely multilingual text it scores each per-language
  stopword list added to the heuristic.

No counterpart in the reference (a pandas Excel->Postgres ETL); these
extend the LLM-corpus curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import tokens
from ..operators.near_dedup import (
    base_hashes,
    minhash_signature,
    portable_hash64,
    shingles,
)
from .near_dedup_queries import CORPUS_SQL, _corpus, minhash_band_ctes
from .registry import register
from .text_queries import _BPE_RE

# Flipped to ``@register`` at the start of round 11 (docs/R11_PLAN.md §1).
# Kept so pre-flip imports (tests, tools) don't break; the cohort now
# lives in plans.registry.REGISTRY like every other query.
STAGED: dict = {}


# --- fastText-shaped linear quality scorer ----------------------------
# Joulin et al. 2016 ("Bag of Tricks"): a linear classifier over
# hashed n-gram features is the standard cheap corpus-quality scorer
# (the CCNet/LLaMA filtering stage). Deployment swaps the
# deterministic hash-derived weight table for trained weights
# broadcast as a map; the plan shape (row-local feature hashing +
# per-doc reduce, ZERO shuffles) is identical.

_QLS_SEED = 7
_QLS_DIM = 100_003  # feature buckets (prime)
_QLS_SPAN = 2_001  # weights span [-1000, 1000]


@register(
    "quality_linear_scorer",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    scored AS (
      SELECT doc_id, len(ts) AS n_tokens,
             CAST(list_sum(list_transform(ts, t ->
               (CAST('0x' || substr(md5('{_QLS_SEED}:' || t), 1, 15)
                     AS BIGINT) % {_QLS_DIM}) % {_QLS_SPAN} - 1000))
               AS BIGINT) AS w_sum
      FROM tok
    )
    SELECT doc_id, n_tokens, w_sum,
           (w_sum * 1000) // n_tokens AS score_pmil,
           CASE WHEN (w_sum * 1000) // n_tokens >= 0 THEN 1 ELSE 0 END
             AS pred_keep
    FROM scored
    """,
    doc="fastText-shaped linear quality scorer: hashed unigram "
    f"buckets (md5 % {_QLS_DIM}) -> deterministic integer weights in "
    "[-1000, 1000] -> per-doc mean score in per-mil (truncating div, "
    "engine-parity verified) + keep/drop decision. Row-local, zero "
    "shuffles; deployment swaps the hash-derived table for trained "
    "weights with the same plan (extension).",
)
def quality_linear_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: feature hashing and the weight lookup are pure
    Column expressions inside codegen (one md5 per token, same as the
    minhash base-hash budget); the per-doc reduce is F.aggregate over
    the token array — no explode, no shuffle, embarrassingly parallel
    at any corpus size. Weights w(b) = (b % span) - 1000 stand in for
    a trained table; at deployment the broadcast map lookup keeps the
    exact same shape."""
    docs = load(spark, sf_dir, "documents")
    ts = tokens("text")

    def w(t):
        bucket = portable_hash64(t, _QLS_SEED) % _QLS_DIM
        return bucket % _QLS_SPAN - 1000

    scored = docs.select(
        "doc_id",
        F.size(ts).alias("n_tokens"),
        F.aggregate(
            ts, F.lit(0).cast("bigint"), lambda acc, t: acc + w(t)
        ).alias("w_sum"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "w_sum",
        F.expr("w_sum * 1000 DIV n_tokens").alias("score_pmil"),
        F.when(F.expr("w_sum * 1000 DIV n_tokens") >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("pred_keep"),
    )


# --- per-language tokenizer fertility ---------------------------------


@register(
    "token_fertility_by_lang",
    f"""
    WITH c AS (
      SELECT lang,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                              ' ')) AS n_ws,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS sum_ws_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe_tokens,
           (CAST(SUM(n_bpe) AS BIGINT) * 1000000)
             // CAST(SUM(n_ws) AS BIGINT) AS fertility_ppm
    FROM c
    WHERE n_bpe > 0
    GROUP BY lang
    """,
    doc="Per-language tokenizer fertility: BPE-ish tokens per "
    "whitespace word in ppm — the tokenizer-health metric tracked per "
    "language in multilingual pipelines (high fertility = the "
    "tokenizer fragments that language). Integer sums + truncating "
    "div; language-cardinality output (extension).",
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: both token counts are row-local regex/split sizes
    in codegen; the aggregate is a language-keyed hash agg with
    map-side combine — output rows = |languages|, so the exchange
    carries a handful of rows per map partition at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
    counts = docs.where(bpe > 0).select(
        "lang",
        F.size(tokens("text")).alias("n_ws"),
        bpe.alias("n_bpe"),
    )
    return (
        counts.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("sum_ws_tokens"),
            F.sum("n_bpe").alias("sum_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_ws_tokens",
            "sum_bpe_tokens",
            F.expr(
                "sum_bpe_tokens * 1000000 DIV sum_ws_tokens"
            ).alias("fertility_ppm"),
        )
    )


# --- per-document n-gram novelty --------------------------------------


@register(
    "ngram_novelty_score",
    """
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, len(ts) - 2),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sg
      FROM tok WHERE len(ts) >= 3
    ),
    g AS (SELECT doc_id, unnest(sg) AS gram FROM sh),
    df AS (SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY gram),
    flagged AS (
      SELECT g.doc_id,
             CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END AS novel
      FROM g JOIN df ON df.gram = g.gram
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           (CAST(SUM(novel) AS BIGINT) * 1000000) // COUNT(*)
             AS novelty_ppm
    FROM flagged
    GROUP BY doc_id
    """,
    doc="Per-document n-gram novelty: fraction of a doc's distinct "
    "word trigrams that appear in NO other document (corpus df = 1), "
    "in ppm — the inverse of boilerplate; low novelty flags template "
    "content that pairwise dedup thresholds miss (extension).",
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: shuffles carry (gram-digest-sized key, doc_id)
    rows, never documents; the df aggregate combines map-side; the
    flag-then-aggregate shape needs 3 exchanges (gram agg, gram join
    probe, doc agg — plan-pinned in tests) where the filter-join-back
    variant needed 4 plus a second doc_id join, because n_grams and
    n_novel fall out of ONE aggregate over the flagged join. Same
    family as tf-idf/C4 line dedup: token-bound, linear in corpus
    grams. Grams per doc are DISTINCT (list_distinct on both
    engines), so df counts documents, not occurrences; every sh doc
    reaches the output because the g-df join is lossless (every gram
    has a df row)."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", shingles(F.col("text"), 3).alias("sg")
    ).where(F.size("sg") >= 1)
    g = sh.select("doc_id", F.explode("sg").alias("gram"))
    df_counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    flagged = g.join(df_counts, "gram").select(
        "doc_id",
        F.when(F.col("n_docs") == 1, F.lit(1)).otherwise(F.lit(0)).alias(
            "novel"
        ),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("novel").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("n_novel * 1000000 DIV n_grams").alias("novelty_ppm"),
        )
    )


# --- priority sampling (weighted bottom-k with unbiased estimates) -----
# Duffield, Lund & Thorup 2007 (JACM): draw u_i uniform, rank items by
# priority q_i = w_i / u_i, keep the top K; with tau = the (K+1)-th
# priority, w_hat_i = max(w_i, tau) is an UNBIASED estimator of w_i's
# contribution to any subset sum — the weighted sample whose estimates
# you can actually aggregate. u_i here is hash-deterministic
# (h / 2^50), so the sample is reproducible across runs/engines; q is
# one exact-input IEEE multiply + divide, bit-identical in Spark and
# DuckDB.

_PRI_K = 100
_PRI_SEED = 11
_PRI_U = 1 << 50  # u denominator; h % 2^50 stays exactly double-representable
# tau = w * 2^50 / h can in principle overflow BIGINT cents (needs
# u < w / 9e18, ~1e-12 — never among the top-(K+1) order statistics at
# any realistic N); the deterministic clamp keeps the CAST defined.
_PRI_TAU_CLAMP = 9e17


@register(
    "priority_sample_orders",
    f"""
    WITH w AS (
      SELECT o_orderkey,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0)
                  AS BIGINT) AS w_cents,
             (CAST('0x' || substr(md5('{_PRI_SEED}:'
                    || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
               % {_PRI_U}) + 1 AS h
      FROM orders
    ),
    q AS (
      SELECT o_orderkey, w_cents,
             (CAST(w_cents AS DOUBLE) * {float(_PRI_U)})
               / CAST(h AS DOUBLE) AS q
      FROM w
    ),
    top AS (
      SELECT * FROM q ORDER BY q DESC, o_orderkey LIMIT {_PRI_K + 1}
    ),
    r AS (
      SELECT o_orderkey, w_cents, q,
             CAST(ROW_NUMBER() OVER (ORDER BY q DESC, o_orderkey)
                  AS INT) AS rank,
             CASE WHEN COUNT(*) OVER () > {_PRI_K}
                  THEN MIN(q) OVER () ELSE 0 END AS tau
      FROM top
    )
    SELECT o_orderkey, w_cents, rank,
           GREATEST(w_cents,
                    CAST(FLOOR(LEAST(tau, {_PRI_TAU_CLAMP})) AS BIGINT))
             AS est_cents
    FROM r WHERE rank <= {_PRI_K}
    """,
    doc="Priority sampling (Duffield-Lund-Thorup 2007): top-K orders "
    "by hash-deterministic priority w/u with the unbiased "
    "max(w, tau) subset-sum estimator (tau = the (K+1)-th priority, "
    "floor-quantized to cents; 0 when N <= K — the whole population "
    "is the sample and est = w exactly). The weighted sample whose "
    "estimates "
    "aggregate correctly — complements the stratified/PPS/temperature "
    "samplers (extension).",
)
def priority_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one scan computes (w_cents, h, q) row-locally;
    the top-(K+1) is TakeOrdered (per-partition heads merged at the
    driver-sized K+1, never a global sort); tau rides a 1-row
    broadcast and the rank window orders the <= K+1-row head only
    (bounded — allowlisted in test_plan_shapes). q's float path is
    one multiply + one divide over exactly-representable integers
    (w_cents < 2^53, h <= 2^50), so both engines produce bit-identical
    doubles and the hash compare is exact."""
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0)
        .cast("bigint")
        .alias("w_cents"),
        (
            portable_hash64(F.col("o_orderkey").cast("string"), _PRI_SEED)
            % F.lit(_PRI_U)
            + 1
        ).alias("h"),
    )
    scored = base.select(
        "o_orderkey",
        "w_cents",
        (
            F.col("w_cents").cast("double")
            * F.lit(float(_PRI_U))
            / F.col("h").cast("double")
        ).alias("q"),
    )
    top = scored.orderBy(F.desc("q"), F.asc("o_orderkey")).limit(_PRI_K + 1)
    # DLT boundary: with N <= K the whole population is kept, and the
    # threshold must be 0 (est = w exactly) — min(q) over the kept head
    # would be a KEPT item's priority and max(w, floor(tau)) would
    # overestimate. Unreachable on TPC-H fixtures (orders >> K); pinned
    # by a tiny-fixture test.
    tau = top.agg(
        F.when(F.count(F.lit(1)) > _PRI_K, F.min("q"))
        .otherwise(F.lit(0.0))
        .alias("tau")
    )
    # rank over the <= K+1-row TakeOrdered head (bounded by the limit)
    head = Window.orderBy(F.desc("q"), F.asc("o_orderkey"))
    ranked = top.withColumn(
        "rank", F.row_number().over(head)
    ).crossJoin(F.broadcast(tau))
    return ranked.where(F.col("rank") <= _PRI_K).select(
        "o_orderkey",
        "w_cents",
        "rank",
        F.greatest(
            F.col("w_cents"),
            F.floor(F.least(F.col("tau"), F.lit(_PRI_TAU_CLAMP))).cast(
                "bigint"
            ),
        ).alias("est_cents"),
    )


# --- language-ID quality harness ---------------------------------------


def _lang_eval_oracle() -> str:
    # Composes the REGISTERED doc_lang_id oracle verbatim as a CTE, so
    # the prediction under evaluation is mirror-identical with the
    # production query by construction (and the fingerprint covers it
    # through the oracle text).
    from .registry import REGISTRY

    pred = REGISTRY["doc_lang_id"].oracle
    return f"""
    WITH pred AS ({pred})
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred_en,
           CAST(SUM(CASE WHEN pred_lang = 'pt' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred_pt,
           CAST(SUM(CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred_und,
           CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           (CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000) // COUNT(*) AS recall_ppm
    FROM pred
    GROUP BY lang
    """


@register(
    "lang_id_quality_eval",
    _lang_eval_oracle(),
    doc="Language-ID quality harness: per TRUE language (the fixture "
    "ships ground-truth labels), the prediction distribution and "
    "recall of the registered doc_lang_id stopword heuristic, in "
    "integer ppm. Deliberately honest: the heuristic only votes "
    "en/pt, so the harness MEASURES its coverage gap on the 5-language "
    "corpus rather than hiding it — at deployment, add stopword lists "
    "per language and re-read this table (extension).",
)
def lang_id_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: inherits doc_lang_id's row-local stopword votes,
    then one language-keyed map-combined aggregate; output rows =
    |languages|."""
    from .text_queries import doc_lang_id

    pred = doc_lang_id(spark, sf_dir)
    hit = F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)
    return (
        pred.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("pred_lang") == "en", 1).otherwise(0)
            ).alias("n_pred_en"),
            F.sum(
                F.when(F.col("pred_lang") == "pt", 1).otherwise(0)
            ).alias("n_pred_pt"),
            F.sum(
                F.when(F.col("pred_lang") == "und", 1).otherwise(0)
            ).alias("n_pred_und"),
            F.sum(hit).alias("n_correct"),
        )
        .select(
            "lang",
            "n_docs",
            "n_pred_en",
            "n_pred_pt",
            "n_pred_und",
            "n_correct",
            F.expr("n_correct * 1000000 DIV n_docs").alias("recall_ppm"),
        )
    )


# --- LSH band-configuration cost table ---------------------------------
# Every (bands, rows) factorization of the K=12 MinHash signature,
# measured on the ACTUAL corpus: bucket histogram + candidate-pair
# volume. With near_dedup_recall_eval (the recall side) this closes
# the tuning loop — pick (b, r) from measured cost at measured recall,
# not from the 1-(1-s^r)^b textbook curve, which assumes a similarity
# distribution real corpora don't have.

_TUNE_CONFIGS = ((2, 6), (3, 4), (4, 3), (6, 2))
_TUNE_K = 12


def _tuning_oracle() -> str:
    # Reuses minhash_band_ctes verbatim so the tok/sh/hashed/sig CTEs
    # stay mirror-identical with the registered dedup (its trailing
    # 4x3 `bands` CTE goes unreferenced here — harmless). Per config,
    # one UNION ALL branch per band re-keys the shared sig.
    branches = []
    for b, r in _TUNE_CONFIGS:
        for band in range(b):
            cols = ", ".join(
                f"CAST(h{band * r + i} AS VARCHAR)" for i in range(r)
            )
            branches.append(
                f"      SELECT {b} AS bands, {r} AS rows_per_band, "
                f"{band} AS band, md5(concat_ws(',', {cols})) AS bkey "
                "FROM sig"
            )
    keys = "\n      UNION ALL\n".join(branches)
    return f"""
    WITH {CORPUS_SQL},
    {minhash_band_ctes()},
    keys AS (
{keys}
    ),
    counts AS (
      SELECT bands, rows_per_band, band, bkey, COUNT(*) AS n
      FROM keys GROUP BY bands, rows_per_band, band, bkey
    )
    SELECT bands, rows_per_band,
           COUNT(*) AS n_buckets,
           CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS n_cand_pairs,
           MAX(n) AS max_bucket
    FROM counts
    GROUP BY bands, rows_per_band
    """


@register(
    "lsh_band_tuning_costs",
    _tuning_oracle(),
    doc="LSH band-configuration cost table: for every (bands, rows) "
    f"factorization of the K={_TUNE_K} MinHash signature, the realized "
    "bucket count, candidate-pair volume (sum of C(n,2) over buckets) "
    "and max bucket size on the actual twin corpus — the cost side of "
    "the tuning loop whose quality side is near_dedup_recall_eval "
    "(extension).",
)
def lsh_band_tuning_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the md5 base-hash pass (the expensive step) runs
    ONCE — the signature frame is localCheckpointed before the four
    configs re-key it — and every downstream exchange carries
    (config, band, 16-byte bkey) rows only; all four configs' bucket
    histograms reduce in a single map-combined hash aggregate (config
    is part of the grouping key, so this is one shuffle, not four).
    Output is |configs| rows."""
    corpus = _corpus(spark, sf_dir)
    sh = corpus.select(
        "doc_id", shingles(F.col("text"), 3).alias("sg")
    ).where(F.size("sg") >= 1)
    hashed = sh.select("doc_id", base_hashes(F.col("sg")).alias("hh"))
    sig = hashed.select(
        "doc_id",
        *[
            c.alias(f"h{i}")
            for i, c in enumerate(
                minhash_signature(F.col("hh"), _TUNE_K)
            )
        ],
    ).localCheckpoint(eager=False)

    # ONE explode over all configs' band keys (r15): the former
    # 4-branch union re-scanned the checkpointed signature frame once
    # per config; flattening every (config, band) key into a single
    # 15-struct array pays one scan and one explode for the same key
    # multiset (order is irrelevant — the next step is a groupBy).
    entries = []
    for b, r in _TUNE_CONFIGS:
        for band in range(b):
            chunk = [F.col(f"h{band * r + i}") for i in range(r)]
            key = F.md5(F.concat_ws(",", *[c.cast("string") for c in chunk]))
            entries.append(
                F.struct(
                    F.lit(b).alias("bands"),
                    F.lit(r).alias("rows_per_band"),
                    F.lit(band).alias("band"),
                    key.alias("bkey"),
                )
            )
    keys = sig.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.bands", "e.rows_per_band", "e.band", "e.bkey"
    )
    counts = keys.groupBy("bands", "rows_per_band", "band", "bkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.groupBy("bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr("n * (n - 1) DIV 2")).alias("n_cand_pairs"),
            F.max("n").alias("max_bucket"),
        )
        .select(
            "bands",
            "rows_per_band",
            "n_buckets",
            "n_cand_pairs",
            "max_bucket",
        )
    )
