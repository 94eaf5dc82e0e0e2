"""Training-data curation queries (LLM-pipeline extensions).

The operators a 100 TB pre-training corpus pipeline runs between raw
ingest and tokenization, beyond dedup/similarity (covered in
``near_dedup_queries`` / ``similarity_queries``):

- benchmark decontamination (n-gram overlap vs a held-out eval set)
- sequence packing (documents -> fixed-token-budget context bins)
- deterministic stratified sampling (per-language keep rates)
- repetition quality filters (Gopher-style duplicate-token and
  top-bigram fractions; Rae et al. 2021, arXiv:2112.11446 §A1.1)
- per-language length quantiles (corpus profiling)

All pure Column expressions (JVM-side, whole-stage codegen) with full
DuckDB oracles. Scale notes per query in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..functions.text import normalize_ws, tokens
from ..operators.near_dedup import shingles
from .registry import register

# --- decontamination -------------------------------------------------

# The synthetic corpus has no labeled eval split, so designate two
# sources as the "benchmark" the trainer must not memorize.
_EVAL_SOURCES = ("src0", "src1")
_CONTAM_N = 5  # 5-gram overlap (13 is typical for real corpora, but
# the fixture docs average ~50 tokens; the machinery is n-agnostic)


@register(
    "decontaminate_ngram_overlap",
    f"""
    WITH tok AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               generate_series(1, len(ts) - {_CONTAM_N - 1}),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                    || ts[i+3] || ' ' || ts[i+4])) AS gs
      FROM tok WHERE len(ts) >= {_CONTAM_N}
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams
      WHERE source IN ('src0', 'src1')
    ),
    train AS (
      SELECT doc_id, unnest(gs) AS g FROM grams
      WHERE source NOT IN ('src0', 'src1')
    )
    SELECT t.doc_id, COUNT(*) AS n_shared_ngrams
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id
    """,
    doc="Benchmark decontamination: training docs sharing any word "
    f"{_CONTAM_N}-gram with the eval split (extension; standard "
    "pre-training hygiene step).",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-side docs that leak eval-set n-grams.

    Scale shape: the eval split is tiny relative to the corpus (GBs vs
    100 TB), so its distinct-gram set is BROADCAST — the training side
    streams through a broadcast hash join with no shuffle of the
    exploded grams; the only shuffle is the final per-doc count
    (partial-aggregated map-side). Grams are per-doc distinct, so a
    doc repeating an eval gram k times counts it once.
    """
    docs = load(spark, sf_dir, "documents")
    sg = shingles(F.col("text"), _CONTAM_N)
    grams = docs.where(F.size(sg) >= 1).select(
        "doc_id", "source", F.explode(sg).alias("g")
    )
    bench = (
        grams.where(F.col("source").isin(*_EVAL_SOURCES))
        .select("g")
        .distinct()
    )
    train = grams.where(~F.col("source").isin(*_EVAL_SOURCES))
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


# --- bloom-prefiltered decontamination -------------------------------
# decontaminate_ngram_overlap broadcasts the eval split's DISTINCT
# n-gram set — fine while the eval side is benchmark-sized, but a
# 100 TB pipeline also decontaminates against huge reference corpora
# (all of held-out validation, licensed-content denylists) whose gram
# set does not fit a broadcast. The bloom variant broadcasts a FIXED
# 8 KB bitmap instead, prefilters corpus grams row-locally inside
# codegen, and verifies only the (tiny) survivor set with an exact
# join — the output is identical (false positives never survive the
# verify join), so the oracle is the plain exact-overlap SQL.

_BLOOM_BITS = 1 << 16  # 8 KB bitmap, broadcast-constant at any scale
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 3  # hash functions


def _bloom_positions(g: Column) -> list[Column]:
    """K bit positions per gram: xxhash64(g, seed_i) mod m."""
    return [
        F.pmod(F.xxhash64(g, F.lit(i)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]


@register(
    "decontaminate_bloom_prefilter",
    f"""
    WITH tok AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               generate_series(1, len(ts) - {_CONTAM_N - 1}),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                    || ts[i+3] || ' ' || ts[i+4])) AS gs
      FROM tok WHERE len(ts) >= {_CONTAM_N}
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams
      WHERE source IN ('src0', 'src1')
    ),
    train AS (
      SELECT doc_id, unnest(gs) AS g FROM grams
      WHERE source NOT IN ('src0', 'src1')
    )
    SELECT t.doc_id, COUNT(*) AS n_shared_ngrams
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id
    """,
    doc="Bloom-prefiltered benchmark decontamination: the eval gram "
    f"set is folded into a fixed {_BLOOM_BITS // 8 // 1024} KB bitmap "
    f"({_BLOOM_K} xxhash64 probes), corpus grams are prefiltered "
    "row-locally, and only survivors reach the exact verify join — "
    "output identical to decontaminate_ngram_overlap (false "
    "positives cannot survive the verify join), which is the oracle "
    "(extension).",
)
def decontaminate_bloom_prefilter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train-side docs leaking eval n-grams, bloom-prefiltered.

    Scale shape: ``decontaminate_ngram_overlap`` must broadcast the
    eval split's distinct grams — unbounded in the eval side's size.
    Here the only broadcast is ONE row holding a fixed
    ``_BLOOM_WORDS x int64`` bitmap (built with a bounded groupBy on
    word index + bit_or, densified once into an array), the corpus
    gram stream is filtered row-locally (K codegen'd hash-and-test
    probes per gram — no join, no shuffle), and the exact verify join
    runs over only the survivors: true matches plus a
    fill^K false-positive trickle, so the verify join's build side is
    survivor-sized and Catalyst/AQE picks its own strategy instead of
    being forced to broadcast the full gram set. At a 21% fill (the
    fixture's) the false-positive rate is under 1%; production sizes
    the bitmap to the denylist (~10 bits per element keeps fp ~ 1%)
    and still ships kilobytes-to-megabytes, not the gram corpus.
    """
    docs = load(spark, sf_dir, "documents")
    sg = shingles(F.col("text"), _CONTAM_N)
    grams = docs.where(F.size(sg) >= 1).select(
        "doc_id", "source", F.explode(sg).alias("g")
    )
    bench = (
        grams.where(F.col("source").isin(*_EVAL_SOURCES))
        .select("g")
        .distinct()
    )
    train = grams.where(~F.col("source").isin(*_EVAL_SOURCES))

    # build: positions -> (word, bit) -> bit_or per word -> dense array
    pos = bench.select(
        F.explode(F.array(*_bloom_positions(F.col("g")))).alias("p")
    )
    words = pos.select(
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("bit"),
    )
    bitmap = (
        words.groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "bits"))
            ).alias("m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BLOOM_WORDS - 1)),
                lambda i: F.coalesce(
                    F.element_at("m", i), F.lit(0).cast("bigint")
                ),
            ).alias("bm")
        )
    )

    # probe: materialize the K positions as real columns (outer
    # expressions referenced inside lambdas/exprs re-evaluate — the
    # documented O(n^2) trap), then test each position's bit
    probed = train.crossJoin(F.broadcast(bitmap))
    for i in range(_BLOOM_K):
        probed = probed.withColumn(
            f"__p{i}",
            F.pmod(F.xxhash64(F.col("g"), F.lit(i)), F.lit(_BLOOM_BITS)),
        )
    cond = None
    for i in range(_BLOOM_K):
        hit = F.expr(
            f"(element_at(bm, CAST(__p{i} / 64 AS INT) + 1) & "
            f"shiftleft(1L, CAST(__p{i} % 64 AS INT))) != 0"
        )
        cond = hit if cond is None else (cond & hit)
    survivors = probed.where(cond).select("doc_id", "g")

    # exact verify: survivor-sized join (NOT forced broadcast — the
    # point is that the full gram set never needs to ship)
    return (
        survivors.join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


# --- sequence packing ------------------------------------------------

_PACK_BUDGET = 512  # tokens per context bin
_PACK_SHARDS = 8


@register(
    "pack_documents_bins",
    f"""
    WITH tok AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                 ' ')) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM tok
    ),
    binned AS (
      SELECT shard,
             CAST(FLOOR((cum - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT)
               AS bin,
             doc_id, n_tokens
      FROM cum
    )
    SELECT shard, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM binned GROUP BY shard, bin
    """,
    doc=f"Sequence packing: prefix-sum binning of documents into "
    f"~{_PACK_BUDGET}-token context bins within hash shards "
    "(extension; the batch-assembly step before tokenization).",
)
def pack_documents_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents -> fixed-token-budget bins, per shard.

    Bin assignment is prefix-sum binning: bin = floor(exclusive-prefix
    -sum / budget). A deterministic one-window approximation of
    next-fit packing — a doc can straddle a budget boundary (real
    packers truncate or pad there), but assignment needs no recurrence,
    so it stays a window function.

    Scale shape: the window partitions by shard, NOT a global sort —
    at 100 TB each shard's prefix sum runs independently after one
    hash exchange (single-partition windows are the classic scale
    killer here). Shard count scales with the cluster; doc order
    within a shard is deterministic (doc_id), so reruns repack
    identically.
    """
    docs = load(spark, sf_dir, "documents")
    nt = F.size(tokens(F.col("text")))
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        nt.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = base.select(
        "shard",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / float(_PACK_BUDGET)).alias("bin"),
        "doc_id",
        "n_tokens",
    )
    return binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --- stratified sampling ---------------------------------------------

_SAMPLE_SEED = 11
_RATE_DEFAULT = 0.2
_RATE_BY_LANG = {"en": 0.5}
_HASH_SPACE = float(1 << 60)  # 15 hex digits


def _uniform(c: Column, seed: int) -> Column:
    """Deterministic uniform [0,1) from md5 — identical in DuckDB as
    CAST('0x' || substr(md5(seed || ':' || x), 1, 15) AS BIGINT)
    / POW(2, 60). Both engines convert the same bigint to double with
    IEEE round-to-nearest and divide by an exact power of two, so the
    comparison against the rate is bit-identical.
    """
    hx = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, 15)
    return F.conv(hx, 16, 10).cast("bigint") / F.lit(_HASH_SPACE)


def _sql_rate() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _RATE_BY_LANG.items()
    )
    return f"CASE lang {whens} ELSE {_RATE_DEFAULT} END"


@register(
    "stratified_sample_documents",
    f"""
    WITH u AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5('{_SAMPLE_SEED}:' ||
                  CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               / POW(2, 60) AS u
      FROM documents
    )
    SELECT doc_id, lang, ROUND(u, 6) AS u
    FROM u WHERE u < {_sql_rate()}
    """,
    doc="Deterministic stratified sampling: per-language keep rates "
    "via a portable hash-derived uniform (extension; reproducible "
    "corpus downsampling).",
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each doc iff hash-uniform(doc_id) < rate(lang).

    Scale shape: a pure row-local filter — no shuffle, no RNG state,
    no sample() nondeterminism across retries/speculation (Spark's
    sample() re-draws per task attempt; a content-hash never does).
    Rates are data-independent so the filter pushes to the scan.
    """
    docs = load(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id").cast("string"), _SAMPLE_SEED)
    rate = F.lit(_RATE_DEFAULT)
    for k, v in _RATE_BY_LANG.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return docs.where(u < rate).select(
        "doc_id", "lang", F.round(u, 6).alias("u")
    )


# --- repetition quality filter ---------------------------------------

# Gopher-style thresholds (Rae et al. 2021 table A1, adapted to token
# fractions over these short synthetic docs).
_MAX_TOP_BIGRAM_FRAC = 0.20
_MAX_DUP_TOKEN_FRAC = 0.50


@register(
    "doc_repetition_filter",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(ts) AS n_tokens,
             1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts)
               AS dup_token_frac,
             list_transform(generate_series(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1]) AS bg
      FROM tok WHERE len(ts) >= 2
    ),
    counts AS (
      SELECT doc_id, g, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(bg) AS g FROM base)
      GROUP BY doc_id, g
    ),
    top AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bigrams
      FROM counts GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           ROUND(b.dup_token_frac, 6) AS dup_token_frac,
           ROUND(CAST(t.top_c AS DOUBLE) / t.n_bigrams, 6)
             AS top_bigram_frac,
           CASE WHEN CAST(t.top_c AS DOUBLE) / t.n_bigrams
                     > {_MAX_TOP_BIGRAM_FRAC}
                  OR b.dup_token_frac > {_MAX_DUP_TOKEN_FRAC}
                THEN 'drop' ELSE 'keep' END AS rep_flag
    FROM base b JOIN top t USING (doc_id)
    """,
    doc="Repetition quality filter: duplicate-token and top-bigram "
    "fractions with Gopher-style drop thresholds (extension; Rae et "
    "al. 2021 §A1.1).",
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag docs dominated by repeated tokens/bigrams.

    Scale shape: dup_token_frac is row-local (array_distinct — no
    shuffle). The bigram mode needs a per-(doc,gram) count: explode ->
    two partial-aggregated groupBys keyed by doc_id, so data stays
    hash-partitioned by doc_id between them (one exchange, reused).
    The join back to the row-local side is doc_id-keyed as well.
    Bigrams here are NON-distinct (frequency matters), unlike
    shingles() — built from the same shifted-slice zip so the split
    is evaluated once per row, not per element.
    """
    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    n = F.size(ts)
    bigrams = F.zip_with(
        F.slice(ts, 1, n - 1),
        F.slice(ts, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = docs.where(n >= 2).select(
        "doc_id",
        n.alias("n_tokens"),
        (1.0 - F.size(F.array_distinct(ts)).cast("double") / n).alias(
            "dup_token_frac"
        ),
        bigrams.alias("bg"),
    )
    counts = (
        base.select("doc_id", F.explode("bg").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams")
    )
    frac = F.col("top_c").cast("double") / F.col("n_bigrams")
    return (
        base.select("doc_id", "n_tokens", "dup_token_frac")
        .join(top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round("dup_token_frac", 6).alias("dup_token_frac"),
            F.round(frac, 6).alias("top_bigram_frac"),
            F.when(
                (frac > _MAX_TOP_BIGRAM_FRAC)
                | (F.col("dup_token_frac") > _MAX_DUP_TOKEN_FRAC),
                F.lit("drop"),
            )
            .otherwise(F.lit("keep"))
            .alias("rep_flag"),
        )
    )


# --- corpus profiling ------------------------------------------------


@register(
    "doc_length_quantiles",
    """
    WITH tok AS (
      SELECT lang,
             CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ',
                  'g')), ' ')) AS DOUBLE) AS n_tokens
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(quantile_cont(n_tokens, 0.5), 6) AS p50,
           ROUND(quantile_cont(n_tokens, 0.9), 6) AS p90,
           ROUND(quantile_cont(n_tokens, 0.99), 6) AS p99
    FROM tok GROUP BY lang
    """,
    doc="Per-language token-length quantiles: exact interpolated "
    "percentiles for corpus profiling (extension).",
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 token counts per language.

    Exact ``percentile`` (not approx_percentile) so the DuckDB
    quantile_cont oracle matches bit-for-bit: both engines sort the
    group and linearly interpolate on doubles; ROUND(,6) absorbs any
    last-ulp drift. At 100 TB profiling would switch to
    approx_percentile (t-digest, mergeable, no per-group sort) — the
    exact form is the oracle-checkable contract; group cardinality
    (languages) is tiny so the per-group sort is bounded here.
    """
    docs = load(spark, sf_dir, "documents")
    nt = F.size(tokens(F.col("text"))).cast("double")
    return (
        docs.select("lang", nt.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.percentile("n_tokens", 0.5), 6).alias("p50"),
            F.round(F.percentile("n_tokens", 0.9), 6).alias("p90"),
            F.round(F.percentile("n_tokens", 0.99), 6).alias("p99"),
        )
    )


# --- per-source curation report --------------------------------------


@register(
    "corpus_curation_report",
    """
    WITH tok AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts,
             md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    fpc AS (SELECT fp, COUNT(*) AS n_fp FROM tok GROUP BY fp),
    toks AS (SELECT doc_id, unnest(ts) AS term FROM tok),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    total AS (SELECT SUM(cnt) AS total FROM vocab),
    lm AS (
      SELECT t.doc_id,
             ROUND(CAST(SUM(CAST(ln(CAST(v.cnt AS DOUBLE) / total.total)
                   AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS lm_score
      FROM toks t JOIN vocab v USING (term) CROSS JOIN total
      GROUP BY t.doc_id
    )
    SELECT k.source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(len(k.ts) AS DECIMAL(28,10))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_tokens,
           CAST(SUM(CASE WHEN f.n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dup,
           ROUND(CAST(SUM(CAST(lm.lm_score AS DECIMAL(28,10))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_lm_score
    FROM tok k
    JOIN fpc f ON f.fp = k.fp
    JOIN lm ON lm.doc_id = k.doc_id
    GROUP BY k.source
    """,
    doc="Per-source curation report: doc counts, mean length, exact-"
    "duplicate counts, mean unigram LM score — the funnel dashboard a "
    "corpus pipeline reviews per ingestion source (extension).",
)
def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per ingestion source with composite quality signals.

    Scale shape: fingerprint counts and the unigram model are both
    narrow keyed aggregates (16-byte digests / vocabulary terms); the
    final rollup groups by source (a handful of keys, partial-
    aggregated map-side). Mean-of-per-doc-means for the LM score uses
    the per-doc ROUNDED score on both sides so engine accumulation
    order cancels out.
    """
    from .registry import davg

    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    base = docs.select(
        "doc_id",
        "source",
        tokens(F.col("text")).alias("ts"),
        F.md5(norm).alias("fp"),
    )
    fpc = base.groupBy("fp").agg(F.count(F.lit(1)).alias("n_fp"))
    toks = base.select("doc_id", F.explode("ts").alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    logp = F.log(F.col("cnt").cast("double") / F.col("total"))
    lm = (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(davg(logp, "lm_score"))
    )
    return (
        base.join(fpc, "fp")
        .join(lm, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.size("ts").cast("double"), "mean_tokens"),
            F.sum(
                F.when(F.col("n_fp") > 1, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_exact_dup"),
            davg(F.col("lm_score").cast("double"), "mean_lm_score"),
        )
    )


# --- approximate profiling (the actual 100 TB path) -------------------


@register(
    "profile_approx_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           TRUE AS hll_sources_ok,
           TRUE AS p50_in_bounds,
           TRUE AS p90_in_bounds
    FROM documents
    GROUP BY lang
    """,
    doc="Approximate corpus profile as a BOUND CHECK: per language, "
    "exact doc/source counts plus booleans asserting the HLL distinct "
    "count and approx percentiles landed inside their documented error "
    "bounds. The oracle pins the exact columns and expects every bound "
    "to hold (literal TRUE) — a drifting sketch turns the row red "
    "(extension; replaces the former rows-only registration).",
)
def profile_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language approx-profile sketches, verified against bounds.

    ``approx_count_distinct`` (HyperLogLog++) and
    ``percentile_approx`` (t-digest style) both partial-aggregate
    map-side into fixed-size sketch buffers and merge on the reduce
    side — no per-group sort, no exact-distinct double exchange;
    memory is O(sketch) per group regardless of corpus size. That is
    the trade the exact profiling twins cannot make, and why they flip
    to these forms at 100 TB.

    The exact companions computed here exist to VERIFY the sketches
    (rsd 0.05 for HLL; rank error <= max(1, N/1000) for the
    percentiles, checked against generous exact-percentile windows) —
    at production scale you would emit only the sketch columns and
    drop the exact ones.
    """
    docs = load(spark, sf_dir, "documents")
    nt = F.size(tokens(F.col("text")))
    agg = (
        docs.select("lang", "source", nt.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.approx_count_distinct("source").alias("_hll_src"),
            F.percentile_approx("n_tokens", 0.5, 1000).alias("_p50a"),
            F.percentile_approx("n_tokens", 0.9, 1000).alias("_p90a"),
            F.expr("percentile(n_tokens, 0.40)").alias("_p40"),
            F.expr("percentile(n_tokens, 0.60)").alias("_p60"),
            F.expr("percentile(n_tokens, 0.85)").alias("_p85"),
            F.expr("percentile(n_tokens, 0.95)").alias("_p95"),
        )
    )
    hll_err = F.abs(F.col("_hll_src") - F.col("n_sources"))
    hll_tol = F.greatest(F.lit(1.0), F.col("n_sources") * F.lit(0.05))
    return agg.select(
        "lang",
        "n_docs",
        "n_sources",
        (hll_err <= hll_tol).alias("hll_sources_ok"),
        F.col("_p50a")
        .between(F.col("_p40") - 1, F.col("_p60") + 1)
        .alias("p50_in_bounds"),
        F.col("_p90a")
        .between(F.col("_p85") - 1, F.col("_p95") + 1)
        .alias("p90_in_bounds"),
    )


# --- temperature-based source mixing ---------------------------------

_MIX_ALPHA = 0.7  # exponent alpha < 1 flattens: rare groups upsample
_MIX_KEEP = 0.5  # overall corpus keep fraction
_MIX_SEED = 29


@register(
    "temperature_mix_sources",
    f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    weighted AS (
      SELECT lang, n, ROUND(pow(n, {_MIX_ALPHA!r}), 6) AS w
      FROM counts
    ),
    tot AS (
      SELECT CAST(SUM(CAST(w AS DECIMAL(28,10))) AS DOUBLE) AS tw,
             SUM(n) AS tn
      FROM weighted
    ),
    rates AS (
      SELECT w.lang, w.n,
             ROUND(least(1.0, ({_MIX_KEEP} * tot.tn) * w.w
                              / (tot.tw * w.n)), 6) AS rate
      FROM weighted w CROSS JOIN tot
    ),
    kept AS (
      SELECT d.lang, COUNT(*) AS n_kept
      FROM documents d JOIN rates r ON r.lang = d.lang
      WHERE CAST('0x' || substr(md5('{_MIX_SEED}:' ||
                 CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
            / POW(2, 60) < r.rate
      GROUP BY d.lang
    )
    SELECT r.lang, r.n AS n_docs, r.rate,
           COALESCE(k.n_kept, 0) AS n_kept
    FROM rates r LEFT JOIN kept k ON k.lang = r.lang
    """,
    doc=f"Temperature-based mixing (alpha={_MIX_ALPHA}): keep rates "
    "proportional to n^alpha / n, so with alpha < 1 rare languages "
    "upsample relative to their share (XLM/mBERT-style data-recipe "
    "mixing), applied as a hash-deterministic filter (extension).",
)
def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep rates under temperature reweighting + achieved
    counts.

    With weights w_i = n_i^alpha (alpha < 1), a group's keep rate is
    K * N * w_i / (W * n_i) — decreasing in n_i — so rare groups keep
    a larger fraction: the distribution flattens toward uniform as
    alpha -> 0 and stays proportional at alpha = 1.

    Scale shape: the recipe math runs on a groups-sized aggregate
    (broadcast everywhere); the corpus-side work is one row-local
    hash filter plus a keyed count — deterministic under retries,
    unlike ``sample()``. Weights are ROUNDED before the exact-decimal
    total so pow() ulp differences between engines cannot reach the
    rates.
    """
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    weighted = counts.select(
        "lang",
        "n",
        F.round(F.pow("n", F.lit(_MIX_ALPHA)), 6).alias("w"),
    )
    tot = weighted.agg(
        F.sum(F.col("w").cast("decimal(28,10)")).cast("double").alias("tw"),
        F.sum("n").alias("tn"),
    )
    rates = weighted.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.round(
            F.least(
                F.lit(1.0),
                (F.lit(_MIX_KEEP) * F.col("tn"))
                * F.col("w")
                / (F.col("tw") * F.col("n")),
            ),
            6,
        ).alias("rate"),
    )
    u = _uniform(F.col("doc_id").cast("string"), _MIX_SEED)
    kept = (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .where(u < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            "rate",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


# --- deterministic train/holdout split -------------------------------

_SPLIT_SEED = 37
_TEST_FRAC = 0.05
_VAL_FRAC = 0.05


@register(
    "split_train_holdout",
    f"""
    WITH u AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5('{_SPLIT_SEED}:' ||
                  CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               / POW(2, 60) AS u
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN u < {_TEST_FRAC} THEN 'test'
                WHEN u < {_TEST_FRAC + _VAL_FRAC} THEN 'validation'
                ELSE 'train' END AS split,
           ROUND(u, 6) AS u
    FROM u
    """,
    doc="Deterministic train/validation/test assignment via a "
    "content-hash uniform (extension; the reproducible holdout split "
    "every training pipeline needs — stable under re-runs, retries, "
    "and corpus growth, unlike randomSplit).",
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket split: u = md5-uniform(doc_id); test < 5% <=
    validation < 10% <= train.

    Scale shape: row-local, shuffle-free, no RNG state. Unlike
    ``randomSplit`` (per-task-attempt redraws => docs can land in TWO
    splits under speculation/retries) the assignment is a pure
    function of the id, so the split is stable across engines, runs,
    and incremental corpus growth — the property that prevents
    train/test leakage at 100 TB where re-runs are routine. The
    boundary constants are data-independent, so Catalyst folds them
    and the projection pushes to the scan.
    """
    docs = load(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id").cast("string"), _SPLIT_SEED)
    split = (
        F.when(u < _TEST_FRAC, F.lit("test"))
        .when(u < _TEST_FRAC + _VAL_FRAC, F.lit("validation"))
        .otherwise(F.lit("train"))
    )
    return docs.select(
        "doc_id",
        "lang",
        split.alias("split"),
        F.round(u, 6).alias("u"),
    )


# --- overlapping context-window chunking ------------------------------

_CHUNK_TOKENS = 128  # context-window size
_CHUNK_STRIDE = 96  # start-to-start stride (32-token overlap)


@register(
    "chunk_documents_stride",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                          ' ') AS ts
      FROM documents
    ),
    counted AS (
      SELECT doc_id, ts, len(ts) AS nt,
             1 + (GREATEST(0, len(ts) - {_CHUNK_TOKENS})
                  + {_CHUNK_STRIDE} - 1) // {_CHUNK_STRIDE}
               AS n_chunks
      FROM tok
    ),
    exploded AS (
      SELECT doc_id, ts, nt, UNNEST(generate_series(0, n_chunks - 1))
               AS chunk_idx
      FROM counted
    )
    SELECT doc_id, chunk_idx,
           CAST(len(list_slice(ts, chunk_idx * {_CHUNK_STRIDE} + 1,
                 chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}))
             AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(ts, chunk_idx * {_CHUNK_STRIDE} + 1,
                   chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}), ' '))
             AS chunk_md5
    FROM exploded
    """,
    doc=f"Overlapping context-window chunking: {_CHUNK_TOKENS}-token "
    f"windows at stride {_CHUNK_STRIDE} (last window short), each "
    "chunk fingerprinted — the doc->training-sample expansion step "
    "before tokenization/packing (extension).",
)
def chunk_documents_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode each document into overlapping token windows.

    Row-local end to end: split once, arithmetic chunk count,
    posexplode + slice — no shuffle, no window, linear in corpus
    size; the natural mapInPandas-free shape for 100 TB (each input
    split maps independently to ~len/stride output rows).

    Chunk-count rule: chunks start every ``stride`` tokens while any
    token remains, i.e. ``1 + ceil(max(0, nt - chunk) / stride)``
    windows; the final window may be shorter than ``chunk`` but the
    union of windows covers every token exactly.
    """
    docs = load(spark, sf_dir, "documents")
    ts = F.split(normalize_ws(F.col("text")), " ")
    nt = F.size(ts)
    # integer ceil: 1 + floor((max(0, nt-C) + S-1) / S)
    n_chunks = 1 + F.floor(
        (F.greatest(F.lit(0), nt - _CHUNK_TOKENS) + (_CHUNK_STRIDE - 1))
        / _CHUNK_STRIDE
    ).cast("bigint")
    base = docs.select(
        "doc_id", ts.alias("ts"), n_chunks.alias("n_chunks")
    )
    exploded = base.select(
        "doc_id",
        "ts",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("ts"),
        (F.col("chunk_idx") * _CHUNK_STRIDE + 1).cast("int"),
        _CHUNK_TOKENS,
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# --- largest-remainder proportional allocation sampling --------------

_ALLOC_BUDGET = 37  # deliberately not divisible: exercises remainders
_ALLOC_SEED = 23


@register(
    "proportional_allocation_sample",
    f"""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot_all FROM c),
    alloc0 AS (
      SELECT lang, cnt,
             CAST(({_ALLOC_BUDGET} * cnt) // tot_all AS BIGINT) AS base,
             CAST(({_ALLOC_BUDGET} * cnt) % tot_all AS BIGINT) AS rem
      FROM c, tot
    ),
    lo AS (SELECT CAST({_ALLOC_BUDGET} - SUM(base) AS BIGINT) AS leftover
           FROM alloc0),
    ranked AS (
      SELECT lang, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk
      FROM alloc0
    ),
    quota AS (
      SELECT lang,
             CAST(base + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END
                  AS BIGINT) AS quota
      FROM ranked, lo
    ),
    picked AS (
      SELECT d.doc_id, d.lang, q.quota,
             ROW_NUMBER() OVER (
               PARTITION BY d.lang
               ORDER BY md5('{_ALLOC_SEED}:' || CAST(d.doc_id AS VARCHAR)),
                        d.doc_id) AS pick_rank
      FROM documents d JOIN quota q USING (lang)
    )
    SELECT doc_id, lang, quota, CAST(pick_rank AS BIGINT) AS pick_rank
    FROM picked WHERE pick_rank <= quota
    ORDER BY lang, pick_rank
    """,
    doc=f"Largest-remainder (Hamilton) allocation of a fixed sample "
    f"budget ({_ALLOC_BUDGET} docs) across language strata "
    "proportional to their counts — floor quotas, then +1 to the "
    "largest remainders; per-stratum picks are content-hash ordered "
    "(reproducible, retry-stable). Exact-integer arithmetic "
    "throughout (extension).",
)
def proportional_allocation_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly _ALLOC_BUDGET docs, allocated across langs by the
    Hamilton method, picked deterministically per stratum.

    Scale shape: the allocation runs entirely on the stratum-count
    frame (one tiny aggregate + two broadcast scalar joins —
    integer-only arithmetic, so both engines agree bit-for-bit).
    The pick is a per-stratum ROW_NUMBER over a content-hash order:
    fine at bench strata counts, but a global per-stratum sort is
    the bottleneck when strata hold billions of rows — at that
    scale, replace rank-below-quota with a hash-threshold filter
    (keep iff u(doc) < quota/cnt, the ``stratified_sample`` shape)
    and accept +-O(sqrt(n)) quota error, or pre-aggregate per-shard
    counts and allocate shard sub-quotas (two-level Hamilton).
    """
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("tot_all"))
    alloc0 = c.join(F.broadcast(tot)).select(
        "lang",
        "cnt",
        F.expr(f"CAST(({_ALLOC_BUDGET} * cnt) div tot_all AS BIGINT)")
        .alias("base"),
        F.expr(f"CAST(({_ALLOC_BUDGET} * cnt) % tot_all AS BIGINT)")
        .alias("rem"),
    )
    lo = alloc0.agg(
        (F.lit(_ALLOC_BUDGET) - F.sum("base")).cast("long").alias("leftover")
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("lang"))
    )
    quota = (
        alloc0.select("lang", "base", "rem")
        .withColumn("rk", rk)
        .join(F.broadcast(lo))
        .select(
            "lang",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )
    key = F.md5(
        F.concat(
            F.lit(f"{_ALLOC_SEED}:"), F.col("doc_id").cast("string")
        )
    )
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    return (
        docs.join(F.broadcast(quota), "lang")
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= F.col("quota"))
        .select("doc_id", "lang", "quota", "pick_rank")
        .orderBy("lang", "pick_rank")
    )
