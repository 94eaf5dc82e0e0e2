"""Near-dedup queries: MinHash-LSH pairs, exact-Jaccard pairs, SimHash
fingerprints, incremental batch-vs-corpus matching, and exact
duplicate-substring spans.

The fixtures' ``documents`` table has no near-duplicates, so each
query plants its own deterministic perturbations (suffix twins with
id offset +1000000, token-reversed decoys, shared boilerplate
prefixes): the duplicates the detectors must recover are known by
construction, and the DuckDB oracle reproduces the whole pipeline —
portable md5-based hashes make the signatures identical across
engines (see ``operators/near_dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.near_dedup import (
    MERSENNE_P,
    minhash_incremental_matches,
    minhash_near_dup_pairs,
    minhash_params,
    ngram_jaccard_pairs,
    shingles,
    simhash_from_hashes,
)
from .registry import davg, register, sql_davg

K, BANDS, ROWS = 12, 4, 3
SUFFIX = " fim do documento"
ID_OFFSET = 1_000_000


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    orig = docs.select(F.col("doc_id"), norm.alias("text"))
    pert = docs.select(
        (F.col("doc_id") + ID_OFFSET).alias("doc_id"),
        F.concat(norm, F.lit(SUFFIX)).alias("text"),
    )
    return orig.unionByName(pert)


def _sql_hash(seed: int, expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{seed}:' || {expr}), 1, 15) AS BIGINT)"
    )


def minhash_band_ctes() -> str:
    """CTE chain ``tok .. bands`` replaying shingling, signatures and
    LSH band keys in DuckDB over an upstream ``corpus(id, t)`` CTE.
    Composed by :func:`minhash_pairs_ctes` (self-join pairs) and the
    incremental-match oracle (cross-side join)."""
    # universal-hash signatures over one base-hash array (mirrors
    # operators/near_dedup.py minhash_signature exactly)
    sig_cols = ",\n           ".join(
        f"list_min(list_transform(hh, h -> ({a} * h + {b}) % {MERSENNE_P}))"
        f" AS h{k}"
        for k, (a, b) in enumerate(minhash_params(K))
    )
    band_selects = "\n      UNION ALL\n".join(
        "      SELECT id, {b} AS band, md5(concat_ws(',', {cols})) AS bkey"
        " FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(h{b * ROWS + r} AS VARCHAR)" for r in range(ROWS)
            ),
        )
        for b in range(BANDS)
    )
    return f"""tok AS (SELECT id, string_split(t, ' ') AS ts FROM corpus),
    sh AS (
      SELECT id, list_distinct(list_transform(
               generate_series(1, len(ts) - 2),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sg
      FROM tok WHERE len(ts) >= 3
    ),
    hashed AS (
      SELECT id,
             list_transform(sg, s -> {_sql_hash(0, 's')} % {MERSENNE_P})
               AS hh
      FROM sh
    ),
    sig AS (
      SELECT id,
           {sig_cols}
      FROM hashed
    ),
    bands AS (
{band_selects}
    )"""


def minhash_pairs_ctes(threshold: float = 0.5) -> str:
    """CTE chain ``tok .. scored`` replaying the banded-MinHash pipeline
    in DuckDB over an upstream ``corpus(id, t)`` CTE; the caller embeds
    it as ``WITH [RECURSIVE] corpus AS (...), {minhash_pairs_ctes()},
    ...`` and reads qualifying pairs from ``scored``. Shared by the
    pair query here and the cluster-resolution query in
    ``graph_queries`` so both replays stay mirror-identical.
    """
    return f"""{minhash_band_ctes()},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.id < b.id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             ROUND(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
                   / len(list_distinct(sa.sg || sb.sg)), 6) AS jaccard
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b
      WHERE ROUND(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
                  / len(list_distinct(sa.sg || sb.sg)), 6) >= {threshold}
    )"""


CORPUS_SQL = f"""corpus AS (
      SELECT doc_id AS id,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
      FROM documents
      UNION ALL
      SELECT doc_id + {ID_OFFSET},
             trim(regexp_replace(text, '\\s+', ' ', 'g')) || '{SUFFIX}'
      FROM documents
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {CORPUS_SQL},
    {minhash_pairs_ctes(0.5)}
    SELECT id_a, id_b, jaccard FROM scored
    """


@register(
    "near_dedup_minhash",
    _minhash_oracle(),
    doc="Banded MinHash-LSH near-dedup: shingle -> 12-hash signature "
    "-> 4x3 bands -> candidate join -> exact-Jaccard verify "
    "(extension; scale path for fuzzy dedup).",
)
def near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return minhash_near_dup_pairs(
        corpus,
        text_col="text",
        id_col="doc_id",
        num_hashes=K,
        bands=BANDS,
        rows=ROWS,
        threshold=0.5,
    )


_JACCARD_T = 0.8


def _ngram_jaccard_oracle() -> str:
    # Brute force with the (lossless) length filter: prefix filtering
    # returns EXACTLY the pairs with J >= t, so all-pairs is a valid
    # oracle; t*|B| <= |A| <= |B|/t prunes the quadratic scan.
    return f"""
    WITH corpus AS (
      SELECT doc_id AS id,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
      FROM documents
      UNION ALL
      SELECT doc_id + {ID_OFFSET},
             trim(regexp_replace(text, '\\s+', ' ', 'g')) || '{SUFFIX}'
      FROM documents
    ),
    tok AS (SELECT id, string_split(t, ' ') AS ts FROM corpus),
    sh AS (
      SELECT id, list_distinct(list_transform(
               generate_series(1, len(ts) - 2),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sg
      FROM tok WHERE len(ts) >= 3
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             ROUND(CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
                   / len(list_distinct(a.sg || b.sg)), 6) AS jaccard
      FROM sh a JOIN sh b
        ON a.id < b.id
       AND len(a.sg) >= {_JACCARD_T} * len(b.sg)
       AND len(b.sg) >= {_JACCARD_T} * len(a.sg)
    )
    SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= {_JACCARD_T}
    """


@register(
    "near_dedup_ngram_jaccard",
    _ngram_jaccard_oracle(),
    doc="Exact all-pairs word-trigram Jaccard >= 0.8 via LOSSLESS "
    "prefix filtering (AllPairs/PPJoin): rarest-first global token "
    "order, inverted-index join on each document's short prefix, "
    "exact verify — deterministic recall, unlike MinHash "
    "(extension; completes the dedup suite).",
)
def near_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _corpus(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        ngram=3,
        threshold=_JACCARD_T,
    )


def _recall_eval_oracle() -> str:
    # Truth reuses the minhash chain's `sh` CTE (same corpus, same
    # word-trigram shingle space) with the exact PPJoin arm's lossless
    # length filter + round-6 Jaccard convention, so the two arms are
    # compared over IDENTICAL similarity definitions.
    return f"""
    WITH {CORPUS_SQL},
    {minhash_pairs_ctes(0.5)},
    truth AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sh a JOIN sh b
        ON a.id < b.id
       AND len(a.sg) >= {_JACCARD_T} * len(b.sg)
       AND len(b.sg) >= {_JACCARD_T} * len(a.sg)
      WHERE ROUND(CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
                  / len(list_distinct(a.sg || b.sg)), 6) >= {_JACCARD_T}
    ),
    hits AS (
      SELECT t.id_a FROM truth t
      JOIN scored s ON s.id_a = t.id_a AND s.id_b = t.id_b
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_true,
           (SELECT COUNT(*) FROM scored) AS n_lsh_pairs,
           (SELECT COUNT(*) FROM hits) AS n_hits,
           (SELECT COUNT(*) FROM hits) * 1000000
             // GREATEST((SELECT COUNT(*) FROM truth), 1) AS recall_ppm
    """


@register(
    "near_dedup_recall_eval",
    _recall_eval_oracle(),
    doc="Dedup quality harness (r9 verdict ask): candidate-stage "
    f"recall of banded MinHash-LSH against the exact PPJoin trigram-"
    f"Jaccard arm at J >= {_JACCARD_T} on the planted-twin corpus. "
    "Both arms share one shingle space, so every true pair the LSH "
    "bands surface also passes the exact verify — recall_ppm isolates "
    "band misses. One summary row; integer ppm (never round a ratio).",
)
def near_dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the probabilistic dedup arm vs the exact one.

    Scale shape: the expensive side is the exact PPJoin arm — which a
    100 TB deployment runs on a SAMPLE to score the LSH configuration
    before the full probabilistic pass (this harness IS that scoring
    job). The hit join is pair-keyed (two longs), counts are map-side
    partial aggregates, and the three 1-row counts meet on broadcast
    cross joins — nothing wide ever reaches the driver.
    Mirrors reference test strategy of checking derived outputs
    against independently-computed truth (SURVEY.md section 5).
    """
    # Both arms consume the SAME corpus/shingle space (the oracle's
    # shared `sh` CTE); pay the shingle+md5 pass ONCE via a shared
    # eager-checkpointed signature frame instead of once per arm
    # (r14 optimization: the two query functions each re-shingled the
    # 2x corpus — ~3s of duplicated scan-side hashing at sf0.1).
    # Results are identical by construction: the PPJoin arm reads the
    # (id, sg) projection, the LSH arm the (id, sg, hh) frame, both
    # exactly what the standalone queries derive from the same text.
    from ..operators.near_dedup import corpus_signatures

    sigs = corpus_signatures(_corpus(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    # Each arm feeds TWO consumers (its own count + the hit join)
    # whose different column pruning breaks canonical equality — the
    # executed r15 plan showed ZERO ReusedExchange and both arm
    # pipelines running twice (40 ExistingRDD scans, 28 exchanges).
    # Checkpoint the tiny (id_a, id_b) pair lists eagerly so each arm
    # executes once; unlike the association_rules negative result the
    # reuse here is demonstrably absent and the materialized frames
    # are pair lists, not corpus-sized.
    truth = (
        ngram_jaccard_pairs(None, ngram=3, threshold=_JACCARD_T, base=sigs)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    lsh = (
        minhash_near_dup_pairs(
            None,
            num_hashes=K,
            bands=BANDS,
            rows=ROWS,
            threshold=0.5,
            signatures=sigs,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    hits = truth.join(lsh, ["id_a", "id_b"], "left_semi")

    t = truth.agg(F.count(F.lit(1)).alias("n_true"))
    l = lsh.agg(F.count(F.lit(1)).alias("n_lsh_pairs"))
    h = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        t.crossJoin(F.broadcast(l))
        .crossJoin(F.broadcast(h))
        .select(
            "n_true",
            "n_lsh_pairs",
            "n_hits",
            F.expr(
                "n_hits * 1000000 DIV greatest(n_true, 1)"
            ).alias("recall_ppm"),
        )
    )


def _simhash_oracle(bits: int = 16) -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hh, h -> (h & {1 << i}) != 0)) "
        f"> len(hh) THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
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
    hashed AS (
      SELECT doc_id, list_transform(sg, s -> {_sql_hash(0, 's')}) AS hh
      FROM sh
    )
    SELECT doc_id, CAST({terms} AS BIGINT) AS fp
    FROM hashed
    """


@register(
    "doc_simhash",
    _simhash_oracle(),
    doc="SimHash fingerprint (16-bit) over trigram shingles — "
    "Hamming-near fingerprints are near-dup candidates (extension).",
)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.near_dedup import portable_hash64

    docs = load(spark, sf_dir, "documents")
    sg = shingles(F.col("text"), 3)
    hashed = (
        docs.select("doc_id", sg.alias("sg"))
        .where(F.size("sg") >= 1)
        # one md5 pass, materialized as an attribute (see
        # simhash_from_hashes docstring)
        .select(
            "doc_id",
            F.transform("sg", lambda s: portable_hash64(s, 0)).alias("hh"),
        )
    )
    return hashed.select(
        "doc_id", simhash_from_hashes(F.col("hh"), 16).alias("fp")
    )


# --- incremental dedup: new batch vs existing corpus ------------------

# Every 5th "new" doc is token-REVERSED instead of suffixed: its
# trigram shingle set shares ~nothing with the original, so it must
# NOT match (it is the genuinely-new content the batch should accept);
# the rest are suffix twins that must match their original.


def _incremental_oracle() -> str:
    norm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""
    WITH corpus AS (
      SELECT doc_id AS id, {norm} AS t FROM documents
      UNION ALL
      SELECT doc_id + {ID_OFFSET},
             CASE WHEN doc_id % 5 = 0
                  THEN array_to_string(
                         list_reverse(string_split({norm}, ' ')), ' ')
                  ELSE {norm} || '{SUFFIX}' END
      FROM documents
    ),
    {minhash_band_ctes()},
    cand AS (
      SELECT DISTINCT a.id AS matched_id, b.id AS new_id
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.id < {ID_OFFSET} AND b.id >= {ID_OFFSET}
    ),
    scored AS (
      SELECT c.new_id, c.matched_id,
             ROUND(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
                   / len(list_distinct(sa.sg || sb.sg)), 6) AS jaccard
      FROM cand c
      JOIN sh sa ON sa.id = c.matched_id
      JOIN sh sb ON sb.id = c.new_id
      WHERE ROUND(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
                  / len(list_distinct(sa.sg || sb.sg)), 6) >= 0.5
    ),
    ranked AS (
      SELECT new_id, matched_id, jaccard,
             ROW_NUMBER() OVER (PARTITION BY new_id
                                ORDER BY jaccard DESC, matched_id) AS rn
      FROM scored
    )
    SELECT new_id, matched_id, jaccard FROM ranked WHERE rn = 1
    """


@register(
    "near_dedup_incremental",
    _incremental_oracle(),
    doc="Incremental dedup: a new crawl batch LSH-matched against the "
    "existing corpus only (old x new within buckets, never the full "
    "self-join); best existing match per new doc, unmatched docs are "
    "the ones to accept (extension; the steady-state ingestion flow).",
)
def near_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    old = docs.select("doc_id", norm.alias("text"))
    ts = F.split(norm, " ")
    new = docs.select(
        (F.col("doc_id") + ID_OFFSET).alias("doc_id"),
        F.when(
            F.col("doc_id") % 5 == 0, F.array_join(F.reverse(ts), " ")
        )
        .otherwise(F.concat(norm, F.lit(SUFFIX)))
        .alias("text"),
    )
    return minhash_incremental_matches(
        old,
        new,
        text_col="text",
        id_col="doc_id",
        num_hashes=K,
        bands=BANDS,
        rows=ROWS,
        threshold=0.5,
    )


# --- exact duplicate-substring spans (Lee et al. 2022) ----------------

# "Deduplicating Training Data Makes Language Models Better" removes
# exact duplicate token spans >= 50 tokens found via a suffix array;
# the distributed equivalent detects spans through rolling L-gram
# matches: a maximal run of consecutive positions whose L-grams each
# occur more than once in the corpus IS a duplicated span (any
# duplicated span of length >= L produces exactly such a run). L=10
# here (fixture docs are short; the machinery is L-agnostic).
_SPAN_L = 10
# Fixture adapter: every 4th doc is prefixed with a shared 24-token
# boilerplate clause, the classic licence-header duplication case.
_BOILER = (
    "clausula padrao de licenca aberta numero um dois tres quatro "
    "cinco seis sete oito nove dez onze doze treze catorze quinze "
    "dezesseis dezessete dezoito"
)


def _substring_span_oracle() -> str:
    norm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""
    WITH corpus AS (
      SELECT doc_id AS id,
             CASE WHEN doc_id % 4 = 0
                  THEN '{_BOILER} ' || {norm}
                  ELSE {norm} END AS t
      FROM documents
    ),
    tok AS (SELECT id, string_split(t, ' ') AS ts FROM corpus),
    grams AS (
      SELECT id, i AS gpos,
             md5(array_to_string(ts[i : i + {_SPAN_L} - 1], ' ')) AS gh
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(ts) - {_SPAN_L} + 1)) AS i
      )
      WHERE len(ts) >= {_SPAN_L}
    ),
    dupg AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) > 1),
    covered AS (
      SELECT DISTINCT g.id, u.tokpos
      FROM grams g JOIN dupg USING (gh),
           LATERAL (
             SELECT unnest(generate_series(g.gpos,
                                           g.gpos + {_SPAN_L} - 1)) AS tokpos
           ) u
    ),
    runs AS (
      SELECT id, tokpos,
             tokpos - ROW_NUMBER() OVER (PARTITION BY id
                                         ORDER BY tokpos) AS run
      FROM covered
    ),
    spans AS (
      SELECT id, run, COUNT(*) AS span_len
      FROM runs GROUP BY id, run
    ),
    per_doc AS (
      SELECT id, COUNT(*) AS n_dup_spans,
             CAST(SUM(span_len) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY id
    )
    SELECT k.id AS doc_id, len(k.ts) AS n_tokens,
           COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           ROUND(COALESCE(p.dup_tokens, 0) / CAST(len(k.ts) AS DOUBLE), 6)
             AS dup_frac
    FROM tok k LEFT JOIN per_doc p ON p.id = k.id
    """


@register(
    "dedup_substring_spans",
    _substring_span_oracle(),
    doc=f"Exact duplicate-substring spans >= {_SPAN_L} tokens via "
    "rolling L-gram matches + maximal-run merging (extension; the "
    "distributed shape of Lee et al. 2022 suffix-array span dedup).",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span count, token coverage and fraction.

    Scale shape: grams shuffle as 16-byte md5 keys (never the L-token
    strings); the duplicate-gram set joins back on that key; coverage
    positions and the run-merging window stay partitioned by doc_id.
    The L-fold position explode is the known cost — Lee et al.'s
    suffix array avoids it at the price of a global sort; the gram
    form partitions freely and needs no order, which is the better
    trade on a shuffle-rich cluster.
    """
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    t = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.lit(_BOILER + " "), norm)
    ).otherwise(norm)
    ts = F.split(t, " ")
    base = docs.select("doc_id", ts.alias("ts")).select(
        "doc_id", "ts", F.size("ts").alias("n_tokens")
    )
    from ..operators.near_dedup import shingle_grams

    grams = (
        base.where(F.col("n_tokens") >= _SPAN_L)
        .select(
            "doc_id",
            F.posexplode(shingle_grams(F.col("ts"), _SPAN_L)).alias(
                "gpos0", "g"
            ),
        )
        .select("doc_id", (F.col("gpos0") + 1).alias("gpos"), F.md5("g").alias("gh"))
    )
    dupg = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("gh")
    )
    covered = (
        grams.join(dupg, "gh")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + F.lit(_SPAN_L - 1))
            ).alias("tokpos"),
        )
        .distinct()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("tokpos")
    spans = (
        covered.withColumn("run", F.col("tokpos") - F.row_number().over(w))
        .groupBy("doc_id", "run")
        .agg(F.count(F.lit(1)).alias("span_len"))
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("span_len").alias("dup_tokens"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


# --- cross-source duplication overlap --------------------------------


def _dup_overlap_oracle() -> str:
    return f"""
    WITH {CORPUS_SQL},
    {minhash_pairs_ctes(0.5)},
    srcmap AS (
      SELECT doc_id AS id, source FROM documents
      UNION ALL
      SELECT doc_id + {ID_OFFSET}, source FROM documents
    )
    SELECT LEAST(sa.source, sb.source) AS source_a,
           GREATEST(sa.source, sb.source) AS source_b,
           COUNT(*) AS n_pairs,
           {sql_davg('jaccard', 'avg_jaccard')}
    FROM scored
    JOIN srcmap sa ON sa.id = scored.id_a
    JOIN srcmap sb ON sb.id = scored.id_b
    GROUP BY 1, 2
    """


@register(
    "dup_overlap_by_source",
    _dup_overlap_oracle(),
    doc="Cross-source duplication matrix: MinHash near-dup pairs "
    "rolled up by unordered (source, source) — the provenance view "
    "that tells a curation team WHICH feeds re-crawl each other "
    "(extension).",
)
def dup_overlap_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the heavy lifting is the shared banded-LSH pair
    pipeline (vectors/shingles never in the candidate shuffle — see
    operators/near_dedup.py); this rollup adds two id-equi joins
    against a 2-column (id, source) dim — broadcast when small, plain
    hash join at scale — and a (source x source)-key hash aggregate
    whose key space is tiny (sources^2), so the map-side partial
    aggregation collapses it before the exchange."""
    corpus = _corpus(spark, sf_dir)
    pairs = minhash_near_dup_pairs(
        corpus,
        text_col="text",
        id_col="doc_id",
        num_hashes=K,
        bands=BANDS,
        rows=ROWS,
        threshold=0.5,
    )
    docs = load(spark, sf_dir, "documents")
    srcmap = docs.select(F.col("doc_id").alias("id"), "source").unionByName(
        docs.select((F.col("doc_id") + ID_OFFSET).alias("id"), "source")
    )
    j = pairs.join(
        srcmap.select(F.col("id").alias("id_a"), F.col("source").alias("sa")),
        "id_a",
    ).join(
        srcmap.select(F.col("id").alias("id_b"), F.col("source").alias("sb")),
        "id_b",
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            davg(F.col("jaccard"), "avg_jaccard"),
        )
    )


# --- streaming ingest replayed as two micro-batches -------------------


def _ingest_accept_oracle() -> str:
    """Replays the two-micro-batch accept loop of
    ``streaming/ingest.accept_batch``: batch 1 = even doc_ids
    (intra-batch greedy first-wins dedup), its accepted signatures
    become the store; batch 2 = odd doc_ids (intra-batch dedup, then
    cross-corpus rejection against the store)."""
    jac = (
        "ROUND(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)"
        " / len(list_distinct(sa.sg || sb.sg)), 6) >= 0.5"
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id AS id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    {minhash_band_ctes()},
    rej1 AS (
      SELECT DISTINCT c.id_b AS id FROM (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.id < b.id AND a.id % 2 = 0 AND b.id % 2 = 0
      ) c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b
      WHERE {jac}
    ),
    acc1 AS (
      SELECT id FROM corpus
      WHERE id % 2 = 0 AND id NOT IN (SELECT id FROM rej1)
    ),
    rej2 AS (
      SELECT DISTINCT c.id_b AS id FROM (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.id < b.id AND a.id % 2 = 1 AND b.id % 2 = 1
      ) c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b
      WHERE {jac}
    ),
    surv2 AS (
      SELECT id FROM corpus
      WHERE id % 2 = 1 AND id NOT IN (SELECT id FROM rej2)
    ),
    rejx AS (
      SELECT DISTINCT c.id_b AS id FROM (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        JOIN acc1 ON acc1.id = a.id
        JOIN surv2 s2 ON s2.id = b.id
      ) c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b
      WHERE {jac}
    )
    SELECT id AS doc_id, 1 AS batch FROM acc1
    UNION ALL
    SELECT id AS doc_id, 2 AS batch FROM surv2
    WHERE id NOT IN (SELECT id FROM rejx)
    """


@register(
    "streaming_ingest_accept",
    _ingest_accept_oracle(),
    doc="Streaming ingest loop replayed as two deterministic "
    "micro-batches (even doc_ids then odd): batch-level near-dedup, "
    "accepted signatures persisted as the store, second batch "
    "deduped against the store — the hard-signal twin of "
    "streaming/ingest.py's foreachBatch merge (its exact batch "
    "logic, accept_batch, is called directly).",
)
def streaming_ingest_accept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final accepted-corpus membership of the two-batch ingest.

    Mirrors ``ingest_dedup_available_now``'s per-batch merge exactly:
    each batch is pinned, shingle+hashed ONCE (corpus_signatures,
    eagerly checkpointed — the frame feeds the intra-batch self-join,
    the cross-corpus match, and the store), and the store holds only
    accepted docs' (id, sg, hh). Scale shape is the store's: banding
    is linear, the only joins are within (band, bkey) buckets, and no
    text column ever enters a shuffle.
    """
    from ..streaming.ingest import accept_batch
    from ..operators.near_dedup import corpus_signatures

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    b1 = docs.where(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
    b2 = docs.where(F.col("doc_id") % 2 == 1).localCheckpoint(eager=True)
    sigs1 = corpus_signatures(b1).localCheckpoint(eager=True)
    acc1 = accept_batch(b1, None, batch_signatures=sigs1).localCheckpoint(
        eager=True
    )
    store = sigs1.join(
        acc1.select(F.col("doc_id").alias("id")), "id", "left_semi"
    ).localCheckpoint(eager=True)
    sigs2 = corpus_signatures(b2).localCheckpoint(eager=True)
    acc2 = accept_batch(b2, store, batch_signatures=sigs2)
    return acc1.select("doc_id", F.lit(1).alias("batch")).unionByName(
        acc2.select("doc_id", F.lit(2).alias("batch"))
    )
