"""Text-analysis queries over ``documents`` (LLM-pipeline extensions).

Language-ID, quality scoring, token counting, fingerprinting — each a
pure Column-expression plan (JVM-side) with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import (
    EN_STOPWORDS,
    PT_STOPWORDS,
    fingerprint,
    normalize_ws,
    punct_ratio,
    stopword_hits,
    token_count,
    tokens,
)
from .registry import register


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "doc_token_count",
    """
    SELECT doc_id,
           len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
             AS n_tokens,
           length(text) AS len_chars
    FROM documents
    """,
    doc="Token counting (whitespace tokenizer) over documents.",
)
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("len_chars"),
    )


#: BPE-ish pre-tokenizer: letter runs, SINGLE digits (GPT-style digit
#: splitting), single punctuation marks. Deliberately regex-dialect
#: neutral (no lookaround/classes that differ between Java regex and
#: DuckDB's RE2).
_BPE_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


@register(
    "doc_bpe_token_count",
    f"""
    SELECT doc_id,
           len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
             AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           ROUND(CAST(length(text) AS DOUBLE)
                 / len(regexp_extract_all(text, '{_BPE_RE}')), 6)
             AS chars_per_token
    FROM documents
    WHERE len(regexp_extract_all(text, '{_BPE_RE}')) > 0
    """,
    doc="BPE-ish token counting: regex pre-tokenizer (letter runs, "
    "single digits, punctuation) vs whitespace tokens; chars/token "
    "is the compression-ratio proxy (extension).",
)
def doc_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: row-local projection, zero shuffles; the regex
    runs once per row inside codegen (both counts share the
    subexpression)."""
    docs = load(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
    return (
        docs.where(bpe > 0)
        .select(
            "doc_id",
            token_count("text").alias("n_ws_tokens"),
            bpe.alias("n_bpe_tokens"),
            F.round(F.length("text").cast("double") / bpe, 6).alias(
                "chars_per_token"
            ),
        )
    )


@register(
    "doc_lang_id",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    )
    SELECT doc_id, lang,
           len(list_filter(ts, t -> t IN ({_sql_list(EN_STOPWORDS)})))
             AS en_hits,
           len(list_filter(ts, t -> t IN ({_sql_list(PT_STOPWORDS)})))
             AS pt_hits,
           CASE
             WHEN len(list_filter(ts, t -> t IN ({_sql_list(EN_STOPWORDS)})))
                > len(list_filter(ts, t -> t IN ({_sql_list(PT_STOPWORDS)})))
               THEN 'en'
             WHEN len(list_filter(ts, t -> t IN ({_sql_list(PT_STOPWORDS)})))
                > len(list_filter(ts, t -> t IN ({_sql_list(EN_STOPWORDS)})))
               THEN 'pt'
             ELSE 'und'
           END AS pred_lang
    FROM tok
    """,
    doc="Language-ID heuristic: disjoint stopword votes (n-gram-free "
    "variant; extension).",
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    en = stopword_hits("text", EN_STOPWORDS)
    pt = stopword_hits("text", PT_STOPWORDS)
    return docs.select(
        "doc_id",
        "lang",
        en.alias("en_hits"),
        pt.alias("pt_hits"),
        F.when(en > pt, F.lit("en"))
        .when(pt > en, F.lit("pt"))
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
    )


@register(
    "doc_quality_score",
    """
    WITH t AS (
      SELECT doc_id,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
               AS n_tokens,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                  AS DOUBLE) / length(text) AS punct_ratio,
             length(text) AS len_chars
      FROM documents
    )
    SELECT doc_id, n_tokens, len_chars,
           ROUND(punct_ratio, 6) AS punct_ratio,
           CASE WHEN n_tokens >= 20 AND punct_ratio < 0.2
                THEN 'keep' ELSE 'drop' END AS quality_flag
    FROM t
    """,
    doc="Quality scoring: length / punctuation-ratio filters (extension).",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pr = punct_ratio("text")
    nt = token_count("text")
    return docs.select(
        "doc_id",
        nt.alias("n_tokens"),
        F.length("text").alias("len_chars"),
        F.round(pr, 6).alias("punct_ratio"),
        F.when((nt >= 20) & (pr < 0.2), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("quality_flag"),
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    doc="Document fingerprinting: md5 of canonical whitespace-normalized "
    "text (extension).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


_WINNOW_K = 3  # k-gram size (words)
_WINNOW_W = 4  # window of consecutive k-gram hashes per fingerprint


@register(
    "doc_winnow_fingerprint",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, len(ts) - {_WINNOW_K - 1}),
               i -> CAST('0x' || substr(md5('0:' || ts[i] || ' ' || ts[i+1]
                         || ' ' || ts[i+2]), 1, 15) AS BIGINT)) AS hh
      FROM tok WHERE len(ts) >= {_WINNOW_K + _WINNOW_W - 1}
    ),
    fps AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               generate_series(1, len(hh) - {_WINNOW_W - 1}),
               i -> list_min(hh[i:i+{_WINNOW_W - 1}])))) AS fp
      FROM hashed
    )
    SELECT doc_id, len(fp) AS n_fingerprints,
           md5(array_to_string(list_transform(fp, x -> CAST(x AS VARCHAR)),
               ',')) AS fp_digest
    FROM fps
    """,
    doc="Winnowing document fingerprint (Schleimer et al. 2003): "
    "min-hash of each sliding window of k-gram hashes; guarantees a "
    "shared fingerprint for any sufficiently long common substring "
    "(extension; the rolling-hash fingerprinting method).",
)
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: row-local array pipeline, zero shuffles. The
    k-gram hash array is materialized as a real column BEFORE the
    sliding-window lambda touches it — referencing an unmaterialized
    expression inside a higher-order lambda re-evaluates it per
    element (the O(n^2) trap documented on
    ``operators/near_dedup.shingles``); an attribute reference is
    evaluated once per row. Window minima cost O(n*w) with w=4."""
    from ..operators.near_dedup import portable_hash64, shingle_grams

    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    sg = shingle_grams(ts, _WINNOW_K)
    hashed = docs.where(
        F.size(ts) >= _WINNOW_K + _WINNOW_W - 1
    ).select(
        "doc_id",
        F.transform(sg, lambda g: portable_hash64(g, 0)).alias("hh"),
    )
    win_min = F.transform(
        F.sequence(F.lit(1), F.size("hh") - (_WINNOW_W - 1)),
        lambda i: F.array_min(F.slice("hh", i, _WINNOW_W)),
    )
    fps = hashed.select(
        "doc_id", F.array_sort(F.array_distinct(win_min)).alias("fp")
    )
    return fps.select(
        "doc_id",
        F.size("fp").alias("n_fingerprints"),
        F.md5(F.array_join(F.transform("fp", lambda x: x.cast("string")), ","))
        .alias("fp_digest"),
    )


@register(
    "doc_ngram_profile",
    """
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    )
    SELECT doc_id,
           len(ts) - 2 AS n_trigrams,
           len(list_distinct(list_transform(
             generate_series(1, len(ts) - 2),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
           ))) AS n_distinct_trigrams
    FROM tok
    WHERE len(ts) >= 3
    """,
    doc="Word-trigram shingle profile per document (n-gram machinery "
    "backing Jaccard/MinHash dedup).",
)
def doc_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shifted-slice zip, NOT element_at-in-lambda: the latter
    # re-evaluates the split per element (O(tokens²) per doc — see
    # operators/near_dedup.shingles)
    from ..operators.near_dedup import shingle_grams, shingles

    docs = load(spark, sf_dir, "documents")
    ts = F.split(normalize_ws(F.col("text")), " ")
    return (
        docs.where(F.size(ts) >= 3)
        .select(
            "doc_id",
            (F.size(ts) - 2).alias("n_trigrams"),
            F.size(shingles(F.col("text"), 3)).alias("n_distinct_trigrams"),
        )
    )


# --- character entropy (gibberish / compressibility signal) -----------


@register(
    "doc_char_entropy",
    """
    WITH cs AS (
      SELECT doc_id, string_split(text, '') AS cs FROM documents
    ),
    dc AS (
      SELECT doc_id, cs, len(cs) AS n,
             list_sort(list_distinct(cs)) AS dch
      FROM cs
    ),
    cnt AS (
      SELECT doc_id, n, dch,
             list_transform(dch,
               c -> len(list_filter(cs, x -> x = c))) AS cnts
      FROM dc
    )
    SELECT doc_id, n AS n_chars, len(dch) AS n_distinct_chars,
           ROUND(-list_aggregate(
             list_transform(cnts, k -> (k / CAST(n AS DOUBLE))
                                       * ln(k / CAST(n AS DOUBLE))),
             'sum'), 6) AS char_entropy
    FROM cnt
    """,
    doc="Character-level Shannon entropy per document — low entropy "
    "flags repetitive/gibberish text, a cheap compression-ratio "
    "proxy (extension; quality-filter family).",
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local char entropy: H = -sum p_c ln p_c.

    Scale shape: zero shuffles — the char histogram builds inside one
    projection (distinct chars are sorted so both engines fold the
    double sum in the same order; the alphabet is small, so the
    O(distinct x n) row-local filter scan is bounded). Each stage
    materializes its array as a real column so no lambda re-evaluates
    an upstream expression per element.
    """
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", "").alias("cs"))
    staged = base.select(
        "doc_id",
        "cs",
        F.size("cs").alias("n"),
        F.array_sort(F.array_distinct("cs")).alias("dch"),
    ).select(
        "doc_id",
        "n",
        F.size("dch").alias("n_distinct_chars"),
        F.transform(
            "dch",
            lambda c: F.size(F.filter("cs", lambda x: x == c)),
        ).alias("cnts"),
    )
    p = lambda k: k / F.col("n").cast("double")  # noqa: E731
    return staged.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        "n_distinct_chars",
        F.round(
            -F.aggregate(
                F.transform("cnts", lambda k: p(k) * F.log(p(k))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("char_entropy"),
    )


# --- feature-hashing document embeddings -----------------------------

# The hashing trick (Weinberger et al. 2009, "Feature Hashing for
# Large Scale Multitask Learning"): token t contributes sign(t) to
# dimension h(t) % D; no vocabulary, fully streaming/deterministic.
# Output is the SPARSE representation (doc, dim, weight) with weights
# L2-normalized per document — the bridge from the text tables to the
# embedding operators (ANN/dedup run on any (id, vector) frame).
_FH_DIM = 32
_FH_SEED = 91


def _fh_ctes() -> str:
    """CTE chain ``tok .. nrm`` replaying the signed hashing trick in
    DuckDB — shared by the sparse-embedding and doc-similarity
    oracles so the two replays can never diverge (mirrors the
    ``minhash_pairs_ctes`` convention in near_dedup_queries)."""
    return f"""tok AS (
      SELECT doc_id, unnest(string_split(
               trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS t
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('{_FH_SEED}:' || t), 1, 15) AS BIGINT)
               % {_FH_DIM} AS dim,
             CASE WHEN CAST('0x' || substr(md5('{_FH_SEED}:s' || t), 1, 15)
                        AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok
    ),
    sparse AS (
      SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS w
      FROM hashed GROUP BY doc_id, dim
    ),
    nrm AS (
      SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS n2
      FROM sparse GROUP BY doc_id
    )"""


@register(
    "doc_feature_hashing",
    f"""
    WITH {_fh_ctes()}
    SELECT s.doc_id, s.dim, s.w,
           ROUND(s.w / n.n2, 6) AS w_norm
    FROM sparse s JOIN nrm n ON n.doc_id = s.doc_id
    WHERE s.w <> 0
    """,
    doc=f"Feature-hashing (hashing-trick) document embeddings: signed "
    f"token hashes into {_FH_DIM} dims, sparse (doc, dim, weight) "
    "output with per-doc L2 normalization — vocabulary-free "
    "text-to-vector bridge (Weinberger et al. 2009; extension).",
)
def doc_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: explode -> (doc, dim)-key hash aggregate with
    map-side combine (at most D=32 rows per doc reach the exchange
    regardless of document length), then a per-doc norm join. Signed
    hashing keeps E[<x,y>] unbiased (the Weinberger result), so
    downstream cosine operators work unchanged on the dense form.
    Integer weights stay exact; only the final normalized weight
    rounds, so cross-engine parity holds without decimal machinery.
    """
    from ..operators.near_dedup import portable_hash64

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    )
    hashed = tok.select(
        "doc_id",
        (portable_hash64(F.col("t"), _FH_SEED) % _FH_DIM).alias("dim"),
        F.when(
            portable_hash64(F.concat(F.lit("s"), F.col("t")), _FH_SEED) % 2
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    sparse = (
        hashed.groupBy("doc_id", "dim")
        .agg(F.sum("sgn").alias("w"))
        .where(F.col("w") != 0)
    )
    nrm = sparse.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("n2")
    )
    return sparse.join(nrm, "doc_id").select(
        "doc_id",
        "dim",
        "w",
        F.round(F.col("w") / F.col("n2"), 6).alias("w_norm"),
    )


# --- document similarity over hashed embeddings ----------------------

_DOCSIM_Q = 8
_DOCSIM_K = 5


def _docsim_oracle() -> str:
    dense_terms = ", ".join(
        f"SUM(CASE WHEN dim = {d} THEN w_norm ELSE 0 END)"
        for d in range(_FH_DIM)
    )
    return f"""
    WITH {_fh_ctes()},
    wn AS (
      SELECT s.doc_id, s.dim, ROUND(s.w / n.n2, 6) AS w_norm
      FROM sparse s JOIN nrm n ON n.doc_id = s.doc_id
      WHERE s.w <> 0
    ),
    dense AS (
      SELECT doc_id, list_value({dense_terms}) AS v
      FROM wn GROUP BY doc_id
    ),
    pairs AS (
      SELECT q.doc_id AS query_id, c.doc_id AS cand_id,
             ROUND(list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
      FROM dense q JOIN dense c ON c.doc_id <> q.doc_id
      WHERE q.doc_id < {_DOCSIM_Q}
    )
    SELECT query_id, cand_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= {_DOCSIM_K}
    """


@register(
    "doc_similarity_topk",
    _docsim_oracle(),
    doc="Top-5 most similar documents per query doc over the "
    "feature-hashed embeddings — the end-to-end text-to-vector-to-"
    "similarity bridge (brute-force baseline; at corpus scale the "
    "dense frame feeds the hyperplane-LSH/PQ operators unchanged; "
    "extension).",
)
def doc_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: densification is a (doc)-key hash aggregate of 32
    conditional sums (map-side combine; at most one dense row per doc
    crosses the exchange). The pairing here is the documented O(N*Q)
    brute-force baseline with the few query vectors broadcast; the
    dense (id, v) frame is exactly the input shape of
    ann_lsh_topk/_pq plans, which are the sub-linear paths.
    """
    from pyspark.sql import Window

    from ..functions.vectors import sql_dot, sql_norm

    sparse = doc_feature_hashing(spark, sf_dir)
    dense = sparse.groupBy("doc_id").agg(
        F.array(
            *[
                F.sum(
                    F.when(F.col("dim") == d, F.col("w_norm")).otherwise(0.0)
                )
                for d in range(_FH_DIM)
            ]
        ).alias("v")
    )
    # norms hoisted once per vector and the fixed-dim expanded dot —
    # the same per-pair-cost discipline as _embedding_pair_plan; the
    # arithmetic (sqrt(dot(v,v)), left-to-right fold) is unchanged so
    # the rounded cosine stays oracle-identical. r15: both as ONE
    # parsed straight-line SQL string (codegen arithmetic, no py4j
    # Column-tree construction) — bit-identical per sql_dot's note.
    dense_n = dense.select(
        "doc_id", "v", F.expr(sql_norm("v", _FH_DIM)).alias("nv")
    )
    q = dense_n.where(F.col("doc_id") < _DOCSIM_Q).select(
        F.col("doc_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    pairs = dense_n.join(
        F.broadcast(q), F.col("doc_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("doc_id").alias("cand_id"),
        F.round(
            F.expr(sql_dot("qv", "v", _FH_DIM))
            / (F.col("nq") * F.col("nv")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _DOCSIM_K)
        .drop("rn")
    )


# --- Gopher quality-rule bundle --------------------------------------

# Rae et al. 2021 (Gopher, arXiv:2112.11446 Appendix A) rule set,
# restated over the fixture's flat word streams. Fixture adapters,
# each marked: word-count bounds are scaled to the fixture's 10-100
# word docs (the paper's 50..100k would pass/fail uniformly here);
# the stopword probe uses the two stopwords the synthetic vocabulary
# actually contains; symbol/ellipsis/bullet rules have no fixture
# signal and are covered by doc_quality_score's punctuation ratio.
_GOPHER_MIN_WORDS = 30
_GOPHER_MAX_WORDS = 90
_GOPHER_MIN_MWL = 3.0  # mean word length bounds (paper values)
_GOPHER_MAX_MWL = 10.0
_GOPHER_STOPWORDS = ("a", "the")
_GOPHER_MIN_STOP_HITS = 2
_GOPHER_MIN_ALPHA_PPM = 800_000  # >= 80% words contain a letter


@register(
    "gopher_quality_flags",
    f"""
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ts) AS BIGINT) AS n_words,
             CAST(len(list_filter(ts, w -> w IN
                    ({_sql_list(_GOPHER_STOPWORDS)}))) AS BIGINT)
               AS stop_hits,
             ROUND(CAST(list_sum(list_transform(ts, w -> length(w)))
                        AS DOUBLE) / len(ts), 6) AS mean_word_len,
             CAST(len(list_filter(ts, w ->
                    regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
               * 1000000 // len(ts) AS alpha_ppm
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_ppm,
           n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
             AS ok_words,
           mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}
             AS ok_mwl,
           stop_hits >= {_GOPHER_MIN_STOP_HITS} AS ok_stop,
           alpha_ppm >= {_GOPHER_MIN_ALPHA_PPM} AS ok_alpha,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
             AND (mean_word_len BETWEEN {_GOPHER_MIN_MWL}
                                    AND {_GOPHER_MAX_MWL})
             AND stop_hits >= {_GOPHER_MIN_STOP_HITS}
             AND alpha_ppm >= {_GOPHER_MIN_ALPHA_PPM} AS gopher_pass
    FROM m
    """,
    doc="Gopher rule-based quality filter (Rae et al. 2021 App. A): "
    "word-count bounds, mean-word-length bounds, minimum stopword "
    "hits, minimum alphabetic-word fraction, and the conjunctive "
    "keep decision, per document (extension).",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All rules as array expressions over one tokenization.

    Scale shape: zero joins, zero shuffles — one projection pass,
    entirely inside whole-stage codegen; the token array materializes
    once per row and every rule folds over it (``filter``/
    ``aggregate`` higher-order functions, no re-split). The
    alpha fraction is emitted as integer parts-per-million (the
    percent-rank lesson: never round a ratio whose denominator can
    divide the rounding scale); mean word length divides an exact
    integer sum, so scale-6 rounding is ulp-safe.
    """
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    nw = F.size("ts").cast("bigint")
    stop = F.size(
        F.filter(
            F.col("ts"), lambda w: w.isin(*_GOPHER_STOPWORDS)
        )
    ).cast("bigint")
    mwl = F.round(
        F.aggregate(
            F.col("ts"),
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.length(w),
        ).cast("double")
        / F.size("ts"),
        6,
    )
    alpha = (
        F.size(
            F.filter(F.col("ts"), lambda w: w.rlike("[a-zA-Z]"))
        ).cast("bigint")
        * 1000000
    ) / F.size("ts")
    m = base.select(
        "doc_id",
        nw.alias("n_words"),
        stop.alias("stop_hits"),
        mwl.alias("mean_word_len"),
        F.floor(alpha).cast("bigint").alias("alpha_ppm"),
    )
    ok_words = F.col("n_words").between(
        _GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS
    )
    ok_mwl = F.col("mean_word_len").between(
        _GOPHER_MIN_MWL, _GOPHER_MAX_MWL
    )
    ok_stop = F.col("stop_hits") >= _GOPHER_MIN_STOP_HITS
    ok_alpha = F.col("alpha_ppm") >= _GOPHER_MIN_ALPHA_PPM
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_hits",
        "alpha_ppm",
        ok_words.alias("ok_words"),
        ok_mwl.alias("ok_mwl"),
        ok_stop.alias("ok_stop"),
        ok_alpha.alias("ok_alpha"),
        (ok_words & ok_mwl & ok_stop & ok_alpha).alias("gopher_pass"),
    )
