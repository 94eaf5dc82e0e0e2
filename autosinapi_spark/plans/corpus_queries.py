"""Corpus-hygiene queries: line dedup, TF-IDF, PII, URLs, LM scoring.

The second tranche of LLM-pipeline curation operators (first tranche:
``curation_queries``). All pure Column expressions with full DuckDB
oracles:

- C4-style line-level dedup: lines duplicated across the corpus are
  kept only at their first occurrence (Raffel et al. 2020, C4 §2.2).
- TF-IDF top terms per document (classic salient-term extraction).
- PII detection + redaction counts (emails/phones), the scrub step
  every public-data pipeline runs before training.
- URL/domain extraction + per-domain stats (C4/CCNet provenance
  profiling).
- Unigram log-probability scoring (CCNet-style LM quality signal,
  Wenzek et al. 2020 — a full KenLM is out of scope, the unigram
  variant is the same two-pass shape).
- Deterministic corpus shuffle-sharding (hash-derived training order).
- Global top-k vocabulary head (distributed TakeOrdered).
- Chunk-level mixed-language (code-switching) detection.

Fixture adapters, each marked inline: the synthetic docs are flat
word streams, so "lines" are fixed 8-token chunks, and no document
carries real PII/URLs, so deterministic doc_id-derived emails/phones/
URLs are appended in-query (the same perturbation idiom as
``near_dedup_queries``'s twin corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..functions.text import tokens
from .registry import davg, dsum, register, sql_davg, sql_dsum

# --- C4-style line-level dedup ---------------------------------------

_LINE_TOKENS = 8  # fixture adapter: a "line" = 8 consecutive tokens


def _lines(ts: Column) -> Column:
    """Token array -> array of 8-token chunk strings (trailing chunk
    may be shorter). ``ts`` must be a materialized attribute — a
    lambda referencing a split expression re-evaluates it per element
    (the O(n²) pitfall from ``operators/near_dedup.shingles``)."""
    n_chunks = F.ceil(F.size(ts) / F.lit(float(_LINE_TOKENS))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(ts, i * _LINE_TOKENS + 1, _LINE_TOKENS), " "
        ),
    )


@register(
    "dedup_lines_c4",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    lined AS (
      SELECT doc_id,
             list_transform(
               generate_series(0,
                 CAST(ceil(len(ts) / {float(_LINE_TOKENS)}) AS INT) - 1),
               i -> array_to_string(
                 ts[i * {_LINE_TOKENS} + 1 :
                    least((i + 1) * {_LINE_TOKENS}, len(ts))], ' '))
               AS lines
      FROM tok
    ),
    expl AS (
      SELECT doc_id, u.line, u.pos
      FROM lined,
           LATERAL (SELECT unnest(lines) AS line,
                           generate_subscripts(lines, 1) AS pos) u
    ),
    ranked AS (
      SELECT doc_id, pos, line,
             ROW_NUMBER() OVER (PARTITION BY line
                                ORDER BY doc_id, pos) AS rn
      FROM expl
    ),
    kept AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(line, ' ' ORDER BY pos)) AS kept_hash
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    )
    SELECT l.doc_id, len(l.lines) AS n_lines,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.kept_hash, '') AS kept_hash
    FROM lined l LEFT JOIN kept k ON k.doc_id = l.doc_id
    """,
    doc="C4-style line-level dedup: corpus-global keep-first over "
    f"{_LINE_TOKENS}-token lines, documents reassembled from their "
    "surviving lines (extension; Raffel et al. 2020 §2.2).",
)
def dedup_lines_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc line counts after corpus-global line dedup.

    Scale shape: one explode -> one hash exchange keyed by line text
    for the keep-first window -> one doc_id-keyed reassembly agg. At
    100 TB the window key would be a line HASH (16 bytes) rather than
    the line text, and the reassembly joins the hash verdicts back —
    same plan shape, narrower shuffle; the text key here keeps the
    oracle trivially portable. Window partitions by line (not a global
    sort), so skew is bounded by the count of one repeated line.
    """
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("ts")).select(
        "doc_id", _lines(F.col("ts")).alias("lines")
    )
    expl = base.select(
        "doc_id", F.posexplode("lines").alias("pos0", "line")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    w = Window.partitionBy("line").orderBy("doc_id", "pos")
    kept = (
        expl.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    " ",
                )
            ).alias("kept_hash"),
        )
    )
    return (
        base.select("doc_id", F.size("lines").alias("n_lines"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_hash", F.lit("")).alias("kept_hash"),
        )
    )


# --- TF-IDF top terms ------------------------------------------------

_TOP_TERMS = 3


@register(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
               AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score DESC, term) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_TERMS}
    """,
    doc=f"TF-IDF top-{_TOP_TERMS} terms per document: smoothed idf, "
    "deterministic (score, term) ranking (extension; salient-term "
    "extraction).",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF terms per doc (score rounded BEFORE ranking so the
    rank order is identical cross-engine).

    Scale shape: tf is one doc_id+term-keyed aggregate; df reuses tf
    (already partial-aggregated) with a term-keyed reduce; the corpus
    size joins in as a 1-row broadcast. The ranking window partitions
    by doc_id — no global sort. The df side is vocabulary-sized; it
    enters a plain hash join (broadcastable when the vocabulary fits,
    AQE decides at runtime).
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("tf")
        * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
           + F.lit(1.0)),
        6,
    )
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", "tf", "df", score.alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


# --- PII detection / redaction ---------------------------------------

# Character-class-only patterns: identical semantics in Java regex
# (Spark) and RE2 (DuckDB).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{2} \d{4,5}-\d{4}\b"


def _pii_augmented(doc_id: Column, text: Column) -> Column:
    """Fixture adapter: deterministic synthetic PII appended to a
    subset of docs (the corpus itself is PII-free)."""
    email = F.when(
        doc_id % 3 == 0,
        F.concat(F.lit(" contato user"), doc_id, F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc_id % 5 == 0,
        F.concat(
            F.lit(" fone 11 9"),
            F.lpad((doc_id % 10000).cast("string"), 4, "0"),
            F.lit("-"),
            F.lpad(((doc_id * 7) % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(text, email, phone)


_SQL_PII_AUG = """text
      || CASE WHEN doc_id % 3 = 0
              THEN ' contato user' || doc_id || '@example.com'
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0
              THEN ' fone 11 9' || lpad(CAST(doc_id % 10000 AS VARCHAR),
                     4, '0') || '-'
                   || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
              ELSE '' END"""


@register(
    "pii_redact_documents",
    f"""
    WITH aug AS (
      SELECT doc_id, {_SQL_PII_AUG} AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>',
               'g'), '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_hash
    FROM aug
    """,
    doc="PII scrub: email/phone detection counts + md5 of the "
    "redacted text (extension; standard pre-training privacy pass).",
)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact synthetic emails/phones per document.

    Scale shape: pure row-local projection — zero shuffles; the regex
    work stays inside whole-stage codegen. Patterns restrict to
    constructs with identical Java-regex/RE2 semantics so the oracle
    replays exactly.
    """
    docs = load(spark, sf_dir, "documents")
    t = _pii_augmented(F.col("doc_id"), F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("clean_hash"),
    )


# --- URL / domain profiling ------------------------------------------

_URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def _url_augmented(doc_id: Column, text: Column) -> Column:
    """Fixture adapter: deterministic synthetic URLs (corpus has none)."""
    u1 = F.when(
        doc_id % 2 == 0,
        F.concat(
            F.lit(" ver https://site"),
            (doc_id % 20),
            F.lit(".example.org/p/"),
            doc_id,
        ),
    ).otherwise(F.lit(""))
    u2 = F.when(
        doc_id % 7 == 0,
        F.concat(F.lit(" cdn http://cdn"), (doc_id % 5), F.lit(".example.net/x")),
    ).otherwise(F.lit(""))
    return F.concat(text, u1, u2)


_SQL_URL_AUG = """text
      || CASE WHEN doc_id % 2 = 0
              THEN ' ver https://site' || (doc_id % 20)
                   || '.example.org/p/' || doc_id
              ELSE '' END
      || CASE WHEN doc_id % 7 = 0
              THEN ' cdn http://cdn' || (doc_id % 5) || '.example.net/x'
              ELSE '' END"""


@register(
    "url_domain_stats",
    f"""
    WITH aug AS (
      SELECT doc_id, {_SQL_URL_AUG} AS t FROM documents
    ),
    hits AS (
      SELECT doc_id,
             unnest(regexp_extract_all(t, '{_URL_DOMAIN_RE}', 1)) AS domain
      FROM aug
    )
    SELECT domain, COUNT(*) AS n_urls,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM hits GROUP BY domain
    """,
    doc="URL/domain profiling: extract all URLs, aggregate per "
    "registered domain (extension; C4/CCNet-style provenance stats).",
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL and document counts.

    Scale shape: row-local extract-all + explode, then one
    domain-keyed aggregate (count partial-aggregates map-side;
    COUNT(DISTINCT doc_id) expands to a two-phase exact distinct —
    at 100 TB this would switch to approx_count_distinct, kept exact
    here for the oracle).
    """
    docs = load(spark, sf_dir, "documents")
    t = _url_augmented(F.col("doc_id"), F.col("text"))
    hits = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(t, F.lit(_URL_DOMAIN_RE), 1)).alias(
            "domain"
        ),
    )
    return hits.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# --- unigram LM scoring ----------------------------------------------


@register(
    "doc_unigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT SUM(cnt) AS total FROM vocab),
    scored AS (
      SELECT t.doc_id,
             ln(CAST(v.cnt AS DOUBLE) / total.total) AS logp
      FROM tok t JOIN vocab v USING (term) CROSS JOIN total
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           {sql_davg('logp', 'lm_score')}
    FROM scored GROUP BY doc_id
    """,
    doc="Unigram LM quality score: per-doc mean token log-probability "
    "under the corpus unigram model (extension; CCNet-style LM "
    "filtering, Wenzek et al. 2020).",
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass LM scoring: build the unigram model, score every doc.

    Scale shape: pass 1 is a term-keyed count (vocabulary-sized
    output); pass 2 re-joins tokens to the model on term and reduces
    per doc_id. The model side is vocabulary-scale, so the join is a
    plain hash join (broadcast when it fits). The mean uses the exact
    decimal-sum pattern (``registry.davg``) so token order never
    changes the hash; ln() ulp drift across engines is quantized away
    by the decimal(28,10) cast.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    logp = F.log(F.col("cnt").cast("double") / F.col("total"))
    scored = (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", logp.alias("logp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        davg(F.col("logp"), "lm_score"),
    )


# --- deterministic training-order shuffle ----------------------------

_SHUF_SEED = 23
_SHUF_SHARDS = 16


@register(
    "corpus_shuffle_shards",
    f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    )
    SELECT doc_id,
           CAST('0x' || substr(hkey, 1, 15) AS BIGINT) % {_SHUF_SHARDS}
             AS shard,
           ROW_NUMBER() OVER (
             PARTITION BY CAST('0x' || substr(hkey, 1, 15) AS BIGINT)
                          % {_SHUF_SHARDS}
             ORDER BY hkey, doc_id) AS ord
    FROM keyed
    """,
    doc=f"Deterministic corpus shuffle: hash-derived {_SHUF_SHARDS}-way "
    "shard + in-shard order for reproducible training-data ordering "
    "(extension; the pre-tokenization shuffle step).",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle: (shard, ord) from a content hash.

    Unlike ``orderBy(rand())`` (nondeterministic across retries and
    engines), a hash of the key gives a permutation that is stable
    under task retry/speculation and identical on every engine. Scale
    shape: the in-shard ranking windows partition by shard — shard
    count scales with the cluster, there is NO global sort; writing
    shard files is then a partitioned write.
    """
    docs = load(spark, sf_dir, "documents")
    hkey = F.md5(F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", hkey.alias("hkey")).select(
        "doc_id",
        "hkey",
        (F.conv(F.substring("hkey", 1, 15), 16, 10).cast("bigint")
         % _SHUF_SHARDS).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("ord")
    )


# --- global vocabulary head ------------------------------------------

_TOP_TOKENS = 20


@register(
    "heavy_hitter_tokens",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS n
    FROM tok GROUP BY token
    ORDER BY n DESC, token
    LIMIT {_TOP_TOKENS}
    """,
    doc=f"Global top-{_TOP_TOKENS} token frequencies (vocabulary head) "
    "with deterministic tie order (extension; tokenizer-training / "
    "stopword-discovery profiling).",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global most-frequent tokens.

    Scale shape: explode -> token-keyed count (partial-aggregated
    map-side), then ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject — a per-partition top-k merged on the
    driver, NOT a single-partition global sort; the deterministic
    (count desc, token) tiebreak keeps the cut identical across
    engines.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(_TOP_TOKENS)
    )


# --- mixed-language (code-switching) detection -----------------------

# Fixture adapter: every 6th doc gets a Portuguese-stopword-rich tail
# so the corpus actually contains code-switched documents.
_PT_TAIL = "de da do que em para com um uma os de da do que em para"


def _chunk_langs(lines: Column) -> Column:
    """Per-chunk language vote over the stopword lists (row-local)."""
    from ..functions.text import EN_STOPWORDS, PT_STOPWORDS

    def vote(c: Column) -> Column:
        ts = F.split(c, " ")
        en = F.size(F.filter(ts, lambda t: t.isin(*EN_STOPWORDS)))
        pt = F.size(F.filter(ts, lambda t: t.isin(*PT_STOPWORDS)))
        return (
            F.when(en > pt, F.lit("en"))
            .when(pt > en, F.lit("pt"))
            .otherwise(F.lit("und"))
        )

    return F.transform(lines, vote)


def _sql_mixed_lang() -> str:
    from ..functions.text import EN_STOPWORDS, PT_STOPWORDS

    en = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    pt = ", ".join(f"'{w}'" for w in PT_STOPWORDS)
    lines = f"""list_transform(
               generate_series(0,
                 CAST(ceil(len(ts) / {float(_LINE_TOKENS)}) AS INT) - 1),
               i -> array_to_string(
                 ts[i * {_LINE_TOKENS} + 1 :
                    least((i + 1) * {_LINE_TOKENS}, len(ts))], ' '))"""
    vote = f"""list_transform({lines}, c ->
               CASE
                 WHEN len(list_filter(string_split(c, ' '),
                          t -> list_contains([{en}], t)))
                      > len(list_filter(string_split(c, ' '),
                            t -> list_contains([{pt}], t))) THEN 'en'
                 WHEN len(list_filter(string_split(c, ' '),
                          t -> list_contains([{pt}], t)))
                      > len(list_filter(string_split(c, ' '),
                            t -> list_contains([{en}], t))) THEN 'pt'
                 ELSE 'und'
               END)"""
    return f"""
    WITH aug AS (
      SELECT doc_id,
             trim(regexp_replace(text, '\\s+', ' ', 'g'))
             || CASE WHEN doc_id % 6 = 0 THEN ' {_PT_TAIL}' ELSE '' END
               AS t
      FROM documents
    ),
    tok AS (SELECT doc_id, string_split(t, ' ') AS ts FROM aug),
    voted AS (SELECT doc_id, {vote} AS cl FROM tok)
    SELECT doc_id,
           len(cl) AS n_chunks,
           len(list_filter(cl, x -> x = 'en')) AS n_en,
           len(list_filter(cl, x -> x = 'pt')) AS n_pt,
           len(list_filter(cl, x -> x = 'und')) AS n_und,
           CASE WHEN len(list_filter(cl, x -> x = 'en')) > 0
                 AND len(list_filter(cl, x -> x = 'pt')) > 0
                THEN 1 ELSE 0 END AS is_mixed
    FROM voted
    """


@register(
    "doc_mixed_language",
    _sql_mixed_lang(),
    doc="Code-switching detection: per-chunk stopword language votes; "
    "docs with both en and pt chunks flagged mixed (extension; "
    "chunk-level refinement of doc_lang_id).",
)
def doc_mixed_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level language consistency per document.

    Scale shape: entirely row-local (chunking, per-chunk votes and
    the aggregation all run inside one projection over arrays) — zero
    shuffles, pushes to the scan like ``pii_redact_documents``.
    """
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    t = F.when(
        F.col("doc_id") % 6 == 0, F.concat(norm, F.lit(" " + _PT_TAIL))
    ).otherwise(norm)
    base = docs.select("doc_id", F.split(t, " ").alias("ts")).select(
        "doc_id", _chunk_langs(_lines(F.col("ts"))).alias("cl")
    )
    n_of = lambda lang: F.size(F.filter("cl", lambda x: x == lang))  # noqa: E731
    return base.select(
        "doc_id",
        F.size("cl").alias("n_chunks"),
        n_of("en").alias("n_en"),
        n_of("pt").alias("n_pt"),
        n_of("und").alias("n_und"),
        F.when((n_of("en") > 0) & (n_of("pt") > 0), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_mixed"),
    )


# --- bigram LM scoring (interpolated) --------------------------------

_LM_LAMBDA = 0.8  # bigram weight; (1-lambda) backs off to unigram


@register(
    "doc_bigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    uni AS (
      SELECT u.term, COUNT(*) AS c1
      FROM (SELECT unnest(ts) AS term FROM tok) u GROUP BY u.term
    ),
    total AS (SELECT SUM(c1) AS n FROM uni),
    bg AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(ts) - 1),
                            i -> {{prev: ts[i], cur: ts[i+1]}}) AS bgs
      FROM tok WHERE len(ts) >= 2
    ),
    inst AS (
      SELECT doc_id, u.bgr.prev AS prev, u.bgr.cur AS cur
      FROM bg, LATERAL (SELECT unnest(bgs) AS bgr) u
    ),
    big AS (SELECT prev, cur, COUNT(*) AS c2 FROM inst GROUP BY prev, cur),
    scored AS (
      SELECT i.doc_id,
             ln({_LM_LAMBDA} * b.c2 / CAST(cp.c1 AS DOUBLE)
                + {1.0 - _LM_LAMBDA!r} * cc.c1 / CAST(total.n AS DOUBLE))
               AS logp
      FROM inst i
      JOIN big b ON b.prev = i.prev AND b.cur = i.cur
      JOIN uni cp ON cp.term = i.prev
      JOIN uni cc ON cc.term = i.cur
      CROSS JOIN total
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           {sql_davg('logp', 'bigram_score')}
    FROM scored GROUP BY doc_id
    """,
    doc=f"Interpolated bigram LM score (lambda={_LM_LAMBDA} bigram + "
    "unigram backoff): per-doc mean token log-probability under the "
    "corpus bigram model (extension; one step closer to CCNet's "
    "KenLM filter than doc_unigram_logprob).",
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass bigram LM: corpus model, then per-doc scoring.

    Scale shape: the unigram model is vocabulary-sized (broadcast);
    the bigram model is corpus-bounded and joins hash-partitioned on
    (prev, cur); bigram instances build ROW-LOCALLY via shifted-slice
    zips (no self-join on position). Mean uses the exact decimal-sum
    pattern; ln() ulp drift is quantized away.
    """
    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    n = F.size(ts)
    bigrams = F.zip_with(
        F.slice(ts, 1, n - 1),
        F.slice(ts, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    base = docs.select("doc_id", ts.alias("ts"))
    uni = base.select(F.explode("ts").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).alias("c1")
    )
    total = uni.agg(F.sum("c1").alias("n"))
    inst = (
        docs.where(n >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )
    big = inst.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    cp = uni.select(F.col("term").alias("prev"), F.col("c1").alias("c1_prev"))
    cc = uni.select(F.col("term").alias("cur"), F.col("c1").alias("c1_cur"))
    p = F.lit(_LM_LAMBDA) * F.col("c2") / F.col("c1_prev").cast("double") + F.lit(
        1.0 - _LM_LAMBDA
    ) * F.col("c1_cur") / F.col("n").cast("double")
    scored = (
        inst.join(big, ["prev", "cur"])
        .join(F.broadcast(cp), "prev")
        .join(F.broadcast(cc), "cur")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(p).alias("logp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        davg(F.col("logp"), "bigram_score"),
    )


# --- BM25 document ranking -------------------------------------------

# Okapi BM25 with the Lucene idf variant (ln(1 + (N - df + .5)/(df + .5)),
# always positive). Query terms are the corpus's own top-N terms by
# document frequency — deterministic, so the oracle derives the same
# query set. k1/b are the standard defaults.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QTERMS = 5
_BM25_TOP_DOCS = 10


@register(
    "bm25_doc_ranking",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    qterms AS (
      SELECT term, df FROM df
      ORDER BY df DESC, term LIMIT {_BM25_QTERMS}
    ),
    scored AS (
      SELECT q.term, tf.doc_id, tf.tf, dl.dl,
             ROUND(
               (ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
                * (tf.tf * ({_BM25_K1} + 1.0)))
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + ({_BM25_B} * dl.dl) / s.avgdl)),
               6) AS score
      FROM tf
      JOIN qterms q USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT term, doc_id, tf, dl, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY term
                ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_BM25_TOP_DOCS}
    """,
    doc=f"Okapi BM25 (k1={_BM25_K1}, b={_BM25_B}): top-{_BM25_TOP_DOCS} "
    f"documents per query term, query = the corpus's top-{_BM25_QTERMS} "
    "df terms (extension; the ranked-retrieval complement to TF-IDF).",
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked documents for the corpus's highest-df query terms.

    Scale shape: tf/dl/df are the same partial-combining aggregates as
    tfidf_top_terms; the query-term set is a {_BM25_QTERMS}-row
    broadcast, so the scoring join prunes tf to |qterms| postings
    lists BEFORE the doc-length join (equi-join on doc_id); corpus
    stats ride a 1-row broadcast. The rank window partitions by term
    — bounded by the postings list, never a global sort. Score is
    rounded before ranking; ties break on doc_id (cross-engine
    stable).
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = df.orderBy(F.col("df").desc(), F.col("term")).limit(_BM25_QTERMS)
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    score = F.round(
        (idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0)))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (
                F.lit(1.0 - _BM25_B)
                + (F.lit(_BM25_B) * F.col("dl")) / F.col("avgdl")
            )
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", "tf", "dl", score.alias("score"))
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BM25_TOP_DOCS)
        .select("term", "doc_id", "tf", "dl", "score", "rank")
    )


# --- count-min sketch token frequencies ------------------------------

# Cormode & Muthukrishnan 2005: d independent hash rows x w buckets;
# estimate = min over rows of the collided counter. Overestimates
# only; error <= 2N/w with overwhelming probability at d = 4. The
# md5-based portable_hash64 contract lets the DuckDB oracle replay
# the ENTIRE sketch bit-for-bit (same counters, same estimates) —
# the within_bound boolean is then a replayed fact, and the unit
# test asserts it holds for every tracked term.
_CMS_W = 512
_CMS_SEEDS = (101, 102, 103, 104)


def _cms_oracle() -> str:
    def h(seed: str, expr: str) -> str:
        return (
            f"CAST('0x' || substr(md5('{seed}:' || {expr}), 1, 15) "
            f"AS BIGINT) % {_CMS_W}"
        )

    rows_ = " UNION ALL ".join(
        f"SELECT token, {j} AS j, {h(str(s), 'token')} AS b FROM tok"
        for j, s in enumerate(_CMS_SEEDS)
    )
    tb = " UNION ALL ".join(
        f"SELECT token, n, {j} AS j, {h(str(s), 'token')} AS b "
        "FROM tracked"
        for j, s in enumerate(_CMS_SEEDS)
    )
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS token
      FROM documents
    ),
    hrows AS ({rows_}),
    counters AS (SELECT j, b, COUNT(*) AS c FROM hrows GROUP BY 1, 2),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS nt FROM counters WHERE j = 0
    ),
    tracked AS (
      SELECT token, COUNT(*) AS n FROM tok
      GROUP BY token ORDER BY n DESC, token LIMIT {_TOP_TOKENS}
    ),
    tb AS ({tb}),
    est AS (
      SELECT tb.token, tb.n, MIN(c.c) AS n_est
      FROM tb JOIN counters c ON c.j = tb.j AND c.b = tb.b
      GROUP BY tb.token, tb.n
    )
    SELECT e.token, e.n AS n_exact, e.n_est,
           e.n_est - e.n AS overcount,
           (e.n_est - e.n) * {_CMS_W} <= 2 * t.nt AS within_bound
    FROM est e, tot t
    """


@register(
    "cms_token_frequency",
    _cms_oracle(),
    doc=f"Count-min sketch frequency estimation: {len(_CMS_SEEDS)} "
    f"portable-hash rows x {_CMS_W} buckets built in one pass, "
    f"top-{_TOP_TOKENS} exact heavy hitters estimated from the "
    "sketch, per-term overcount + 2N/w bound check — all replayed "
    "exactly by the oracle via the md5 hash contract (Cormode & "
    "Muthukrishnan 2005; extension).",
)
def cms_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracked heavy hitters with their CMS estimates and bound checks.

    Scale shape: the sketch build explodes each token into d = 4
    (row, bucket) ints that partial-aggregate map-side into at most
    d x w = 2048 counters — the shuffle carries counters, not tokens,
    which is the whole point of a CMS at 100 TB (fixed-size state for
    an unbounded stream; the streaming twin would merge per-batch
    counters). Estimation joins the 20 tracked terms against the
    2048-row broadcast counter table; the total-token scalar rides a
    1-row broadcast. Integer-only arithmetic end to end.
    """
    from ..operators.near_dedup import portable_hash64

    docs = load(spark, sf_dir, "documents")
    # the token stream feeds both the sketch build and the exact
    # heavy-hitter companion: tokenize once (at production scale the
    # exact companion disappears — candidates are tracked from the
    # sketch itself — and this frame is a single streaming pass)
    tok = docs.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).localCheckpoint(eager=False)

    def buckets(col):
        return F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    (portable_hash64(col, s) % _CMS_W).alias("b"),
                )
                for j, s in enumerate(_CMS_SEEDS)
            ]
        )

    counters = (
        tok.select(F.explode(buckets(F.col("token"))).alias("h"))
        .groupBy(F.col("h.j").alias("j"), F.col("h.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # total token count is already IN the sketch: each hash row's
    # counters sum to N — no extra pass over the corpus
    tot = counters.where(F.col("j") == 0).agg(F.sum("c").alias("nt"))
    tracked = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(_TOP_TOKENS)
    )
    est = (
        tracked.select(
            "token", "n", F.explode(buckets(F.col("token"))).alias("h")
        )
        .select("token", "n", F.col("h.j").alias("j"), F.col("h.b").alias("b"))
        .join(F.broadcast(counters), ["j", "b"])
        .groupBy("token", "n")
        .agg(F.min("c").alias("n_est"))
    )
    return est.crossJoin(F.broadcast(tot)).select(
        "token",
        F.col("n").alias("n_exact"),
        "n_est",
        (F.col("n_est") - F.col("n")).alias("overcount"),
        (
            (F.col("n_est") - F.col("n")) * _CMS_W <= 2 * F.col("nt")
        ).alias("within_bound"),
    )


# --- CCNet-style perplexity bucketing (head / middle / tail) ---------


@register(
    "perplexity_buckets",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT SUM(cnt) AS total FROM vocab),
    scored AS (
      SELECT t.doc_id,
             ln(CAST(v.cnt AS DOUBLE) / total.total) AS logp
      FROM tok t JOIN vocab v USING (term) CROSS JOIN total
    ),
    per_doc AS (
      SELECT doc_id, {sql_davg('logp', 'lm_score')}
      FROM scored GROUP BY doc_id
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, p.lm_score,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY p.lm_score DESC, d.doc_id) AS b
      FROM per_doc p JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, lm_score,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
    FROM ranked
    """,
    doc="CCNet perplexity bucketing (Wenzek et al. 2020): per "
    "language, documents split into head/middle/tail terciles of the "
    "unigram-LM score (higher mean log-prob = lower perplexity = "
    "head) — the quality tiers CCNet samples from; unique "
    "(score, doc_id) ordering keeps the tercile cut "
    "engine-deterministic (extension).",
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail quality tiers by LM score.

    Scale shape: the LM scoring passes are ``doc_unigram_logprob``'s
    (term-keyed model build, vocabulary-scale join, per-doc decimal
    mean); the tercile assignment is ONE window partitioned by
    language — a real key, no global window. The rounded score is
    what both the ordering and the output use, so the tercile
    boundary cannot sit between engine-ulp-different values.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    logp = F.log(F.col("cnt").cast("double") / F.col("total"))
    per_doc = (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(davg(logp, "lm_score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.desc("lm_score"), F.asc("doc_id")
    )
    ranked = (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("b", F.ntile(3).over(w))
    )
    return ranked.select(
        "doc_id",
        "lang",
        "lm_score",
        F.when(F.col("b") == 1, F.lit("head"))
        .when(F.col("b") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


# --- per-source distribution drift (KL divergence) -------------------


@register(
    "source_token_kl",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    st AS (
      SELECT source, term, COUNT(*) AS c_st
      FROM tok GROUP BY source, term
    ),
    s_tot AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS c_s
      FROM st GROUP BY source
    ),
    t_tot AS (
      SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t
      FROM st GROUP BY term
    ),
    ctot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS c_all FROM st),
    term_kl AS (
      SELECT st.source, st.c_st, s.c_s,
             (CAST(st.c_st AS DOUBLE) / s.c_s)
               * ln((CAST(st.c_st AS DOUBLE) / s.c_s)
                    / (CAST(t.c_t AS DOUBLE) / ctot.c_all)) AS term_kl
      FROM st
      JOIN s_tot s USING (source)
      JOIN t_tot t USING (term)
      CROSS JOIN ctot
    )
    SELECT source,
           MAX(c_s) AS n_tokens,
           COUNT(*) AS n_distinct,
           {sql_dsum('term_kl', 'kl_nats')}
    FROM term_kl
    GROUP BY source
    ORDER BY source
    """,
    doc="Per-source token-distribution drift: KL(source ‖ corpus) "
    "over unigram frequencies — the mixture-monitoring signal a "
    "training-data pipeline tracks to catch a crawler or source "
    "whose language shifted (extension; same two-pass LM shape as "
    "doc_unigram_logprob).",
)
def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram mix vs the corpus.

    Scale shape: one explode feeds a (source, term)-keyed hash count
    (map-side combine collapses repeats before the exchange); the
    three marginals (per-source, per-term, corpus total) all derive
    from that vocabulary×sources-scale frame, never from re-reading
    text. The per-term join is keyed on term (vocabulary-scale hash
    join); per-source totals and the 1-row corpus total broadcast.
    Per-term KL contributions reduce source-keyed — ~|sources| output
    rows, all map-side combine. ln() ulp drift across engines is
    quantized away by the decimal(28,10)-sum + round(6) pattern.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    st = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c_st")
    )
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("c_s"))
    t_tot = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    ctot = st.agg(F.sum("c_st").alias("c_all"))
    p = F.col("c_st").cast("double") / F.col("c_s")
    q = F.col("c_t").cast("double") / F.col("c_all")
    term_kl = (
        st.join(F.broadcast(s_tot), "source")
        .join(t_tot, "term")
        .crossJoin(F.broadcast(ctot))
        .select("source", "c_s", (p * F.log(p / q)).alias("term_kl"))
    )
    return (
        term_kl.groupBy("source")
        .agg(
            F.max("c_s").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            dsum(F.col("term_kl"), "kl_nats"),
        )
        .select("source", "n_tokens", "n_distinct", "kl_nats")
        .orderBy("source")
    )


# --- out-of-vocabulary rate per source -------------------------------

# Fixture adapter: the synthetic corpus draws from a ~31-word pool, so
# a "real" 50k vocabulary would cover everything; V=16 keeps a genuine
# OOV tail. The machinery is V-agnostic.
_OOV_VOCAB_V = 16


@register(
    "source_oov_rate",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tcnt AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    vocab AS (
      SELECT term FROM (
        SELECT term,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk
        FROM tcnt
      ) WHERE rk <= {_OOV_VOCAB_V}
    ),
    st AS (
      SELECT source, term, COUNT(*) AS c_st
      FROM tok GROUP BY source, term
    ),
    scored AS (
      SELECT s.source, s.c_st,
             CASE WHEN v.term IS NULL THEN s.c_st ELSE 0 END AS oov
      FROM st s LEFT JOIN vocab v USING (term)
    )
    SELECT source,
           CAST(SUM(c_st) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           (CAST(SUM(oov) AS BIGINT) * 1000000)
             // CAST(SUM(c_st) AS BIGINT) AS oov_ppm
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    doc=f"Out-of-vocabulary rate per source: occurrences outside the "
    f"global top-{_OOV_VOCAB_V} vocabulary (count-desc, "
    "term-lexicographic ties), integer-ppm rate — the "
    "tokenizer-coverage signal a training pipeline tracks per feed "
    "(extension).",
)
def source_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV occurrence share per source against the global top-V vocab.

    Scale shape: both the vocabulary ranking and the per-source rates
    derive from hash-aggregated count frames — (term) and
    (source, term) — never from re-scanning text.  The top-V cut is
    ``orderBy(...).limit(V)`` — TakeOrderedAndProject, a per-partition
    top-V merged on the driver, never a single-task sort over the full
    distinct-term frame (which is web-corpus-vocabulary-sized, i.e.
    unbounded) — and the V-row vocabulary broadcasts into the left
    join.  Rates are integer ppm.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    tcnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        tcnt.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(_OOV_VOCAB_V)
        .select("term")
    )
    st = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c_st")
    )
    scored = st.join(F.broadcast(vocab.withColumn("in_v", F.lit(1))),
                     "term", "left").select(
        "source",
        "c_st",
        F.when(F.col("in_v").isNull(), F.col("c_st"))
        .otherwise(F.lit(0))
        .alias("oov"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("c_st").alias("n_tokens"),
            F.sum("oov").alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000000L) div n_tokens").alias("oov_ppm"),
        )
        .orderBy("source")
    )


# --- Zipf law fit per source -----------------------------------------


@register(
    "source_zipf_fit",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    st AS (
      SELECT source, term, COUNT(*) AS c
      FROM tok GROUP BY source, term
    ),
    ranked AS (
      SELECT source,
             ln(CAST(ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY c DESC, term)
                     AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM st
    ),
    sums AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x*x AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x*y AS DECIMAL(28,10))) AS DOUBLE) AS sxy
      FROM ranked GROUP BY source
    )
    SELECT source, n AS n_terms,
           ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0 AS zipf_slope,
           ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n,
                 6) + 0 AS zipf_intercept
    FROM sums
    ORDER BY source
    """,
    doc="Zipf-law fit per source: OLS slope/intercept of "
    "ln(count) ~ ln(rank) over the source's term frequency ranking "
    "— the distributional-health signal (natural text tracks slope "
    "~ -1; generated or templated feeds flatten) (extension).",
)
def source_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS on the log-log rank/frequency line.

    Scale shape: the regression consumes the (source, term) count
    frame (vocabulary x sources scale), never raw tokens; ranking
    partitions by source (bounded by vocabulary size per source —
    the same bounded-window argument as ``source_oov_rate``); the
    five OLS moments are one hash aggregate with exact decimal sums,
    so term order never moves the fit.  Closed-form slope/intercept
    from the moments — no iterative solver.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    st = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("term"))
    ranked = st.select(
        "source",
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )

    def dsum_d(e, a):
        return F.sum(e.cast("decimal(28,10)")).cast("double").alias(a)

    sums = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        dsum_d(F.col("x"), "sx"),
        dsum_d(F.col("y"), "sy"),
        dsum_d(F.col("x") * F.col("x"), "sxx"),
        dsum_d(F.col("x") * F.col("y"), "sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "source",
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("zipf_intercept"),
    ).orderBy("source")


# --- DSIR hashed-ngram importance weights ----------------------------

# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score each raw document by the log importance
# ratio of a hashed n-gram bag-of-features model fit on a target
# distribution vs the raw pool, then resample by weight. Features are
# hashed uni+bigrams (the paper's construction); the fixture's
# ``source`` column plays the target/raw split.
_DSIR_TARGET = "src7"
_DSIR_BUCKETS = 64
_DSIR_SEED = 173


def _dsir_ctes() -> str:
    """CTE chain ``tok .. scored`` replaying the hashed-ngram
    importance model in DuckDB — shared by the weight and resample
    oracles so the two replays can never diverge (the ``_fh_ctes``
    convention)."""
    return f"""tok AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    feat AS (
      SELECT doc_id, source, u.f
      FROM tok, LATERAL (SELECT unnest(list_concat(
             ts,
             list_transform(generate_series(1, len(ts) - 1),
                            i -> ts[i] || '_' || ts[i+1]))) AS f) u
    ),
    hashed AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5('{_DSIR_SEED}:' || f), 1, 15)
                  AS BIGINT) % {_DSIR_BUCKETS} AS dim
      FROM feat
    ),
    dims AS (
      SELECT dim,
             COUNT(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS n_t,
             COUNT(*) AS n_all
      FROM hashed GROUP BY dim
    ),
    tot AS (SELECT SUM(n_t) AS nt, SUM(n_all) AS na FROM dims),
    lr AS (
      SELECT dim,
             ln((n_t + 1) / CAST(nt + {_DSIR_BUCKETS} AS DOUBLE))
               - ln((n_all + 1) / CAST(na + {_DSIR_BUCKETS} AS DOUBLE))
               AS lr
      FROM dims, tot
    ),
    scored AS (
      SELECT h.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_feats,
             SUM(CAST(l.lr AS DECIMAL(28,10))) AS s
      FROM hashed h JOIN lr l ON l.dim = h.dim
      GROUP BY h.doc_id
    )"""


@register(
    "dsir_importance_weights",
    f"""
    WITH {_dsir_ctes()}
    SELECT doc_id, n_feats,
           ROUND(CAST(s AS DOUBLE) / n_feats, 6) AS dsir_score,
           s > 0 AS is_targetlike
    FROM scored
    """,
    doc=f"DSIR importance weights (Xie et al. 2023): per-doc mean log "
    f"importance ratio of hashed uni+bigram features ("
    f"{_DSIR_BUCKETS} buckets, +1 smoothing) between the "
    f"'{_DSIR_TARGET}' target slice and the raw pool — the "
    "distribution-matching data-selection score (extension).",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-ngram importance model, fit and applied in one pass.

    Scale shape: features build ROW-LOCALLY (shifted-slice zip for
    bigrams — no position self-join) and immediately hash into
    {buckets} dims, so the model-fit aggregate exchanges at most
    {buckets} rows per task regardless of corpus size; the fitted
    log-ratio table is {buckets} rows + two scalars — broadcast into
    the per-doc scoring join, which partial-aggregates per doc_id
    behind a map-side combine. Two passes over tokens total, the
    same shape DSIR runs at pile scale. Mean uses the exact
    decimal-sum pattern; ln() ulp drift is quantized away; the
    is_targetlike flag compares the EXACT decimal sum against zero,
    so it can never straddle a float boundary.
    """
    from ..operators.near_dedup import portable_hash64

    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    n = F.size(ts)
    bigrams = F.zip_with(
        F.slice(ts, 1, n - 1),
        F.slice(ts, 2, n - 1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    hashed = docs.select(
        "doc_id",
        "source",
        F.explode(F.concat(ts, bigrams)).alias("f"),
    ).select(
        "doc_id",
        "source",
        (portable_hash64(F.col("f"), _DSIR_SEED) % _DSIR_BUCKETS).alias(
            "dim"
        ),
    )
    dims = hashed.groupBy("dim").agg(
        F.sum(
            F.when(F.col("source") == _DSIR_TARGET, 1).otherwise(0)
        ).alias("n_t"),
        F.count(F.lit(1)).alias("n_all"),
    # B rows, but consumed by BOTH the totals aggregate and the
    # log-ratio join — materialize once so the token explode+hash
    # lineage runs a single model-fit pass, not once per consumer
    # (plan-pinned: exactly two documents scans end-to-end)
    ).localCheckpoint(eager=False)
    tot = dims.agg(
        F.sum("n_t").alias("nt"), F.sum("n_all").alias("na")
    )
    b = F.lit(_DSIR_BUCKETS)
    lr = (
        dims.crossJoin(F.broadcast(tot))
        .select(
            "dim",
            (
                F.log(
                    (F.col("n_t") + 1)
                    / (F.col("nt") + b).cast("double")
                )
                - F.log(
                    (F.col("n_all") + 1)
                    / (F.col("na") + b).cast("double")
                )
            ).alias("lr"),
        )
    )
    scored = (
        hashed.join(F.broadcast(lr), "dim")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.col("lr").cast("decimal(28,10)")).alias("s"),
        )
    )
    return scored.select(
        "doc_id",
        "n_feats",
        F.round(
            F.col("s").cast("double") / F.col("n_feats"), 6
        ).alias("dsir_score"),
        (F.col("s") > 0).alias("is_targetlike"),
    )


# --- DSIR Gumbel top-k resampling ------------------------------------

# The paper's selection step: sampling n docs WITHOUT replacement with
# probability proportional to exp(score) is equivalent to taking the
# top-n by (score + Gumbel noise) — the Gumbel-top-k trick (Kool et
# al. 2019; DSIR §2.3). The Gumbel draw is derandomized from a
# content hash, so the "sample" is a pure function of the corpus.
_DSIR_N = 200
_DSIR_GUMBEL_SEED = 777
_DSIR_HASH_DEN = (1 << 60) + 2  # u = (h+1)/DEN in (0,1) strictly


@register(
    "dsir_gumbel_resample",
    f"""
    WITH {_dsir_ctes()},
    keyed AS (
      SELECT doc_id,
             ROUND(CAST(s AS DOUBLE) / n_feats, 6) AS dsir_score,
             ROUND(ROUND(CAST(s AS DOUBLE) / n_feats, 6)
                   - ln(-ln((CAST('0x' || substr(md5(
                         '{_DSIR_GUMBEL_SEED}:' || doc_id), 1, 15)
                       AS BIGINT) + 1) / {_DSIR_HASH_DEN}.0)), 6)
               AS gumbel_key
      FROM scored
    ),
    ranked AS (
      SELECT doc_id, dsir_score, gumbel_key,
             CAST(ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id)
                  AS BIGINT) AS sample_rank
      FROM keyed
    )
    SELECT doc_id, dsir_score, gumbel_key, sample_rank
    FROM ranked WHERE sample_rank <= {_DSIR_N}
    """,
    doc=f"DSIR resampling via the Gumbel-top-k trick: top {_DSIR_N} "
    "documents by importance score + hash-derandomized Gumbel noise "
    "= sampling without replacement proportional to exp(score) "
    "(Xie et al. 2023 §2.3; Kool et al. 2019) — deterministic, so "
    "the selected set is reproducible and engine-independent "
    "(extension).",
)
def dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling as a deterministic top-n.

    Scale shape: reuses the `dsir_importance_weights` dataflow (two
    token passes, 64-bucket broadcast model), adds one row-local
    Gumbel key (the uniform comes from the same portable md5 the
    dedup operators use, so both engines draw the SAME noise), then
    selects via orderBy+limit — a distributed TakeOrdered (per-
    partition heap of n, driver merge), never a global sort; the
    rank column is a window over the ALREADY-SELECTED n rows, which
    is budget-bounded by construction.
    """
    from ..operators.near_dedup import portable_hash64

    from pyspark.sql.window import Window

    scored = dsir_importance_weights(spark, sf_dir)
    u = (
        portable_hash64(
            F.col("doc_id").cast("string"), _DSIR_GUMBEL_SEED
        )
        + 1
    ) / F.lit(float(_DSIR_HASH_DEN))
    # the key adds noise to the ROUNDED score (both engines quantize
    # the mean identically first, so the sum can't straddle an ulp)
    keyed = scored.select(
        "doc_id",
        "dsir_score",
        F.round(F.col("dsir_score") - F.log(-F.log(u)), 6).alias(
            "gumbel_key"
        ),
    )
    top = keyed.orderBy(F.desc("gumbel_key"), "doc_id").limit(_DSIR_N)
    w = Window.orderBy(F.desc("gumbel_key"), "doc_id")
    return top.select(
        "doc_id",
        "dsir_score",
        "gumbel_key",
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
    )


# --- inverted index (bigram postings) --------------------------------

_IDX_MIN_DF = 5
_IDX_POSTINGS_K = 8


@register(
    "inverted_index_postings",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ts) - 1),
                                   i -> ts[i] || ' ' || ts[i+1])) AS term
      FROM tok
    ),
    g AS (
      SELECT term, COUNT(*) AS ctf,
             list_sort(list(DISTINCT doc_id)) AS docs
      FROM b GROUP BY term
    )
    SELECT term,
           CAST(len(docs) AS BIGINT) AS df,
           CAST(ctf AS BIGINT) AS ctf,
           array_to_string(list_slice(docs, 1, {_IDX_POSTINGS_K}), ',')
             AS postings
    FROM g
    WHERE len(docs) >= {_IDX_MIN_DF}
    ORDER BY term
    """,
    doc="Inverted-index build over bigram terms: document frequency, "
    "collection term frequency, and the head of each sorted postings "
    f"list (first {_IDX_POSTINGS_K} doc ids), min-df {_IDX_MIN_DF} — "
    "the search/decontamination index shape (extension).",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term -> (df, ctf, head of sorted postings).

    Scale shape: bigram instances build ROW-LOCALLY (shifted-slice
    zip on a MATERIALIZED token array — never re-splitting text per
    element); a (term, doc_id) aggregate collapses instances to
    per-doc tfs, and a TERM-PARTITIONED window ranks doc ids so the
    final term aggregate only ever collects the rn <= K head —
    per-term aggregation state is bounded at K ids no matter how
    common the term. The previous form (collect_set of ALL doc ids,
    sort, slice) held a full postings list in ONE aggregation buffer:
    a stopword bigram's buffer is corpus-df-sized at 100 TB (OOM),
    and it measured 19x wall for 10x data on the sf1 spot-bench; this
    form is ~linear. The window's sort spills per term partition;
    Catalyst reuses the term exchange for the following groupBy.
    Full posting lists at corpus scale are not a row — production
    indexes shard them (term, shard_no) -> fixed-size blocks, the
    same aggregate with a secondary key. min-df prunes the hapax
    tail (the vast majority of a real vocabulary) before output.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    base = docs.select("doc_id", ts.alias("ts"))
    n = F.size(F.col("ts"))
    bigrams = F.zip_with(
        F.slice(F.col("ts"), 1, n - 1),
        F.slice(F.col("ts"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    inst = base.select("doc_id", F.explode(bigrams).alias("term"))
    per_doc = inst.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    rn = F.row_number().over(
        Window.partitionBy("term").orderBy("doc_id")
    )
    g = per_doc.withColumn("rn", rn).groupBy("term").agg(
        F.sum("tf").alias("ctf"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("rn") <= _IDX_POSTINGS_K, F.col("doc_id"))
            )
        ).alias("head"),
    )
    return g.where(F.col("df") >= _IDX_MIN_DF).select(
        "term",
        "df",
        F.col("ctf"),
        # VARCHAR postings head: the driver hash has no proven
        # cross-engine array canonicalization — scalar outputs only
        F.array_join(
            F.transform("head", lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


_IDX_BLOCK = 8  # postings block size (production: ~4096 ids/block)


@register(
    "inverted_index_postings_full",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ts) - 1),
                                   i -> ts[i] || ' ' || ts[i+1])) AS term
      FROM tok
    ),
    pd AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM b GROUP BY term, doc_id
    ),
    st AS (
      SELECT term, doc_id,
             COUNT(*) OVER (PARTITION BY term) AS df,
             SUM(tf) OVER (PARTITION BY term) AS ctf,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM pd
    )
    SELECT term,
           CAST((rn - 1) // {_IDX_BLOCK} AS BIGINT) AS block_no,
           CAST(df AS BIGINT) AS df,
           CAST(ctf AS BIGINT) AS ctf,
           CAST(COUNT(*) AS BIGINT) AS n_block,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM st
    WHERE df >= {_IDX_MIN_DF}
    GROUP BY term, (rn - 1) // {_IDX_BLOCK}, df, ctf
    """,
    doc="Full inverted-index postings as fixed-size sharded blocks: "
    f"(term, block_no) -> up to {_IDX_BLOCK} sorted doc ids, plus "
    f"per-term df/ctf, min-df {_IDX_MIN_DF} — the complete postings "
    "lists the bounded-head query truncates, without any "
    "list-of-all-docs aggregation buffer (extension).",
)
def inverted_index_postings_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """term -> COMPLETE postings list, sharded into bounded blocks.

    ``inverted_index_postings`` bounds its aggregation state by
    keeping only the K-head of each list; a real IR consumer needs
    the whole list, and a stopword bigram's whole list is
    corpus-df-sized — collecting it into ONE aggregation buffer is
    the 100 TB OOM this family exists to avoid. This query emits the
    full list as ``(term, block_no)`` rows of at most ``_IDX_BLOCK``
    ids each:
    the same term-partitioned ROW_NUMBER window assigns each posting
    its in-term rank, ``(rn - 1) div B`` becomes a secondary grouping
    key, and the block aggregate's collect_list is bounded at B by
    construction. df/ctf ride the same term-partitioned window (one
    exchange, reused by the block aggregate: partitioning on term
    already satisfies the (term, block_no) grouping), and the window
    buffers spill per term partition instead of living in agg hash
    state. Readers reassemble a list by scanning a term's blocks in
    block_no order; at deployment block size is ~4096 and the output
    is range-laid-out on (term, block_no) for contiguous scans.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    base = docs.select("doc_id", ts.alias("ts"))
    n = F.size(F.col("ts"))
    bigrams = F.zip_with(
        F.slice(F.col("ts"), 1, n - 1),
        F.slice(F.col("ts"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    inst = base.select("doc_id", F.explode(bigrams).alias("term"))
    per_doc = inst.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    w_t = Window.partitionBy("term")
    w_rn = Window.partitionBy("term").orderBy("doc_id")
    st = per_doc.select(
        "term",
        "doc_id",
        F.count(F.lit(1)).over(w_t).alias("df"),
        F.sum("tf").over(w_t).alias("ctf"),
        F.row_number().over(w_rn).alias("rn"),
    ).where(F.col("df") >= _IDX_MIN_DF)
    blocks = (
        st.withColumn(
            "block_no",
            # integer DIV, not float-divide-and-cast: exact at any rn
            F.expr(f"CAST((rn - 1) DIV {_IDX_BLOCK} AS BIGINT)"),
        )
        .groupBy("term", "block_no", "df", "ctf")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_block"),
            F.array_sort(F.collect_list("doc_id")).alias("ids"),
        )
    )
    return blocks.select(
        "term",
        "block_no",
        F.col("df").cast("bigint").alias("df"),
        F.col("ctf").cast("bigint").alias("ctf"),
        "n_block",
        F.array_join(
            F.transform("ids", lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


# --- BPE merge-round pair counting -----------------------------------

_BPE_TOP_PAIRS = 20


@register(
    "bpe_pair_merge_counts",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents
    ),
    dict AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                   i -> substr(w, i, 2))) AS pair,
             freq
      FROM dict
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {_BPE_TOP_PAIRS}
    """,
    doc=f"BPE tokenizer training, one merge round: corpus-weighted "
    f"adjacent-character-pair counts, top-{_BPE_TOP_PAIRS} merge "
    "candidates (count desc, pair tiebreak) — the inner loop of "
    "Sennrich et al. BPE, whose full training repeats this count "
    "after applying the winning merge (extension).",
)
def bpe_pair_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top merge-candidate character pairs, corpus-frequency-weighted.

    Scale shape: dictionary-ize FIRST — pair extraction runs over the
    DISTINCT word dictionary weighted by word frequency, never over
    raw corpus tokens (the same vocabulary-vs-rows collapse as the
    entity-resolution query: a 100 TB corpus's word dictionary is
    orders of magnitude smaller than its token stream). Pair
    expansion is row-local (sequence/substr inside codegen), the
    count is one hash aggregate, and the final cut is
    ``orderBy(...).limit`` — TakeOrderedAndProject, no global sort.
    Full BPE training iterates: apply the winning merge to the
    dictionary (row-local regexp) and re-count — T rounds = T of
    exactly this job over a dictionary that only shrinks.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    dic = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    # Spark's sequence(1, 0) counts DOWN ([1, 0]) instead of returning
    # empty like DuckDB's generate_series — guard 1-char words or they
    # emit phantom "pairs"
    pairs = dic.select(
        F.explode(
            F.expr(
                "CASE WHEN length(w) >= 2 THEN "
                "transform(sequence(1, length(w) - 1), "
                "i -> substr(w, i, 2)) "
                "ELSE array() END"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_BPE_TOP_PAIRS)
    )


# --- positional inverted index + phrase query ------------------------
# The two IR operators a search user hits right after plain postings:
# a POSITIONAL index (term -> (doc, tf, sorted positions)) and the
# phrase-query plan over it (w1 w2 w3 matches where pos(w2) = pos(w1)+1
# and pos(w3) = pos(w1)+2 within one document). The registered phrase
# is data-derived (the corpus's most frequent trigram, ties broken by
# string) so the query is deterministic at any sf.


@register(
    "inverted_index_positional",
    f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    tp AS (
      SELECT doc_id, u.pos AS pos, u.w AS w
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ts)),
                                     i -> {{pos: i, w: ts[i]}})) AS u
        FROM tok
      )
    ),
    per AS (
      SELECT w, doc_id, COUNT(*) AS tf, list_sort(list(pos)) AS ps
      FROM tp GROUP BY w, doc_id
    ),
    st AS (
      SELECT w, doc_id, tf, ps,
             COUNT(*) OVER (PARTITION BY w) AS df
      FROM per
    )
    SELECT w AS term, doc_id,
           CAST(df AS BIGINT) AS df,
           CAST(tf AS BIGINT) AS tf,
           array_to_string(ps, ',') AS positions
    FROM st WHERE df >= {_IDX_MIN_DF}
    """,
    doc="Positional inverted index over unigram terms: per (term, doc) "
    "tf and the SORTED in-document position list (aggregation state "
    "bounded by one document's length — never corpus-df-sized), plus "
    f"per-term df, min-df {_IDX_MIN_DF} — the index phrase and "
    "proximity queries run on (extension).",
)
def inverted_index_positional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(term, doc_id, df, tf, positions) — the phrase-capable index.

    Scale shape: position lists aggregate per (term, doc) — the
    buffer is bounded by ONE document's occurrences of one term, so
    unlike a naive per-term position list no aggregation state scales
    with corpus df; per-term df rides a term-partitioned window
    (spillable) over the (term, doc) rows, which are postings-sized.
    At deployment the rows range-lay-out on (term, doc_id) so one
    term's postings are a contiguous scan.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    tp = base.select(
        "doc_id", F.posexplode("ts").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    per = tp.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("ps"),
    )
    w_t = Window.partitionBy("w")
    st = per.withColumn("df", F.count(F.lit(1)).over(w_t)).where(
        F.col("df") >= _IDX_MIN_DF
    )
    return st.select(
        F.col("w").alias("term"),
        "doc_id",
        F.col("df").cast("bigint").alias("df"),
        F.col("tf").cast("bigint").alias("tf"),
        F.array_join(
            F.transform("ps", lambda x: x.cast("string")), ","
        ).alias("positions"),
    )


@register(
    "phrase_match_positional",
    """
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    tp AS (
      SELECT doc_id, u.pos AS pos, u.w AS w
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ts)),
                                     i -> {pos: i, w: ts[i]})) AS u
        FROM tok
      )
    ),
    tri AS (
      SELECT unnest(list_transform(generate_series(1, len(ts) - 2),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS t
      FROM tok
    ),
    top AS (
      SELECT string_split(t, ' ')[1] AS w1,
             string_split(t, ' ')[2] AS w2,
             string_split(t, ' ')[3] AS w3,
             t AS phrase
      FROM (SELECT t, COUNT(*) AS c FROM tri GROUP BY t
            ORDER BY c DESC, t LIMIT 1)
    )
    SELECT t1.doc_id, top.phrase,
           CAST(COUNT(*) AS BIGINT) AS n_phrase
    FROM tp t1
    JOIN top ON t1.w = top.w1
    JOIN tp t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
              AND t2.w = top.w2
    JOIN tp t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
              AND t3.w = top.w3
    GROUP BY t1.doc_id, top.phrase
    """,
    doc="Phrase query over the positional index: the corpus's most "
    "frequent trigram (tie -> lexicographic), matched per document "
    "via positional adjacency joins (pos, pos+1, pos+2) — the classic "
    "positional-index phrase plan (extension).",
)
def phrase_match_positional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, phrase, n_phrase) for documents containing the phrase.

    Scale shape: the phrase terms arrive as a 1-row broadcast (the
    trigram TakeOrdered head), each term's postings are a broadcast-
    filtered slice of the position stream, and the adjacency match is
    two (doc_id, pos)-keyed equi-joins — the merge pattern a
    positional index exists for. Nothing fans out: each join's output
    is bounded by the rarest term's postings. The trigram count feeds
    one TakeOrdered(1), never a global sort.
    """
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    n = F.size(F.col("ts"))
    tri = F.zip_with(
        F.zip_with(
            F.slice(F.col("ts"), 1, n - 2),
            F.slice(F.col("ts"), 2, n - 2),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        F.slice(F.col("ts"), 3, n - 2),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )
    top = (
        base.where(n >= 3)
        .select(F.explode(tri).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(1)
        .select(
            F.split("t", " ").getItem(0).alias("w1"),
            F.split("t", " ").getItem(1).alias("w2"),
            F.split("t", " ").getItem(2).alias("w3"),
            F.col("t").alias("phrase"),
        )
    )
    tp = base.select(
        "doc_id", F.posexplode("ts").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    t1 = tp.join(F.broadcast(top), tp["w"] == F.col("w1")).select(
        "doc_id", "pos", "phrase", "w2", "w3"
    )
    t2 = tp.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("w").alias("x2"),
    )
    t3 = tp.select(
        F.col("doc_id").alias("d3"),
        F.col("pos").alias("p3"),
        F.col("w").alias("x3"),
    )
    m = (
        t1.join(
            t2,
            (F.col("d2") == F.col("doc_id"))
            & (F.col("p2") == F.col("pos") + 1)
            & (F.col("x2") == F.col("w2")),
        )
        .join(
            t3,
            (F.col("d3") == F.col("doc_id"))
            & (F.col("p3") == F.col("pos") + 2)
            & (F.col("x3") == F.col("w3")),
        )
    )
    return m.groupBy("doc_id", "phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_phrase")
    )


# --- hybrid retrieval: reciprocal-rank fusion (dense + sparse) -------
# The fixture's documents and embeddings tables are id-aligned
# (doc_id == vec_id), so the two standard retrieval arms exist for
# the same corpus: BM25 over the text (sparse/lexical) and embedding
# cosine (dense). RRF (Cormode-free, Cormack et al. 2009) fuses the
# two rank lists with score = sum over arms of 1 / (K + rank) — the
# de-facto hybrid-search combiner in RAG stacks because it needs no
# score calibration between arms, only RANKS, which also makes it
# fully deterministic cross-engine (integer ranks; two exact IEEE
# divisions per doc).

_RRF_K = 60
_RRF_ARM_TOP = 50  # per-arm shortlist fed to the fusion
_RRF_TOP = 10
_RRF_QDOC = 0  # query = document 0 (its text AND its embedding)

_RRF_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(regexp_replace(
               text, '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    qterms AS (
      SELECT DISTINCT term FROM tok WHERE doc_id = {_RRF_QDOC}
    ),
    qdf AS (
      SELECT df.term, df.df FROM df JOIN qterms q USING (term)
    ),
    sparse_scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(SUM(CAST(ROUND(
               (ln(1.0 + (s.n_docs - qdf.df + 0.5) / (qdf.df + 0.5))
                * (tf.tf * ({_BM25_K1} + 1.0)))
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + ({_BM25_B} * dl.dl) / s.avgdl)),
               6) AS DECIMAL(28,10))), 6) AS DOUBLE) AS score
      FROM tf
      JOIN qdf USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      WHERE tf.doc_id <> {_RRF_QDOC}
      GROUP BY tf.doc_id
    ),
    sparse_rank AS (
      SELECT doc_id, rank_sparse FROM (
        SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY score DESC, doc_id) AS rank_sparse
        FROM sparse_scored
      ) WHERE rank_sparse <= {_RRF_ARM_TOP}
    ),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {_RRF_QDOC}),
    dense_scored AS (
      SELECT c.vec_id AS doc_id,
             ROUND(list_dot_product(q.qv, c.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
      FROM e c, q WHERE c.vec_id <> {_RRF_QDOC}
    ),
    dense_rank_ AS (
      SELECT doc_id, rank_dense FROM (
        SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY cos DESC, doc_id) AS rank_dense
        FROM dense_scored
      ) WHERE rank_dense <= {_RRF_ARM_TOP}
    ),
    fused AS (
      SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
             s.rank_sparse, d.rank_dense,
             ROUND(COALESCE(1.0 / ({_RRF_K} + s.rank_sparse), 0.0)
                   + COALESCE(1.0 / ({_RRF_K} + d.rank_dense), 0.0), 6)
               AS rrf_score
      FROM sparse_rank s FULL OUTER JOIN dense_rank_ d USING (doc_id)
    )
    SELECT doc_id, rank_sparse, rank_dense, rrf_score,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY rrf_score DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= {_RRF_TOP}
    ORDER BY rank
"""


def _rrf_arms(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The two per-arm rank lists feeding RRF fusion — sparse =
    (doc_id, rank_sparse), dense = (doc_id, rank_dense), each the
    arm's top-``_RRF_ARM_TOP`` for the document-0 query. Shared by
    ``hybrid_search_rrf`` (fusion) and ``hybrid_pooled_recall_eval``
    (arm-vs-fusion quality harness), so the two queries evaluate the
    IDENTICAL retrieval systems."""
    from ..functions.vectors import as_double, sql_dot

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).localCheckpoint(eager=False)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = (
        tok.where(F.col("doc_id") == _RRF_QDOC).select("term").distinct()
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    term_score = F.round(
        (idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0)))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (
                F.lit(1.0 - _BM25_B)
                + (F.lit(_BM25_B) * F.col("dl")) / F.col("avgdl")
            )
        ),
        6,
    )
    # restrict df to the query terms BEFORE broadcasting: the full
    # term-df frame is vocabulary-scale, the restricted one is
    # |qterms| rows at any corpus size
    qdf = df.join(F.broadcast(qterms), "term")
    sparse_scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .where(F.col("doc_id") != _RRF_QDOC)
        .select("doc_id", term_score.alias("ts"))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("ts").cast("decimal(28,10)")), 6)
             .cast("double").alias("score"))
    )
    ws = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    sparse_rank = (
        sparse_scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_RRF_ARM_TOP)
        .withColumn("rank_sparse", F.row_number().over(ws))
    ).select("doc_id", "rank_sparse")
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    qv = emb.where(F.col("vec_id") == _RRF_QDOC).select(
        F.col("v").alias("qv")
    )
    dense_scored = (
        emb.where(F.col("vec_id") != _RRF_QDOC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            # one parsed SQL string, not ~190 py4j Column round trips
            # (r15); sqrt(straight-line self-dot) == the HOF norm
            # fold bit-for-bit — see functions.vectors.sql_dot
            F.expr(
                f"round({sql_dot('qv', 'v', 64)} / "
                f"(sqrt({sql_dot('qv', 'qv', 64)}) * "
                f"sqrt({sql_dot('v', 'v', 64)})), 6)"
            ).alias("cos"),
        )
    )
    wd = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    dense_rank = (
        dense_scored.orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(_RRF_ARM_TOP)
        .withColumn("rank_dense", F.row_number().over(wd))
    ).select("doc_id", "rank_dense")
    return sparse_rank, dense_rank


@register(
    "hybrid_search_rrf",
    _RRF_SQL,
    doc=f"Hybrid retrieval via reciprocal-rank fusion (K={_RRF_K}, "
    "Cormack et al. 2009): document-0-as-query BM25 lexical arm + "
    "embedding-cosine dense arm over the id-aligned corpus, per-arm "
    f"top-{_RRF_ARM_TOP} rank lists fused by 1/(K+rank) sums into "
    f"the top-{_RRF_TOP} — the calibration-free sparse+dense "
    "combiner RAG retrieval stacks run (extension).",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rank_sparse, rank_dense, rrf_score, rank) top fusion.

    Scale shape: each arm is its existing scalable plan — the BM25
    arm's aggregates partial-combine and its query-term set rides a
    broadcast (the per-doc score SUM partial-combines on doc_id);
    the dense arm is the broadcast-1-query cosine scan (at 100 TB it
    would route through the IMI/SQ8 index instead — same (id, rank)
    contract into the fusion). Fusion itself touches only the two
    ARM_TOP-row rank lists: a full-outer join on doc_id plus two
    IEEE divisions per row. Per-term BM25 scores are 6dp-rounded
    BEFORE the per-doc sum (left-assoc order irrelevant: the SUM is
    over <= |qterms| rounded values re-rounded at 6dp; both engines
    aggregate the identical value set per doc — order effects sit
    below the rounding grid) and ranks are integers, so the fused
    ordering is engine-identical.
    """
    sparse_rank, dense_rank = _rrf_arms(spark, sf_dir)
    return _rrf_fuse(sparse_rank, dense_rank)


def _rrf_fuse(sparse_rank: DataFrame, dense_rank: DataFrame) -> DataFrame:
    """RRF fusion of the two arm rank lists into the ranked
    top-``_RRF_TOP`` — (doc_id, rank_sparse, rank_dense, rrf_score,
    rank). Shared by the fusion query and the quality harness."""
    fused = (
        sparse_rank.join(dense_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            "rank_sparse",
            "rank_dense",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_sparse")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_dense")),
                    F.lit(0.0),
                ),
                6,
            ).alias("rrf_score"),
        )
    )
    wf = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(_RRF_TOP)
        .withColumn("rank", F.row_number().over(wf).cast("bigint"))
        .orderBy("rank")
    )


# --- hybrid retrieval quality harness: pooled-consensus recall -------
# There are no human relevance labels on a synthetic corpus, so the
# harness uses the pooling convention (the TREC device RRF itself is
# built on, Cormack et al. 2009: documents retrieved by MULTIPLE
# independent systems are the best available relevance proxy): the
# pseudo-relevant pool = the intersection of the two arms' ARM_TOP
# lists, and each system (sparse-only, dense-only, fused) is scored
# by how much of that pool its top-10 recovers. Fusion should
# dominate its arms here BY DESIGN — the row quantifies the gain
# (and a regression where it stops dominating means an arm or the
# fusion broke), mirroring ann_recall_eval's role for the ANN index.

_RRF_EVAL_SQL = (
    _RRF_SQL[: _RRF_SQL.rindex(
        "SELECT doc_id, rank_sparse, rank_dense, rrf_score"
    )]
    + f"""
    , rrf_rank AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY rrf_score DESC, doc_id) AS rn
        FROM fused
      ) WHERE rn <= {_RRF_TOP}
    ),
    pool AS (
      SELECT s.doc_id FROM sparse_rank s
      JOIN dense_rank_ d ON d.doc_id = s.doc_id
    ),
    pn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pool FROM pool),
    systems AS (
      SELECT 'dense' AS system, doc_id, CAST(rank_dense AS BIGINT) AS rank
      FROM dense_rank_ WHERE rank_dense <= {_RRF_TOP}
      UNION ALL
      SELECT 'rrf' AS system, doc_id, rank FROM rrf_rank
      UNION ALL
      SELECT 'sparse' AS system, doc_id, CAST(rank_sparse AS BIGINT) AS rank
      FROM sparse_rank WHERE rank_sparse <= {_RRF_TOP}
    ),
    hits AS (
      SELECT sy.system,
             CAST(COUNT(p.doc_id) AS BIGINT) AS n_hits,
             MIN(CASE WHEN p.doc_id IS NOT NULL THEN sy.rank END)
               AS first_hit
      FROM systems sy LEFT JOIN pool p ON p.doc_id = sy.doc_id
      GROUP BY sy.system
    )
    SELECT h.system,
           CAST({_RRF_TOP} AS BIGINT) AS top_k,
           pn.n_pool,
           h.n_hits,
           CAST(CASE WHEN pn.n_pool = 0 THEN 0
                     ELSE h.n_hits * 1000000 // pn.n_pool END
                AS BIGINT) AS recall_ppm,
           CAST(COALESCE(h.first_hit, 0) AS BIGINT) AS first_hit_rank
    FROM hits h, pn
    ORDER BY h.system
"""
)


@register(
    "hybrid_pooled_recall_eval",
    _RRF_EVAL_SQL,
    doc="Hybrid-retrieval quality harness: pooled-consensus recall@10 "
    "for the sparse arm, the dense arm, and their RRF fusion — the "
    "pseudo-relevant pool is the intersection of the two arms' "
    f"top-{_RRF_ARM_TOP} lists (the pooling convention underlying "
    "RRF, Cormack et al. 2009), each system scored by pool docs in "
    "its top-10 (integer ppm) plus the rank of its first pool hit — "
    "the scheduled fusion-health measurement mirroring "
    "ann_recall_eval (extension).",
)
def hybrid_pooled_recall_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(system, top_k, n_pool, n_hits, recall_ppm, first_hit_rank),
    one row per retrieval system in {dense, rrf, sparse}.

    Scale shape: the arms are the shared ``_rrf_arms`` plans (BM25
    partial-combining aggregates + broadcast-1-query cosine scan);
    everything added by the harness — pool intersection, the 3x10-row
    systems frame, hit counting — runs on ARM_TOP-sized rank lists,
    so evaluation cost is the arm cost regardless of corpus size. The
    arm lists are localCheckpointed (50 rows each) because three
    consumers (fusion, pool, systems) would otherwise re-derive the
    full scan lineage per consumer. Metrics are integer (ppm via
    DIV), so cross-engine hashes are exact; the n_pool = 0 guard
    keeps the division total (fixture pools are 5-6 docs).
    """
    sparse_rank, dense_rank = _rrf_arms(spark, sf_dir)
    sparse_rank = sparse_rank.localCheckpoint(eager=False)
    dense_rank = dense_rank.localCheckpoint(eager=False)
    rrf = _rrf_fuse(sparse_rank, dense_rank).select("doc_id", "rank")
    pool = (
        sparse_rank.join(dense_rank, "doc_id")
        .select("doc_id", F.lit(1).alias("hit"))
    )
    systems = (
        dense_rank.where(F.col("rank_dense") <= _RRF_TOP)
        .select(
            F.lit("dense").alias("system"),
            "doc_id",
            F.col("rank_dense").cast("bigint").alias("rank"),
        )
        .unionAll(
            rrf.select(F.lit("rrf").alias("system"), "doc_id", "rank")
        )
        .unionAll(
            sparse_rank.where(F.col("rank_sparse") <= _RRF_TOP).select(
                F.lit("sparse").alias("system"),
                "doc_id",
                F.col("rank_sparse").cast("bigint").alias("rank"),
            )
        )
    )
    hits = (
        systems.join(F.broadcast(pool), "doc_id", "left")
        .groupBy("system")
        .agg(
            F.count("hit").cast("bigint").alias("n_hits"),
            F.min(
                F.when(F.col("hit").isNotNull(), F.col("rank"))
            ).alias("first_hit"),
        )
    )
    pn = pool.agg(F.count(F.lit(1)).cast("bigint").alias("n_pool"))
    return (
        hits.crossJoin(F.broadcast(pn))
        .select(
            "system",
            F.lit(_RRF_TOP).cast("bigint").alias("top_k"),
            "n_pool",
            "n_hits",
            F.when(F.col("n_pool") == 0, F.lit(0).cast("bigint"))
            .otherwise(F.expr("n_hits * 1000000 DIV n_pool"))
            .alias("recall_ppm"),
            F.coalesce(F.col("first_hit"), F.lit(0))
            .cast("bigint")
            .alias("first_hit_rank"),
        )
        .orderBy("system")
    )
