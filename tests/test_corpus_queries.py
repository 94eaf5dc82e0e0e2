"""Semantics + plan shapes for the corpus-hygiene queries
(plans/corpus_queries.py)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from autosinapi_spark.plans.corpus_queries import (
    dedup_lines_c4,
    doc_unigram_logprob,
    pii_redact_documents,
    tfidf_top_terms,
    url_domain_stats,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_line_dedup_removes_cross_doc_duplicates(spark):
    rows = dedup_lines_c4(spark, SF_SMOKE).collect()
    assert all(r["n_kept"] <= r["n_lines"] for r in rows)
    # the tiny shared vocabulary guarantees cross-doc line collisions
    assert sum(r["n_lines"] - r["n_kept"] for r in rows) > 0
    # a doc that kept everything hashes its full line sequence
    assert all((r["kept_hash"] == "") == (r["n_kept"] == 0) for r in rows)


def test_line_dedup_keeps_first_occurrence(spark):
    # global keep-first: total kept lines == count of distinct lines
    df = dedup_lines_c4(spark, SF_SMOKE)
    kept_total = df.agg(F.sum("n_kept")).first()[0]
    from autosinapi_spark.catalog import load
    from autosinapi_spark.functions.text import tokens
    from autosinapi_spark.plans.corpus_queries import _lines

    docs = load(spark, SF_SMOKE, "documents")
    distinct_lines = (
        docs.select(tokens(F.col("text")).alias("ts"))
        .select(F.explode(_lines(F.col("ts"))).alias("line"))
        .distinct()
        .count()
    )
    assert kept_total == distinct_lines


def test_tfidf_rank_is_dense_per_doc(spark):
    rows = tfidf_top_terms(spark, SF_SMOKE).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_pii_counts_match_injection_rule(spark):
    rows = pii_redact_documents(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["n_emails"] == (1 if r["doc_id"] % 3 == 0 else 0)
        assert r["n_phones"] == (1 if r["doc_id"] % 5 == 0 else 0)


def test_pii_redaction_is_row_local(spark, no_rebalance):
    plan = _plan(pii_redact_documents(spark, SF_SMOKE))
    assert "Exchange" not in plan  # pure projection, zero shuffles


def test_url_domains_match_injection_rule(spark):
    from autosinapi_spark.catalog import load

    rows = {r["domain"]: r for r in url_domain_stats(spark, SF_SMOKE).collect()}
    assert all(
        d.endswith(".example.org") or d.endswith(".example.net")
        for d in rows
    )
    # every even doc contributes exactly one site URL
    n_even = (
        load(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") % 2 == 0)
        .count()
    )
    assert sum(
        r["n_urls"] for d, r in rows.items() if d.endswith(".example.org")
    ) == n_even


def test_unigram_logprob_is_negative_and_finite(spark):
    rows = doc_unigram_logprob(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["lm_score"] < 0.0
        assert r["n_tokens"] > 0


def test_no_cartesian_anywhere(spark):
    for fn in (dedup_lines_c4, tfidf_top_terms, doc_unigram_logprob):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan


def test_entropy_and_mixed_language_are_row_local(spark, no_rebalance):
    from autosinapi_spark.plans.text_queries import doc_char_entropy
    from autosinapi_spark.plans.corpus_queries import doc_mixed_language

    for fn in (doc_char_entropy, doc_mixed_language):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "Exchange" not in plan, fn.__name__


def test_recipe_queries_have_no_cartesian(spark):
    from autosinapi_spark.plans.curation_queries import (
        corpus_curation_report,
        temperature_mix_sources,
    )
    from autosinapi_spark.plans.near_dedup_queries import (
        dedup_substring_spans,
        near_dedup_incremental,
    )

    for fn in (
        temperature_mix_sources,
        corpus_curation_report,
        dedup_substring_spans,
        near_dedup_incremental,
    ):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, fn.__name__


def test_cms_overestimates_within_bound(spark):
    """CMS structural guarantees: est >= exact for every tracked term
    (min of collided counters can never undercount), the 2N/w bound
    holds, and a pure-Python sketch replay agrees exactly."""
    import hashlib
    from collections import Counter, defaultdict

    from autosinapi_spark.catalog import load
    from autosinapi_spark.functions.text import tokens as _tokens
    from autosinapi_spark.plans.corpus_queries import (
        _CMS_SEEDS,
        _CMS_W,
        cms_token_frequency,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = cms_token_frequency(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_est >= r.n_exact
        assert r.overcount == r.n_est - r.n_exact
        assert r.within_bound is True

    # Python replay of the exact sketch
    toks = [
        t
        for row in load(spark, SF_SMOKE, "documents")
        .select(_tokens(F.col("text")).alias("ts"))
        .collect()
        for t in row.ts
    ]

    def h(seed, tok):
        return int(
            hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:15], 16
        ) % _CMS_W

    counters = defaultdict(int)
    for t in toks:
        for j, s in enumerate(_CMS_SEEDS):
            counters[(j, h(s, t))] += 1
    exact = Counter(toks)
    for r in rows:
        assert exact[r.token] == r.n_exact
        assert r.n_est == min(
            counters[(j, h(s, r.token))]
            for j, s in enumerate(_CMS_SEEDS)
        )


def test_perplexity_buckets_tercile_replay(spark):
    """Bucket assignment must replay from the registered LM scores:
    per language, NTILE(3) over (score desc, doc_id)."""
    from collections import defaultdict

    from autosinapi_spark.plans.corpus_queries import (
        doc_unigram_logprob,
        perplexity_buckets,
    )
    from autosinapi_spark.catalog import load
    from tests.conftest import SF_SMOKE

    scores = {
        r.doc_id: r.lm_score
        for r in doc_unigram_logprob(spark, SF_SMOKE).collect()
    }
    langs = {
        r.doc_id: r.lang
        for r in load(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    by_lang = defaultdict(list)
    for d, lang in langs.items():
        by_lang[lang].append(d)

    def ntile3(ds):
        ordered = sorted(ds, key=lambda d: (-scores[d], d))
        n = len(ordered)
        out = {}
        base, rem = divmod(n, 3)
        sizes = [base + (1 if i < rem else 0) for i in range(3)]
        pos = 0
        for b, sz in enumerate(sizes, start=1):
            for d in ordered[pos : pos + sz]:
                out[d] = ["head", "middle", "tail"][b - 1]
            pos += sz
        return out

    expect = {}
    for ds in by_lang.values():
        expect.update(ntile3(ds))

    got = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_source_token_kl_python_replay(spark):
    """Full Python recomputation of per-source KL(source ‖ corpus)
    from the raw docs; also pins Gibbs' inequality (KL >= 0) and the
    token-count marginals."""
    import math
    from collections import Counter

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.corpus_queries import source_token_kl

    got = {r.source: r for r in source_token_kl(spark, SF_SMOKE).collect()}

    docs = load(spark, SF_SMOKE, "documents").select("source", "text").collect()
    st: Counter = Counter()
    for r in docs:
        for t in " ".join(r.text.split()).split(" "):
            st[(r.source, t)] += 1
    s_tot: Counter = Counter()
    t_tot: Counter = Counter()
    for (s, t), c in st.items():
        s_tot[s] += c
        t_tot[t] += c
    c_all = sum(st.values())

    assert set(got) == set(s_tot)
    assert sum(r.n_tokens for r in got.values()) == c_all
    for s in s_tot:
        kl = sum(
            (c / s_tot[s]) * math.log((c / s_tot[s]) / (t_tot[t] / c_all))
            for (src, t), c in st.items()
            if src == s
        )
        assert got[s].n_tokens == s_tot[s]
        assert got[s].n_distinct == sum(
            1 for (src, _t) in st if src == s
        )
        assert got[s].kl_nats >= 0.0  # Gibbs' inequality
        assert abs(got[s].kl_nats - kl) < 1e-5, (s, got[s].kl_nats, kl)


def test_source_oov_rate_python_replay(spark):
    from collections import Counter

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.corpus_queries import (
        _OOV_VOCAB_V,
        source_oov_rate,
    )

    got = {r.source: r for r in source_oov_rate(spark, SF_SMOKE).collect()}

    docs = load(spark, SF_SMOKE, "documents").select("source", "text").collect()
    occ: Counter = Counter()
    per_src: Counter = Counter()
    for r in docs:
        for t in " ".join(r.text.split()).split(" "):
            occ[t] += 1
            per_src[(r.source, t)] += 1
    vocab = {
        t
        for t, _c in sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_OOV_VOCAB_V
        ]
    }
    for s in {src for (src, _t) in per_src}:
        n = sum(c for (src, _t), c in per_src.items() if src == s)
        oov = sum(
            c for (src, t), c in per_src.items() if src == s and t not in vocab
        )
        r = got[s]
        assert (r.n_tokens, r.n_oov) == (n, oov)
        assert r.oov_ppm == (oov * 1_000_000) // n
        assert 0 < r.oov_ppm < 1_000_000  # fixture exercises both sides


def test_source_zipf_fit_python_replay(spark):
    import math
    from collections import Counter, defaultdict

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.corpus_queries import source_zipf_fit

    got = {r.source: r for r in source_zipf_fit(spark, SF_SMOKE).collect()}

    docs = load(spark, SF_SMOKE, "documents").select("source", "text").collect()
    per_src = defaultdict(Counter)
    for r in docs:
        for t in " ".join(r.text.split()).split(" "):
            per_src[r.source][t] += 1
    for s, cnts in per_src.items():
        pts = [
            (math.log(rk + 1), math.log(c))
            for rk, (_t, c) in enumerate(
                sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        inter = (sy - slope * sx) / n
        r = got[s]
        assert r.n_terms == n
        assert abs(r.zipf_slope - slope) < 2e-6
        assert abs(r.zipf_intercept - inter) < 2e-6
        assert r.zipf_slope < 0  # frequency decreases with rank


def test_dsir_importance_weights_python_replay(spark):
    """Hashed uni+bigram importance model replayed in Python."""
    import hashlib
    import math
    from collections import Counter

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.corpus_queries import (
        _DSIR_BUCKETS,
        _DSIR_SEED,
        _DSIR_TARGET,
        dsir_importance_weights,
    )

    got = {
        r.doc_id: r
        for r in dsir_importance_weights(spark, SF_SMOKE).collect()
    }

    def h(f):
        hx = hashlib.md5(f"{_DSIR_SEED}:{f}".encode()).hexdigest()[:15]
        return int(hx, 16) % _DSIR_BUCKETS

    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    per_doc, n_t, n_all = {}, Counter(), Counter()
    for r in docs:
        ts = " ".join(r.text.split()).split(" ")
        feats = ts + [f"{a}_{b}" for a, b in zip(ts, ts[1:])]
        dims = [h(f) for f in feats]
        per_doc[r.doc_id] = dims
        for d in dims:
            n_all[d] += 1
            if r.source == _DSIR_TARGET:
                n_t[d] += 1
    nt, na, B = sum(n_t.values()), sum(n_all.values()), _DSIR_BUCKETS
    lr = {
        d: math.log((n_t[d] + 1) / (nt + B))
        - math.log((n_all[d] + 1) / (na + B))
        for d in n_all
    }
    for doc_id, dims in per_doc.items():
        s = sum(lr[d] for d in dims)
        r = got[doc_id]
        assert r.n_feats == len(dims)
        assert abs(r.dsir_score - s / len(dims)) < 1e-5
        assert r.is_targetlike == (s > 0)
    # the target slice must score higher on average than the pool
    tgt = [r for r in docs if r.source == _DSIR_TARGET]
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean([got[r.doc_id].dsir_score for r in tgt]) > mean(
        [got[r.doc_id].dsir_score for r in docs]
    )


def test_gopher_quality_flags_python_replay(spark):
    """Rule bundle replayed in Python; both keep and drop sides hit."""
    import re

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.text_queries import (
        _GOPHER_MAX_MWL,
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_ALPHA_PPM,
        _GOPHER_MIN_MWL,
        _GOPHER_MIN_STOP_HITS,
        _GOPHER_MIN_WORDS,
        _GOPHER_STOPWORDS,
        gopher_quality_flags,
    )

    got = {r.doc_id: r for r in gopher_quality_flags(spark, SF_SMOKE).collect()}

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    for d in docs:
        ts = " ".join(d.text.split()).split(" ")
        n = len(ts)
        stop = sum(1 for w in ts if w in _GOPHER_STOPWORDS)
        mwl = round(sum(len(w) for w in ts) / n, 6)
        alpha = sum(1 for w in ts if re.search("[a-zA-Z]", w)) * 1_000_000 // n
        r = got[d.doc_id]
        assert (r.n_words, r.stop_hits, r.alpha_ppm) == (n, stop, alpha)
        assert abs(r.mean_word_len - mwl) < 2e-6
        exp_pass = (
            _GOPHER_MIN_WORDS <= n <= _GOPHER_MAX_WORDS
            and _GOPHER_MIN_MWL <= mwl <= _GOPHER_MAX_MWL
            and stop >= _GOPHER_MIN_STOP_HITS
            and alpha >= _GOPHER_MIN_ALPHA_PPM
        )
        assert r.gopher_pass == exp_pass
        assert r.gopher_pass == (
            r.ok_words and r.ok_mwl and r.ok_stop and r.ok_alpha
        )
    # the thresholds must actually split the fixture
    passes = [r.gopher_pass for r in got.values()]
    assert any(passes) and not all(passes)


def test_dsir_gumbel_resample_python_replay(spark):
    """Gumbel-top-k selection replayed from the weight frame."""
    import hashlib
    import math

    from autosinapi_spark.plans.corpus_queries import (
        _DSIR_GUMBEL_SEED,
        _DSIR_HASH_DEN,
        _DSIR_N,
        dsir_gumbel_resample,
        dsir_importance_weights,
    )

    rows = dsir_gumbel_resample(spark, SF_SMOKE).collect()
    weights = {
        r.doc_id: r.dsir_score
        for r in dsir_importance_weights(spark, SF_SMOKE).collect()
    }

    def gumbel(doc_id):
        hx = hashlib.md5(
            f"{_DSIR_GUMBEL_SEED}:{doc_id}".encode()
        ).hexdigest()[:15]
        u = (int(hx, 16) + 1) / _DSIR_HASH_DEN
        return -math.log(-math.log(u))

    keyed = sorted(
        (
            (-round(score + gumbel(d), 6), d)
            for d, score in weights.items()
        )
    )[:_DSIR_N]
    exp = {
        d: (weights[d], -negk, rk)
        for rk, (negk, d) in enumerate(keyed, start=1)
    }
    got = {r.doc_id: (r.dsir_score, r.gumbel_key, r.sample_rank) for r in rows}
    assert set(got) == set(exp)
    for d, (score, key, rk) in exp.items():
        gs, gk, grk = got[d]
        assert gs == score and grk == rk
        assert abs(gk - key) < 2e-6
    # selection must enrich for high scores vs the pool average
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean([weights[d] for d in got]) > mean(list(weights.values()))


def test_inverted_index_full_blocks_reassemble(spark):
    """Sharded blocks must reassemble to the exact full postings list:
    contiguous block numbering, every block bounded at _IDX_BLOCK (all
    but the last exactly full), concatenation sorted and df-sized, and
    the first K ids equal to the bounded-head query's postings."""
    from collections import defaultdict

    from autosinapi_spark.plans.corpus_queries import (
        _IDX_BLOCK,
        _IDX_POSTINGS_K,
        inverted_index_postings,
        inverted_index_postings_full,
    )

    by_term = defaultdict(list)
    for r in inverted_index_postings_full(spark, SF_SMOKE).collect():
        assert 1 <= r.n_block <= _IDX_BLOCK
        ids = [int(x) for x in r.postings.split(",")]
        assert len(ids) == r.n_block
        by_term[r.term].append((r.block_no, ids, r.df, r.ctf))

    head = {
        r.term: r for r in inverted_index_postings(spark, SF_SMOKE).collect()
    }
    assert set(by_term) == set(head)
    assert any(len(bs) > 1 for bs in by_term.values())  # multi-block terms

    for term, blocks in by_term.items():
        blocks.sort()
        assert [b[0] for b in blocks] == list(range(len(blocks)))
        for _, ids, _, _ in blocks[:-1]:
            assert len(ids) == _IDX_BLOCK
        full = [i for _, ids, _, _ in blocks for i in ids]
        assert full == sorted(full)
        assert len(full) == blocks[0][2]  # df spans all blocks
        hr = head[term]
        assert hr.df == blocks[0][2]
        assert hr.ctf == blocks[0][3]
        assert full[:_IDX_POSTINGS_K] == [
            int(x) for x in hr.postings.split(",")
        ]


def test_bloom_prefilter_matches_exact_decontamination(spark):
    """The bloom stage is a pure prefilter: output must be IDENTICAL
    to the exact broadcast-join query (false positives die in the
    verify join), and the plan must actually contain the row-local
    hash probes plus no forced broadcast of the full gram set."""
    from autosinapi_spark.plans.curation_queries import (
        decontaminate_bloom_prefilter,
        decontaminate_ngram_overlap,
    )

    exact = {
        (r.doc_id, r.n_shared_ngrams)
        for r in decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
    }
    bloom_df = decontaminate_bloom_prefilter(spark, SF_SMOKE)
    bloom = {(r.doc_id, r.n_shared_ngrams) for r in bloom_df.collect()}
    assert len(exact) > 0
    assert bloom == exact
    plan = _plan(bloom_df)
    assert "xxhash64" in plan


def test_phrase_match_python_replay(spark):
    """Phrase occurrences recounted with plain python over the raw
    text must equal the positional-join result exactly."""
    import re as _re

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.corpus_queries import (
        phrase_match_positional,
    )

    got = {
        r.doc_id: (r.phrase, r.n_phrase)
        for r in phrase_match_positional(spark, SF_SMOKE).collect()
    }
    assert got
    phrase = next(iter(got.values()))[0]
    w = phrase.split(" ")
    assert len(w) == 3

    exp = {}
    for r in load(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect():
        ts = _re.sub(r"\s+", " ", r.text.strip()).split(" ")
        n = sum(
            1
            for i in range(len(ts) - 2)
            if ts[i : i + 3] == w
        )
        if n:
            exp[r.doc_id] = (phrase, n)
    assert got == exp


def test_positional_index_positions_are_exact(spark):
    """Every posting's positions must point at actual occurrences of
    the term in the document, tf == len(positions), and df counts the
    docs the term appears in."""
    import re as _re
    from collections import defaultdict

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.corpus_queries import (
        inverted_index_positional,
    )

    toks = {
        r.doc_id: _re.sub(r"\s+", " ", r.text.strip()).split(" ")
        for r in load(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = inverted_index_positional(spark, SF_SMOKE).collect()
    assert rows
    docs_per_term = defaultdict(set)
    for r in rows:
        ps = [int(x) for x in r.positions.split(",")]
        assert r.tf == len(ps)
        assert ps == sorted(ps)
        for p in ps:
            assert toks[r.doc_id][p - 1] == r.term  # 1-based positions
        docs_per_term[r.term].add(r.doc_id)
    for r in rows:
        assert r.df == len(docs_per_term[r.term])


def _py_rrf_arms(spark):
    """Pure-Python re-derivation of both retrieval arms' rank lists
    (doc -> 1-based rank, top _RRF_ARM_TOP each) — shared by the
    fusion replay and the pooled-recall-harness replay."""
    import math
    from collections import Counter

    from autosinapi_spark.catalog import load
    from autosinapi_spark.functions.text import tokens
    from autosinapi_spark.plans.corpus_queries import (
        _BM25_B,
        _BM25_K1,
        _RRF_ARM_TOP,
        _RRF_QDOC,
    )
    from tests.conftest import SF_SMOKE

    docs = (
        load(spark, SF_SMOKE, "documents")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .collect()
    )
    toks = {r.doc_id: list(r.toks) for r in docs}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    qterms = set(toks[_RRF_QDOC])
    sparse = {}
    for d in tf:
        if d == _RRF_QDOC:
            continue
        s = sum(
            round(
                math.log(
                    1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)
                )
                * (tf[d][t] * (_BM25_K1 + 1.0))
                / (
                    tf[d][t]
                    + _BM25_K1
                    * (1.0 - _BM25_B + (_BM25_B * dl[d]) / avgdl)
                ),
                6,
            )
            for t in qterms
            if tf[d][t]
        )
        if s:
            sparse[d] = round(s, 6)
    sparse_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(sparse.items(), key=lambda kv: (-kv[1], kv[0]))[
                :_RRF_ARM_TOP
            ]
        )
    }
    emb = load(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    qv = vecs[_RRF_QDOC]
    nq = math.sqrt(sum(x * x for x in qv))
    dense = {}
    for d, v in vecs.items():
        if d == _RRF_QDOC:
            continue
        nv = math.sqrt(sum(x * x for x in v))
        dense[d] = round(
            sum(a * b for a, b in zip(qv, v)) / (nq * nv), 6
        )
    dense_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(dense.items(), key=lambda kv: (-kv[1], kv[0]))[
                :_RRF_ARM_TOP
            ]
        )
    }
    return sparse_rank, dense_rank


def test_hybrid_search_rrf_python_replay(spark):
    """RRF fusion replayed in Python: BM25 arm from re-derived
    tf/df/dl stats, dense arm from exact cosines, 1/(K+rank) sums."""
    from autosinapi_spark.plans.corpus_queries import (
        _RRF_K,
        _RRF_TOP,
        hybrid_search_rrf,
    )
    from tests.conftest import SF_SMOKE

    got = hybrid_search_rrf(spark, SF_SMOKE).collect()
    sparse_rank, dense_rank = _py_rrf_arms(spark)
    fused = {}
    for d in set(sparse_rank) | set(dense_rank):
        fused[d] = round(
            (1.0 / (_RRF_K + sparse_rank[d]) if d in sparse_rank else 0.0)
            + (1.0 / (_RRF_K + dense_rank[d]) if d in dense_rank else 0.0),
            6,
        )
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_TOP]
    assert [(r.doc_id, r.rrf_score) for r in got] == want
    for r in got:
        assert r.rank_sparse == sparse_rank.get(r.doc_id)
        assert r.rank_dense == dense_rank.get(r.doc_id)


def test_hybrid_pooled_recall_eval_python_replay(spark):
    """The fusion-quality harness replayed in Python: pool = arm
    intersection, per-system top-10 hits, ppm recall, first-hit
    rank — and the structural claim that RRF's pool recall is at
    least each arm's (fusion dominates by construction; a regression
    here means an arm or the fusion broke)."""
    from autosinapi_spark.plans.corpus_queries import (
        _RRF_K,
        _RRF_TOP,
        hybrid_pooled_recall_eval,
    )
    from tests.conftest import SF_SMOKE

    got = {
        r.system: r
        for r in hybrid_pooled_recall_eval(spark, SF_SMOKE).collect()
    }
    assert set(got) == {"sparse", "dense", "rrf"}

    sparse_rank, dense_rank = _py_rrf_arms(spark)
    fused = {}
    for d in set(sparse_rank) | set(dense_rank):
        fused[d] = round(
            (1.0 / (_RRF_K + sparse_rank[d]) if d in sparse_rank else 0.0)
            + (1.0 / (_RRF_K + dense_rank[d]) if d in dense_rank else 0.0),
            6,
        )
    rrf_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[
                :_RRF_TOP
            ]
        )
    }
    pool = set(sparse_rank) & set(dense_rank)
    assert pool, "fixture must produce a non-empty consensus pool"
    for name, ranks in (
        ("sparse", sparse_rank),
        ("dense", dense_rank),
        ("rrf", rrf_rank),
    ):
        top10 = {d: r for d, r in ranks.items() if r <= _RRF_TOP}
        hits = {d: r for d, r in top10.items() if d in pool}
        row = got[name]
        assert row.top_k == _RRF_TOP
        assert row.n_pool == len(pool)
        assert row.n_hits == len(hits), name
        assert row.recall_ppm == len(hits) * 1000000 // len(pool)
        assert row.first_hit_rank == (min(hits.values()) if hits else 0)
    # fusion must recover at least as much of the consensus pool as
    # either arm alone (RRF's raison d'etre)
    assert got["rrf"].n_hits >= max(
        got["sparse"].n_hits, got["dense"].n_hits
    )
