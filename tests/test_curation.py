"""Semantic + plan-shape tests for the curation queries.

The registered queries are oracle-compared against DuckDB at sf0.01;
these pin the SEMANTICS (packing invariants, decontamination
soundness, sampling rates) and the physical shapes that make them
100 TB-safe (broadcast eval side, sharded — never global — windows).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from autosinapi_spark.plans.curation_queries import (
    _CONTAM_N,
    _EVAL_SOURCES,
    _PACK_BUDGET,
    _RATE_BY_LANG,
    _RATE_DEFAULT,
    decontaminate_ngram_overlap,
    doc_repetition_filter,
    pack_documents_bins,
    stratified_sample_documents,
)
from tests.conftest import SF_CORRECT, SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_decontaminate_reported_docs_truly_share_grams(spark):
    """Soundness vs a Python brute force on the smoke corpus: every
    reported doc shares >= 1 word n-gram with the eval split, with the
    exact distinct-gram count, and no leaking doc is missed."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()

    def grams(text):
        ts = " ".join(text.split()).split(" ")
        return {
            " ".join(ts[i : i + _CONTAM_N])
            for i in range(len(ts) - _CONTAM_N + 1)
        }

    bench = set()
    for r in docs:
        if r.source in _EVAL_SOURCES:
            bench |= grams(r.text)
    expected = {}
    for r in docs:
        if r.source not in _EVAL_SOURCES:
            n = len(grams(r.text) & bench)
            if n:
                expected[r.doc_id] = n

    got = {
        r.doc_id: r.n_shared_ngrams
        for r in decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_decontaminate_broadcasts_eval_side(spark):
    plan = _plan(decontaminate_ngram_overlap(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_packing_invariants(spark):
    """Per (shard, bin): bins are dense from 0, a bin before the last
    one holds >= budget only if a single doc overflows it, and
    exclusive-prefix-sum binning means every bin except possibly the
    last STARTS under budget: bin_tokens - last doc's tokens <
    budget always holds per construction; verify via totals."""
    rows = pack_documents_bins(spark, SF_CORRECT).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs
    for shard, bins in by_shard.items():
        bins.sort(key=lambda r: r.bin)
        assert bins[0].bin == 0
        assert [b.bin for b in bins] == list(range(len(bins)))  # dense
        # doc ranges of consecutive bins must not interleave: packing
        # respects the deterministic doc_id order within the shard
        for a, b in zip(bins, bins[1:]):
            assert a.last_doc < b.first_doc
        # every non-final bin was closed because it crossed the
        # budget: its cumulative tokens reach the bin's boundary
        cum = 0
        for b in bins[:-1]:
            cum += b.bin_tokens
            assert cum >= (b.bin + 1) * _PACK_BUDGET


def test_stratified_sample_rates_and_determinism(spark, no_rebalance):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    totals = {r.lang: r.c for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    got = stratified_sample_documents(spark, SF_CORRECT)
    kept = {r.lang: r.c for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    for lang, total in totals.items():
        rate = _RATE_BY_LANG.get(lang, _RATE_DEFAULT)
        # hash-uniform keeps ~rate of each stratum; 3 sigma of a
        # binomial at these counts
        sigma = (total * rate * (1 - rate)) ** 0.5
        assert abs(kept.get(lang, 0) - total * rate) <= 3 * sigma + 1
    # deterministic: same rows on a rerun (no RNG state)
    again = {r.doc_id for r in got.select("doc_id").collect()}
    ids = {r.doc_id for r in
           stratified_sample_documents(spark, SF_CORRECT)
           .select("doc_id").collect()}
    assert again == ids
    # row-local: no exchange anywhere in the filter plan
    assert "Exchange" not in _plan(got)


def test_repetition_filter_brute_force(spark):
    """Exact fractions vs Python on the smoke corpus."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    expected = {}
    for r in docs:
        ts = " ".join(r.text.split()).split(" ")
        if len(ts) < 2:
            continue
        dup = 1.0 - len(set(ts)) / len(ts)
        bgs = [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        top = max(bgs.count(g) for g in set(bgs))
        expected[r.doc_id] = (
            round(dup, 6),
            round(top / len(bgs), 6),
        )
    got = {
        r.doc_id: (r.dup_token_frac, r.top_bigram_frac)
        for r in doc_repetition_filter(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark, no_rebalance):
    """Winnowing's core guarantee (Schleimer et al. 2003): documents
    sharing a token run of length >= w + k - 1 share at least one
    fingerprint. Build synthetic pairs around the fixture corpus."""
    from autosinapi_spark.plans.text_queries import (
        _WINNOW_K,
        _WINNOW_W,
        doc_winnow_fingerprint,
    )

    need = _WINNOW_W + _WINNOW_K - 1
    shared = " ".join(f"s{i}" for i in range(need + 2))
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"{shared} zeta eta theta iota kappa"),
        (3, "totally different tokens here with no overlap at all x y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r
            for r in doc_winnow_fingerprint(spark, d).collect()
        }
    assert set(out) == {1, 2, 3}
    # recompute raw fingerprint sets in Python to check the overlap
    import hashlib

    def fps(text):
        ts = text.split()
        hh = [
            int(
                hashlib.md5(
                    ("0:" + " ".join(ts[i : i + _WINNOW_K])).encode()
                ).hexdigest()[:15],
                16,
            )
            for i in range(len(ts) - _WINNOW_K + 1)
        ]
        return {
            min(hh[i : i + _WINNOW_W])
            for i in range(len(hh) - _WINNOW_W + 1)
        }

    f1, f2, f3 = fps(rows[0][1]), fps(rows[1][1]), fps(rows[2][1])
    assert f1 & f2  # the guarantee
    assert not (f1 & f3) and not (f2 & f3)
    # and the Spark pipeline produced exactly these sets
    assert out[1].n_fingerprints == len(f1)
    assert out[2].n_fingerprints == len(f2)
    assert out[3].n_fingerprints == len(f3)


def test_profile_approx_stats_error_bounds(spark):
    from autosinapi_spark.catalog import load
    from autosinapi_spark.functions.text import tokens as _tokens
    from autosinapi_spark.plans.curation_queries import profile_approx_stats
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    approx = {
        r["lang"]: r for r in profile_approx_stats(spark, SF_SMOKE).collect()
    }
    docs = load(spark, SF_SMOKE, "documents")
    exact = {
        r["lang"]: r
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("sources"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for lang, a in approx.items():
        e = exact[lang]
        # exact companions must match a straight recompute
        assert a["n_docs"] == e["n_docs"]
        assert a["n_sources"] == e["sources"]
        # every sketch must land inside its documented error bound —
        # the query emits the bound checks itself (the oracle pins
        # these to literal TRUE)
        assert a["hll_sources_ok"] is True
        assert a["p50_in_bounds"] is True
        assert a["p90_in_bounds"] is True
