"""Streaming ingestion with persisted-signature near-dedup: the
end-to-end loop over corpus_signatures — accepted docs' signatures
persist, later batches dedup against the STORE (not corpus text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from autosinapi_spark.catalog import load
from autosinapi_spark.streaming.ingest import (
    accept_batch,
    ingest_dedup_available_now,
)
from tests.conftest import SF_SMOKE


def _docs(spark, lo, hi):
    return (
        load(spark, SF_SMOKE, "documents")
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def test_accept_batch_drops_intra_batch_twins(spark):
    from autosinapi_spark.operators.near_dedup import minhash_near_dup_pairs

    base = _docs(spark, 0, 40)
    twins = base.withColumn("doc_id", F.col("doc_id") + 1000)
    batch = base.unionByName(twins)
    kept = accept_batch(batch, None)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # every identical twin (jaccard 1.0) loses to its smaller-id
    # original; base docs that near-dup a SMALLER base doc (the
    # fixtures plant such pairs) are rejected by the same rule
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    base_rejected = {
        r["id_b"] for r in minhash_near_dup_pairs(base).collect()
    }
    assert ids == base_ids - base_rejected
    assert not (ids & {r["doc_id"] + 1000 for r in base.collect()})


def test_ingest_stream_dedups_against_signature_store(spark, tmp_path):
    landing = tmp_path / "landing"
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")

    from autosinapi_spark.operators.near_dedup import corpus_signatures

    first = _docs(spark, 0, 60)
    first.write.mode("overwrite").parquet(str(landing / "b1"))
    ingest_dedup_available_now(spark, str(landing / "*"), corpus, store, ckpt)
    # differential oracle: the pure-batch accept over the same input
    want1 = accept_batch(first, None)
    want1_ids = {r["doc_id"] for r in want1.select("doc_id").collect()}
    got1_ids = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got1_ids == want1_ids
    # signature store carries one row per accepted doc, no text column
    sigs = spark.read.parquet(store)
    assert sigs.count() == len(want1_ids)
    assert set(sigs.columns) == {"id", "sg", "hh"}

    # batch 2: half re-delivered (near-dup of stored docs), half new
    redelivered = _docs(spark, 20, 60).withColumn(
        "doc_id", F.col("doc_id") + 5000
    )
    fresh = _docs(spark, 60, 90)
    batch2 = redelivered.unionByName(fresh)
    batch2.write.mode("overwrite").parquet(str(landing / "b2"))
    ingest_dedup_available_now(spark, str(landing / "*"), corpus, store, ckpt)
    out_ids = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    want2 = accept_batch(batch2, corpus_signatures(want1))
    want_ids = want1_ids | {
        r["doc_id"] for r in want2.select("doc_id").collect()
    }
    assert out_ids == want_ids  # re-delivered content rejected
    assert not (out_ids & {r["doc_id"] for r in redelivered.collect()})
    assert spark.read.parquet(store).count() == len(want_ids)

    # idempotence: rerun with no new files — checkpoint skips everything
    ingest_dedup_available_now(spark, str(landing / "*"), corpus, store, ckpt)
    assert spark.read.parquet(corpus).count() == len(want_ids)
