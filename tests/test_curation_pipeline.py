"""End-to-end curation funnel (curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from autosinapi_spark.catalog import load
from autosinapi_spark.curation import CurationConfig, CurationPipeline
from tests.conftest import SF_SMOKE


def _corpus(spark):
    """Fixture docs + planted problems: an exact copy, a near-dup twin,
    a too-short doc, and a token-repetition doc."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [
            # exact duplicate of doc 0 (whitespace noise only)
            (900001, None),
            # short doc (< min_tokens)
            (900002, "too short"),
            # repetition junk
            (900003, " ".join(["spam"] * 40)),
        ],
        "doc_id long, text string",
    )
    d0 = docs.where(F.col("doc_id") == 0).first()["text"]
    extra = extra.withColumn(
        "text",
        F.when(F.col("doc_id") == 900001, F.lit("  " + d0 + "  ")).otherwise(
            F.col("text")
        ),
    )
    twin = docs.where(F.col("doc_id") == 1).select(
        F.lit(900004).cast("long").alias("doc_id"),
        F.concat("text", F.lit(" fim do documento")).alias("text"),
    )
    return docs.unionByName(extra).unionByName(twin)


def test_funnel_drops_each_planted_problem(spark):
    corpus = _corpus(spark)
    pipe = CurationPipeline(CurationConfig(min_tokens=10))
    final, counts = pipe.run(corpus)
    ids = {r["doc_id"] for r in final.select("doc_id").collect()}

    assert 900002 not in ids  # length gate
    assert 900003 not in ids  # repetition gate
    assert 900001 not in ids  # exact dedup (doc 0 survives: smaller id)
    assert 0 in ids  # global min id is always its cluster's canonical
    # near dedup: the planted twin has the largest id in its cluster, so
    # it can never be canonical (doc 1 itself may legitimately lose to a
    # natural near-dup with a smaller id in the fixture corpus)
    assert 900004 not in ids

    # funnel counts decrease monotonically through the gates
    seq = [counts["input"]] + [
        counts[s] for s in pipe.cfg.stages
    ]
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert counts["output"] == len(ids)
    # every surviving doc got a shard in range
    shards = {r["shard"] for r in final.select("shard").collect()}
    assert shards <= set(range(pipe.cfg.n_shards))


def test_funnel_is_deterministic_across_reruns(spark):
    corpus = _corpus(spark)
    pipe = CurationPipeline()
    a, ca = pipe.run(corpus)
    b, cb = pipe.run(corpus)
    assert ca == cb
    rows_a = sorted(
        (r["doc_id"], r["shard"]) for r in a.select("doc_id", "shard").collect()
    )
    rows_b = sorted(
        (r["doc_id"], r["shard"]) for r in b.select("doc_id", "shard").collect()
    )
    assert rows_a == rows_b


def test_decontamination_stage_drops_eval_overlap(spark):
    corpus = _corpus(spark)
    pipe = CurationPipeline()
    # pick a doc that SURVIVES the upstream gates, then rerun with its
    # text as the benchmark: that survivor must now be dropped
    baseline, base_counts = pipe.run(corpus)
    victim = baseline.select("doc_id").orderBy("doc_id").first()["doc_id"]
    eval_docs = corpus.where(F.col("doc_id") == victim).select("text")
    final, counts = pipe.run(corpus, eval_docs=eval_docs)
    ids = {r["doc_id"] for r in final.select("doc_id").collect()}
    assert victim not in ids
    assert counts["decontaminate"] < base_counts["decontaminate"]
