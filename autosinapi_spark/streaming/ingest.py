"""Streaming corpus ingestion with persisted-signature near-dedup.

The end-to-end ingestion-time shape for a training corpus: a
``Trigger.AvailableNow`` stream drains a landing zone of new document
files; each micro-batch is near-dedup-checked against the ALREADY
ACCEPTED corpus via its persisted MinHash signature store (never
against raw corpus text), accepted docs land in the corpus table and
their signatures append to the store — so the expensive shingle+hash
pass runs exactly once per document LIFETIME, at ingestion.

This closes the loop promised by
:func:`..operators.near_dedup.corpus_signatures`: the batch query
surface (``near_dedup_incremental``) proves the cross-side join
correct; this operator runs the same join continuously.

Scale notes: per micro-batch cost is banding(B) + the (band, bkey)
bucket join against the store — the store side is a parquet scan of
(id, sg, hh) with no text column; at 100 TB corpus scale the store is
partitioned by ingestion date and the join shuffles only
(id, band, 16-byte key) plus the candidate verify rejoin. Intra-batch
duplicates are resolved greedily (keep the smallest doc_id of each
matched pair) before the cross-corpus check, mirroring the reference's
first-wins dedup policy (/root/reference/autosinapi/etl_pipeline.py's
drop_duplicates sites at lines 303 and 318).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.near_dedup import (
    corpus_signatures,
    minhash_incremental_matches,
    minhash_near_dup_pairs,
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def accept_batch(
    batch: DataFrame,
    old_signatures: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 12,
    bands: int = 4,
    rows: int = 3,
    ngram: int = 3,
    batch_signatures: DataFrame | None = None,
) -> DataFrame:
    """Docs from ``batch`` that survive near-dedup (pure batch logic,
    reused by the streaming wrapper and directly testable).

    Two-stage: (1) intra-batch — for every near-dup pair keep the
    smaller id (greedy first-wins; a chain a~b~c keeps only a, the
    deliberate aggressive choice for ingestion), (2) cross-corpus —
    drop batch docs matching any stored signature at >= threshold.

    Pass ``batch_signatures`` (a :func:`corpus_signatures` frame over
    ``batch``, ideally checkpointed) and the batch text is never
    shingled here — both stages band from the precomputed (sg, hh).
    """
    pairs = minhash_near_dup_pairs(
        batch,
        text_col,
        id_col,
        num_hashes,
        bands,
        rows,
        ngram,
        threshold,
        signatures=batch_signatures,
    )
    intra_rejected = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = batch.join(intra_rejected, id_col, "left_anti")
    if old_signatures is None:
        return survivors
    surv_sigs = (
        batch_signatures.join(
            survivors.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
        if batch_signatures is not None
        else None
    )
    matches = minhash_incremental_matches(
        None,
        survivors,
        text_col,
        id_col,
        num_hashes,
        bands,
        rows,
        ngram,
        threshold,
        old_signatures=old_signatures,
        new_signatures=surv_sigs,
    )
    cross_rejected = matches.select(F.col("new_id").alias(id_col)).distinct()
    return survivors.join(cross_rejected, id_col, "left_anti")


def ingest_dedup_available_now(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    sig_store_path: str,
    checkpoint_dir: str,
    schema: T.StructType = DOCS_SCHEMA,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ngram: int = 3,
    fmt: str = "parquet",
) -> None:
    """Drain the landing dir, near-dedup each batch against the
    persisted signature store, append accepted docs + signatures.

    File progress is tracked in the stream checkpoint (re-delivered
    FILES are skipped); re-delivered ROWS are dropped by the dedup
    itself, so the pipeline is idempotent at both granularities —
    the streaming extension of the K2 append-ignore-conflicts policy.
    """

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        # Top-level pyspark.errors.AnalysisException covers both the
        # classic captured subclass and the Spark Connect one; the
        # .captured import missed Connect's, failing the first batch.
        from pyspark.errors import AnalysisException

        s = batch.sparkSession
        try:
            store = s.read.parquet(sig_store_path)
        except AnalysisException as exc:
            # ONLY the store-not-yet-created case (first batch) may
            # fall back to no-cross-dedup; any other analysis error
            # (corrupt part-file, permissions) must fail the batch —
            # silently continuing would admit duplicates forever.
            if exc.getErrorClass() not in (
                "PATH_NOT_FOUND",
                "UNABLE_TO_INFER_SCHEMA",
            ):
                raise
            store = None
        # pin the batch: it is referenced by the pair self-join, the
        # cross join, and two anti-joins — without the checkpoint the
        # file-source batch re-reads per reference
        pinned = batch.localCheckpoint(eager=True)
        # shingle+hash the batch text EXACTLY once; both dedup stages
        # band from this frame, and the store write below reuses it
        sigs = corpus_signatures(
            pinned, text_col, id_col, ngram
        ).localCheckpoint(eager=True)
        accepted = accept_batch(
            pinned,
            store,
            text_col,
            id_col,
            threshold=threshold,
            ngram=ngram,
            batch_signatures=sigs,
        ).localCheckpoint(eager=True)
        # corpus first, signatures second: a crash between the two
        # leaves accepted docs without signatures, so a LATER batch
        # could admit one of their near-dups (bounded duplication) —
        # never the reverse (signatures blocking docs that don't
        # exist). At deployment both writes become one transactional
        # multi-table commit in a table format (Delta/Iceberg).
        accepted.write.mode("append").parquet(corpus_path)
        sigs.join(
            accepted.select(F.col(id_col).alias("id")), "id", "left_semi"
        ).write.mode("append").parquet(sig_store_path)

    q = (
        spark.readStream.schema(schema)
        .format(fmt)
        .load(landing_dir)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
