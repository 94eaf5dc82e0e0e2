"""Multimodal queries — binary payload plumbing over the media catalog.

All four media queries are fully oracle-checked: the fake codec's
byte math is deterministic over the utf-8 payload, so DuckDB can
replay it — ``ord(substr(...))`` arithmetic for decode/feature (the
byte histogram is serialized to CSV in the registered projection so
the canonicalizer can hash it), and ``range()`` stride offsets for
the one-to-many frame explosion. Numeric behaviour is additionally
pinned by unit tests (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    synth_media_from_documents,
)
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_media_from_documents(load(spark, sf_dir, "documents"))


@register(
    "media_binary_stats",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="Binary-column metadata plumbing: payload byte length + md5 "
    "computed on the binary column itself (multimodal extension).",
)
def media_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir)
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "media_decode_stats",
    # The synthetic payload is utf-8 of ASCII fixture text, so the fake
    # codec's byte math IS SQL-expressible: ord(substr) == payload byte.
    """
    SELECT doc_id AS media_id,
           ord(substr(text, 1, 1)) * 256 + ord(substr(text, 2, 1))
               AS decoded_width,
           ord(substr(text, 3, 1)) * 256 + ord(substr(text, 4, 1))
               AS decoded_height,
           length(text) AS n_bytes,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                i -> ord(substr(text, i, 1)))) AS BIGINT) AS checksum
    FROM documents
    """,
    doc="Arrow-batched decode via mapInPandas (fake codec over the "
    "synthetic header; real codec drops into the same plumbing). "
    "Fully oracle-checked: the ASCII fixture makes byte arithmetic "
    "expressible as ord(substr(...)) in DuckDB.",
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(_media(spark, sf_dir))


@register(
    "media_feature_extract",
    """
    WITH b AS (
      SELECT doc_id AS media_id,
             list_transform(range(1, length(text) + 1),
                            i -> ord(substr(text, i, 1))) AS bs
      FROM documents
    )
    SELECT media_id,
           len(bs) AS n_bytes,
           CAST(list_sum(bs) AS BIGINT) AS byte_sum,
           ROUND(CAST(list_sum(bs) AS DOUBLE) / len(bs), 6) AS byte_mean,
           array_to_string(list_transform(range(0, 16),
               h -> CAST(len(list_filter(bs, x -> x // 16 = h))
                         AS VARCHAR)), ',') AS byte_hist_csv
    FROM b
    """,
    doc="Vectorized byte-histogram feature extraction per payload "
    "(mapInPandas; the embedding-model slot in a real pipeline). The "
    "registered projection serializes the histogram to CSV so the "
    "driver canonicalizer can sort it; the raw array<long> stays on "
    "the operator API (operators/multimodal.py extract_features).",
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        "byte_sum",
        F.round(F.col("byte_sum").cast("double") / F.col("n_bytes"), 6)
        .alias("byte_mean"),
        F.array_join(F.col("byte_hist").cast("array<string>"), ",")
        .alias("byte_hist_csv"),
    )


@register(
    "media_frame_sample",
    # Frames are deterministic fixed-size slices of the ASCII payload,
    # so the one-to-many explosion IS SQL-expressible: 256-byte frames
    # sampled every 2nd frame (the fps-downsample shape: offsets step
    # 512, frame_idx keeps ORIGINAL numbering 0, 2, 4, ...; empty
    # payloads still yield their single zero-byte frame 0, matching
    # the chunker's max(len, 1) floor). frame_md5 hashes the exact
    # slice CONTENT, so the oracle pins offset/bounds arithmetic, not
    # just lengths (text is ASCII, so char slicing == byte slicing).
    """
    WITH d AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE text IS NOT NULL
    )
    SELECT media_id,
           CAST(off // 256 AS INT) AS frame_idx,
           CAST(LEAST(256, n - off) AS INT) AS frame_bytes,
           md5(substr(text, off + 1, 256)) AS frame_md5
    FROM (
      SELECT media_id, text, n,
             unnest(range(0, GREATEST(n, 1), 512)) AS off
      FROM d
    )
    """,
    doc="Frame sampling: one media row explodes to frame rows (video "
    "decode shape), downsampled to every 2nd 256-byte frame with "
    "original frame numbering preserved. Fully oracle-checked "
    "including per-frame content md5: DuckDB replays the stride "
    "offsets, tail bounds, and exact slice bytes.",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(_media(spark, sf_dir), frame_bytes=256, every_nth=2)
    return frames.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )
