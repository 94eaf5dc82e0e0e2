"""Multimodal (binary-column) operators — plumbing for image/audio/video.

Media is modeled the way a 100 TB training-data lake stores it: an
opaque ``binary`` payload column plus typed metadata columns, so
Parquet scans prune payloads whenever a query touches only metadata.

The fixtures ship no real media, and this container has no
image/audio codecs, so the DECODE step is split exactly as the task
demands:

- the Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
  UDFs, batch shapes, explode semantics — is REAL and tested;
- the codec call itself is a deterministic fake (payload bytes are
  interpreted through a fixed synthetic header) behind the same
  signature a PIL/ffmpeg implementation would have — ONLY the
  compressed-format decode is faked; everything downstream of decoded
  bytes (frame chunking/striding, byte features, nearest-neighbor
  resize of raw bitmaps) is real arithmetic, numpy-pinned in tests.

Scale notes: every UDF here is ``mapInPandas`` (Arrow-batched, one
Python worker per partition, no per-row pickling); payload bytes
never shuffle — feature extraction projects them away in the same
stage that reads them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media catalog schema: payload + typed metadata (prunable without
# touching payload bytes)
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("byte_sum", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_hist", T.ArrayType(T.LongType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media catalog from the documents fixture.

    payload = utf-8 bytes of the text (stable across engines), with a
    synthetic '8-byte header' convention the fake decoder reads:
    width = byte0*256+byte1, height = byte2*256+byte3.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("synthetic").alias("format"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        (F.length("text") * 10).cast("int").alias("duration_ms"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """'Decode' payloads via the synthetic header (fake codec).

    Real implementation point: replace ``_fake_decode_batch``'s body
    with PIL.Image.open / soundfile.read — the Spark plumbing
    (schema, Arrow batching, column pruning) stays identical.
    """

    def _fake_decode_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().fillna(0).astype("int32")
            b = payloads.apply(
                lambda p: (p[0] * 256 + p[1], p[2] * 256 + p[3])
                if p is not None and len(p) >= 4
                else (None, None)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded_width": [x[0] for x in b],
                    "decoded_height": [x[1] for x in b],
                    "n_bytes": n,
                    "checksum": payloads.apply(
                        lambda p: sum(p) if p is not None else None
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        _fake_decode_batch, schema=DECODED_SCHEMA
    )


def extract_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Byte-level feature extraction (mean + histogram) per payload.

    The real-media analogue is an embedding/feature model over decoded
    pixels; byte statistics keep the computation real (vectorized
    numpy over Arrow batches) without codecs.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ns, sums, means, hists = [], [], [], []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    ns.append(None)
                    sums.append(None)
                    means.append(None)
                    hists.append(None)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                ns.append(len(p))
                sums.append(int(arr.sum(dtype=np.int64)))
                means.append(float(arr.mean()))
                hists.append(
                    np.bincount(arr // (256 // n_bins), minlength=n_bins)
                    .astype("int64")
                    .tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.array(ns, dtype="Int32"),
                    "byte_sum": pd.array(sums, dtype="Int64"),
                    "byte_mean": means,
                    "byte_hist": hists,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        _features, schema=FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame, frame_bytes: int = 64, every_nth: int = 1
) -> DataFrame:
    """Frame sampling: 1 input row -> N frame rows (video shape).

    Deterministic fake: the payload splits into fixed-size chunks
    standing in for decoded frames; a real implementation swaps the
    chunker for ffmpeg keyframe extraction. Demonstrates the
    one-to-many mapInPandas batch shape.

    ``every_nth`` is the sampling stride a real video pipeline applies
    (keep one frame per n, the fps-downsample shape): the emitted
    ``frame_idx`` keeps the ORIGINAL frame numbering (0, n, 2n, ...),
    not a re-densified one, so downstream joins against full-rate
    extractions still line up. A zero-length payload still yields its
    single empty frame (index 0 is always sampled).
    """
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    step = frame_bytes * every_nth

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                for i in range(0, max(len(p), 1), step):
                    ids.append(mid)
                    idxs.append(i // frame_bytes)
                    frames.append(bytes(p[i : i + frame_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select("media_id", "payload").mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    src_width_col: str = "width",
    src_height_col: str = "height",
) -> DataFrame:
    """Nearest-neighbor resize of RAW grayscale bitmaps (real, no
    codec): payload bytes are row-major ``src_height x src_width``
    pixels (the post-decode representation), output is ``height x
    width``. Implemented as vectorized numpy fancy indexing inside one
    Arrow-batched ``mapInPandas`` — the resize ARITHMETIC needs no
    image library; only decoding COMPRESSED formats does, and that
    remains :func:`decode_media`'s documented deployment swap
    (PIL/ffmpeg in place of the fake codec). Rows whose payload length
    does not match ``src_width * src_height`` are emitted with NULL
    pixels rather than dropped, so malformed media is visible
    downstream (the orphan-check convention). Pixel mapping is the
    standard floor grid ``src_idx = out_idx * src_dim // out_dim``,
    pinned against pure-numpy truth in tests/test_multimodal.py.
    """
    if width < 1 or height < 1:
        raise ValueError(f"target size must be >= 1x1, got {width}x{height}")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, pix = [], []
            for mid, sw, sh, p in zip(
                pdf["media_id"],
                pdf[src_width_col],
                pdf[src_height_col],
                pdf["payload"],
            ):
                ids.append(mid)
                # null metadata reaches pandas as NaN in a float
                # column, so isna() is the real null check here
                if (
                    p is None
                    or pd.isna(sw)
                    or pd.isna(sh)
                    or sw < 1
                    or sh < 1
                    or len(p) != int(sw) * int(sh)
                ):
                    pix.append(None)
                    continue
                img = np.frombuffer(p, dtype=np.uint8).reshape(
                    int(sh), int(sw)
                )
                rows = np.arange(height) * int(sh) // height
                cols = np.arange(width) * int(sw) // width
                pix.append(img[np.ix_(rows, cols)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "out_width": np.int32(width),
                    "out_height": np.int32(height),
                    "pixels": pix,
                }
            )

    return df.select(
        "media_id", src_width_col, src_height_col, "payload"
    ).mapInPandas(_resize, schema=RESIZED_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("b0", T.LongType(), False),
        T.StructField("b1", T.LongType(), False),
        T.StructField("b2", T.LongType(), False),
        T.StructField("b3", T.LongType(), False),
    ]
)

_AHASH_BITS = 64  # perceptual-hash width
_AHASH_STRIDE = 5  # fake-decode strip: stride-5 prefix window
_AHASH_BANDS = 4  # 4 x 16-bit bands (the Hamming-LSH pigeonhole keys)


def ahash_bands(df: DataFrame) -> DataFrame:
    """Average-hash (aHash) of each payload, emitted as 4 x 16-bit
    bands — the banded form Hamming-distance LSH joins on.

    The real-media analogue: decode, grayscale, resize to 8x8, and
    set bit_i = pixel_i > mean(pixels) — THE standard perceptual
    near-dup hash for images. The codec-free fake decode here takes
    the 64-sample stride-5 prefix strip of the payload bytes
    as the 'bitmap' (positions min(stride*i, n-1) — PREFIX-anchored,
    not length-normalized, because an insertion in a length-normalized
    sampling shifts every downstream sample and no near-dup pair
    survives; a real image resize is spatially stable, which the
    prefix strip emulates for byte streams). Everything downstream of
    the fake bitmap is the real algorithm: exact integer mean
    threshold (64 * sample > sum — no float), 16-bit band packing,
    and the caller's band-keyed candidate join + bit_count verify.
    Band k takes the INTERLEAVED bit positions {k, k+4, ..., k+60},
    not a contiguous 16-bit run: strip positions are spatially
    correlated (for these fixtures, late positions land in common
    corpus phrases; for real images, any contiguous image region can
    be flat), and a band made of correlated positions collapses to a
    few hot bucket values — measured on the sf0.1 fixture: the
    contiguous bands' squared-bucket-occupancy sums read 23k / 159k /
    1.4M / 4.3M (the candidate join's cost law) vs 58-77k for all
    four interleaved bands, a 55x cut of the worst band at identical
    pigeonhole recall (the 4 bands still partition all 64 bits).
    Null/empty payloads produce no row (a real decoder would skip
    undecodable media the same way).
    """

    def _ahash(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        shifts = np.arange(16, dtype=np.int64)
        for pdf in batches:
            ids, rows = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                b = np.frombuffer(p, dtype=np.uint8)
                idx = np.minimum(
                    _AHASH_STRIDE * np.arange(_AHASH_BITS), len(b) - 1
                )
                sm = b[idx].astype(np.int64)
                tot = int(sm.sum())
                bits = (_AHASH_BITS * sm > tot).astype(np.int64)
                ids.append(mid)
                rows.append(
                    [
                        int((bits[k::_AHASH_BANDS] << shifts).sum())
                        for k in range(_AHASH_BANDS)
                    ]
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "b0": pd.Series([r[0] for r in rows], dtype="int64"),
                    "b1": pd.Series([r[1] for r in rows], dtype="int64"),
                    "b2": pd.Series([r[2] for r in rows], dtype="int64"),
                    "b3": pd.Series([r[3] for r in rows], dtype="int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        _ahash, schema=AHASH_SCHEMA
    )
