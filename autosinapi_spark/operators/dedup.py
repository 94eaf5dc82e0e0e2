"""Deduplication operators.

Reference semantics (exact/keyed):

- A1 keyed dedup — ``drop_duplicates(subset=[...])`` for catalogs and
  edges (``/root/reference/autosinapi/core/processor.py:256-258,296,
  310-312,418-430``). pandas keeps the FIRST row; to make the survivor
  deterministic and oracle-expressible we use an explicit
  ``row_number`` ordering instead of Spark's arbitrary
  ``dropDuplicates``.

LLM-pipeline extensions (exact text dedup here; MinHash/SimHash live
in ``near_dedup.py``).

Scale notes: keyed dedup is one hash shuffle on the key with partial
aggregation map-side; survivor selection via min/max_by avoids a full
window sort when only "keep first by ordering" is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    descending: bool = False,
) -> DataFrame:
    """Deterministic keyed dedup: keep first row per key by ordering (A1).

    Spark's ``dropDuplicates`` keeps an arbitrary row; a window with an
    explicit total order makes the survivor stable (SURVEY §7.3).
    """
    ordering = [F.desc(c) if descending else F.asc(c) for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_text_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact-duplicate groups over a document corpus.

    Hash-groupBy on (optionally whitespace-normalized) text; survivor =
    min id. Returns (survivor id, dup_count). At 100 TB the groupBy key
    should be ``sha2(text)`` rather than the raw text to keep shuffle
    rows narrow — we group on the digest and keep text out of the
    shuffle entirely.
    """
    key = F.col(text_col)
    if normalize:
        key = F.trim(F.regexp_replace(key, r"\s+", " "))
    digest = F.sha2(key, 256).alias("__k")
    return (
        df.select(digest, F.col(id_col))
        .groupBy("__k")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__k")
    )
