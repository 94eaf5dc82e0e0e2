"""Near-duplicate detection: MinHash + LSH banding, SimHash (extensions).

The promised scale path for fuzzy dedup over a document corpus
(``operators/dedup.py`` handles the exact case). Everything is
built-in Column expressions — md5-based hashing so the DuckDB oracle
can reproduce signatures bit-for-bit (Spark's xxhash64/hash are
engine-private).

Pipeline (classic banded MinHash-LSH, e.g. Leskovec et al., "Mining
of Massive Datasets" ch. 3):

1. shingle: word n-grams of the whitespace-normalized text,
   deduplicated per document (set semantics for Jaccard).
2. signature: k minhash values; hash_i(s) = first 60 bits of
   md5(i || ':' || s) — engine-portable and uniform enough.
3. band: split the signature into b bands of r rows; band key =
   md5 of the band's joined values. Only documents sharing a band
   key ever meet.
4. candidates: self-join on (band index, band key) with id_a < id_b;
   distinct pairs.
5. verify: exact Jaccard over the shingle sets, threshold filter.

Scale notes: the only shuffles are the groupBy-band (narrow: id +
16-byte key) and the candidate join; no all-pairs stage ever
materializes. Probability a pair with Jaccard J becomes a candidate
is 1-(1-J^r)^b — tune (k, b, r) to the target threshold; the final
exact-Jaccard filter removes band false-positives, so the output is
exact w.r.t. recall misses only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def portable_hash64(c: Column, seed: int) -> Column:
    """First 60 bits of md5(seed:val) as a non-negative bigint.

    Identical in DuckDB as ``CAST('0x' || substr(md5(seed || ':' ||
    val), 1, 15) AS BIGINT)`` — the cross-engine contract the oracle
    relies on.
    """
    hx = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, 15)
    return F.conv(hx, 16, 10).cast("bigint")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text.

    Documents shorter than n tokens yield an empty array — guarded
    explicitly because ``sequence(1, k)`` with k <= 0 generates a
    DESCENDING sequence in Spark and index 0 would throw under ANSI.
    """
    ts = F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ts, i + j) for j in range(n)]
        ),
    )
    empty = F.array_except(F.array(F.lit("")), F.array(F.lit("")))
    return F.when(F.size(ts) >= n, F.array_distinct(grams)).otherwise(empty)


def minhash_signature(sg: Column, num_hashes: int) -> list[Column]:
    """k minhash values (one per seeded hash) over a shingle array.

    NB: the per-seed lambdas MUST be single-argument — Spark's
    higher-order functions bind a second lambda parameter to the
    array index, so a `k=k` default capture would be silently
    overwritten with a Column.
    """

    def mk(k: int) -> Column:
        return F.array_min(F.transform(sg, lambda s: portable_hash64(s, k)))

    return [mk(k) for k in range(num_hashes)]


def band_keys(sig_cols: list[Column], bands: int, rows: int) -> Column:
    """array<struct<band:int, bkey:string>> — one LSH key per band."""
    assert len(sig_cols) == bands * rows
    entries = []
    for b in range(bands):
        chunk = sig_cols[b * rows : (b + 1) * rows]
        key = F.md5(F.concat_ws(",", *[c.cast("string") for c in chunk]))
        entries.append(F.struct(F.lit(b).alias("band"), key.alias("bkey")))
    return F.array(*entries)


def simhash(sg: Column, bits: int = 16) -> Column:
    """SimHash fingerprint over a shingle set (bits-wide, default 16).

    bit_i = 1 iff more shingle hashes have bit i set than unset; the
    fingerprint is Σ bit_i << i. Near-dup candidates are fingerprints
    within small Hamming distance (pairing via the same banding
    machinery as MinHash — split the fingerprint into byte bands).
    """
    def ones_at(i: int) -> Column:
        # single-arg lambda: see minhash_signature note on index binding
        return F.size(
            F.filter(
                sg,
                lambda s: portable_hash64(s, 0).bitwiseAND(F.lit(1 << i))
                != 0,
            )
        )

    total = F.size(sg)
    acc = F.lit(0).cast("bigint")
    for i in range(bits):
        bit = F.when(ones_at(i) * 2 > total, F.lit(1)).otherwise(F.lit(0))
        acc = acc + bit.cast("bigint") * F.lit(1 << i)
    return acc


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    rows: int = 3,
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact Jaccard >= threshold).

    Returns (id_a, id_b, jaccard) — jaccard rounded to 6 for
    cross-engine hash stability.
    """
    sg = shingles(F.col(text_col), ngram)
    base = docs.select(F.col(id_col).alias("id"), sg.alias("sg")).where(
        F.size(F.col("sg")) >= 1
    )
    sig = minhash_signature(F.col("sg"), num_hashes)
    # the banded frame carries only (id, band, bkey) — shingle arrays
    # stay OUT of the LSH shuffle; they rejoin only for the (much
    # smaller) candidate verification
    keyed = base.select(
        "id", F.explode(band_keys(sig, bands, rows)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))

    a = keyed.select("band", "bkey", F.col("id").alias("id_a"))
    b = keyed.select("band", "bkey", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs = cand.join(
        base.select(F.col("id").alias("id_a"), F.col("sg").alias("sg_a")),
        "id_a",
    ).join(
        base.select(F.col("id").alias("id_b"), F.col("sg").alias("sg_b")),
        "id_b",
    )
    jac = F.size(F.array_intersect("sg_a", "sg_b")) / F.size(
        F.array_union("sg_a", "sg_b")
    )
    return (
        pairs.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
