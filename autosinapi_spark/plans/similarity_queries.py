"""Embedding similarity-search queries (LLM-pipeline extensions).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (candidate set shrinks ~2^bits-fold). Both
are pure DataFrame plans: the query side is broadcast, the dot product
runs in zip_with/aggregate JVM expressions.

Cosines are rounded to 6 decimals BEFORE ranking in both engines so
float accumulation-order differences cannot flip a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load
from ..functions.vectors import as_double, cosine, sign_bucket
from .registry import register

_N_QUERIES = 8
_TOP_K = 5

_COS_SQL = """
      list_dot_product(q.v, c.v)
      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
"""

_BRUTE_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             ROUND({_COS_SQL}, 6) AS cos_sim
      FROM e q JOIN e c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, cand_id, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= {_TOP_K}
"""


@register(
    "ann_bruteforce_topk",
    _BRUTE_ORACLE,
    doc="Brute-force cosine top-k per query vector (ANN correctness "
    "baseline; extension).",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = emb.join(broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


_LSH_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
           + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
           + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
           + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             ROUND({_COS_SQL}, 6) AS cos_sim
      FROM e q JOIN e c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, cand_id, cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= {_TOP_K}
"""


@register(
    "ann_lsh_topk",
    _LSH_ORACLE,
    doc="LSH-bucketed ANN: sign-pattern buckets (4 bits) shrink the "
    "candidate join ~16x — the 100 TB scale path (extension).",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        sign_bucket(F.col("embedding"), 4).alias("bucket"),
    )
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    pairs = emb.join(
        broadcast(q),
        (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


@register(
    "embedding_label_centroids",
    """
    SELECT label, u.pos - 1 AS dim,
           ROUND(CAST(SUM(CAST(u.val AS DECIMAL(28,10))) AS DOUBLE)
                 / COUNT(*), 8) AS centroid_val
    FROM (
      SELECT label,
             unnest(list_transform(CAST(embedding AS DOUBLE[]),
                                   (x, i) -> {pos: i, val: x})) AS u
      FROM embeddings
    )
    GROUP BY label, u.pos - 1
    """,
    doc="Per-label centroid via posexplode + exact decimal mean "
    "(vector aggregate shape; extension).",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(as_double(F.col("embedding")))
    ).toDF("label", "dim", "val")
    return exploded.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            8,
        ).alias("centroid_val")
    )
