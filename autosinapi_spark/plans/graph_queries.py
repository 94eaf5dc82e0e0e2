"""Dedup cluster resolution — connected components over near-dup pairs.

MinHash-LSH (``near_dedup_queries``) ends at PAIRS; this module runs
the step every production dedup pipeline needs next: merge pairs into
duplicate clusters (connected components) and emit one keep/drop
verdict per document. The fixture corpus is extended to THREE
generations per document (original, +suffix, +suffix+suffix2) so
clusters form transitive CHAINS — A~B and B~C where A~C may miss the
LSH bands — and the component merge is doing real work, not echoing
the pair list.

The DuckDB oracle replays the identical MinHash pipeline (shared CTE
builder, ``near_dedup_queries.minhash_pairs_ctes``) and resolves
components with a recursive min-reachable-id CTE — the same
WITH RECURSIVE pattern as the BOM oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.graph import resolve_clusters
from ..operators.near_dedup import minhash_near_dup_pairs
from .near_dedup_queries import (
    BANDS,
    ID_OFFSET,
    K,
    ROWS,
    SUFFIX,
    minhash_pairs_ctes,
)
from .registry import register

# Second-generation perturbation: twin2 = twin1 + SUFFIX2, so
# J(orig, twin1) and J(twin1, twin2) are both high while
# J(orig, twin2) is lower — the cluster only assembles transitively.
SUFFIX2 = " anexo revisado em versao final"
# Every 4th document keeps the query proportional to the pair query
# (corpus = 3 x N/4 docs vs its 2 x N); the modulus pushes down to the
# parquet scan as a filter.
_MOD = 4


def _cc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("doc_id") % _MOD == 0
    )
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    orig = docs.select(F.col("doc_id"), norm.alias("text"))
    t1 = docs.select(
        (F.col("doc_id") + ID_OFFSET).alias("doc_id"),
        F.concat(norm, F.lit(SUFFIX)).alias("text"),
    )
    t2 = docs.select(
        (F.col("doc_id") + 2 * ID_OFFSET).alias("doc_id"),
        F.concat(norm, F.lit(SUFFIX), F.lit(SUFFIX2)).alias("text"),
    )
    return orig.unionByName(t1).unionByName(t2)


def _cc_oracle_ctes() -> str:
    """Shared WITH RECURSIVE chain (corpus -> pairs -> components ->
    sizes) for every query over the 3-generation twin corpus — ONE
    definition so the LSH parameters and the 0.5 threshold cannot
    drift between the resolution and keep-best oracles."""
    norm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""corpus AS (
      SELECT doc_id AS id, {norm} AS t
      FROM documents WHERE doc_id % {_MOD} = 0
      UNION ALL
      SELECT doc_id + {ID_OFFSET}, {norm} || '{SUFFIX}'
      FROM documents WHERE doc_id % {_MOD} = 0
      UNION ALL
      SELECT doc_id + {2 * ID_OFFSET}, {norm} || '{SUFFIX}{SUFFIX2}'
      FROM documents WHERE doc_id % {_MOD} = 0
    ),
    {minhash_pairs_ctes(0.5)},
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM scored
      UNION ALL
      SELECT id_b, id_a FROM scored
    ),
    walk(id, r) AS (
      SELECT id, id FROM corpus
      UNION
      SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.r
    ),
    comp AS (SELECT id, MIN(r) AS cluster_id FROM walk GROUP BY id),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS cluster_size
      FROM comp GROUP BY cluster_id
    )"""


def _cluster_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_oracle_ctes()}
    SELECT c.id AS doc_id, c.cluster_id, s.cluster_size,
           CASE WHEN c.id = c.cluster_id THEN 1 ELSE 0 END AS is_canonical
    FROM comp c JOIN sizes s USING (cluster_id)
    """


def _cc_clusters(spark: SparkSession, sf_dir: str):
    """Shared Spark pipeline: (corpus, clusters) — the single
    definition of the corpus/LSH-pair/connected-components stage both
    cluster queries run (mirrors ``_cc_oracle_ctes``)."""
    corpus = _cc_corpus(spark, sf_dir)
    pairs = minhash_near_dup_pairs(
        corpus,
        text_col="text",
        id_col="doc_id",
        num_hashes=K,
        bands=BANDS,
        rows=ROWS,
        threshold=0.5,
    ).select("id_a", "id_b")
    verts = corpus.select(F.col("doc_id").alias("id"))
    return corpus, resolve_clusters(verts, pairs)


@register(
    "dedup_cluster_resolution",
    _cluster_oracle(),
    doc="Duplicate-cluster resolution: MinHash-LSH pairs -> connected "
    "components (iterative min-label propagation) -> per-document "
    "keep/drop verdict with cluster id + size (extension; the "
    "post-pair step of every dedup pipeline).",
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every corpus doc labeled with its duplicate-cluster verdict.

    Scale shape: the pair stage is the banded-LSH pipeline (no
    all-pairs stage); the component loop shuffles only (id, label)
    longs and converges in O(cluster diameter) rounds — bounded by
    construction for dup clusters (see ``operators/graph.py``).
    Singleton docs (no near-dup) flow through as their own cluster.
    """
    _corpus, clusters = _cc_clusters(spark, sf_dir)
    return clusters.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        "cluster_size",
        "is_canonical",
    )


# --- cluster representative selection (quality-ranked keep) -----------


def _keep_best_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_oracle_ctes()},
    tokc AS (
      SELECT id,
             len(string_split(t, ' ')) AS nt,
             len(list_distinct(string_split(t, ' '))) AS nd
      FROM corpus
    ),
    ranked AS (
      SELECT c.cluster_id, c.id, t.nt,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY t.nd DESC, t.nt DESC, c.id)
               AS rn
      FROM comp c JOIN tokc t ON t.id = c.id
    )
    SELECT r.cluster_id, s.cluster_size,
           r.id AS kept_doc_id,
           r.nt AS kept_n_tokens,
           s.cluster_size - 1 AS n_dropped
    FROM ranked r JOIN sizes s USING (cluster_id)
    WHERE r.rn = 1
    """


@register(
    "dedup_cluster_keep_best",
    _keep_best_oracle(),
    doc="Cluster representative selection: per duplicate cluster keep "
    "the highest-quality member (most distinct tokens, then longest, "
    "then smallest id — integer-deterministic), emit kept doc + drop "
    "count. The step that turns cluster verdicts into the final "
    "corpus; unlike min-id canonicalization the kept doc is usually "
    "the richest generation, not the oldest (extension).",
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per duplicate cluster with its surviving document.

    Scale shape: identical to ``dedup_cluster_resolution`` (banded
    LSH pairs + O(diameter) label propagation over (id, label) longs)
    plus one per-cluster ROW_NUMBER window — partitioned by
    cluster_id, so no global sort; the quality rank is integer-only
    (distinct-token count, token count, id) to stay
    tie-deterministic across engines.
    """
    corpus, clusters = _cc_clusters(spark, sf_dir)
    ts = F.split(F.col("text"), " ")
    tokc = corpus.select(
        F.col("doc_id").alias("id"),
        F.size(ts).alias("nt"),
        F.size(F.array_distinct(ts)).alias("nd"),
    )
    from pyspark.sql import Window

    ranked = (
        clusters.join(tokc, "id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.desc("nd"), F.desc("nt"), F.asc("id")
                )
            ),
        )
        .where(F.col("rn") == 1)
    )
    return ranked.select(
        "cluster_id",
        "cluster_size",
        F.col("id").alias("kept_doc_id"),
        F.col("nt").alias("kept_n_tokens"),
        (F.col("cluster_size") - 1).alias("n_dropped"),
    )
