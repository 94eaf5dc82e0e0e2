"""End-to-end corpus curation pipeline — the LLM-data twin of
``pipeline.SinapiPipeline``.

Chains the engine's curation operators into the standard pre-training
funnel (the FineWeb/CCNet/Gopher composition):

    normalize -> length gate -> repetition gate -> exact dedup
    -> near dedup (MinHash-LSH pairs -> connected components ->
       keep cluster canonicals) -> benchmark decontamination
    -> deterministic shuffle-shard assignment [-> JSONL export]

Every stage is a pure DataFrame transformation; the run report counts
survivors per stage (the funnel a data-quality review reads). The
whole funnel is deterministic: hash-derived decisions only, so a
rerun on the same input yields byte-identical survivors — the
property the idempotent reference pipeline (SURVEY §3) has for
monthly loads, carried over to corpus builds.

Scale notes: stages communicate only through narrow columns
(fingerprints, cluster ids, shard keys); document text is carried,
not shuffled, until the final shard exchange. Gates run before the
(more expensive) dedup stages so the LSH corpus is already pruned.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.text import tokens
from .operators.graph import resolve_clusters
from .operators.near_dedup import minhash_near_dup_pairs


@dataclass
class CurationConfig:
    min_tokens: int = 10
    max_dup_token_frac: float = 0.5
    minhash_threshold: float = 0.5
    contamination_ngram: int = 5
    n_shards: int = 16
    shuffle_seed: int = 23
    id_col: str = "doc_id"
    text_col: str = "text"
    stages: tuple[str, ...] = (
        "length",
        "repetition",
        "exact_dedup",
        "near_dedup",
        "decontaminate",
    )
    extra: dict = field(default_factory=dict)


class CurationPipeline:
    """Run the funnel; ``run`` returns (final_df, stage_counts)."""

    def __init__(self, config: CurationConfig | None = None):
        self.cfg = config or CurationConfig()

    # --- stages -------------------------------------------------------

    def _normalized(self, docs: DataFrame) -> DataFrame:
        c = self.cfg
        norm = F.trim(F.regexp_replace(F.col(c.text_col), r"\s+", " "))
        return docs.select(
            F.col(c.id_col).alias("doc_id"),
            norm.alias("text"),
            *[col for col in docs.columns if col not in (c.id_col, c.text_col)],
        )

    def _length_gate(self, docs: DataFrame) -> DataFrame:
        return docs.where(
            F.size(tokens(F.col("text"))) >= self.cfg.min_tokens
        )

    def _repetition_gate(self, docs: DataFrame) -> DataFrame:
        ts = tokens(F.col("text"))
        frac = 1.0 - F.size(F.array_distinct(ts)).cast("double") / F.size(ts)
        return docs.where(frac <= self.cfg.max_dup_token_frac)

    def _exact_dedup(self, docs: DataFrame) -> DataFrame:
        # keep-first by doc_id within each exact-content group
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        return (
            docs.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _near_dedup(self, docs: DataFrame) -> DataFrame:
        pairs = minhash_near_dup_pairs(
            docs, text_col="text", id_col="doc_id",
            threshold=self.cfg.minhash_threshold,
        ).select("id_a", "id_b")
        verdicts = resolve_clusters(
            docs.select(F.col("doc_id").alias("id")), pairs
        )
        keep = verdicts.where(F.col("is_canonical") == 1).select(
            F.col("id").alias("doc_id")
        )
        return docs.join(keep, "doc_id")

    def _decontaminate(
        self, docs: DataFrame, eval_docs: DataFrame | None
    ) -> DataFrame:
        if eval_docs is None:
            return docs
        from .operators.near_dedup import shingles

        n = self.cfg.contamination_ngram
        bench = (
            eval_docs.select(
                F.explode(
                    shingles(F.trim(F.regexp_replace("text", r"\s+", " ")), n)
                ).alias("g")
            )
            .distinct()
        )
        grams = docs.select(
            "doc_id", F.explode(shingles(F.col("text"), n)).alias("g")
        )
        contaminated = (
            grams.join(F.broadcast(bench), "g").select("doc_id").distinct()
        )
        return docs.join(contaminated, "doc_id", "left_anti")

    def _assign_shards(self, docs: DataFrame) -> DataFrame:
        c = self.cfg
        hkey = F.md5(
            F.concat(
                F.lit(f"{c.shuffle_seed}:"), F.col("doc_id").cast("string")
            )
        )
        shard = (
            F.conv(F.substring(hkey, 1, 15), 16, 10).cast("bigint")
            % c.n_shards
        )
        return docs.withColumn("shard", shard)

    # --- driver -------------------------------------------------------

    def run(
        self,
        docs: DataFrame,
        eval_docs: DataFrame | None = None,
    ) -> tuple[DataFrame, dict[str, int]]:
        c = self.cfg
        cur = self._normalized(docs).localCheckpoint(eager=False)
        counts: dict[str, int] = {"input": cur.count()}
        stage_fns = {
            "length": self._length_gate,
            "repetition": self._repetition_gate,
            "exact_dedup": self._exact_dedup,
            "near_dedup": self._near_dedup,
            "decontaminate": lambda d: self._decontaminate(d, eval_docs),
        }
        for name in c.stages:
            cur = stage_fns[name](cur).localCheckpoint(eager=False)
            counts[name] = cur.count()
        cur = self._assign_shards(cur)
        counts["output"] = counts[c.stages[-1]] if c.stages else counts["input"]
        return cur, counts
