"""Round-13-registered query (built in r11, optimized + staged in
r12, flipped to ``@register`` at the r13 window rewrite).

Registration budget note: this flip — together with the two
``staged_r13b`` rows — takes the registry from 198 to 201, which
deliberately crosses the ``max(3, ceil(N/50))`` staleness-bound
threshold: bound 4 -> 5, rotation capacity 200 -> 250, ending the
zero-margin treadmill (docs/R13_PLAN.md §1, the r12 verdict's ask #1).

``suffix_window_rank`` — distributed suffix ranking by prefix
doubling (Manber & Myers 1990), the building block of exact-substring
deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" builds a suffix array to find 50-token
duplicate spans). For every character position of every document, the
query computes the DENSE RANK of its L=32-character window among all
corpus positions, then emits the lexicographic head with per-window
duplicate counts — equal ranks ARE the duplicate-window clusters the
dedup pass consumes.

Algorithm (all ranks integers, bit-deterministic):

- round 0: the first 8 characters pack row-locally into one BIGINT
  code (base-256 ascii, zero-padded past the document end so a
  shorter suffix sorts first, matching binary string collation;
  0x7F7F7F7F7F7F7F7F ~ 9.19e18 — inside int64 on ASCII only), then
  one dense re-rank compresses the codes to <= n before any pairing
  (r15: the pack was 4 chars + 3 doubling rounds; widening to 8
  trades one doc-keyed lead() pass for a pairing-free round-0
  re-rank — measured 5.66 -> 5.06 s solo at sf0.1/8 cores, ~nil at
  32 cores where the loop is re-rank-bound, and it retires the old
  round-1 tight spot where pair codes reached ~4.6e18 with only 2x
  headroom);
- 2 doubling rounds (8 -> 16 -> 32): each round joins every
  position with its ``p + step`` neighbor IN THE SAME DOCUMENT
  (missing neighbor = rank 0), then DENSELY re-ranks the (r1, r2)
  pairs so rank values stay <= n and the next round's pair encoding
  ``r1 * (max_rank + 1) + r2`` cannot overflow: n^2 < 2^63 holds
  through n ~ 3e9 positions; past that (the 100 TB regime) the
  re-rank switches to a range-partitioned sort per shard — the
  standard large-scale SA construction — with the same round
  structure. That ceiling is a RUNTIME check too (r12 ADVICE): each
  pairing round's 1-row rank-bound frame raises when mr + 1 >
  floor(sqrt(2^63 - 1)) = 3037000499, so a ~3e9-distinct-rank corpus
  errors loudly with the remediation named instead of overflowing;
  with the round-0 re-rank every pairing round's mr is a dense-rank
  count <= n, so that ONE guard covers them uniformly. Any codepoint
  past 127 (Spark ``ascii`` returns the full codepoint) would
  overflow the 8-char pack itself (128 * 256^7 == 2^63): a RUNTIME
  guard (r11 ADVICE) raises via ``raise_error`` on the first
  codepoint > 127, so a non-ASCII corpus errors loudly instead of
  overflowing (ANSI) or silently corrupting ranks — such a corpus
  must byte-normalize first. The fixture-ASCII guard
  (tests/test_multimodal.py) protects the oracle comparison for the
  same reason (codepoint order vs binary collation).
- the dense re-rank itself never sorts globally: pair codes are cut
  into <= _SFX_NBLK contiguous VALUE-range blocks (block id = code
  DIV ceil(code_space / NBLK), order-preserving by construction),
  each block dense_ranks its rows partition-locally (equal codes
  share a rank, so no pre-distinct is needed), and block offsets
  come from an exclusive prefix sum over the NBLK-bounded per-block
  distinct-count frame (max(dense_rank) per block) — the
  hierarchical-prefix-sum pattern of ``systematic_weighted_sample``,
  applied to an order instead of a key line. Value-range blocking
  assumes the code space is roughly uniformly occupied; a
  pathologically repetitive corpus concentrates codes in few blocks,
  degrading a block's rank window toward a single task (measured
  fine at 1.5M positions: tools/stress_repetitive.py) — the
  range-sampled partitioner above is the production answer there
  too.

Windows do NOT cross document boundaries (each document is its own
suffix universe, the semantics a per-document dedup wants); the
DuckDB oracle is therefore one window function — DENSE_RANK over
``substr(text, pos + 1, 32)`` — over the exploded position set, which
also pins the engine-parity assumption: integer ascii ranks equal
binary string collation only while the fixture is pure ASCII (already
guarded by tests/test_multimodal.py's fixture assertion).

Reference parity note: the reference engine (a single-process pandas
ETL, /root/reference/autosinapi/) has no text-indexing operators;
this is an extension for the 100 TB curation target, the exact-arm
complement to the rolling-hash ``dedup_substring_spans``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

# Kept for import compatibility with round-12 tooling snapshots; the
# query now registers directly into plans.registry.REGISTRY.
STAGED: dict = {}


_SFX_PACK = 8  # characters packed row-locally into the round-0 code
_SFX_ROUNDS = 2  # doubling rounds: 8 -> 16 -> 32
_SFX_WINDOW = _SFX_PACK * (2 ** _SFX_ROUNDS)  # = 32
_SFX_NBLK = 4096  # contiguous value-range blocks per dense re-rank
_SFX_TOP = 500  # emitted lexicographic head


_SFX_SQL = f"""
    WITH pos AS (
      SELECT d.doc_id, CAST(u.i AS BIGINT) AS local_pos,
             substr(d.text, CAST(u.i AS INT) + 1, {_SFX_WINDOW}) AS w
      FROM documents d, unnest(range(0, length(d.text))) AS u(i)
    ),
    ranked AS (
      SELECT doc_id, local_pos, w,
             DENSE_RANK() OVER (ORDER BY w) AS sfx_rank,
             COUNT(*) OVER (PARTITION BY w) AS dup_count
      FROM pos
    )
    SELECT CAST(sfx_rank AS BIGINT) AS sfx_rank,
           CAST(dup_count AS BIGINT) AS dup_count,
           doc_id, local_pos, w AS window_text
    FROM ranked
    ORDER BY sfx_rank, doc_id, local_pos
    LIMIT {_SFX_TOP}
"""


@register(
    "suffix_window_rank",
    _SFX_SQL,
    doc=f"Distributed suffix ranking by prefix doubling (Manber-Myers; "
    f"the Lee-et-al exact-substring-dedup index): dense rank of every "
    f"position's {_SFX_WINDOW}-char window via a packed {_SFX_PACK}-"
    f"char densely re-ranked round 0 "
    f"plus {_SFX_ROUNDS} dense-re-rank doubling rounds (hierarchical "
    "value-range blocking, never a global sort); emits the "
    f"top-{_SFX_TOP} lexicographic head with duplicate-window counts "
    "(extension).",
)
def suffix_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sfx_rank, dup_count, doc_id, local_pos, window_text) for the
    500 lexicographically-first window positions.

    Scale shape per round: one doc-partitioned lead() window for the
    neighbor rank (positions are dense per document, so lead(rank,
    step) IS the rank at p + step — one exchange, no self-join
    build; NOTE the skew bound this trades for: partitionBy(doc_id)
    serializes each document's positions onto ONE task, so round
    latency is floored by the longest single document — fine for
    web-scale corpora of ~1e4-1e6-char docs, but a corpus dominated
    by one multi-GB document should fall back to the (doc_id, p)
    self-join form this replaced, which hash-partitions positions
    across tasks), ONE blk-keyed exchange carrying the whole dense
    re-rank (block-partitioned dense_rank over the non-distinct
    position frame + an NBLK-bounded per-block distinct-count
    aggregate + exclusive-offset window, <= 4096 rows, broadcast
    back — no distinct pass, no code-keyed join back; r14 cut the
    former 4-exchange re-rank to this 1-exchange form, 9.5s -> 6.3s
    solo at sf0.1) — every frame carries only (doc_id, long, long)
    triples; document
    text is touched exactly twice (the row-local round-0 pack and the
    final 500-row window_text join). Rounds are FIXED (no driver
    action inside the loop), so the whole query is one lazy DAG whose
    localCheckpoints bound lineage without synchronization barriers.
    The final head is TakeOrdered (500 rows), never a global sort.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # round 0: pack the first _SFX_PACK chars at every position into
    # one base-256 code, row-local (a code slot past the document end
    # reads 0, so a suffix shorter than the pack sorts first,
    # = binary collation). Each digit is cast to BIGINT BEFORE the
    # place-value multiply: ascii() returns int32, and under ANSI
    # mode 128 * 256^3 == 2^31 already overflows the int multiply —
    # so codepoints >= 128 in the leading slot would error spuriously
    # (and the Latin-1 guard below could never produce its message).
    # The codepoints come from a MATERIALIZED array column, indexed
    # O(1) per position: the former substring(text, i, 1) per pack
    # slot was O(i) on UTF8String (char->byte seek from the string
    # head), making round 0 O(len^2) per document — measured 7.4s of
    # the 16.3s sf0.1 wall; this form builds positions in 0.8s,
    # bit-identical (r13 re-measure). The localCheckpoint on `codes`
    # is ALSO the projection barrier that stops CollapseProject from
    # inlining the O(n) split+transform into the per-position lambda
    # (which would re-run it per element — the documented
    # per-element re-evaluation trap).
    pack = " + ".join(
        f"COALESCE(try_element_at(ca, i + {j + 1}), "
        f"CAST(0 AS BIGINT)) * {256 ** (_SFX_PACK - 1 - j)}"
        for j in range(_SFX_PACK)
    )
    chars = F.expr(
        "transform(sequence(0, size(ca) - 1), "
        f"i -> struct(i AS p, CAST({pack} AS BIGINT) AS r))"
    )
    # codepoint guard (runtime, not just docstring — r11 ADVICE): the
    # 8-char base-256 pack only fits int64 for ASCII — cp_max 127
    # tops out at 0x7F7F7F7F7F7F7F7F ~ 9.19e18, while a single
    # codepoint >= 128 in the leading slot already reaches
    # 128 * 256^7 == 2^63. Wider codepoints additionally break the
    # one-digit base-256 ordering. Raise loudly on the first
    # codepoint > 127 instead of overflowing (ANSI) or silently
    # corrupting ranks (non-ANSI). The check is embedded in the USED
    # doc_id projection (a bare withColumn would be pruned by
    # Catalyst); one rlike pass per row, row-local.
    guarded = docs.select(
        F.when(
            # NULL text must PASS the guard (rlike(NULL) is NULL,
            # which would otherwise fall through to raise_error with
            # a misleading message) — the length filter below drops
            # NULL rows the same way it drops empties
            F.col("text").isNull()
            | F.col("text").rlike(r"^[\x00-\x7f]*$"),
            F.col("doc_id"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "suffix_window_rank: non-ASCII codepoint "
                        "(codepoints past ascii 127 overflow the "
                        "int64 8-char round-0 pack; byte-normalize "
                        "or reduce _SFX_PACK first) in doc "
                    ),
                    F.col("doc_id").cast("string"),
                )
            )
        )
        .alias("doc_id"),
        "text",
    )
    codes = (
        # length guard: Spark's sequence(0, n - 1) on an EMPTY text
        # yields the DESCENDING [0, -1] (verified on 4.1), i.e. two
        # phantom positions — the oracle's range(0, 0) is empty
        guarded.where(F.length("text") > 0)
        .select(
            "doc_id",
            F.expr(
                "transform(split(text, ''), "
                "ch -> CAST(ascii(ch) AS BIGINT))"
            ).alias("ca"),
        )
        .localCheckpoint(eager=False)
    )
    pos = (
        codes.select("doc_id", F.explode(chars).alias("c"))
        .select(
            "doc_id",
            F.col("c.p").cast("long").alias("p"),
            F.col("c.r").alias("rank"),
        )
        .localCheckpoint(eager=False)
    )
    cur = pos
    step = _SFX_PACK

    # pair-space guard (r12 ADVICE): every round encodes pairs as
    # r1 * (mr + 1) + r2 with r1, r2 <= mr, so the code space tops
    # out at (mr + 1)^2 - 1 — int64-safe only while
    # mr + 1 <= floor(sqrt(2^63 - 1)) = 3037000499. Round 1's mr is
    # ASCII-bounded (~2.1e9, covered by the codepoint guard above),
    # but rounds 2-3 re-derive mr as the DISTINCT-rank count, which a
    # ~3e9-position corpus — reachable well below 100 TB — can push
    # past the ceiling with no compile-time signal. Check it on the
    # 1-row bound frame itself (O(1) per round): overflow then raises
    # loudly with the remediation (range-partitioned sort re-rank)
    # instead of wrapping (non-ANSI) or erroring opaquely (ANSI).
    def _guard_mr(bound: DataFrame) -> DataFrame:
        return bound.select(
            F.when(
                F.col("mr") + 1 <= F.lit(3037000499),
                F.col("mr"),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "suffix_window_rank: distinct-rank count "
                            "mr + 1 > 3037000499 — the (mr + 1)^2 "
                            "pair space overflows int64; switch the "
                            "dense re-rank to the range-partitioned "
                            "sort form for corpora past ~3e9 "
                            "positions (mr = "
                        ),
                        F.col("mr").cast("string"),
                        F.lit(")"),
                    )
                )
            )
            .alias("mr")
        )

    # One blk-keyed exchange carries each dense re-rank (r14 shape):
    # dense_rank over the NON-distinct frame within value-range
    # blocks + an exclusive prefix sum of per-block max(dense_rank)
    # (== the block's distinct count) composes to the global dense
    # rank bit-for-bit; the window and the per-block count both reuse
    # the one HashPartitioning(blk) exchange. Shared by round 0 and
    # the doubling rounds (r15 refactor).
    def _rerank(blocked: DataFrame) -> tuple[DataFrame, DataFrame]:
        w_in = Window.partitionBy("blk").orderBy("v")
        ranked_rows = blocked.select(
            "doc_id",
            "p",
            "blk",
            F.dense_rank().over(w_in).cast("long").alias("dr"),
        ).localCheckpoint(eager=False)
        counts = (
            ranked_rows.groupBy("blk")
            .agg(F.max("dr").alias("c"))
            # <= NBLK rows, consumed by the offset window AND the
            # next round's rank bound: materialize once so the bound
            # never re-executes the Θ(n) frame behind it
            .localCheckpoint(eager=False)
        )
        # exclusive prefix over the <= NBLK block frame (bounded by a
        # constant; allowlisted in test_plan_shapes.py)
        w_off = Window.orderBy("blk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = counts.select(
            "blk",
            F.coalesce(F.sum("c").over(w_off), F.lit(0).cast("long"))
            .alias("off"),
        )
        # no checkpoint on the result: it is a row-local
        # broadcast-offset map over the CHECKPOINTED ranked_rows, so
        # every consumer re-read re-runs only that cheap map, never
        # the Θ(n) re-rank behind it
        ranked = ranked_rows.join(F.broadcast(offs), "blk").select(
            "doc_id",
            "p",
            (F.col("off") + F.col("dr")).cast("long").alias("rank"),
        )
        return ranked, counts

    # round 0.5 (r15, the pack-widening): 8-char packed codes
    # (<= 0x7F7F..7F ~ 9.19e18) no longer fit the r1*(mr+1)+r2 pair
    # encoding, so they are densely re-ranked ONCE before the first
    # pairing round — the same 1-exchange machinery, minus the lead()
    # pairing. The code-space bound is one Θ(n) max over the packed
    # codes (the only corpus-sized bound scan; later rounds derive
    # theirs from the NBLK-sized block counts). No _guard_mr here:
    # the packed-code magnitude is pack-bounded (ASCII guard above),
    # and these codes never enter a pair encoding.
    sp0 = pos.agg((F.max("rank") + F.lit(1).cast("long")).alias("sp"))
    blocked0 = (
        pos.select("doc_id", "p", F.col("rank").alias("v"))
        .crossJoin(F.broadcast(sp0))
        .withColumn(
            "blk",
            F.expr(f"v DIV ((sp + {_SFX_NBLK - 1}) DIV {_SFX_NBLK})"),
        )
        .repartition("blk")
    )
    cur, counts = _rerank(blocked0)
    # pairing-round rank bound: dense re-rank => max rank == distinct
    # code count == sum of block counts — uniformly <= n, so every
    # pairing round (round 1 included, unlike the 4-char shape whose
    # round-1 mr was the raw packed-code magnitude) sits under the
    # one 3037000499 pair-space guard
    maxr = _guard_mr(counts.agg(F.sum("c").cast("long").alias("mr")))
    for rnd in range(_SFX_ROUNDS):
        # neighbor rank at p + step via lead() over the doc-local
        # position order: positions are DENSE per document (sequence
        # over length), so lead(rank, step) is exactly the rank at
        # p + step — one doc_id-keyed exchange + a per-doc sort
        # (bounded by document length) instead of the two Θ(n)
        # exchanges and hash build of the (doc_id, p) self-join this
        # replaced; null past the document end = the 0 sentinel
        # (shorter suffix sorts first, binary collation)
        w_doc = Window.partitionBy("doc_id").orderBy("p")
        # Pair codes v = r1 * (mr + 1) + r2 (both <= mr) order exactly
        # like the (r1, r2) tuples, so the shared _rerank over v IS
        # the dense re-rank of the doubled windows.
        paired = (
            cur.select(
                "doc_id",
                "p",
                F.col("rank").alias("r1"),
                F.coalesce(
                    F.lead("rank", step).over(w_doc),
                    F.lit(0).cast("long"),
                ).alias("r2"),
            )
            .crossJoin(F.broadcast(maxr))
            .withColumn("v", F.expr("r1 * (mr + 1) + r2"))
            .withColumn(
                "blk",
                F.expr(
                    f"v DIV (((mr + 1) * (mr + 1) + {_SFX_NBLK - 1}) "
                    f"DIV {_SFX_NBLK})"
                ),
            )
            .repartition("blk")
        )
        cur, counts = _rerank(paired)
        # next round's rank bound from the block counts (<= NBLK rows)
        # instead of re-scanning the Θ(n) position frame: the re-rank
        # is dense, so max rank == total distinct codes == sum(c)
        maxr = _guard_mr(counts.agg(F.sum("c").cast("long").alias("mr")))
        step *= 2
    # TakeOrdered head; consumed twice (dup restriction + final join)
    # but both reads re-run only the cheap broadcast-offset map over
    # the checkpointed final ranked_rows RDD, so no upstream
    # recompute — cheaper than checkpointing the 500-row frame and
    # hiding the TakeOrdered from the plan pin
    top = cur.orderBy("rank", "doc_id", "p").limit(_SFX_TOP)
    # dup counts only for the head's <= _SFX_TOP distinct ranks: the
    # broadcast semi-join filters the Θ(n) position frame down BEFORE
    # aggregating, so the groupBy carries <= 500 map-combined groups
    # and the full-width shuffle the unrestricted groupBy(rank) needed
    # (~n distinct ranks — one extra Θ(n)-row exchange) disappears;
    # at 100 TB that exchange is the difference between the tail stage
    # being head-sized and corpus-sized
    dup = (
        cur.join(
            F.broadcast(top.select("rank").distinct()),
            "rank",
            "left_semi",
        )
        .groupBy("rank")
        .agg(F.count(F.lit(1)).alias("dup_count"))
    )
    return (
        F.broadcast(top)
        .join(dup, "rank")
        .join(docs, "doc_id")
        .select(
            F.col("rank").alias("sfx_rank"),
            "dup_count",
            "doc_id",
            F.col("p").alias("local_pos"),
            F.expr(
                f"substring(text, CAST(p + 1 AS INT), {_SFX_WINDOW})"
            ).alias("window_text"),
        )
        .orderBy("sfx_rank", "doc_id", "local_pos")
    )
