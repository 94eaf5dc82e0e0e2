"""Round-14-registered queries (built and staged in round 13,
flipped to ``@register`` at the r14 window rewrite per
docs/R14_PLAN.md §1).

Registration budget note: this flip takes the registry to 204
(bound 5 — it next moves at 251; capacity 250, ~46 slots of
lifetime slack). The r14 window fits the mandatory set (3
never-green + the 4 leftover r9 rows + the r10 cohort as fill).

- ``layout_skipping_equalcount`` — the file-skipping payoff of
  EQUAL-COUNT file cuts along the Hilbert curve vs the Morton
  (z-order) curve vs a hash layout, in one pass. The registered
  ``zorder_skipping_stats`` row cuts files by equal-WIDTH bit
  prefixes — but any power-of-two prefix cut tiles the key plane in
  perfect axis-aligned rectangles under BOTH curves, so prefix cuts
  cannot show the curves apart. Real writers cut by equal COUNT
  (Delta OPTIMIZE ZORDER / liquid clustering write ~equal-size
  files from a range partitioning of the curve value), and THERE the
  curves differ: an equal-count cut lands mid-cell, and a file that
  straddles a Morton boundary jump inherits an envelope that spans
  the jump, while the Hilbert curve's unit steps (pinned by
  tests/test_staged_r13b.py's adjacency property) keep every
  straddling file's envelope local. Fixture measurement (sf0.1,
  64 equal-count files): mean per-file partkey extent 13.6% of the
  domain under Hilbert vs 21.1% under Morton (1.56x) and supplier-key
  extent 13.4% vs 15.9%; a bottom-quartile predicate skips 47-48/64
  files under either curve (scan fraction ~25-27%) vs 0 under hash
  (scan 100%). Exact per-row file ranks come from the hierarchical
  block machinery (below), never a global sort.

- ``butterfly_item_bipartite`` — butterfly (K2,2 / 4-cycle) counting
  over the order-item bipartite graph (Wang, Fu, Cheng & Yu 2014,
  "Rectangle counting in large bipartite graphs"; Sanei-Mehri,
  Sariyuce & Tirthapura 2018, "Butterfly counting in bipartite
  networks"): for every item pair co-purchased by c orders, the pair
  closes C(c, 2) butterflies — the bipartite clustering motif. Per
  item: the summed co-pair order count (its wedge participation) and
  its butterfly count, top-100 by butterflies. The curation reading
  (documents x shingles instead of orders x items): butterfly-dense
  regions ARE template/boilerplate structure — two documents sharing
  two shingles is the atomic near-dup signal, and this query ranks
  the shingles (here items) that anchor the most such structure.
  Wedges come from the basket-local pair expansion (the
  ``item_cooccurrence_*`` shape: bounded by max basket size, never a
  data-by-data join); everything downstream is integer aggregation.

- ``streaming_dedup_replay`` — the batch replay (the
  ``streaming_window_late_data`` / ``streaming_session_replay``
  convention) of streaming watermark dedup: the oracle row for
  ``streaming/incremental.dedup_events_stream``
  (``dropDuplicatesWithinWatermark``), whose real streaming form is
  unit-tested but had no per-round oracle check. A deterministic
  at-least-once stream (every 7th event re-delivered inside the
  1-hour horizon, every 13th after state expiry) is pushed through
  the exact keyed-state drop rule; the emitted kept/dropped/LEAKED
  counts pin both the dedup and the watermark's documented
  false-negative trade.

Each entry carries a full DuckDB oracle; the Spark-vs-oracle compare
lives in tests/test_correctness.py since the r14 flip (a duplicate
compare ran in tests/test_staged_r14.py while staged, the convention
every cohort uses). What stays in tests/test_staged_r14.py is what
the registry compare can't express: pure-Python replays (the
equal-count rank/file assignment and the envelope arithmetic on
plain dicts; butterfly counts from a brute 4-cycle enumeration; the
keyed-state machine for the dedup replay), plan pins, the
duplicate-event_id guard fixture, and the hypothesis properties.

Reference parity note: the reference engine (a single-process pandas
ETL, /root/reference/autosinapi/) has no layout or graph operators —
both are extensions for the 100 TB curation target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .olap_queries import _z_expr, _z_norm
from .registry import register
from .staged_r13b import _hb_expr, _hb_norm

# Kept (empty) so pre-flip imports fail loud rather than silently:
# since the r14 flip every query here registers directly into
# plans.registry.REGISTRY.
STAGED: dict = {}


# --- equal-count layout skipping stats -------------------------------

_LSK_FILES = 64  # equal-count file cuts per layout
_LSK_NBLK = 4096  # value-range blocks for the distributed rank
# curve values are 2 * 16 bits; blocks cut the value domain evenly
_LSK_BLKW = (1 << 32) // _LSK_NBLK  # 2^20
_LSK_TIE = "l_orderkey, l_linenumber, l_partkey, l_suppkey"
# (l_orderkey, l_linenumber) is NOT unique in the fixture lineitem;
# the full 4-column tiebreak makes the rank (and thus file cuts)
# bit-deterministic across engines


def _lsk_lay_sql(table: str, idiv: str) -> str:
    """Stage 1 (curve values): one row per (layout, fact row) with
    the layout's curve value and the rank tiebreak keys."""
    return f"""
    WITH mm AS (
      SELECT MIN(CAST(l_partkey AS BIGINT)) AS pmin,
             MAX(CAST(l_partkey AS BIGINT)) AS pmax,
             MIN(CAST(l_suppkey AS BIGINT)) AS smin,
             MAX(CAST(l_suppkey AS BIGINT)) AS smax,
             COUNT(*) AS nrows
      FROM {table}
    ),
    bh AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, nrows,
             {_hb_norm('l_partkey', 'pmin', 'pmax', idiv)} AS x,
             {_hb_norm('l_suppkey', 'smin', 'smax', idiv)} AS y
      FROM {table} CROSS JOIN mm
    ),
    bz AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, nrows,
             {_z_norm('l_partkey', 'pmin', 'pmax', idiv)} AS px,
             {_z_norm('l_suppkey', 'smin', 'smax', idiv)} AS sx
      FROM {table} CROSS JOIN mm
    ),
    lay AS (
      SELECT 'hilbert' AS layout, CAST({_hb_expr()} AS BIGINT) AS val,
             l_orderkey, l_linenumber, l_partkey, l_suppkey, nrows
      FROM bh
      UNION ALL
      SELECT 'zorder', CAST({_z_expr('px', 'sx')} AS BIGINT),
             l_orderkey, l_linenumber, l_partkey, l_suppkey, nrows
      FROM bz
    )
    SELECT * FROM lay
    """


def _lsk_stats_sql(lay: str, table: str, idiv: str) -> str:
    """Stage 2 (ranks -> files -> stats) over a materialized stage-1
    frame. The rank machinery is the hierarchical block pattern
    (suffix_window_rank's dense re-rank): value-range blocks are
    order-preserving by construction, so rank = block offset (an
    exclusive prefix sum over the <= NBLK-row per-layout block-count
    frame) + the block-local row_number — never a global sort of the
    fact table."""
    return f"""
    WITH blk AS (
      SELECT layout, val {idiv} {_LSK_BLKW} AS blk_id, COUNT(*) AS c
      FROM {lay} GROUP BY layout, val {idiv} {_LSK_BLKW}
    ),
    offs AS (
      SELECT layout, blk_id,
             COALESCE(SUM(c) OVER (
               PARTITION BY layout ORDER BY blk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS off
      FROM blk
    ),
    rk AS (
      SELECT l.layout, l.l_partkey, l.l_suppkey, l.nrows,
             o.off + ROW_NUMBER() OVER (
               PARTITION BY l.layout, o.blk_id
               ORDER BY l.val, {_LSK_TIE}
             ) AS rnk
      FROM {lay} l JOIN offs o
        ON l.layout = o.layout
       AND l.val {idiv} {_LSK_BLKW} = o.blk_id
    ),
    files AS (
      SELECT layout,
             (rnk - 1) * {_LSK_FILES} {idiv} nrows AS file_id,
             l_partkey, l_suppkey
      FROM rk
      UNION ALL
      SELECT 'hash', l_orderkey % {_LSK_FILES}, l_partkey, l_suppkey
      FROM {table}
    ),
    f AS (
      SELECT layout, file_id, COUNT(*) AS n,
             MIN(CAST(l_partkey AS BIGINT)) AS pkmin,
             MAX(CAST(l_partkey AS BIGINT)) AS pkmax,
             MIN(CAST(l_suppkey AS BIGINT)) AS skmin,
             MAX(CAST(l_suppkey AS BIGINT)) AS skmax
      FROM files GROUP BY layout, file_id
    ),
    pred AS (
      SELECT pmin, pmax, smin, smax,
             pmin + (pmax - pmin) {idiv} 4 AS pk_hi,
             smin + (smax - smin) {idiv} 4 AS sk_hi
      FROM (
        SELECT MIN(CAST(l_partkey AS BIGINT)) AS pmin,
               MAX(CAST(l_partkey AS BIGINT)) AS pmax,
               MIN(CAST(l_suppkey AS BIGINT)) AS smin,
               MAX(CAST(l_suppkey AS BIGINT)) AS smax
        FROM {table}
      )
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CASE WHEN p.pmax = p.pmin THEN CAST(0 AS BIGINT)
                ELSE CAST(SUM(f.pkmax - f.pkmin) * 1000000
                     {idiv} (COUNT(*) * (p.pmax - p.pmin)) AS BIGINT)
           END AS pk_extent_ppm,
           CASE WHEN p.smax = p.smin THEN CAST(0 AS BIGINT)
                ELSE CAST(SUM(f.skmax - f.skmin) * 1000000
                     {idiv} (COUNT(*) * (p.smax - p.smin)) AS BIGINT)
           END AS sk_extent_ppm,
           CAST(SUM(CASE WHEN f.pkmin > p.pk_hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_skip_pk,
           CAST(SUM(CASE WHEN f.skmin > p.sk_hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_skip_sk,
           CAST(SUM(CASE WHEN f.pkmin > p.pk_hi THEN 0 ELSE f.n END)
                * 1000000 {idiv} SUM(f.n) AS BIGINT) AS pk_scan_ppm,
           CAST(SUM(CASE WHEN f.skmin > p.sk_hi THEN 0 ELSE f.n END)
                * 1000000 {idiv} SUM(f.n) AS BIGINT) AS sk_scan_ppm
    FROM f CROSS JOIN pred p
    GROUP BY layout, p.pmax, p.pmin, p.smax, p.smin
    ORDER BY layout
    """


def _lsk_oracle() -> str:
    """One DuckDB statement: stage 1 as a MATERIALIZED CTE (it is
    referenced twice — the block counts and the rank join — and
    multi-reference CTE inlining re-expands the curve expressions
    per reference, the r11 pagerank-oracle hazard), then stage 2."""
    lay = _lsk_lay_sql("lineitem", "//").strip()
    stats = _lsk_stats_sql("lay2", "lineitem", "//").strip().replace(
        "WITH blk AS", ", blk AS", 1
    )
    return f"""
    WITH lay2 AS MATERIALIZED ({lay})
    {stats}
    """


@register(
    "layout_skipping_equalcount",
    _lsk_oracle(),
    doc=f"Equal-count {_LSK_FILES}-file cuts along the Hilbert vs "
    "Morton curve vs a hash layout, with per-file min/max envelope "
    "tightness (integer ppm of each key domain), bottom-quartile "
    "skip counts, and scan fractions — the cut discipline real "
    "layout writers use, where the curves genuinely differ (prefix "
    "cuts tile identically under both; extension).",
)
def layout_skipping_equalcount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(layout, n_files, pk_extent_ppm, sk_extent_ppm, n_skip_pk,
    n_skip_sk, pk_scan_ppm, sk_scan_ppm), one row per layout.

    Scale shape: both curve values are row-local integer projections
    (the registered ``hilbert_layout_keys`` / ``zorder_layout_keys``
    expressions, imported so a change there promotes this row too);
    the exact equal-count rank NEVER sorts globally — value-range
    blocks (order-preserving by construction) get a per-(layout,
    blk) count, an exclusive prefix sum over the <= {nblk}-row
    per-layout block frame (a layout-PARTITIONED window, bounded by
    the block constant), and a block-local row_number (bounded by
    block occupancy), the ``suffix_window_rank`` hierarchical
    pattern. File stats are a ({files} x 3)-group map-side-combined
    aggregate — the shuffle carries file-granularity rows — and the
    final rollup is 3 rows. All outputs are integer ppm (no double
    ROUND, no magnitude hazard). The stage-1 curve frame is
    localCheckpoint-materialized: it feeds two consumers (block
    counts + the rank join), and without the boundary Catalyst
    re-inlines the ~136-term Hilbert automaton into the block key,
    the window sort key, AND the output — the fused method passed
    janino's 64 KB limit and fell back to interpreted execution
    (measured; the split form also computes each curve value exactly
    once). Corpus-sized exchanges after the split: the (layout,
    blk)-keyed rank window (the offs side rides a broadcast) and the
    map-side-combined file-stats aggregate; the blk frame itself
    grows only with the block CONSTANT, not the data.
    """.replace("{nblk}", str(_LSK_NBLK)).replace(
        "{files}", str(_LSK_FILES)
    )
    li = load(spark, sf_dir, "lineitem")
    lay = spark.sql(
        _lsk_lay_sql("{li}", "DIV"), li=li
    ).localCheckpoint(eager=False)
    return spark.sql(
        _lsk_stats_sql("{lay}", "{li}", "DIV"), lay=lay, li=li
    )


# --- bipartite butterfly counting ------------------------------------

_BF_TOP = 100  # emitted head: items anchoring the most butterflies


def _bf_sql(idiv: str) -> str:
    return f"""
    WITH pp AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pr AS (
      SELECT a.p AS i, b.p AS j, COUNT(*) AS c
      FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    ),
    pe AS (
      SELECT i AS part_id, c, c * (c - 1) {idiv} 2 AS bf FROM pr
      UNION ALL
      SELECT j, c, c * (c - 1) {idiv} 2 FROM pr
    )
    SELECT CAST(part_id AS BIGINT) AS part_id,
           CAST(SUM(c) AS BIGINT) AS n_copair_orders,
           CAST(SUM(bf) AS BIGINT) AS n_butterflies
    FROM pe GROUP BY part_id
    ORDER BY n_butterflies DESC, part_id
    LIMIT {_BF_TOP}
    """


@register(
    "butterfly_item_bipartite",
    _bf_sql("//"),
    doc="Butterfly (K2,2) counting over the order-item bipartite "
    "graph (Wang et al. 2014; Sanei-Mehri et al. 2018): every item "
    "pair co-purchased by c orders closes C(c, 2) butterflies; "
    f"emits the top-{_BF_TOP} items by butterfly participation with "
    "their co-pair order counts — the bipartite clustering motif "
    "that, read over documents x shingles, ranks the anchors of "
    "template/boilerplate structure (extension).",
)
def butterfly_item_bipartite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(part_id, n_copair_orders, n_butterflies), top-100 by
    butterflies (part_id tiebreak).

    Scale shape: item pairs come from the basket-local expansion
    (collect_set per order, row-local C(k, 2) pair array bounded by
    max basket size — the ``item_cooccurrence_*`` shape, never a
    data-by-data join; the oracle's equivalent self-join is
    order-keyed and basket-bounded too); the (i, j) pair counts are
    a map-side-combined hash aggregate whose keys are item pairs
    (narrow, 16 bytes); the per-item rollup explodes each pair to
    its two endpoints (2 rows per pair) and combines map-side; the
    head is TakeOrdered ({top} rows), never a global sort. Skew
    bound: the heaviest item pair's count equals its co-purchase
    frequency — hash-partitioned across (i, j) keys, no single hot
    task. All outputs are integers.
    """.replace("{top}", str(_BF_TOP))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ps, a -> transform(ps, "
                    "b -> struct(a AS i, b AS j)))), "
                    "x -> x.i < x.j)"
                )
            ).alias("e")
        )
        .groupBy("e.i", "e.j")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_pair = pairs.select(
        "i", "j", "c", F.expr("c * (c - 1) DIV 2").alias("bf")
    )
    pe = per_pair.select(
        F.explode(F.array("i", "j")).alias("part_id"), "c", "bf"
    )
    return (
        pe.groupBy("part_id")
        .agg(
            F.sum("c").cast("long").alias("n_copair_orders"),
            F.sum("bf").cast("long").alias("n_butterflies"),
        )
        .select(
            F.col("part_id").cast("long").alias("part_id"),
            "n_copair_orders",
            "n_butterflies",
        )
        .orderBy(F.desc("n_butterflies"), F.asc("part_id"))
        .limit(_BF_TOP)
    )


# --- streaming watermark-dedup replay ---------------------------------

_SDD_DELAY_US = 3_600_000_000  # 1-hour watermark horizon, in micros
_SDD_FAST = 7  # event_id % 7 == 0: re-delivered +30 min (in horizon)
_SDD_SLOW = 13  # event_id % 13 == 0: re-delivered +3 h (state expired)
_SDD_FAST_US = 1_800_000_000
_SDD_SLOW_US = 10_800_000_000


def _sdd_sql() -> str:
    return f"""
    WITH arrivals AS (
      SELECT event_id, event_type, epoch_us(ts) AS a
      FROM events
      UNION ALL
      SELECT event_id, event_type, epoch_us(ts) + {_SDD_FAST_US}
      FROM events WHERE event_id % {_SDD_FAST} = 0
      UNION ALL
      SELECT event_id, event_type, epoch_us(ts) + {_SDD_SLOW_US}
      FROM events WHERE event_id % {_SDD_SLOW} = 0
    ),
    seq AS (
      SELECT event_id, event_type, a,
             ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY a)
               AS rn,
             lag(a, 1) OVER (PARTITION BY event_id ORDER BY a) AS a1,
             lag(a, 2) OVER (PARTITION BY event_id ORDER BY a) AS a2
      FROM arrivals
    ),
    judged AS (
      SELECT event_id, event_type, rn,
             CASE
               WHEN rn = 1 THEN TRUE
               WHEN rn = 2 THEN a - a1 > {_SDD_DELAY_US}
               WHEN a1 - a2 > {_SDD_DELAY_US}
                 THEN a - a1 > {_SDD_DELAY_US}
               ELSE a - a2 > {_SDD_DELAY_US}
             END AS kept
      FROM seq
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dupes_dropped,
           CAST(SUM(CASE WHEN kept AND rn > 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dupes_leaked
    FROM judged
    GROUP BY event_type
    ORDER BY event_type
    """


@register(
    "streaming_dedup_replay",
    _sdd_sql(),
    doc="Batch replay of streaming watermark dedup "
    "(dropDuplicatesWithinWatermark / streaming.dedup_events_stream) "
    "over a deterministic at-least-once stream: every 7th event "
    "re-delivered 30 min later (inside the 1-hour horizon, keyed "
    "state drops it) and every 13th 3 h later (state expired, the "
    "duplicate LEAKS — the documented watermark-dedup trade); emits "
    "per-type kept/dropped/leaked counts (extension; the "
    "effectively-once ingest repair for event streams).",
)
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_kept, n_dupes_dropped, n_dupes_leaked), one row
    per type.

    Scale shape: the synthetic at-least-once stream is three
    row-local projections unioned (no join builds duplicates); the
    state emulation is ONE event_id-keyed window pass (the exchange
    the streaming engine's state store shuffle performs) — an arrival
    is dropped iff its gap from the last RETAINED same-key arrival is
    within the horizon, state re-arming on every retained arrival
    (chain depth <= 3 by construction of the replay stream, so two
    lag() frames close the recurrence without iteration); the rollup
    is a map-side-combined groupBy over |event_type| groups.

    PRECONDITION: the two-lag closure is sound only while chain
    depth <= 3, which holds iff event_id is unique in the base
    events table (each key then arrives at most 3 times: original
    + fast + slow re-delivery). A duplicate event_id would make
    BOTH engines compute the same wrong keyed-state emulation —
    parity green, semantics broken, no signal — so the Spark side
    carries a runtime assert_true(rn <= 3) that fails loud instead
    (the property test pins the guard on a planted-duplicate frame).

    Semantics note (why the gap rule is sound here): the real
    engine's state expiry is GLOBAL-watermark-driven — a key inserted
    at ts expires when the watermark passes ts + delay, and in an
    event-time-ordered stream the watermark itself lags max event
    time by delay, so the effective per-key drop horizon sits between
    delay and 2*delay depending on batch cuts. The replay's synthetic
    gaps are chosen OUTSIDE that ambiguity band (+30 min < delay:
    dropped under every reading; +3 h > 2*delay: expired under every
    reading), so the emitted counts pin semantics the real operator
    satisfies regardless of batching. The REAL streaming operator
    (streaming/incremental.dedup_events_stream) is additionally
    unit-tested live in tests/test_streaming.py. All outputs are
    integers.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("a")
    )
    arrivals = ev.unionByName(
        ev.where(F.col("event_id") % _SDD_FAST == 0).select(
            "event_id",
            "event_type",
            (F.col("a") + _SDD_FAST_US).alias("a"),
        )
    ).unionByName(
        ev.where(F.col("event_id") % _SDD_SLOW == 0).select(
            "event_id",
            "event_type",
            (F.col("a") + _SDD_SLOW_US).alias("a"),
        )
    )
    w = Window.partitionBy("event_id").orderBy("a")
    seq = arrivals.select(
        "event_id",
        "event_type",
        "a",
        F.row_number().over(w).alias("rn"),
        F.lag("a", 1).over(w).alias("a1"),
        F.lag("a", 2).over(w).alias("a2"),
    )
    # chain-depth guard (docstring PRECONDITION): rn > 3 can only
    # happen when event_id duplicates in the base table, where the
    # two-lag closure silently computes the wrong emulation in BOTH
    # engines — fail loud instead. assert_true returns NULL on
    # success, so the filter keeps every valid row and the predicate
    # cannot be pruned away.
    seq = seq.where(
        F.assert_true(
            F.col("rn") <= F.lit(3),
            F.lit(
                "streaming_dedup_replay: chain depth > 3 — duplicate "
                "event_id in the base events table violates the "
                "two-lag closure precondition"
            ),
        ).isNull()
    )
    d = F.lit(_SDD_DELAY_US)
    kept = (
        F.when(F.col("rn") == 1, F.lit(True))
        .when(F.col("rn") == 2, F.col("a") - F.col("a1") > d)
        .when(
            F.col("a1") - F.col("a2") > d,
            F.col("a") - F.col("a1") > d,
        )
        .otherwise(F.col("a") - F.col("a2") > d)
    )
    judged = seq.select("event_type", "rn", kept.alias("kept"))
    return (
        judged.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(~F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_dupes_dropped"),
            F.sum(
                F.when(F.col("kept") & (F.col("rn") > 1), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_dupes_leaked"),
        )
        .orderBy("event_type")
    )
