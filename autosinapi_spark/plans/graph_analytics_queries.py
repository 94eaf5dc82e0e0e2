"""Graph analytics beyond dedup clustering (extension).

Two classic large-scale graph workloads a data-curation platform
runs over derived graphs:

- ``item_cooccurrence_pagerank`` — build an item co-occurrence graph
  from order baskets (distinct part pairs within an order) and run a
  FIXED-ITERATION PageRank over it. The iteration count is pinned
  (T=3) and every quantity is integer "rank units" with truncating
  division, so both engines produce bit-identical ranks — the DuckDB
  oracle unrolls the three iterations as chained CTEs. PageRank-style
  link analysis is how web-corpus pipelines derive per-domain quality
  priors (e.g. harmonic-centrality ranking of Common Crawl domains).

- ``entity_resolution_parts`` — fuzzy entity resolution over the part
  catalog: normalize names, block on the head noun, generate
  candidate pairs inside blocks only, keep pairs with Levenshtein
  distance <= 2, and resolve transitive matches with the same
  connected-components operator the dedup pipeline uses
  (``operators/graph.py``). Blocking-then-match-then-cluster is the
  canonical scalable ER shape: candidate generation never goes
  all-pairs, and both engines share the exact integer edit-distance.

Reference parity note: the reference engine has no graph operators at
all (its nearest analogue is the recursive BOM explosion,
/root/reference/autosinapi/ queries; see ``plans/bom_queries.py``) —
both queries here are extensions for the 100 TB curation target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.graph import resolve_clusters
from .registry import register

# --- PageRank over item co-occurrence --------------------------------

# Integer "rank units": every node starts with 1e12 units; damping
# 0.85 is applied as integer (85 * x) // 100. With ~1e12 units/node
# and <= ~1e5 nodes at bench scale the contribution sums stay far
# below int64 range. Truncating division makes every iteration
# bit-deterministic across engines (no float accumulation anywhere).
_PR_INIT = 1_000_000_000_000
_PR_BASE = 150_000_000_000  # (1 - 0.85) * _PR_INIT
_PR_ITERS = 3
_PR_TOP = 100  # emitted head; the full (id, pr) frame stays distributed


def _pr_sql() -> str:
    iters = []
    prev = "r0"
    for t in range(1, _PR_ITERS + 1):
        iters.append(
            f"""
    i{t} AS (
      SELECT e.dst AS id,
             CAST(SUM(r.pr // d.outdeg) AS BIGINT) AS incoming
      FROM edges e
      JOIN {prev} r ON r.id = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{t} AS (
      SELECT n.id,
             CAST({_PR_BASE} + (85 * COALESCE(i.incoming, 0)) // 100
                  AS BIGINT) AS pr
      FROM nodes n LEFT JOIN i{t} i ON i.id = n.id
    )"""
        )
        prev = f"r{t}"
    return f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey <> b.l_partkey
    ),
    deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    ),
    nodes AS (SELECT DISTINCT l_partkey AS id FROM li),
    r0 AS (
      SELECT id, CAST({_PR_INIT} AS BIGINT) AS pr FROM nodes
    ),{','.join(iters)}
    SELECT part_key, pagerank_units, rank_pos FROM (
      SELECT id AS part_key, pr AS pagerank_units,
             CAST(RANK() OVER (ORDER BY pr DESC, id) AS BIGINT)
               AS rank_pos
      FROM {prev}
    ) WHERE rank_pos <= {_PR_TOP}
    """


@register(
    "item_cooccurrence_pagerank",
    _pr_sql(),
    doc="Fixed-iteration integer PageRank over the order-basket item "
    "co-occurrence graph: distinct within-order part pairs -> "
    "symmetric edge list -> 3 damped iterations in integer rank "
    "units with truncating division (bit-deterministic; oracle "
    "unrolls the iterations as CTEs). The link-analysis quality-"
    "prior pattern of web-corpus curation (extension).",
)
def item_cooccurrence_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-100 (part_key, pagerank_units, rank_pos) after 3 PR iterations.

    Scale shape: the basket self-join is keyed by order (pairs per
    order are bounded by basket size squared — TPC-H baskets hold
    <= 7 items; a real catalog caps mega-baskets first); each PR
    iteration is one join keyed by src + one groupBy(dst) sum, both
    partial-aggregated, and frames carry only (id, long) pairs. The
    iteration count is fixed, so the whole job is T+1 shuffles
    regardless of graph size; convergence-to-epsilon at scale uses
    the same loop with a driver-side delta check per round (the
    ``operators/graph.py`` pattern).
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # Basket-local pair generation: ONE shuffle groups each order's
    # distinct parts (collect_set dedupes, so no pre-distinct pass),
    # then the k^2 pair expansion is row-local — measured ~2x faster
    # cold than the orderkey self-join, and the per-basket bound (k^2
    # with k <= basket size) is explicit where a real catalog would
    # cap mega-baskets first.
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ps, a -> transform(ps, "
                    "b -> struct(a AS src, b AS dst)))), "
                    "x -> x.src != x.dst)"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # the edge list feeds deg + every iteration: materialize once
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Attach outdeg ONCE and PERSIST the frame pre-hashed on src (r15,
    # the r14 verdict's ask #1): unlike localCheckpoint — whose
    # LogicalRDD reports UNKNOWN partitioning under AQE (the r8
    # boundary pinned in tests/test_plan_shapes.py) — an
    # InMemoryRelation PRESERVES the repartition's HashPartitioning
    # (canChangeCachedPlanOutputPartitioning=false, the default), so
    # every iteration's src-keyed join reads the cached frame with NO
    # exchange and no re-plan (ensureRequirements elides; pinned in
    # tests/test_plan_shapes.py::test_persisted_repartition_keeps_
    # partitioning_under_aqe). MEMORY_AND_DESER spills to disk at
    # deployment scale — the standard iterative-graph posture (GraphX
    # persists its edge frame the same way); the engine's bench/sim
    # harnesses clear the SQL cache between runs, so this is intra-
    # query reuse only, never a cross-run memo.
    edges_deg = edges.join(deg, "src").repartition("src").persist()
    # nodes deliberately NOT persisted (r15 A/B): the hash(id)
    # repartition+persist variant measured 5.78s vs 4.21s solo — the
    # node-sized cache build + per-round columnar reads cost more
    # than the elided exchange saves on a frame this small.
    nodes = li.select(F.col("l_partkey").alias("id")).distinct()
    ranks = nodes.select("id", F.lit(_PR_INIT).cast("long").alias("pr"))
    # Deliberate join strategy (guide §3.1, r14): the unrolled rounds
    # pipeline into ONE adaptive query stage, so AQE has no stage
    # boundary at which to convert the planned SortMergeJoins — the
    # edge frame was being sorted every round. SHUFFLE_HASH on the
    # node-sized side removes the sorts and is scale-safe where a
    # broadcast hint is not (per-partition build of a node-count
    # frame vs whole-frame broadcast).
    for _ in range(_PR_ITERS):
        contrib = (
            edges_deg.join(
                ranks.hint("shuffle_hash"),
                edges_deg["src"] == ranks["id"],
            )
            .select(
                F.col("dst"),
                F.expr("pr div outdeg").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("incoming"))
        )
        ranks = nodes.join(
            contrib.hint("shuffle_hash"),
            nodes["id"] == contrib["dst"],
            "left",
        ).select(
            "id",
            (
                F.lit(_PR_BASE)
                + F.expr(
                    "85 * coalesce(incoming, 0L) div 100"
                )
            )
            .cast("long")
            .alias("pr"),
        )
    from pyspark.sql import Window

    # Top-N head, not a catalog-wide rank: orderBy(...).limit(N)
    # compiles to TakeOrderedAndProject (per-partition top-N merged on
    # the driver), and the rank window then runs over the N-row result
    # only — never an unpartitioned sort of the full item catalog,
    # which is a single task at web-catalog scale. Consumers that need
    # every item's score join against the (id, pr) frame itself, which
    # needs no rank. (id, pr) is a total order, so the cut is
    # deterministic and the head ranks equal their global ranks.
    top = ranks.orderBy(F.desc("pr"), F.asc("id")).limit(_PR_TOP)
    return top.select(
        F.col("id").alias("part_key"),
        F.col("pr").alias("pagerank_units"),
        F.rank()
        .over(Window.orderBy(F.desc("pr"), F.asc("id")))
        .cast("long")
        .alias("rank_pos"),
    )


# --- fuzzy entity resolution over the part catalog -------------------

_ER_MAX_DIST = 2


def _er_sql() -> str:
    return f"""
    WITH RECURSIVE p AS (
      SELECT p_partkey AS id, lower(trim(p_name)) AS nm FROM part
    ),
    b AS (
      SELECT id, nm, regexp_extract(nm, '(\\S+)$', 1) AS blk FROM p
    ),
    pairs AS (
      SELECT a.id AS id_a, c.id AS id_b
      FROM b a JOIN b c
        ON a.blk = c.blk AND a.id < c.id
       AND levenshtein(a.nm, c.nm) <= {_ER_MAX_DIST}
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    walk(id, r) AS (
      SELECT id, id FROM p
      UNION
      SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.r
    ),
    comp AS (SELECT id, MIN(r) AS entity_id FROM walk GROUP BY id),
    sizes AS (
      SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS entity_size
      FROM comp GROUP BY entity_id
    )
    SELECT c.id AS part_key,
           c.entity_id,
           s.entity_size,
           CASE WHEN c.id = c.entity_id THEN 1 ELSE 0 END AS is_rep,
           rp.nm AS rep_name
    FROM comp c
    JOIN sizes s USING (entity_id)
    JOIN p rp ON rp.id = c.entity_id
    """


@register(
    "entity_resolution_parts",
    _er_sql(),
    doc="Fuzzy entity resolution: normalize part names, block on the "
    "head noun, Levenshtein <= 2 candidate pairs INSIDE blocks only, "
    "transitive match closure via connected components, one "
    "representative per entity. The block-match-cluster ER shape "
    "(extension; integer edit distance keeps both engines exact).",
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_key, entity_id, entity_size, is_rep, rep_name).

    Scale shape: one exact groupBy collapses the fact table to the
    DISTINCT-name dictionary, and everything quadratic (blocking,
    levenshtein pairs, transitive closure) runs on that dictionary
    only — at 100 TB the name vocabulary is still orders of magnitude
    smaller than the rows, and if it weren't, production ER splits
    oversized blocks on a second key (documented recall trade). The
    dictionary-level entity map then broadcast-joins back onto the
    rows. The match predicate (levenshtein) is integer-exact, so no
    float tolerance crosses engines; closure reuses
    ``operators/graph.resolve_clusters`` — (id, label) longs only.
    """
    parts = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.lower(F.trim(F.col("p_name"))).alias("nm"),
    )
    # Dictionary-ize BEFORE the quadratic stage: identical normalized
    # names are lev-0 matches by definition, so fuzzy matching only
    # ever needs the DISTINCT name strings (vocabulary-sized — the
    # fact table never meets levenshtein). Each name's stable integer
    # id is its minimum part key, so the name-graph's min-label
    # components equal the part-graph's (running the same pair rule on
    # raw rows at sf0.1 cost 29 s; this form is sub-second).
    names = parts.groupBy("nm").agg(F.min("id").alias("nid"))
    blocked = names.withColumn(
        "blk", F.regexp_extract("nm", r"(\S+)$", 1)
    )
    a, c = blocked.alias("a"), blocked.alias("c")
    pairs = a.join(
        c,
        (F.col("a.blk") == F.col("c.blk"))
        & (F.col("a.nid") < F.col("c.nid"))
        & (
            F.levenshtein(F.col("a.nm"), F.col("c.nm"))
            <= _ER_MAX_DIST
        ),
    ).select(
        F.col("a.nid").alias("id_a"), F.col("c.nid").alias("id_b")
    )
    # components over the name dictionary; cluster_id = min nid =
    # min part key anywhere in the entity
    nclusters = resolve_clusters(names.select(F.col("nid").alias("id")), pairs)
    name_map = names.join(
        nclusters.select(
            F.col("id").alias("nid"), F.col("cluster_id").alias("entity_id")
        ),
        "nid",
    ).select("nm", "entity_id")
    rep_names = names.select(
        F.col("nid").alias("rid"), F.col("nm").alias("rep_name")
    )
    labeled = parts.join(F.broadcast(name_map), "nm")
    sizes = labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("entity_size")
    )
    return (
        labeled.join(F.broadcast(sizes), "entity_id")
        .join(
            F.broadcast(rep_names),
            labeled["entity_id"] == rep_names["rid"],
        )
        .select(
            F.col("id").alias("part_key"),
            "entity_id",
            "entity_size",
            F.when(F.col("id") == F.col("entity_id"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_rep"),
            "rep_name",
        )
    )


# --- triangle counting over item co-occurrence -----------------------

_TRI_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON b.o = a.o AND b.p > a.p
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT part_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS part_key FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
) roles
GROUP BY part_key
ORDER BY n_triangles DESC, part_key
"""


@register(
    "item_cooccurrence_triangles",
    _TRI_SQL,
    doc="Per-item triangle participation count over the order-basket "
    "co-occurrence graph: id-oriented distinct edges (u < v), "
    "sorted higher-neighbor adjacency lists intersected per edge "
    "(Schank-Wagner; never an edge-vs-edge wedge join), each "
    "triangle credited to all three corners — the classic "
    "distributed triangle-count shape (clustering-coefficient / "
    "community-density priors for curation) (extension).",
)
def item_cooccurrence_triangles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(part_key, n_triangles) for every part on >= 1 triangle.

    Scale shape: edges are oriented u < v at generation (basket-
    local k^2 expansion, same one-shuffle pattern as the PageRank
    edge build), so each triangle is enumerated exactly once. The
    implementation is the ADJACENCY-INTERSECTION form (Schank &
    Wagner): build each vertex's sorted higher-neighbor list once,
    attach both endpoints' lists to every edge (two edge-vs-vertex
    hash joins — never an edge-vs-edge join), and intersect them
    row-locally; |adj(u) ∩ adj(v)| is the triangle count through
    edge (u,v). The naive wedge-path join (e1.v = e2.u, then a
    closing semi join) materializes Σ outdeg² rows — ~40M at sf0.1,
    10 s; this form's biggest intermediate is the edge list with
    two bounded arrays attached, and only REAL triangles (~120k)
    are ever exploded for the third-corner credit (u and v take
    |I| credit without exploding). At 100 TB the refinement is
    DEGREE orientation (low-degree -> high-degree endpoint), which
    bounds every neighbor list by O(sqrt(|E|)) on skewed graphs —
    same plan, one extra degree join at edge build; id-orientation
    suffices on this near-uniform basket graph.
    """
    return _triangles(spark, sf_dir, ckpt=True)


def _triangles(
    spark: SparkSession, sf_dir: str, ckpt: bool = True
) -> DataFrame:
    """Body of ``item_cooccurrence_triangles``; ``ckpt=False`` keeps
    the full lineage visible so plan tests can inspect inside the
    checkpoint boundaries (localCheckpoint replaces upstream plan
    with an ExistingRDD scan in .explain)."""

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if ckpt else df

    return _adj_intersect_count(_basket_edges(spark, sf_dir, _ck), _ck)


def _basket_edges(spark: SparkSession, sf_dir: str, _ck) -> DataFrame:
    """Distinct id-oriented (u < v) co-occurrence edges from order
    baskets — basket-local k^2 expansion, one distinct shuffle."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    return _ck(
        baskets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ps, a -> transform(ps, "
                    "b -> struct(a AS u, b AS v)))), "
                    "x -> x.u < x.v)"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )


def _adj_intersect_count(edges: DataFrame, _ck) -> DataFrame:
    """Schank-Wagner adjacency intersection over ACYCLICALLY oriented
    ``(u, v)`` edges (any total order: id or (degree, id)): sorted
    out-neighbor lists, both endpoints' lists attached per edge via
    two edge-vs-vertex hash joins, row-local intersect; each triangle
    surfaces on exactly one edge."""
    adj = edges.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nbrs")
    )
    au = adj.select(F.col("u").alias("au"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("u").alias("av"), F.col("nbrs").alias("nv"))
    withI = _ck(
        edges.join(au, edges["u"] == au["au"])
        # v may have no out-neighbors: left join, empty intersect
        .join(av, edges["v"] == av["av"], "left")
        .select(
            "u",
            "v",
            F.array_intersect(
                F.col("nu"),
                F.coalesce(F.col("nv"), F.expr("array()")),
            ).alias("third"),
        )
        .where(F.size("third") > 0)
    )
    # u and v each sit on size(third) triangles of this edge; every
    # element of `third` is the remaining corner of exactly one.
    uv_credit = withI.select(
        F.explode(F.array("u", "v")).alias("part_key"),
        F.size("third").cast("long").alias("c"),
    )
    w_credit = withI.select(
        F.explode("third").alias("part_key"),
        F.lit(1).cast("long").alias("c"),
    )
    return (
        uv_credit.unionByName(w_credit)
        .groupBy("part_key")
        .agg(F.sum("c").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("part_key"))
    )


# --- degree-oriented triangle counting (the skew-proof variant) ------

_TRI_ORIENTED_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
und AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON b.o = a.o AND b.p > a.p
),
deg AS (
  SELECT x, COUNT(*) AS d
  FROM (SELECT u AS x FROM und UNION ALL SELECT v FROM und)
  GROUP BY x
),
ori AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS u,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS v
  FROM und e
  JOIN deg du ON du.x = e.u
  JOIN deg dv ON dv.x = e.v
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ori e1
  JOIN ori e2 ON e2.u = e1.v
  JOIN ori e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT part_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS part_key FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
) roles
GROUP BY part_key
ORDER BY n_triangles DESC, part_key
"""


@register(
    "item_cooccurrence_triangles_oriented",
    _TRI_ORIENTED_SQL,
    doc="Degree-oriented triangle participation count: every "
    "undirected co-occurrence edge is directed from its lower-"
    "(degree, id) endpoint before the adjacency intersection, which "
    "bounds every out-neighbor list at O(sqrt(|E|)) even on "
    "power-law graphs — the 100 TB refinement of "
    "item_cooccurrence_triangles; identical counts by construction "
    "(extension).",
)
def item_cooccurrence_triangles_oriented(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(part_key, n_triangles), skew-proof orientation.

    Scale shape: identical to ``item_cooccurrence_triangles`` except
    edge direction — low-(degree, id) endpoint first instead of low
    id. Id orientation leaves a celebrity vertex with a huge
    out-neighbor list (every higher-id neighbor), so one row carries
    an O(maxdeg) array and the per-edge intersect does O(maxdeg)
    work; (degree, id) orientation is a total order too (acyclic, so
    each triangle still surfaces on exactly one edge) but caps every
    out-list at O(sqrt(|E|)) — the Schank-Wagner bound that makes
    worst-case work Σ outdeg² = O(E^1.5) REGARDLESS of skew. Cost:
    one degree aggregate + two vertex-keyed joins at edge build; on
    this near-uniform basket graph the two variants time alike (the
    point is the worst case, not this corpus), and the counts are
    equal by construction — test-pinned against the id-oriented
    query.
    """

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    und = _basket_edges(spark, sf_dir, _ck)
    deg = (
        und.select(F.col("u").alias("x"))
        .unionByName(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("xu"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("xv"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = _ck(
        und.join(du, und["u"] == du["xu"])
        .join(dv, und["v"] == dv["xv"])
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("v"),
        )
    )
    return _adj_intersect_count(oriented, _ck)


# --- bounded k-core peeling over the co-occurrence graph -------------

_KCORE_K = 90
_KCORE_ROUNDS = 3


def _kcore_sql() -> str:
    rounds = []
    prev = "edges0"
    for t in range(1, _KCORE_ROUNDS + 1):
        rounds.append(
            f"""
    deg{t} AS (
      SELECT src, COUNT(*) AS c FROM {prev} GROUP BY src
    ),
    keep{t} AS (SELECT src AS id FROM deg{t} WHERE c >= {_KCORE_K}),
    edges{t} AS (
      SELECT e.src, e.dst FROM {prev} e
      JOIN keep{t} s ON s.id = e.src
      JOIN keep{t} d ON d.id = e.dst
    )"""
        )
        prev = f"edges{t}"
    return f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey <> b.l_partkey
    ),{','.join(rounds)}
    SELECT src AS part_key, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM {prev} GROUP BY src
    """


@register(
    "kcore_item_graph",
    _kcore_sql(),
    doc=f"Bounded k-core peeling (k={_KCORE_K}, {_KCORE_ROUNDS} "
    "rounds) over the order-basket co-occurrence graph: repeatedly "
    "drop nodes with degree < k and the edges touching them; emit "
    "survivors with their within-core degree. The dense-substructure "
    "filter of graph-based corpus curation (spam rings, template "
    "farms); bounded rounds make it engine-deterministic like the "
    "PageRank query (extension).",
)
def kcore_item_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_key, core_degree) surviving 3 peel rounds at k=90.

    Scale shape: the basket pair expansion is row-local per order
    (bounded basket size); each peel round is one degree groupBy plus
    two keyed semi-join-shaped joins (src-side, then dst-side) — all
    hash-partitioned on node ids, frames edge-sized, no windows, no
    driver loops over data. Round count is fixed, so the job is
    3*rounds + 2 shuffles regardless of graph size; a to-fixpoint
    variant reuses the same loop with a driver-side emptiness check
    per round on a count that is node-sized, not edge-sized.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ps, a -> transform(ps, "
                    "b -> struct(a AS src, b AS dst)))), "
                    "x -> x.src != x.dst)"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # every round re-reads this edge set: PERSIST it pre-hashed on
        # src (r15, verdict ask #1) so round 1's degree groupBy(src)
        # and every round's src-side semi join read it with NO
        # exchange (InMemoryRelation keeps the partitioning under AQE,
        # unlike localCheckpoint — the plan-shape pin); cache cleared
        # between runs by the sim/bench harnesses.
        .repartition("src")
        .persist()
    )
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        keep = deg.where(F.col("c") >= _KCORE_K).select(
            F.col("src").alias("id")
        )
        edges = (
            edges.join(keep, edges["src"] == keep["id"], "left_semi")
            .join(keep, edges["dst"] == keep["id"], "left_semi")
            # each round's edge set feeds BOTH the next degree count
            # and the next filter: without pinning, the two consumers
            # re-derive every earlier round (2^rounds recompute paths)
            .localCheckpoint(eager=False)
        )
    return edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("core_degree")
    ).select(
        F.col("src").alias("part_key"),
        F.col("core_degree").cast("long").alias("core_degree"),
    )


# --- label-propagation communities -----------------------------------

_LPA_ROUNDS = 3


def _lpa_round_cte(prev: str, name: str) -> str:
    """One synchronous LPA round: each vertex adopts its neighbors'
    most frequent label, ties broken by the smallest label."""
    return f"""{name} AS (
  SELECT v, lab FROM (
    SELECT e.u AS v, l.lab, COUNT(*) AS c,
           ROW_NUMBER() OVER (
             PARTITION BY e.u ORDER BY COUNT(*) DESC, l.lab) AS rn
    FROM sym e JOIN {prev} l ON l.v = e.v
    GROUP BY e.u, l.lab
  ) WHERE rn = 1
)"""


_LPA_ROUND_CTES = ",\n".join(
    _lpa_round_cte(f"lab{r}", f"lab{r + 1}") for r in range(_LPA_ROUNDS)
)

_LPA_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
und AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON b.o = a.o AND b.p > a.p
),
sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
lab0 AS (SELECT DISTINCT u AS v, u AS lab FROM sym),
{_LPA_ROUND_CTES}
SELECT v AS part_key, CAST(lab AS BIGINT) AS community
FROM lab{_LPA_ROUNDS}
"""


@register(
    "label_propagation_communities",
    _LPA_SQL,
    doc=f"Synchronous label propagation ({_LPA_ROUNDS} bounded "
    "rounds) over the item co-occurrence graph: init label = vertex "
    "id, each round every vertex adopts its neighbors' most frequent "
    "label with a deterministic min-label tiebreak — community "
    "detection for topic-cluster curation (Raghavan et al. 2007; "
    "extension).",
)
def label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(part_key, community) after bounded synchronous LPA rounds.

    Determinism: classic LPA is order-dependent (async updates,
    random tie-breaks); this is the synchronous variant with a
    (count DESC, label ASC) tiebreak, so both engines converge to
    bit-identical labels — the same determinism discipline as the
    integer PageRank.

    Scale shape: per round, one vertex-keyed equi-join (neighbor
    labels) + ONE explicit exchange on the vertex that serves both
    the (vertex, label) count and the per-vertex argmax
    (HashPartitioning(u) satisfies ClusteredDistribution(u, lab), so
    both aggregates run partition-local; initial labels are unique
    per vertex, so the (u, lab) partial aggregate has nothing to
    combine and the explicit single shuffle strictly beats the
    planner's two) — no vertex ever holds more state than one label,
    and per-vertex row volume is degree-bounded, so the u-hash
    layout cannot hot-spot worse than the count itself. Rounds are BOUNDED (fixed iterations, like the
    PageRank and k-core operators) and each round's labels are
    localCheckpoint-pinned: labels feed both the join and (without
    pinning) every earlier round's lineage would re-derive per round
    (the 2^rounds recompute trap). The symmetrized edge list reuses
    the checkpointed undirected edges, so the reversal does not run
    the basket expansion twice, and is PERSISTED pre-hashed on the
    join key ``v`` (r15): InMemoryRelation keeps the repartition's
    HashPartitioning under AQE — unlike localCheckpoint, the r8
    boundary pinned in tests/test_plan_shapes.py — so every round's
    edge-side exchange is elided outright, upgrading the r14
    layout/balance win to a true per-round shuffle elision.
    """

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    und = _basket_edges(spark, sf_dir, _ck)
    # persist, not localCheckpoint (r15, verdict ask #1): the cached
    # symmetric edge frame KEEPS HashPartitioning(v) under AQE, so
    # every round's label join reads it with NO exchange — see
    # bfs_khop_distances / the plan-shape pin; cache cleared between
    # runs by the sim/bench harnesses.
    sym = (
        und.unionByName(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .repartition("v")
        .persist()
    )
    labels = sym.select(F.col("u").alias("v")).distinct().select(
        "v", F.col("v").alias("lab")
    )
    for _ in range(_LPA_ROUNDS):
        # One explicit exchange on u serves BOTH aggregates below:
        # HashPartitioning(u) satisfies ClusteredDistribution(u, lab)
        # (partitioning exprs ⊆ clustering exprs), so the (u, lab)
        # count and the per-u argmax both run partition-local — one
        # edge-sized shuffle per round instead of two (plan-checked:
        # the round is 2 exchanges total incl. the label-join side;
        # measured 10.1s -> 5.7s interleaved min-of-3 at sf0.1).
        nl = (
            sym.join(
                labels.select(F.col("v").alias("nbr"), "lab"),
                sym["v"] == F.col("nbr"),
            )
            .select(F.col("u"), F.col("lab"))
            .repartition("u")
        )
        cnt = nl.groupBy("u", "lab").agg(F.count(F.lit(1)).alias("c"))
        # argmax as max_by over an orderable struct instead of a
        # row_number window: same (count DESC, label ASC) winner —
        # (c, -lab) has no ties since lab is unique per (u, lab)
        # group — but partial-aggregates map-side and skips the
        # per-vertex window SORT (measured 12.5s -> 10.4s warm sf0.1)
        labels = _ck(
            cnt.groupBy("u")
            .agg(
                F.max_by(
                    "lab",
                    F.struct(
                        F.col("c").alias("c"),
                        (-F.col("lab")).alias("nl"),
                    ),
                ).alias("lab")
            )
            .select(F.col("u").alias("v"), "lab")
        )
    return labels.select(
        F.col("v").alias("part_key"),
        F.col("lab").cast("long").alias("community"),
    )


# --- bounded multi-source BFS (k-hop distances) ----------------------
# Frontier-expansion breadth-first search from a fixed seed set, hop
# count bounded — the neighborhood-distance primitive under "within
# k hops" graph features (related-item expansion, contamination blast
# radius, influence neighborhoods). The DuckDB oracle replays it as a
# recursive CTE whose UNION (set) semantics dedupe (seed, node, dist)
# states per round, exactly mirroring the frontier dedup.

_BFS_HOPS = 4
_BFS_SEEDS = 3

_BFS_SQL = f"""
WITH RECURSIVE items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
und AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON b.o = a.o AND b.p > a.p
),
sym AS (
  SELECT u AS src, v AS dst FROM und
  UNION ALL SELECT v, u FROM und
),
seeds AS (
  SELECT x AS seed FROM (
    SELECT u AS x FROM und UNION SELECT v FROM und
  ) ORDER BY x LIMIT {_BFS_SEEDS}
),
walk(seed, node, d) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION
  SELECT w.seed, s.dst, w.d + 1
  FROM walk w JOIN sym s ON s.src = w.node
  WHERE w.d < {_BFS_HOPS}
)
SELECT seed, node, CAST(MIN(d) AS INT) AS dist
FROM walk GROUP BY seed, node
ORDER BY seed, dist, node
"""


@register(
    "bfs_khop_distances",
    _BFS_SQL,
    doc=f"Bounded multi-source BFS: hop distance (<= {_BFS_HOPS}) "
    f"from the {_BFS_SEEDS} smallest items in the order-basket "
    "co-occurrence graph to every reachable item — frontier "
    "expansion with per-round dedup against the visited set; the "
    "oracle replays it as a hop-bounded recursive CTE (extension).",
)
def bfs_khop_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seed, node, dist) for every node within _BFS_HOPS of a seed.

    Scale shape: textbook distributed BFS — each round is one
    frontier-vs-edges hash join (shuffle keyed on the frontier
    node / edge src, never all-pairs), a frontier-local distinct,
    and an anti-join against the visited set so closed nodes never
    re-enter the frontier (the frontier SHRINKS once the wave
    passes; without it the walk count grows as degree^hops). Both
    the visited set and the new frontier are localCheckpoint-pinned
    per round — lineage stays O(1) per round instead of 2^rounds
    (the k-core lesson). The hop bound makes the round count a
    compile-time constant, so the whole plan is _BFS_HOPS joins —
    no driver-side convergence loop at bench scale; an unbounded
    BFS would check frontier emptiness per round instead. The
    symmetric edge list is PERSISTED pre-hashed on the join key
    ``src`` (r15): InMemoryRelation keeps the repartition's
    HashPartitioning under AQE — unlike localCheckpoint, the r8
    boundary pinned in tests/test_plan_shapes.py — so every hop's
    edge-side exchange is elided outright, upgrading the r14
    layout/balance win to a true per-hop shuffle elision.
    """

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    edges = _basket_edges(spark, sf_dir, _ck)
    # persist, not localCheckpoint (r15, verdict ask #1): the cached
    # symmetric edge frame KEEPS HashPartitioning(src) under AQE, so
    # every hop's frontier-vs-edges join reads it with NO exchange
    # (the r8 localCheckpoint boundary does not apply to
    # InMemoryRelation — pinned in tests/test_plan_shapes.py); the
    # sim/bench harnesses clear the SQL cache between runs.
    sym = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .repartition("src")
        .persist()
    )
    nodes = sym.select(F.col("src").alias("x")).distinct()
    seeds = (
        nodes.orderBy("x").limit(_BFS_SEEDS).select(F.col("x").alias("seed"))
    )
    visited = _ck(
        seeds.select(
            "seed",
            F.col("seed").alias("node"),
            F.lit(0).cast("int").alias("dist"),
        )
    )
    frontier = visited
    for t in range(1, _BFS_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        new = _ck(
            nxt.join(visited, ["seed", "node"], "left_anti").withColumn(
                "dist", F.lit(t).cast("int")
            )
        )
        visited = _ck(visited.unionByName(new))
        frontier = new
    return visited.orderBy("seed", "dist", "node")
