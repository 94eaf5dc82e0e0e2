"""Connected components — duplicate-cluster resolution (extension).

Every near-dup detector in this engine (``operators/near_dedup.py``,
``plans/similarity_queries.py``) emits PAIRS; a real dedup pipeline
must then pick ONE canonical document per duplicate *cluster*, which
is exactly connected components over the pair graph (the step FineWeb
/ CCNet / BigQuery-dedup pipelines run after MinHash).

Algorithm: iterative min-label propagation —

    label_0(v)   = v
    label_k(v)   = min(label_{k-1}(v), min over neighbors u of
                   label_{k-1}(u))

which converges to min-id-per-component in O(component diameter)
rounds. Duplicate clusters are near-cliques by construction (every
member is a near-dup of a shared ancestor), so the diameter is tiny
(2-3) and the round count stays constant regardless of corpus size;
for adversarial long-path graphs the two-phase large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) drops rounds to O(log n) — same join shapes, more
of them.

Scale shape per round: one hash join (edges x labels, both keyed by
vertex id — co-partitioned after the first exchange) plus one
partial-aggregated groupBy min. Frames carry only (id, label) longs;
document text never enters the loop. Each round localCheckpoint()s
lazily and the convergence count materializes it — ONE
driver-synchronous job per round (the ``operators/bom.py`` pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) with component = min vertex id reachable.

    ``vertices`` may include isolated ids (no incident edge): they come
    back as their own singleton component — a dedup pipeline labels
    EVERY document, not just the ones with duplicates.
    """
    verts = vertices.select(F.col(id_col).alias("id")).distinct()
    # Materialize the edge list ONCE before symmetrizing: both branches
    # of the union share the checkpointed partitions, otherwise an
    # expensive upstream pair pipeline (MinHash-LSH here) executes
    # twice on the first pass.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    # undirected: propagate both ways; cached PRE-HASHED on src (r15):
    # the InMemoryRelation keeps HashPartitioning(src) under AQE
    # (unlike localCheckpoint — the r8 boundary in
    # tests/test_plan_shapes.py), so every round's src-keyed label
    # join reads the cache with NO exchange of the edge frame
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .cache()
    )

    labels = verts.select("id", F.col("id").alias("comp"))
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["dst"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
                F.col("comp").alias("__prev"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("comp") < F.col("__prev")).count()
        labels = new_labels.drop("__prev")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds"
        )
    sym.unpersist()
    return labels


def resolve_clusters(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Canonicalize a near-dup pair list into per-document verdicts.

    Returns (id, cluster_id, cluster_size, is_canonical) — the keep/
    drop decision a dedup pipeline applies: keep ``is_canonical = 1``
    (the min id of each component), drop the rest.
    """
    comp = connected_components(
        vertices, pairs, id_col=id_col, src_col=a_col, dst_col=b_col
    )
    sizes = comp.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            F.when(F.col("id") == F.col("comp"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_canonical"),
        )
    )


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star / small-star.

    The O(log n)-round algorithm of Kiveris et al., "Connected
    Components in MapReduce and Beyond" (SoCC'14) — the variant of
    :func:`connected_components` for graphs whose components can have
    LONG PATHS (min-label propagation needs O(diameter) rounds; dedup
    clusters are shallow so the simple operator wins there, but e.g.
    citation/link graphs are not).

    Each round rewrites the edge set:

    - large-star: per center u, hook every LARGER neighbor to
      m = min(N(u) ∪ {u});
    - small-star: per center u, hook u and its smaller-or-equal
      neighbors to their minimum.

    At fixpoint every component is a star rooted at its minimum id;
    the root is each non-root vertex's unique neighbor. Per round:
    two groupBy-min + join passes over the edge list (always keyed by
    vertex id) and ONE materializing count — edge frames shrink
    toward n-1 star edges, so rounds get cheaper as they converge.
    """
    verts = vertices.select(F.col(id_col).alias("id")).distinct()
    ed = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        # center at u; neighbors from both directions
        nbrs = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        side = (
            nbrs.where(F.col("v") > F.col("u"))
            if large
            else nbrs.where(F.col("v") < F.col("u"))
        )
        hooked = side.join(m, "u").select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
        # small-star also hooks the center itself to its min
        if not large:
            hooked = hooked.unionByName(
                m.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
        return (
            hooked.where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"),
                F.greatest("a", "b").alias("v"),
            )
            .distinct()
        )

    prev_n = ed.count()
    for _ in range(max_iter):
        ed_new = _star(_star(ed, large=True), large=False).localCheckpoint(
            eager=False
        )
        n = ed_new.count()
        # star rounds only ever REWIRE endpoints downward; when the
        # edge multiset stops changing the structure is a stable star
        changed = (
            n != prev_n
            or ed_new.exceptAll(ed).limit(1).count() > 0
        )
        ed = ed_new
        prev_n = n
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_iter} rounds"
        )
    # at fixpoint ed holds (root, member) star edges with root = min id
    labels = ed.select(F.col("v").alias("id"), F.col("u").alias("comp"))
    return verts.join(labels, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )
