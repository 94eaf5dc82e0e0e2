"""Recursive BOM explosion (J9) — the engine's custom graph operator.

Reference semantics: "consulta recursiva (CTE)" over
``vw_composicao_itens_unificados`` to expand a composition into its
full item tree, multiplying ``coeficiente`` along each path
(``/root/reference/docs/DataModel.md:386-391``).

Spark SQL (<= 3.5) has no recursive CTE, so this is an iterative
frontier expansion — the standard distributed transitive-closure
pattern:

    frontier_0 = root edges
    frontier_k = frontier_{k-1} JOIN edges ON child = parent
                 (coefficient multiplied along the path)
    result     = UNION ALL of all frontiers

Scale notes:
- The edge table (BOM structure) is small relative to facts (~1e5-1e7
  edges even for huge catalogs) -> cache it once and broadcast it into
  every iteration's join: each step is then shuffle-free.
- Each iteration's frontier is localCheckpoint()-ed to truncate
  lineage; without this the plan doubles per iteration and the
  DAG-scheduler cost explodes by depth 15+.
- Termination: empty frontier, or ``max_depth`` as a cycle guard (the
  reference never checks cycles — SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def explode_bom(
    edges: DataFrame,
    roots: DataFrame | None = None,
    parent_col: str = "parent",
    child_col: str = "child",
    coef_col: str = "coef",
    max_depth: int = 64,
    broadcast_edges: bool | None = None,
    broadcast_max_edges: int = 5_000_000,
) -> DataFrame:
    """Transitive closure with multiplied coefficients.

    Parameters
    ----------
    edges : DataFrame with (parent, child, coef) columns.
    roots : optional DataFrame with one column ``parent_col`` naming the
        roots to expand; defaults to every node that appears as a parent
        but never as a child (the top-level compositions).
    Returns (root, child, total_coef, depth): one row per (path-distinct)
    descendant occurrence, coefficient multiplied along the path.
    """
    edges = edges.select(
        F.col(parent_col).alias("parent"),
        F.col(child_col).alias("child"),
        F.col(coef_col).cast("double").alias("coef"),
    )
    edges.cache()
    if broadcast_edges is None:
        # the count also materializes the cache we reuse every level;
        # an unguarded broadcast OOMs the driver past ~1e7 edges, so
        # large structures fall back to a shuffle join
        broadcast_edges = edges.count() <= broadcast_max_edges
    e = broadcast(edges) if broadcast_edges else edges

    if roots is None:
        roots = edges.select("parent").subtract(
            edges.select(F.col("child").alias("parent"))
        )
    roots = roots.select(F.col(roots.columns[0]).alias("parent")).distinct()

    # lazy localCheckpoint + count = ONE driver-synchronous job per
    # level (the count materializes the checkpoint and tests emptiness
    # in the same pass; eager checkpoint + isEmpty was two)
    frontier = (
        roots.join(e, "parent")
        .select(
            F.col("parent").alias("root"),
            F.col("child"),
            F.col("coef").alias("total_coef"),
            F.lit(1).alias("depth"),
        )
        .localCheckpoint(eager=False)
    )
    frontier_rows = frontier.count()
    out = frontier
    depth = 1
    while depth < max_depth and frontier_rows > 0:
        # Fresh aliases per iteration: localCheckpoint preserves attribute
        # ids, so a plain self-join against the cached edges would be
        # ambiguous after the first step.
        f = frontier.select(
            F.col("root").alias("__f_root"),
            F.col("child").alias("__f_child"),
            F.col("total_coef").alias("__f_coef"),
            F.col("depth").alias("__f_depth"),
        )
        frontier = (
            f.join(e, f["__f_child"] == e["parent"])
            .select(
                F.col("__f_root").alias("root"),
                F.col("child"),
                (F.col("__f_coef") * F.col("coef")).alias("total_coef"),
                (F.col("__f_depth") + F.lit(1)).alias("depth"),
            )
            .localCheckpoint(eager=False)
        )
        frontier_rows = frontier.count()
        if frontier_rows == 0:
            break
        out = out.unionByName(frontier)
        depth += 1
    # every frontier is already checkpoint-pinned, so the edge cache
    # is no longer referenced by `out`
    edges.unpersist()
    return out


def rollup_cost(
    exploded: DataFrame,
    leaf_prices: DataFrame,
    leaf_key: str,
    price_col: str,
    group_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Total cost per root: Σ total_coef × price over exploded leaves.

    The reference computes this DB-side per DataModel.md:376-391.
    The sum runs through an exact per-row decimal cast then rounds to
    double — a plain SUM(double) is accumulation-order-dependent and
    non-reproducible across runs/engines.
    """
    joined = exploded.join(
        leaf_prices, exploded["child"] == leaf_prices[leaf_key], "inner"
    )
    exact = F.sum(
        (F.col("total_coef") * F.col(price_col)).cast("decimal(28,10)")
    )
    return joined.groupBy("root", *group_extra).agg(
        F.round(exact.cast("double"), 6).alias("custo_total"),
        F.count(F.lit(1)).alias("n_itens"),
    )
