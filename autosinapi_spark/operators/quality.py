"""Data-quality expectations over a DataFrame (Deequ-style).

The constraint-suite pattern of production data pipelines (Schelter et
al. 2018, "Automating Large-Scale Data Quality Verification"): declare
a set of checks against a table, evaluate them all in ONE pass, and
emit a uniform report row per check — (check_name, observed_ppm,
n_violations, passed). The reference pipeline validates implicitly
(coercion failures -> NULL -> dropna, `/root/reference/autosinapi/
processor.py:240-270`); this makes the contract explicit and
reportable, which is what a 100 TB ingest actually monitors.

Check classes:
- row checks (completeness / domain / range / non-negativity /
  custom): a per-row violation predicate, folded into ONE aggregate
  scan as conditional sums — N checks cost one pass, not N.
- uniqueness checks: COUNT(DISTINCT key-tuple) in the same aggregate
  (Spark plans distinct-aggregate expansion; at extreme scale swap
  for approx_count_distinct and a tolerance).
- referential checks: a left-anti join against the referenced key
  set, counted — the only stage that shuffles, keyed on the FK.

All ratios are integer parts-per-million ((n - viol) * 1e6 DIV n) —
never rounded doubles — so reports hash identically across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def expectations_report(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
    unique_checks: list[tuple[str, list[str]]] | None = None,
    ref_checks: list[tuple[str, list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Evaluate a constraint suite; one report row per check.

    ``row_checks``: (name, violation predicate) — predicate TRUE (or
    NULL-handled upstream) marks a violating row.
    ``unique_checks``: (name, key columns) — violations = rows beyond
    the first per duplicate key tuple.
    ``ref_checks``: (name, fk columns, referenced df, pk columns) —
    violations = rows whose fk tuple has no referenced match.

    Returns (check_name, observed_ppm, n_violations, passed) with
    observed_ppm = passing share in integer ppm and passed =
    zero violations. Scale shape: every row/unique check folds into
    one aggregate scan of ``df`` (map-side partial); each ref check
    adds one fk-keyed anti join whose count crossJoins back as a
    broadcast 1-row frame. Report size = number of checks.
    """
    unique_checks = unique_checks or []
    ref_checks = ref_checks or []
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    names: list[str] = []
    for i, (name, viol) in enumerate(row_checks):
        aggs.append(
            F.sum(F.when(viol, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"__v{i}")
        )
        names.append(name)
    for j, (name, keys) in enumerate(unique_checks):
        # count_distinct over a STRUCT, not the bare columns: the
        # multi-arg form skips any row where ANY key column is NULL
        # (so one NULL-keyed row would read as a violation), while a
        # struct of NULL fields is itself non-NULL and is counted —
        # matching DuckDB's COUNT(DISTINCT (a, b)) row-tuple
        # semantics and the "rows beyond the first per duplicate key
        # tuple" contract above. NULL key tuples dedup like any other.
        aggs.append(
            F.count_distinct(F.struct(*[F.col(k) for k in keys]))
            .cast("long").alias(f"__u{j}")
        )
    metrics = df.agg(*aggs)
    for j, (name, _) in enumerate(unique_checks):
        metrics = metrics.withColumn(
            f"__v{len(names)}", (F.col("__n") - F.col(f"__u{j}")).cast("long")
        )
        names.append(name)
    for name, fk, ref, pk in ref_checks:
        cond = None
        for a, b in zip(fk, pk):
            c = df[a] == ref[b]
            cond = c if cond is None else (cond & c)
        orph = (
            df.join(ref, cond, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias(f"__v{len(names)}"))
        )
        metrics = metrics.crossJoin(F.broadcast(orph))
        names.append(name)
    rows = F.array(
        *[
            F.struct(
                F.lit(n).alias("check_name"),
                F.col(f"__v{i}").alias("viol"),
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        metrics.select(F.col("__n").alias("n"), F.explode(rows).alias("r"))
        .select(
            F.col("r.check_name").alias("check_name"),
            F.expr(f"CAST((n - r.viol) * {PPM} DIV n AS BIGINT)").alias(
                "observed_ppm"
            ),
            F.col("r.viol").alias("n_violations"),
            (F.col("r.viol") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )
