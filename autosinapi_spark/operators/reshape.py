"""Reshape operators: unpivot/melt and union views.

Reference semantics:

- R1 unpivot (the signature transform) — 27 UF price columns melt to
  (uf, value) rows, null values dropped, value numeric-coerced
  (``/root/reference/autosinapi/core/processor.py:134-158``; callers
  ``341,404``).
- U1/U2/U3 union-all — per-sheet frame concat (``processor.py:417-446``)
  and the tagged union view ``vw_composicao_itens_unificados``
  (``database.py:129-132``).

Scale notes: ``DataFrame.unpivot`` is a narrow transformation (no
shuffle) expanding each row n_value_cols-fold; the null-drop filter is
fused into the same stage by Catalyst. unionByName is plan-level —
zero data movement.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_values(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "uf",
    value_name: str = "valor",
    drop_null: bool = True,
) -> DataFrame:
    """Wide -> long melt with null-value drop (R1).

    Mirrors ``Processor._unpivot_data`` including the
    ``dropna(subset=[value])`` (processor.py:154).
    """
    out = df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
    if drop_null:
        out = out.where(F.col(value_name).isNotNull())
    return out


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """UNION ALL of same-schema frames by name (U1/U2)."""
    return reduce(lambda a, b: a.unionByName(b), frames)


def tagged_union(
    frames_with_tags: Sequence[tuple[DataFrame, str]],
    tag_col: str = "tipo_item",
) -> DataFrame:
    """UNION ALL with a literal provenance tag per branch (U3).

    The reference's ``vw_composicao_itens_unificados`` shape:
    each branch gets ``lit(tag)`` before the union.
    """
    tagged = [df.withColumn(tag_col, F.lit(tag)) for df, tag in frames_with_tags]
    return union_all(tagged)
