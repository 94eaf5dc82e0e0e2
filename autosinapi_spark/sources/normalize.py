"""Header/metadata normalization (S5 discovery, R2 flatten, C1-C3 names).

Python (not Column) versions of the text rules — these run on column
NAMES and on a bounded pre-scan sample (<= HEADER_SEARCH_LIMIT rows),
never on data. Reference:
``/root/reference/autosinapi/core/processor.py:70-132`` (discovery +
name normalization) and ``:366-376`` (two-row flatten).
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterable, Sequence

HEADER_SEARCH_LIMIT = 20  # config.py:72

# processor.py:163-166 via config.py ID_COL_STANDARDIZE_MAP
ID_COL_STANDARDIZE_MAP = {
    "CODIGO_DO_INSUMO": "CODIGO",
    "DESCRICAO_DO_INSUMO": "DESCRICAO",
    "CODIGO_DA_COMPOSICAO": "CODIGO",
    "DESCRICAO_DA_COMPOSICAO": "DESCRICAO",
}


def normalize_name(raw: object) -> str:
    """Accent-strip + upper + squash to [A-Z0-9_] (processor.py:116-132)."""
    s = str(raw).strip()
    s = "".join(
        c
        for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn"
    )
    s = s.upper()
    s = re.sub(r"[\s\n]+", "_", s)
    return re.sub(r"[^A-Z0-9_]", "", s)


def find_header_row(
    rows: Sequence[Sequence[object]],
    keywords: Iterable[str],
    limit: int = HEADER_SEARCH_LIMIT,
) -> int | None:
    """Index of the first row whose normalized cells contain every
    normalized keyword (processor.py:70-114); None if not found."""
    want = [normalize_name(k) for k in keywords]
    for i, row in enumerate(rows):
        if i > limit:
            break
        row_str = " ".join(
            normalize_name(c) for c in row if c is not None and str(c) != ""
        )
        if all(w in row_str for w in want):
            return i
    return None


def flatten_two_row_header(
    row0: Sequence[object], row1: Sequence[object]
) -> list[str]:
    """R2: (UF row, measure row) -> '{UF}_{measure}' names.

    Level-0 cells survive only if they look like a UF (2 alpha chars),
    then forward-fill across the merged span (processor.py:366-376).
    """
    # mask-then-ffill: a non-UF cell inherits the previous UF span
    filled: list[str | None] = []
    last: str | None = None
    for cell in row0:
        s = str(cell).strip() if cell is not None else ""
        if len(s) == 2 and s.isalpha():
            last = s
            filled.append(s)
        else:
            filled.append(last)
    return [
        f"{h0}_{h1}" if h0 is not None else str(h1)
        for h0, h1 in zip(filled, row1)
    ]


def standardize_id_names(names: Sequence[str]) -> list[str]:
    """Map variant id headers onto canonical CODIGO/DESCRICAO
    (processor.py:163-166)."""
    return [ID_COL_STANDARDIZE_MAP.get(n, n) for n in names]


def dedupe_names(names: Sequence[str]) -> list[str]:
    """Disambiguate repeated/empty normalized names positionally so the
    frame stays selectable (Spark rejects duplicate columns)."""
    seen: dict[str, int] = {}
    out = []
    for i, n in enumerate(names):
        base = n or f"COL_{i}"
        k = seen.get(base, 0)
        seen[base] = k + 1
        out.append(base if k == 0 else f"{base}_{k}")
    return out
