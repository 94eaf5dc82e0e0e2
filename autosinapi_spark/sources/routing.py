"""Sheet / file routing (S8, F6).

Keyword routing tables from the reference config:
``SHEET_MAP`` prefixes ISD/ICD/ISE (prices) and CSD/CCD/CSE (costs)
with their labour-tax regimes (``config.py:53-57``), the Analítico
structure sheet selected by keyword minus exclusion
(``processor.py:209-216``), and file-level routing on Manuten/
Referência name fragments (``etl_pipeline.py:455-456``).
"""

from __future__ import annotations

SHEET_MAP: dict[str, tuple[str, str]] = {
    "ISD": ("precos", "NAO_DESONERADO"),
    "ICD": ("precos", "DESONERADO"),
    "ISE": ("precos", "SEM_ENCARGOS"),
    "CSD": ("custos", "NAO_DESONERADO"),
    "CCD": ("custos", "DESONERADO"),
    "CSE": ("custos", "SEM_ENCARGOS"),
}

ANALITICO_KEYWORD = "Analítico"
ANALITICO_EXCLUDE = "Custo"


def route_sheet(sheet_name: str) -> tuple[str, str] | None:
    """(kind, regime) for a workbook sheet; None when out of scope."""
    if (
        ANALITICO_KEYWORD.lower() in sheet_name.lower()
        and ANALITICO_EXCLUDE.lower() not in sheet_name.lower()
    ):
        return ("estrutura", "")
    for prefix, kind_regime in SHEET_MAP.items():
        if sheet_name.upper().startswith(prefix):
            return kind_regime
    return None


def route_file(file_name: str) -> str | None:
    """'manutencoes' | 'referencia' | None by name keyword (F6)."""
    low = file_name.lower()
    if "manuten" in low:
        return "manutencoes"
    if "referencia" in low or "referência" in file_name.lower():
        return "referencia"
    return None
