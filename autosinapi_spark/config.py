"""Engine configuration — mirrors the reference's Config contract.

The reference flattens ``DEFAULT_CONSTANTS`` into attributes and lets
callers override any key via ``custom_constants``
(``/root/reference/autosinapi/config.py:103-143``); required keys are
validated up front (``config.py:150-160``). Same shape here, with the
storage block (warehouse path) replacing Postgres credentials.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

DEFAULT_CONSTANTS: dict[str, Any] = {
    # sheet routing (config.py:49-57)
    "SHEET_MAP": {
        "ISD": ("precos", "NAO_DESONERADO"),
        "ICD": ("precos", "DESONERADO"),
        "ISE": ("precos", "SEM_ENCARGOS"),
        "CSD": ("custos", "NAO_DESONERADO"),
        "CCD": ("custos", "DESONERADO"),
        "CSE": ("custos", "SEM_ENCARGOS"),
    },
    # header discovery (config.py:62-76)
    "HEADER_SEARCH_LIMIT": 20,
    "MANUTENCOES_HEADER_KEYWORDS": [
        "REFERENCIA",
        "TIPO",
        "CODIGO",
        "DESCRICAO",
        "MANUTENCAO",
    ],
    "CUSTOS_HEADER_KEYWORDS": ["Código da Composição", "Descrição", "Unidade"],
    "PRECOS_HEADER_KEYWORDS": ["CODIGO", "DESCRICAO", "UNIDADE"],
    "MANUTENCOES_DATE_FORMAT": "MM/yyyy",
    "CUSTOS_CODIGO_REGEX": r",(\d+)\)$",
    # placeholder templates (config.py:37-39)
    "PLACEHOLDER_INSUMO_TEMPLATE": "INSUMO_DESCONHECIDO_%d",
    "PLACEHOLDER_COMPOSICAO_TEMPLATE": "COMPOSICAO_DESCONHECIDA_%d",
    "PLACEHOLDER_DEFAULT_UNIT": "UN",
    # lifecycle (config.py:31,92-96)
    "DEACTIVATION_KEYWORD": "DESATIVA",
    "ITEM_TYPE_INSUMO": "INSUMO",
    "ITEM_TYPE_COMPOSICAO": "COMPOSICAO",
    "DEFAULT_ITEM_STATUS": "ATIVO",
    # statuses (config.py:40-42) — ONE vocabulary, unlike the
    # reference's failed/FALHA mismatch (SURVEY §4.4)
    "STATUS_SUCCESS": "SUCESSO",
    "STATUS_FAILURE": "FALHA",
}

REQUIRED_STORAGE_KEYS = {"warehouse"}
REQUIRED_SINAPI_KEYS = {"year", "month"}


class ConfigError(ValueError):
    pass


@dataclass
class EngineConfig:
    """Validated engine config; constants become attributes.

    ``custom_constants`` overrides any DEFAULT_CONSTANTS key — the
    reference's extension point (config.py:104,138-143).
    """

    storage: dict[str, Any]
    sinapi: dict[str, Any]
    mode: str = "local"
    custom_constants: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not isinstance(self.storage, dict) or not self.storage:
            raise ConfigError("storage config inválido ou vazio")
        if not isinstance(self.sinapi, dict) or not self.sinapi:
            raise ConfigError("sinapi config inválido ou vazio")
        missing = REQUIRED_STORAGE_KEYS - set(self.storage)
        if missing:
            raise ConfigError(f"storage config sem chaves: {sorted(missing)}")
        missing = REQUIRED_SINAPI_KEYS - set(self.sinapi)
        if missing:
            raise ConfigError(f"sinapi config sem chaves: {sorted(missing)}")
        if self.mode not in ("local", "server"):
            raise ConfigError("mode deve ser 'local' ou 'server'")
        unknown = set(self.custom_constants) - set(DEFAULT_CONSTANTS)
        if unknown:
            raise ConfigError(f"custom_constants desconhecidas: {sorted(unknown)}")
        merged = {**DEFAULT_CONSTANTS, **self.custom_constants}
        for key, value in merged.items():
            setattr(self, key, value)

    @property
    def warehouse(self) -> str:
        return str(self.storage["warehouse"])

    @property
    def year(self) -> int:
        return int(self.sinapi["year"])

    @property
    def month(self) -> int:
        return int(self.sinapi["month"])
