"""Library entry point — the reference's ``run_etl`` contract.

``run_etl`` accepts explicit config dicts or falls back to environment
variables, validates, runs the monthly pipeline, and returns the
result dict — it REPORTS failures instead of raising, exactly like
``/root/reference/autosinapi/__init__.py:62-187``. One deliberate
divergence (SURVEY §4.4 quirk): a single status vocabulary
(SUCESSO/FALHA), not the reference's mixed "failed"/"FALHA".

Env fallbacks: ``AUTOSINAPI_YEAR``, ``AUTOSINAPI_MONTH``,
``AUTOSINAPI_WAREHOUSE`` (replacing the reference's POSTGRES_* block —
storage here is a Parquet warehouse path).
"""

from __future__ import annotations

import logging
import os
import uuid
from typing import Any

from pyspark.sql import SparkSession

from .config import ConfigError, EngineConfig
from .pipeline import SinapiPipeline

logger = logging.getLogger(__name__)


class RunIdFilter(logging.Filter):
    """Threads the per-run id through every log record.

    Mirrors the reference's logging Filter + formatter contract
    (``etl_pipeline.py:75-113``): records gain a ``run_id`` attribute
    so any ``%(run_id)s`` format picks it up, and records from other
    runs/libraries get a placeholder instead of a KeyError.
    """

    def __init__(self, run_id: str):
        super().__init__()
        self.run_id = run_id

    def filter(self, record: logging.LogRecord) -> bool:
        if not hasattr(record, "run_id"):
            record.run_id = self.run_id
        return True


def setup_run_logging(run_id: str, level: str = "INFO") -> logging.Filter:
    """Attach the run-id filter to the package logger; returns it so
    callers can detach with ``logger.removeFilter``."""
    pkg_logger = logging.getLogger("autosinapi_spark")
    pkg_logger.setLevel(level.upper())
    flt = RunIdFilter(run_id)
    pkg_logger.addFilter(flt)
    return flt


def _failure(cfg_or_none: EngineConfig | None, message: str) -> dict:
    status = cfg_or_none.STATUS_FAILURE if cfg_or_none else "FALHA"
    return {
        "status": status,
        "message": message,
        "tables_updated": [],
        "records_inserted": {},
        "total_records_inserted": 0,
    }


def run_etl(
    storage_config: dict[str, Any] | None = None,
    sinapi_config: dict[str, Any] | None = None,
    inputs: dict[str, Any] | None = None,
    mode: str = "local",
    custom_constants: dict[str, Any] | None = None,
    spark: SparkSession | None = None,
) -> dict:
    """Run one monthly SINAPI load; returns the result-dict contract.

    ``inputs`` carries the extracted CSV paths::

        {"manutencoes": path,
         "precos": {regime: path, ...},
         "custos": {regime: path, ...},
         "estrutura": path}
    """
    run_id = str(uuid.uuid4())[:8]
    log_filter = setup_run_logging(run_id)
    try:
        if storage_config is None:
            wh = os.getenv("AUTOSINAPI_WAREHOUSE")
            if not wh:
                return _failure(None, "AUTOSINAPI_WAREHOUSE não definido")
            storage_config = {"warehouse": wh}
        if sinapi_config is None:
            try:
                sinapi_config = {
                    "year": int(os.environ["AUTOSINAPI_YEAR"]),
                    "month": int(os.environ["AUTOSINAPI_MONTH"]),
                }
            except (KeyError, ValueError) as exc:
                return _failure(
                    None, f"variáveis AUTOSINAPI_ incompletas: {exc}"
                )

        try:
            cfg = EngineConfig(
                storage=storage_config,
                sinapi=sinapi_config,
                mode=mode,
                custom_constants=custom_constants or {},
            )
        except ConfigError as exc:
            return _failure(None, f"erro de configuração: {exc}")

        if not inputs or "estrutura" not in inputs or "manutencoes" not in inputs:
            return _failure(
                cfg, "inputs deve conter ao menos 'manutencoes' e 'estrutura'"
            )

        logger.info(
            "run_etl %s: %s-%02d -> %s", run_id, cfg.year, cfg.month, cfg.warehouse
        )
        try:
            if spark is None:
                from .session import get_spark

                spark = get_spark(app_name=f"autosinapi_etl_{run_id}")
            pipe = SinapiPipeline(spark, cfg.warehouse, cfg.year, cfg.month, cfg)
            result = pipe.run(
                manutencoes_csv=inputs["manutencoes"],
                precos_csvs=inputs.get("precos", {}),
                custos_csvs=inputs.get("custos", {}),
                estrutura_csv=inputs["estrutura"],
            )
            result["run_id"] = run_id
            return result
        except Exception as exc:  # report, don't raise (reference contract)
            logger.error("run_etl %s falhou", run_id, exc_info=True)
            out = _failure(cfg, f"{type(exc).__name__}: {exc}")
            out["run_id"] = run_id
            return out
    finally:
        logging.getLogger("autosinapi_spark").removeFilter(log_filter)
