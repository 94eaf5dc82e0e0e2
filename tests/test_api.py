"""run_etl API contract tests — validation failures report (not raise),
success returns the result dict, custom_constants override behaviour."""

from __future__ import annotations

import pytest

from autosinapi_spark.api import run_etl
from autosinapi_spark.config import ConfigError, EngineConfig
from tests.test_pipeline import csv_dir  # noqa: F401 (fixture reuse)


def _inputs(csv_dir):  # noqa: F811
    return {
        "manutencoes": str(csv_dir / "SINAPI_Manutencoes.csv"),
        "precos": {"NAO_DESONERADO": str(csv_dir / "SINAPI_Precos_ISD.csv")},
        "custos": {"NAO_DESONERADO": str(csv_dir / "SINAPI_Custos_CSD.csv")},
        "estrutura": str(csv_dir / "SINAPI_Analitico.csv"),
    }


def test_run_etl_happy_path(spark, csv_dir, tmp_path):  # noqa: F811
    result = run_etl(
        storage_config={"warehouse": str(tmp_path / "wh")},
        sinapi_config={"year": 2024, "month": 1},
        inputs=_inputs(csv_dir),
        spark=spark,
    )
    assert result["status"] == "SUCESSO"
    assert "precos_insumos_mensal" in result["tables_updated"]
    assert result["records_inserted"]["precos_insumos_mensal"] == 7
    assert len(result["run_id"]) == 8


def test_run_etl_reports_config_errors(spark):
    r = run_etl(storage_config={}, sinapi_config={"year": 2024, "month": 1})
    assert r["status"] == "FALHA" and "configura" in r["message"]
    r = run_etl(
        storage_config={"warehouse": "/tmp/x"},
        sinapi_config={"year": 2024},
    )
    assert r["status"] == "FALHA"
    r = run_etl(
        storage_config={"warehouse": "/tmp/x"},
        sinapi_config={"year": 2024, "month": 1},
        mode="cluster",
    )
    assert r["status"] == "FALHA" and "mode" in r["message"]


def test_run_etl_reports_missing_inputs(spark, tmp_path):
    r = run_etl(
        storage_config={"warehouse": str(tmp_path / "wh")},
        sinapi_config={"year": 2024, "month": 1},
        inputs={},
        spark=spark,
    )
    assert r["status"] == "FALHA" and "inputs" in r["message"]


def test_run_etl_runtime_failure_is_reported(spark, tmp_path):
    r = run_etl(
        storage_config={"warehouse": str(tmp_path / "wh")},
        sinapi_config={"year": 2024, "month": 1},
        inputs={"manutencoes": "/nonexistent.csv", "estrutura": "/none.csv"},
        spark=spark,
    )
    assert r["status"] == "FALHA"
    assert "run_id" in r


def test_custom_constants_override(spark, csv_dir, tmp_path):  # noqa: F811
    result = run_etl(
        storage_config={"warehouse": str(tmp_path / "wh")},
        sinapi_config={"year": 2024, "month": 1},
        inputs=_inputs(csv_dir),
        custom_constants={"PLACEHOLDER_DEFAULT_UNIT": "XX"},
        spark=spark,
    )
    assert result["status"] == "SUCESSO"
    wh = spark.read.parquet(str(tmp_path / "wh" / "insumos"))
    placeholder = wh.where("codigo = 104").collect()[0]
    assert placeholder["unidade"] == "XX"


def test_unknown_custom_constant_rejected():
    with pytest.raises(ConfigError, match="desconhecidas"):
        EngineConfig(
            storage={"warehouse": "/tmp/x"},
            sinapi={"year": 2024, "month": 1},
            custom_constants={"NOT_A_KEY": 1},
        )


def test_run_id_log_filter_attaches_and_detaches(spark, tmp_path):
    import logging

    from autosinapi_spark.api import RunIdFilter

    pkg = logging.getLogger("autosinapi_spark")
    before = [f for f in pkg.filters if isinstance(f, RunIdFilter)]
    run_etl(
        storage_config={"warehouse": str(tmp_path / "wh")},
        sinapi_config={"year": 2024, "month": 1},
        inputs={},
        spark=spark,
    )
    after = [f for f in pkg.filters if isinstance(f, RunIdFilter)]
    assert before == after  # filter removed even on failure paths

    rec = logging.LogRecord("autosinapi_spark.x", 20, "f", 1, "m", (), None)
    RunIdFilter("abc12345").filter(rec)
    assert rec.run_id == "abc12345"


def test_result_contract_message_and_total(spark, csv_dir, tmp_path):  # noqa: F811
    """Reference contract parity: success dict carries 'message' and an
    integer total alongside the per-table records_inserted dict."""
    result = run_etl(
        storage_config={"warehouse": str(tmp_path / "wh")},
        sinapi_config={"year": 2024, "month": 1},
        inputs=_inputs(csv_dir),
        spark=spark,
    )
    assert result["status"] == "SUCESSO" and result["message"]
    assert result["total_records_inserted"] == sum(
        result["records_inserted"].values()
    )
    assert result["total_records_inserted"] > 0

    failure = run_etl(storage_config={}, sinapi_config={"year": 1, "month": 1})
    assert failure["total_records_inserted"] == 0
