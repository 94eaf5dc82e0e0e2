"""Unit tests for the driver-side ingestion metadata helpers."""

from __future__ import annotations

from autosinapi_spark.sources.archive import extract_zip, normalize_zip_name
from autosinapi_spark.sources.normalize import (
    dedupe_names,
    find_header_row,
    flatten_two_row_header,
    normalize_name,
    standardize_id_names,
)
from autosinapi_spark.sources.routing import route_file, route_sheet


def test_normalize_name_reference_rules():
    # processor.py:116-132: NFD accent strip, upper, squash, charset
    assert normalize_name(" Código  da\nComposição ") == "CODIGO_DA_COMPOSICAO"
    assert normalize_name("Preço (R$)") == "PRECO_R"
    assert normalize_name(42) == "42"


def test_find_header_row_keyword_scan():
    rows = [
        ["SINAPI - relatório"],
        [],
        ["Referência", "Tipo", "Código", "Descrição", "Manutenção"],
        ["01/2024", "INSUMO", "1", "x", "y"],
    ]
    kw = ["REFERENCIA", "TIPO", "CODIGO", "DESCRICAO", "MANUTENCAO"]
    assert find_header_row(rows, kw) == 2
    assert find_header_row(rows[:2], kw) is None
    # bounded scan: header beyond the limit is not found
    assert find_header_row([[]] * 30 + [rows[2]], kw, limit=20) is None


def test_flatten_two_row_header_ffill():
    row0 = ["", "", "SP", "", "RJ", ""]
    row1 = ["Código", "Unidade", "CUSTO", "%", "CUSTO", "%"]
    assert flatten_two_row_header(row0, row1) == [
        "Código",
        "Unidade",
        "SP_CUSTO",
        "SP_%",
        "RJ_CUSTO",
        "RJ_%",
    ]


def test_standardize_and_dedupe():
    assert standardize_id_names(["CODIGO_DO_INSUMO", "DESCRICAO_DO_INSUMO"]) == [
        "CODIGO",
        "DESCRICAO",
    ]
    assert dedupe_names(["A", "A", "", "A"]) == ["A", "A_1", "COL_2", "A_2"]


def test_sheet_and_file_routing():
    assert route_sheet("ISD") == ("precos", "NAO_DESONERADO")
    assert route_sheet("CCD fev/2024") == ("custos", "DESONERADO")
    assert route_sheet("Analítico") == ("estrutura", "")
    assert route_sheet("Analítico com Custo") is None
    assert route_sheet("Resumo") is None
    assert route_file("SINAPI_manutencoes_2024_01.xlsx") == "manutencoes"
    assert route_file("SINAPI_Referência_2024_01.xlsx") == "referencia"
    assert route_file("leia-me.txt") is None


def test_zip_roundtrip(tmp_path):
    import zipfile

    src = tmp_path / "original-download.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("inner/data.csv", "a;b\n1;2\n")
    renamed = normalize_zip_name(src, 2024, 1)
    assert renamed.name == "SINAPI-2024-01-formato-xlsx.zip"
    out = extract_zip(renamed, tmp_path / "out")
    assert [p.name for p in out] == ["data.csv"]
    assert (tmp_path / "out" / "inner" / "data.csv").read_text() == "a;b\n1;2\n"


def test_validate_local_file(tmp_path):
    import pytest

    from autosinapi_spark.sources.archive import validate_local_file

    ok = tmp_path / "SINAPI_ref.xlsx"
    ok.write_bytes(b"x")
    assert validate_local_file(ok) == ok
    bad = tmp_path / "notes.txt"
    bad.write_text("x")
    with pytest.raises(ValueError, match="extensão inválida"):
        validate_local_file(bad)
    with pytest.raises(FileNotFoundError):
        validate_local_file(tmp_path / "missing.csv")


def test_orphan_check_ignores_null_fks(spark):
    from autosinapi_spark.operators.repair import orphan_check

    fact = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id INT, fk INT"
    )
    dim = spark.createDataFrame([(10,)], "k INT")
    orphans = {r["id"] for r in orphan_check(fact, "fk", dim, "k").collect()}
    # NULL FK is legal (SQL FK semantics); only the dangling 99 flags
    assert orphans == {3}
