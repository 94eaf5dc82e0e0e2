"""S4/S6 verification: stdlib xlsx reader/writer + Excel->CSV landing.

Ports the reference's synthesized-workbook processor test
(``/root/reference/tests/core/test_processor.py:86-111``): build an
Analítico workbook with the header at row 10 (the ``startrow=9``
pattern), pre-convert it to CSV with ``excel_to_csv``, and run it
through the full ``SinapiPipeline`` — asserting the INSUMO/COMPOSICAO
edge split and the ``"1,0"`` decimal-comma coercion end-to-end.

Reader unit tests cover the format subset the module documents:
shared strings (plain + rich-text runs), inline strings, formula
cached values, booleans, sparse r-referenced cells, and blank rows.
"""

from __future__ import annotations

import csv
import zipfile

import pytest

from autosinapi_spark.pipeline import SinapiPipeline
from autosinapi_spark.sources.landing import excel_to_csv
from autosinapi_spark.sources.xlsx import (
    read_xlsx_rows,
    write_xlsx,
    xlsx_sheet_names,
)
from tests.test_pipeline import CUSTOS_CSV, MANUT_CSV, PRECOS_CSV


# ---------------------------------------------------------------------------
# reader/writer round-trip
# ---------------------------------------------------------------------------


def test_write_read_roundtrip(tmp_path):
    rows = [
        ["CODIGO", "DESCRICAO", "COEF"],
        [101, "Cimento Portland", "1,0"],
        [],  # blank row must survive with its r index
        [102, "Cimento Portland", 2.5],  # repeated shared string
        ["", "só descrição", True],  # sparse: first cell skipped
    ]
    path = write_xlsx(tmp_path / "t.xlsx", {"Plan1": rows, "Plan2": [["x"]]})

    assert xlsx_sheet_names(path) == ["Plan1", "Plan2"]
    got = read_xlsx_rows(path, "Plan1")
    assert got == [
        ["CODIGO", "DESCRICAO", "COEF"],
        ["101", "Cimento Portland", "1,0"],
        ["", "", ""],
        ["102", "Cimento Portland", "2.5"],
        ["", "só descrição", "TRUE"],
    ]
    assert read_xlsx_rows(path, "Plan2") == [["x"]]


def test_shared_strings_deduplicated(tmp_path):
    path = write_xlsx(
        tmp_path / "t.xlsx", {"S": [["mesmo", "mesmo"], ["mesmo", "outro"]]}
    )
    with zipfile.ZipFile(path) as zf:
        sst = zf.read("xl/sharedStrings.xml").decode()
    assert sst.count("<si>") == 2  # 'mesmo' stored once
    assert read_xlsx_rows(path, "S") == [["mesmo", "mesmo"], ["mesmo", "outro"]]


def test_missing_sheet_raises_keyerror(tmp_path):
    path = write_xlsx(tmp_path / "t.xlsx", {"Plan1": [["a"]]})
    with pytest.raises(KeyError, match="Resumo"):
        read_xlsx_rows(path, "Resumo")


def _patch_member(src, dest, member, new_bytes):
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(dest, "w") as zout:
        for item in zin.infolist():
            data = new_bytes if item.filename == member else zin.read(item)
            zout.writestr(item, data)
    return dest


def test_inline_formula_and_richtext_cells(tmp_path):
    """Cell types the writer never emits, hand-authored: inlineStr,
    formula cached value (t="str"), rich-text sharedStrings runs."""
    base = write_xlsx(tmp_path / "base.xlsx", {"S": [["placeholder", "x"]]})
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>em linha</t></is></c>'
        '<c r="B1" t="str"><f>CONCAT("a","b")</f><v>ab</v></c>'
        '<c r="D1" t="s"><v>0</v></c>'  # sparse: skips C1
        "</row>"
        "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{ns}" count="1" uniqueCount="1">'
        "<si><r><t>rico </t></r><r><t>texto</t></r></si></sst>"
    )
    patched = _patch_member(
        base, tmp_path / "p1.xlsx", "xl/worksheets/sheet1.xml", sheet.encode()
    )
    patched = _patch_member(
        patched, tmp_path / "p2.xlsx", "xl/sharedStrings.xml", sst.encode()
    )
    assert read_xlsx_rows(patched, "S") == [["em linha", "ab", "", "rico texto"]]


# ---------------------------------------------------------------------------
# excel_to_csv landing (S6)
# ---------------------------------------------------------------------------


def test_excel_to_csv_quoting(tmp_path):
    rows = [
        ["a;b", 'diz "oi"', "linha1\nlinha2", "plain"],
        [1, "1,0", "", "fim"],
    ]
    path = write_xlsx(tmp_path / "q.xlsx", {"Dados": rows})
    (dest,) = excel_to_csv(path, ["Dados"], tmp_path / "csv", sep=";")

    text = dest.read_text(encoding="utf-8")
    # separator / quote / newline fields quoted, quotes doubled (RFC 4180)
    assert '"a;b"' in text
    assert '"diz ""oi"""' in text
    assert '"linha1\nlinha2"' in text
    with open(dest, encoding="utf-8", newline="") as fh:
        back = list(csv.reader(fh, delimiter=";"))
    assert back == [
        ["a;b", 'diz "oi"', "linha1\nlinha2", "plain"],
        ["1", "1,0", "", "fim"],
    ]


# ---------------------------------------------------------------------------
# end-to-end: startrow=9 workbook -> CSV landing -> full pipeline run
# ---------------------------------------------------------------------------


def _analitico_workbook(tmp_path):
    """The reference processor test's fixture shape
    (test_processor.py:86-111): header written at startrow=9, a
    composition with one INSUMO child and one COMPOSICAO child,
    decimal-comma coefficients."""
    blank = [[]] * 9
    header = [
        "TIPO ITEM",
        "CODIGO DA COMPOSICAO",
        "CODIGO DO ITEM",
        "COEFICIENTE",
        "DESCRICAO",
        "UNIDADE",
    ]
    data = [
        ["", "87453", "", "", "Alvenaria de vedação", "m2"],
        ["INSUMO", "87453", "1234", "1,0", "INSUMO A", "UN"],
        ["COMPOSICAO", "87453", "5678", "2,5", "COMPOSICAO B", "M2"],
    ]
    return write_xlsx(
        tmp_path / "SINAPI_Analitico.xlsx",
        {"Analítico": blank + [header] + data},
    )


def test_startrow9_workbook_through_pipeline(spark, tmp_path):
    xlsx = _analitico_workbook(tmp_path)
    (est_csv,) = excel_to_csv(xlsx, ["Analítico"], tmp_path / "landed")

    (tmp_path / "p.csv").write_text(PRECOS_CSV, encoding="utf-8")
    (tmp_path / "c.csv").write_text(CUSTOS_CSV, encoding="utf-8")
    (tmp_path / "m.csv").write_text(MANUT_CSV, encoding="utf-8")

    pipe = SinapiPipeline(spark, str(tmp_path / "wh"), 2024, 1)
    result = pipe.run(
        manutencoes_csv=str(tmp_path / "m.csv"),
        precos_csvs={"NAO_DESONERADO": str(tmp_path / "p.csv")},
        custos_csvs={"NAO_DESONERADO": str(tmp_path / "c.csv")},
        estrutura_csv=str(est_csv),
    )
    assert result["status"] == "SUCESSO"

    # the reference's assertions: one row per edge table, the INSUMO
    # child split from the COMPOSICAO child, code 1234 coerced to long
    insumos = pipe.read("composicao_insumos").collect()
    subs = pipe.read("composicao_subcomposicoes").collect()
    assert len(insumos) == 1 and len(subs) == 1
    assert insumos[0]["insumo_filho_codigo"] == 1234
    assert insumos[0]["composicao_pai_codigo"] == 87453
    assert insumos[0]["coeficiente"] == 1.0  # "1,0" through the landing CSV
    assert subs[0]["composicao_filho_codigo"] == 5678
    assert subs[0]["coeficiente"] == 2.5
