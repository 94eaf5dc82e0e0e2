"""Minimal stdlib XLSX reader/writer — un-gates S4/S6 without openpyxl.

XLSX is a public, documented format (ECMA-376 / ISO 29500): a zip of
XML parts. The reference's primary input is SINAPI's xlsx workbooks,
which it reads via ``pandas.read_excel(engine='openpyxl')``
(``processor.py:180,219-222,332``; ``pre_processor.py:51-84``); this
container ships no openpyxl, so the engine implements the small subset
of the format those workbooks need with ``zipfile`` + ``xml.etree``:

- workbook.xml + its rels for sheet-name -> worksheet-part routing;
- sharedStrings.xml (plain and rich-text runs);
- cell types: shared string (``t="s"``), inline string
  (``t="inlineStr"``), formula cached string (``t="str"``), boolean
  (``t="b"``), and plain numeric ``<v>``;
- sparse cells (``r="C5"`` references) densified with empty strings,
  matching ``pd.read_excel(header=None)``'s NaN -> '' serialization.

Documented divergences from ``pandas.read_excel``: date-styled
numeric cells are emitted as raw Excel serials (e.g. ``45292``), not
datetime strings — numFmt styles are not interpreted; formula cells
yield their cached ``<v>`` value, not the formula text; booleans
render ``TRUE``/``FALSE`` (not Python ``True``/``False``). SINAPI
sheets carry dates as ``MM/yyyy`` text, so none of these affect the
reference workbooks; a workbook with date-TYPED cells would need a
styles.xml-aware reader.

The writer emits the same subset so tests can synthesize
reference-shaped workbooks (the ``startrow=9`` fixture pattern from
``reference/tests/core/test_processor.py:86-111``) without any Excel
library. Everything here is driver-side landing-zone work, exactly
like the reference's pre-conversion step — the distributed engine only
ever sees the resulting CSV/Parquet.
"""

from __future__ import annotations

import re
import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL_DOC = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)
_NS_REL_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"
_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _m(tag: str) -> str:
    return f"{{{_NS_MAIN}}}{tag}"


def _col_index(ref: str) -> int | None:
    """'A'->0, 'Z'->25, 'AA'->26 ... (None for unparseable refs)."""
    m = _CELL_REF.match(ref)
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    n = idx + 1
    while n:
        n, r = divmod(n - 1, 26)
        out = chr(ord("A") + r) + out
    return out


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _sheet_parts(zf: zipfile.ZipFile) -> dict[str, str]:
    """sheet name -> zip member path, via workbook rels."""
    rels = {}
    try:
        root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in root.iter(f"{{{_NS_REL_PKG}}}Relationship"):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = f"xl/{target}"
            rels[rel.get("Id")] = target
    except KeyError:
        pass
    parts: dict[str, str] = {}
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    for i, sheet in enumerate(wb.iter(_m("sheet"))):
        rid = sheet.get(f"{{{_NS_REL_DOC}}}id")
        part = rels.get(rid, f"xl/worksheets/sheet{i + 1}.xml")
        parts[sheet.get("name", f"Sheet{i + 1}")] = part
    return parts


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    # a <si> is either a plain <t> or rich-text <r><t> runs; concat all
    return [
        "".join(t.text or "" for t in si.iter(_m("t")))
        for si in root.iter(_m("si"))
    ]


def _cell_value(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_m("is"))
        if is_el is None:
            return ""
        return "".join(tt.text or "" for tt in is_el.iter(_m("t")))
    v = c.find(_m("v"))
    raw = v.text if v is not None and v.text is not None else ""
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return "TRUE" if raw == "1" else "FALSE"
    return raw  # numeric / formula-cached as written


def xlsx_sheet_names(path: str | Path) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return list(_sheet_parts(zf))


def read_xlsx_rows(path: str | Path, sheet: str) -> list[list[str]]:
    """One worksheet as dense rows of strings (missing cells -> '').

    Matches ``pd.read_excel(header=None).to_csv(header=False,
    index=False)``'s view of the grid: every row padded to the sheet's
    max used width, blank rows preserved by their ``r`` index.
    """
    with zipfile.ZipFile(path) as zf:
        parts = _sheet_parts(zf)
        if sheet not in parts:
            raise KeyError(
                f"planilha '{sheet}' não encontrada; disponíveis: "
                f"{list(parts)}"
            )
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(parts[sheet]))

    rows: dict[int, dict[int, str]] = {}
    for r_i, row in enumerate(root.iter(_m("row"))):
        r = int(row.get("r", r_i + 1)) - 1
        cells = rows.setdefault(r, {})
        for c_i, c in enumerate(row.iter(_m("c"))):
            ref = c.get("r", "")
            col = _col_index(ref)
            cells[c_i if col is None else col] = _cell_value(c, shared)
    if not rows:
        return []
    n_rows = max(rows) + 1
    n_cols = max((max(cs) + 1 for cs in rows.values() if cs), default=0)
    return [
        [rows.get(r, {}).get(c, "") for c in range(n_cols)]
        for r in range(n_rows)
    ]


# ---------------------------------------------------------------------------
# writer (test/fixture synthesis — same subset the reader consumes)
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/'
    "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
    '"/>'
    "{sheet_overrides}"
    '<Override PartName="/xl/sharedStrings.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'sharedStrings+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_REL_PKG}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def write_xlsx(
    path: str | Path, sheets: dict[str, list[list[object]]]
) -> Path:
    """Write a minimal xlsx: strings via sharedStrings, numbers inline.

    Exercises the exact parts the reader consumes (workbook rels,
    shared strings, sparse numeric cells), so reader tests are honest.
    """
    path = Path(path)
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xmls = []
    for rows in sheets.values():
        out = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
        out.append(f'<worksheet xmlns="{_NS_MAIN}"><sheetData>')
        for r, row in enumerate(rows, start=1):
            out.append(f'<row r="{r}">')
            for c, val in enumerate(row):
                if val is None or val == "":
                    continue
                ref = f"{_col_letters(c)}{r}"
                if isinstance(val, bool):
                    out.append(
                        f'<c r="{ref}" t="b"><v>{int(val)}</v></c>'
                    )
                elif isinstance(val, (int, float)):
                    out.append(f'<c r="{ref}"><v>{val}</v></c>')
                else:
                    out.append(
                        f'<c r="{ref}" t="s"><v>{sref(str(val))}</v></c>'
                    )
            out.append("</row>")
        out.append("</sheetData></worksheet>")
        sheet_xmls.append("".join(out))

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{escape(n, {chr(34): "&quot;"})}" sheetId="{i + 1}" '
        f'r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL_DOC}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/worksheet"
        f'" Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(names))
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_REL_PKG}">{wb_rels}</Relationships>'
    )
    sst = "".join(f"<si><t>{escape(s)}</t></si>" for s in shared)
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS_MAIN}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">{sst}</sst>'
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides=overrides),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return path
