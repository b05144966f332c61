"""Minimal xlsx source/sink (SURVEY.md §2.1 S8/S9) on the stdlib.

The reference reads/writes Excel through ``pd.read_excel`` /
``DataFrame.to_excel`` (storage/excel_handler.py:24-226), which need
openpyxl/xlrd — absent from this runtime. XLSX is a zip of
SpreadsheetML parts, so this module implements the slice the
reference's handler actually exercises with ``zipfile`` + ``xml``:

- ``write_xlsx(df, path, sheet_name=..)`` / multi-sheet via
  ``write_xlsx_sheets({name: df})`` — inline strings, numbers, bools,
  NULL as empty cell; header row first (to_excel's shape with
  ``index=False``)
- ``read_xlsx(spark, path, sheet_name=None)`` — single sheet, by-name
  or the sheet list; header row → column names, types inferred as
  string/double/boolean per column (matching the reference DB
  handler's first-record inference spirit)

Excel files are driver-sized artifacts in the reference (local file
per job) — the writer collects; the distributed formats remain
parquet/csv/json.
"""

from __future__ import annotations

import re
import zipfile
from typing import Dict, List, Optional
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_xml(col: int, row: int, value) -> str:
    ref = f"{_col_letter(col)}{row}"
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(str(value))}</t></is></c>"
    )


def _sheet_xml(header: List[str], rows: List[tuple]) -> str:
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    parts.append(
        "<row r=\"1\">"
        + "".join(_cell_xml(c, 1, name) for c, name in enumerate(header))
        + "</row>"
    )
    for r, row in enumerate(rows, start=2):
        parts.append(
            f'<row r="{r}">'
            + "".join(_cell_xml(c, r, v) for c, v in enumerate(row))
            + "</row>"
        )
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx_sheets(sheets: Dict[str, DataFrame], path: str) -> int:
    """Multi-sheet sink (excel_handler.py:84-118). Returns total rows."""
    total = 0
    sheet_entries = []
    rel_entries = []
    overrides = []
    payloads = {}
    for i, (name, df) in enumerate(sheets.items(), start=1):
        header = df.columns
        rows = [tuple(r) for r in df.collect()]
        total += len(rows)
        payloads[f"xl/worksheets/sheet{i}.xml"] = _sheet_xml(header, rows)
        sheet_entries.append(
            # attribute context: escape() alone leaves '"' unescaped,
            # which would break the name="..." attribute
            f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i}" r:id="rId{i}"/>'
        )
        rel_entries.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            f'"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            f'worksheet+xml"/>'
        )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{''.join(sheet_entries)}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{''.join(rel_entries)}</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(overrides="".join(overrides)),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for part, xml in payloads.items():
            zf.writestr(part, xml)
    return total


def write_xlsx(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> int:
    return write_xlsx_sheets({sheet_name: df}, path)


def _parse_sheet(xml: bytes, shared: List[str]) -> List[List]:
    rows: List[List] = []
    root = ET.fromstring(xml)
    for row_el in root.iter(f"{_NS}row"):
        row: Dict[int, object] = {}
        for cell in row_el.iter(f"{_NS}c"):
            ref = cell.get("r", "A1")
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            col -= 1
            ctype = cell.get("t", "n")
            value: object = None
            if ctype == "inlineStr":
                t = cell.find(f"{_NS}is/{_NS}t")
                value = t.text if t is not None else ""
                value = value or ""
            else:
                v = cell.find(f"{_NS}v")
                if v is None or v.text is None:
                    value = None
                elif ctype == "s":
                    value = shared[int(v.text)]
                elif ctype == "b":
                    value = v.text == "1"
                elif ctype == "str":
                    value = v.text
                else:
                    value = float(v.text)
            row[col] = value
        width = max(row) + 1 if row else 0
        rows.append([row.get(i) for i in range(width)])
    return rows


def list_sheets(path: str) -> List[str]:
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    return [s.get("name") for s in wb.iter(f"{_NS}sheet")]


def read_xlsx(
    spark: SparkSession, path: str, sheet_name: Optional[str] = None
) -> DataFrame:
    """Single-sheet source (excel_handler.py:140-181): header row →
    columns; per-column type = double if every non-null cell is
    numeric, boolean if every cell is bool, else string."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = list(wb.iter(f"{_NS}sheet"))
        chosen_idx = 0
        if sheet_name is not None:
            names = [s.get("name") for s in sheets]
            if sheet_name not in names:
                raise KeyError(f"sheet {sheet_name!r} not in {names}")
            chosen_idx = names.index(sheet_name)
        rel_id = sheets[chosen_idx].get(f"{_REL_NS}id")
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target = None
        for rel in rels.iter():
            if rel.get("Id") == rel_id:
                target = rel.get("Target")
        if target is None:  # pragma: no cover - malformed workbook
            raise ValueError("workbook relationship missing")
        shared: List[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        rows = _parse_sheet(zf.read(f"xl/{re.sub(r'^/?(xl/)?', '', target)}"), shared)
    if not rows:
        raise ValueError("empty sheet")
    header = [str(h) for h in rows[0]]
    data = rows[1:]
    width = len(header)
    data = [r + [None] * (width - len(r)) for r in data]

    def col_type(i: int) -> str:
        vals = [r[i] for r in data if r[i] is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            return "boolean"
        if vals and all(isinstance(v, float) for v in vals):
            return "double"
        return "string"

    types = [col_type(i) for i in range(width)]
    cast_rows = []
    for r in data:
        out = []
        for v, t in zip(r, types):
            if v is None:
                out.append(None)
            elif t == "string":
                out.append(str(v) if not isinstance(v, str) else v)
            else:
                out.append(v)
        cast_rows.append(tuple(out))
    schema = ", ".join(
        f"`{name}` {t}" for name, t in zip(header, types)
    )
    return spark.createDataFrame(cast_rows, schema)
