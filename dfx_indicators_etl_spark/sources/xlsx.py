"""XLSX ingestion (reference: ``storage/_base.py:84-96`` reads .xlsx
via ``pd.read_excel``; ``pipelines/sipri_milex.py:84-93`` adds header
inference + ``na_values``).

The container ships no Excel library, so this is a dependency-free
OOXML reader/writer on ``zipfile`` + ``xml.etree`` (an .xlsx file is a
zip of XML parts). It covers the worksheet features the ETL sources
use — shared/inline strings, numbers, booleans, sparse cells — and
deliberately not styles/formulas/dates-as-serials.

Excel payloads are control-plane sized (the reference loads them into
pandas on one node); parsing happens driver-side and the frame enters
Spark via ``createDataFrame`` with an explicit schema — the same
boundary the reference draws, so no executor ever needs an XLSX codec.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "list_sheets",
    "read_xlsx",
    "infer_header_row",
    "xlsx_to_spark",
    "write_xlsx",
]

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

Cell = str | float | int | bool | None


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """Sheet name → worksheet zip path, in workbook order."""
    rels = {}
    with zf.open("xl/_rels/workbook.xml.rels") as fh:
        for rel in ET.parse(fh).getroot().iter(f"{_PKG_REL_NS}Relationship"):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = f"xl/{target}"
            rels[rel.get("Id")] = target
    out: dict[str, str] = {}
    with zf.open("xl/workbook.xml") as fh:
        for sheet in ET.parse(fh).getroot().iter(f"{_MAIN_NS}sheet"):
            rid = sheet.get(f"{_REL_NS}id")
            if rid in rels:
                out[sheet.get("name", "")] = rels[rid]
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    with zf.open("xl/sharedStrings.xml") as fh:
        root = ET.parse(fh).getroot()
    # An <si> is either one <t> or rich-text runs; concatenate all <t>.
    return [
        "".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t"))
        for si in root.iter(f"{_MAIN_NS}si")
    ]


def _col_index(ref: str) -> int:
    """0-based column index from a cell ref like ``BC12``."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _cell_value(cell: ET.Element, shared: list[str]) -> Cell:
    kind = cell.get("t", "n")
    if kind == "inlineStr":
        node = cell.find(f"{_MAIN_NS}is")
        if node is None:
            return None
        return "".join(t.text or "" for t in node.iter(f"{_MAIN_NS}t"))
    v = cell.find(f"{_MAIN_NS}v")
    if v is None or v.text is None:
        return None
    if kind == "s":
        return shared[int(v.text)]
    if kind == "str":
        return v.text
    if kind == "b":
        return v.text.strip() in ("1", "true")
    # numeric: keep ints exact, everything else float
    text = v.text.strip()
    try:
        return int(text)
    except ValueError:
        return float(text)


def list_sheets(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return list(_sheet_targets(zf))


def read_xlsx(path: str, sheet_name: str | None = None) -> list[list[Cell]]:
    """Parse one worksheet into a rectangular list of rows.

    Sparse cells / short rows pad with ``None`` so every row has the
    sheet's maximum width (pandas' read_excel shape).
    """
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        if sheet_name is None:
            sheet_name = next(iter(targets))
        if sheet_name not in targets:
            raise KeyError(f"sheet {sheet_name!r} not in {list(targets)}")
        shared = _shared_strings(zf)
        rows: list[dict[int, Cell]] = []
        max_row = 0
        max_col = -1
        with zf.open(targets[sheet_name]) as fh:
            for _, row in ET.iterparse(fh):
                if row.tag != f"{_MAIN_NS}row":
                    continue
                r = int(row.get("r", len(rows) + 1)) - 1
                cells: dict[int, Cell] = {}
                for cell in row.iter(f"{_MAIN_NS}c"):
                    ref = cell.get("r", "")
                    col = _col_index(ref) if ref else len(cells)
                    value = _cell_value(cell, shared)
                    if value is not None:
                        cells[col] = value
                        max_col = max(max_col, col)
                while len(rows) <= r:
                    rows.append({})
                rows[r] = cells
                max_row = max(max_row, r)
                row.clear()
    width = max_col + 1
    return [
        [rows[r].get(c) for c in range(width)] if r < len(rows) else [None] * width
        for r in range(max_row + 1)
    ]


def infer_header_row(rows: list[list[Cell]], key: str, col: int = 0) -> int:
    """First row index whose ``col``-th cell equals ``key`` — the
    reference's SIPRI header inference (``iloc[:, 0].eq("Country")``,
    sipri_milex.py:90-91)."""
    for i, row in enumerate(rows):
        if col < len(row) and row[col] == key:
            return i
    raise ValueError(f"no row with {key!r} in column {col}")


def _column_type(values: list[Cell]) -> T.DataType:
    non_null = [v for v in values if v is not None]
    if non_null and all(isinstance(v, bool) for v in non_null):
        return T.BooleanType()
    if non_null and all(
        isinstance(v, int) and not isinstance(v, bool) for v in non_null
    ):
        return T.LongType()
    if non_null and all(
        isinstance(v, (int, float)) and not isinstance(v, bool) for v in non_null
    ):
        return T.DoubleType()
    return T.StringType()


def xlsx_to_spark(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,
    header_row: int = 0,
    na_values: tuple[str, ...] = (),
    row_id_col: str | None = None,
) -> DataFrame:
    """Worksheet → DataFrame with an inferred per-column schema.

    Driver-side parse (control-plane sized by contract), explicit
    schema into ``createDataFrame``: integral columns → long, numeric →
    double, mixed → string (values stringified like pandas' object
    columns). ``na_values`` nulls out sentinel strings before typing —
    the reference's ``na_values=["xxx", "..."]``. ``row_id_col``
    prepends the sheet row index (order-dependent transforms like
    merged-cell forward-fill need an explicit order column once the
    frame is distributed).
    """
    rows = read_xlsx(path, sheet_name)
    if header_row >= len(rows):
        raise ValueError(f"header_row {header_row} beyond sheet ({len(rows)} rows)")
    header, data = rows[header_row], rows[header_row + 1 :]
    names: list[str] = []
    for i, cell in enumerate(header):
        name = str(cell) if cell is not None else f"col{i}"
        while name in names:  # de-dup like pandas' mangle_dupe_cols
            name += "_"
        names.append(name)
    if na_values:
        data = [
            [None if isinstance(v, str) and v in na_values else v for v in row]
            for row in data
        ]
    cols = [[row[i] if i < len(row) else None for row in data] for i in range(len(names))]
    types = [_column_type(c) for c in cols]
    typed = [
        [
            None
            if row[i] is None
            else (
                str(row[i])
                if isinstance(types[i], T.StringType) and not isinstance(row[i], str)
                else (
                    float(row[i])
                    if isinstance(types[i], T.DoubleType)
                    else row[i]
                )
            )
            for i in range(len(names))
        ]
        for row in data
    ]
    schema = T.StructType(
        [T.StructField(n, t, True) for n, t in zip(names, types)]
    )
    if row_id_col is not None:
        typed = [[i, *row] for i, row in enumerate(typed)]
        schema = T.StructType(
            [T.StructField(row_id_col, T.LongType(), False), *schema.fields]
        )
    return spark.createDataFrame(typed, schema)


# ---------------------------------------------------------------------------
# Minimal writer (tests / fixtures): inline strings + numbers only.

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xlsx(path: str, sheets: dict[str, list[list[Cell]]]) -> None:
    """Write a minimal multi-sheet .xlsx (inline strings, numbers,
    booleans; None cells omitted). Enough surface for round-trip tests
    and fixture files — not a general-purpose Excel writer."""
    sheet_xml: dict[str, str] = {}
    for si, rows in enumerate(sheets.values(), start=1):
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                col = ""
                n = ci + 1
                while n:
                    n, rem = divmod(n - 1, 26)
                    col = chr(ord("A") + rem) + col
                ref = f"{col}{ri}"
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                        f"{_xml_escape(str(v))}</t></is></c>"
                    )
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xml[f"xl/worksheets/sheet{si}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>'
        )
    sheet_tags = "".join(
        f'<sheet name="{_xml_escape(name)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, start=1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)
        )
        + "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for name, xml in sheet_xml.items():
            zf.writestr(name, xml)
