"""Excel (.xlsx) workbook source — pure-stdlib OOXML reader.

The reference ingests ``pd.ExcelFile('input/chills.xlsx')`` workbooks
(``mhdb/create_mhdb:160-169``, ``mhdb/spreadsheet_io.py:18-39``), but
neither openpyxl nor xlrd ships in this environment, so this module
parses the public OOXML spreadsheet format directly: a .xlsx file is a
zip of XML parts (ECMA-376) — ``xl/workbook.xml`` lists sheets,
``xl/sharedStrings.xml`` interns strings, ``xl/worksheets/sheetN.xml``
holds typed cells.

Semantics match what the reference's pandas parse feeds
``ingest_chills``: row 1 is the header; missing cells are nulls (the
reference then ``fillna('EmptyValue')``s — our emit engine treats null
and the sentinel identically, ``stages/emit.py:is_excluded``); numeric
columns come back int64 when every value is integral (so a gyear cell
renders ``2018`` not ``2018.0``); a column mixing text and numbers
(the comma-separated FK cells next to scalar indices) becomes a string
column with integral numbers rendered bare (``"3"``, parseable by
``stages.emit.fk_keys``).

Scale note: workbooks are driver-side config artifacts (tens of sheets
× hundreds of rows — the chills workbook is ~400 rows total), never
the 100-TB data path; reading one on the driver and shipping the
small Arrow tables via ``ray.put`` is the intended use. The corpus
itself always arrives as Parquet.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import pyarrow as pa

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26 …"""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>…</t></r>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip path of its worksheet XML)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    by_id = {}
    for rel in rels.findall(f"{_PKG_REL_NS}Relationship"):
        target = rel.get("Target")
        if target.startswith("/"):
            target = target[1:]
        else:
            target = "xl/" + target
        by_id[rel.get("Id")] = target
    out = []
    for sheet in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet"):
        rid = sheet.get(f"{_REL_NS}id")
        out.append((sheet.get("name"), by_id[rid]))
    return out


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(el.text or "" for el in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return bool(int(v.text))
    if t == "e":
        # formula error cells (#N/A, #DIV/0!, …) store the error STRING
        # in <v>. pandas' excel parse (the semantics this module
        # documents itself as mirroring) converts them to NaN, so the
        # reference pipeline DROPS them — return null for parity (and a
        # real workbook with one bad formula must not abort the whole
        # build on float("#N/A") either way)
        return None
    if t == "d":
        # ISO-8601 date cells (rare; most producers store serial
        # numbers) — keep the literal string
        return v.text
    # numeric
    f = float(v.text)
    return int(f) if f.is_integer() else f


def _rows_from_sheet(data: bytes, shared: list[str]) -> list[list]:
    """Sparse OOXML rows → dense list-of-lists (None-padded)."""
    root = ET.fromstring(data)
    sheet_data = root.find(f"{_NS}sheetData")
    rows: list[list] = []
    if sheet_data is None:
        return rows
    for row_el in sheet_data.findall(f"{_NS}row"):
        row_num = int(row_el.get("r", len(rows) + 1))
        while len(rows) < row_num:
            rows.append([])
        cells = rows[row_num - 1]
        for cell in row_el.findall(f"{_NS}c"):
            ref = cell.get("r")
            if ref:
                m = _CELL_REF.fullmatch(ref)
                col = _col_index(m.group(1))
            else:
                col = len(cells)
            while len(cells) <= col:
                cells.append(None)
            cells[col] = _cell_value(cell, shared)
    return rows


def _column_array(values: list) -> pa.Array:
    """Type a column the way the emit engine expects (module docstring):
    pure-numeric → int64/float64, pure-bool → bool, anything mixed →
    string with bare integral rendering."""
    non_null = [v for v in values if v is not None]
    if not non_null:
        return pa.array(values, pa.string())
    if all(isinstance(v, bool) for v in non_null):
        return pa.array(values, pa.bool_())
    if all(isinstance(v, (int, float)) and not isinstance(v, bool)
           for v in non_null):
        if all(isinstance(v, int) for v in non_null):
            return pa.array(values, pa.int64())
        return pa.array(
            [float(v) if v is not None else None for v in values],
            pa.float64(),
        )

    def _s(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, int):
            return str(v)
        if isinstance(v, float):
            return str(int(v)) if v.is_integer() else str(v)
        return v

    return pa.array([_s(v) for v in values], pa.string())


def read_excel_workbook(path: str) -> dict[str, pa.Table]:
    """.xlsx path → {sheet name: Arrow table} (row 1 = header).

    Header tolerance mirrors the reference's pandas parse: unnamed
    header cells get positional ``Unnamed: N`` names; fully-empty
    trailing columns are kept only if headed. Duplicate header names
    are renamed with pandas' exact ``dedup_names`` algorithm (``.1``
    suffixes chaining onto already-suffixed names on collision) so no
    data column is silently dropped and configs written against a
    pandas parse of the same workbook resolve identically.
    """
    tables: dict[str, pa.Table] = {}
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        for name, target in _sheet_targets(zf):
            rows = _rows_from_sheet(zf.read(target), shared)
            if not rows:
                tables[name] = pa.table({})
                continue
            header, body = rows[0], rows[1:]
            n_cols = max([len(header)] + [len(r) for r in body]) if (
                header or body
            ) else 0
            names: list[str] = []
            seen: dict[str, int] = {}
            for i in range(n_cols):
                raw = header[i] if i < len(header) else None
                col = str(raw) if raw is not None else f"Unnamed: {i}"
                # pandas' dedup_names algorithm EXACTLY (a config/spec
                # written against the reference's pandas-parsed column
                # names must resolve identically): on collision the
                # suffix chains onto the already-suffixed name, so
                # ["x", "x.1", "x"] yields x, x.1, x.1.1 — and never a
                # second "x.1" that pa.table(dict(...)) would silently
                # drop
                cur = seen.get(col, 0)
                while cur > 0:
                    seen[col] = cur + 1
                    col = f"{col}.{cur}"
                    cur = seen.get(col, 0)
                seen[col] = cur + 1
                names.append(col)
            columns = []
            for i in range(n_cols):
                columns.append(
                    _column_array(
                        [r[i] if i < len(r) else None for r in body]
                    )
                )
            tables[name] = pa.table(dict(zip(names, columns)))
    return tables
