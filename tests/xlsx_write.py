"""Minimal stdlib .xlsx writer — TEST SUPPORT ONLY.

The container has no Excel library, so the golden-workbook fixture is
serialized to a real OOXML package by hand (zip of XML parts per
ECMA-376). Deliberately minimal: one shared-strings table (exercising
the reader's interning path), typed numeric cells, and
``xml:space="preserve"`` on padded strings (the claims leading-space
quirk must survive the round-trip).
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
{overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(sheets: dict[str, "object"], path: str) -> None:
    """{sheet name: pandas DataFrame} → .xlsx at ``path``.

    None/NaN cells are omitted (true blanks); ints/floats become
    numeric cells; everything else is a shared string.
    """
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xml = {}
    for sheet_no, (name, df) in enumerate(sheets.items(), 1):
        rows_out = []
        header = list(df.columns)
        all_rows = [header] + df.values.tolist()
        for r, row in enumerate(all_rows, 1):
            cells = []
            for c, v in enumerate(row):
                if v is None or (isinstance(v, float) and v != v):
                    continue
                ref = f"{_col_letter(c)}{r}"
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    num = int(v) if isinstance(v, float) and v.is_integer() else v
                    cells.append(f'<c r="{ref}"><v>{num}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sref(str(v))}</v></c>'
                    )
            if cells:
                rows_out.append(f'<row r="{r}">{"".join(cells)}</row>')
        sheet_xml[sheet_no] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(rows_out)
            + "</sheetData></worksheet>"
        )

    def t_el(s: str) -> str:
        body = escape(s)
        if s != s.strip():
            return f'<t xml:space="preserve">{body}</t>'
        return f"<t>{body}</t>"

    shared_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
        f'main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si>{t_el(s)}</si>" for s in shared)
        + "</sst>"
    )

    sheets_el = "".join(
        f'<sheet name="{escape(name)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, 1)
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<sheets>{sheets_el}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)
        )
        + f'<Relationship Id="rId{len(sheets) + 1}" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/sharedStrings"'
        ' Target="sharedStrings.xml"/>'
        + "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(1, len(sheets) + 1)
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", shared_xml)
        for i, name in enumerate(sheets, 1):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", sheet_xml[i])
