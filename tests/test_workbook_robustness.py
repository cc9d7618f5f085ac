"""Workbook-surface robustness (round-5 review fixes): real-world
.xlsx quirks the golden fixture can't exercise — formula-error cells,
recursively-colliding duplicate headers — plus the descriptive-error
contract of the lookup bundle and the chills build's no-op path."""

from __future__ import annotations

from xml.etree import ElementTree as ET

import pandas as pd
import pytest

from mhdb_tables2turtles_ray.sources.excel import (
    _cell_value,
    read_excel_workbook,
)
from tests.xlsx_write import write_xlsx

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _cell(xml: str):
    return ET.fromstring(xml.replace("<c ", f'<c xmlns="{_NS}" ', 1))


def test_error_and_date_cells():
    """A formula error (#N/A, #DIV/0!) is stored as <c t="e"> with the
    error STRING in <v>: pandas' excel parse converts these to NaN, so
    they must come back NULL (reference parity — the reference's
    fillna/exclude machinery then drops them), never crash float().
    An ISO-date cell (t="d") keeps its literal string."""
    assert _cell_value(_cell('<c r="A1" t="e"><v>#N/A</v></c>'), []) is None
    assert (
        _cell_value(_cell('<c r="B2" t="e"><v>#DIV/0!</v></c>'), []) is None
    )
    assert (
        _cell_value(_cell('<c r="C3" t="d"><v>2018-01-02</v></c>'), [])
        == "2018-01-02"
    )
    # the numeric path is unchanged
    assert _cell_value(_cell('<c r="D4"><v>2018</v></c>'), []) == 2018


def test_duplicate_headers_match_pandas_dedup_names(tmp_path):
    """["x", "x.1", "x"] must yield x, x.1, x.1.1 — pandas'
    dedup_names chains the suffix onto the already-suffixed name on
    collision (verified against the installed pandas), so configs
    written against a pandas parse of the same workbook resolve
    identically; a naive suffix would mint a second "x.1" and silently
    drop a data column."""
    try:
        from pandas.io.common import dedup_names

        expect = list(
            dedup_names(["x", "x.1", "x"], is_potential_multiindex=False)
        )
    except ImportError:  # private API moved — fall back to the pin
        expect = ["x", "x.1", "x.1.1"]
    assert expect == ["x", "x.1", "x.1.1"]

    path = str(tmp_path / "dup.xlsx")
    df = pd.DataFrame([["a", "b", "c"]], columns=["x", "x.1", "x"])
    write_xlsx({"S": df}, path)
    t = read_excel_workbook(path)["S"]
    assert t.column_names == expect
    assert [c.to_pylist() for c in t.columns] == [["a"], ["b"], ["c"]]


def test_lookup_bundle_names_the_broken_def():
    from mhdb_tables2turtles_ray.pipelines.workbook import build_lookup_bundle

    import pyarrow as pa

    tables = {"S": pa.table({"index": [1], "v": ["a"]})}
    with pytest.raises(ValueError, match="lookup 'lk'.*no sheet 'MISSING'"):
        build_lookup_bundle(
            tables,
            [{"name": "lk", "sheet": "MISSING", "key": "index", "value": "v"}],
        )
    with pytest.raises(ValueError, match="lookup 'lk'.*no column 'nope'"):
        build_lookup_bundle(
            tables,
            [{"name": "lk", "sheet": "S", "key": "index", "value": "nope"}],
        )


def test_chills_missing_lookup_sheet_is_descriptive():
    """A non-chills workbook fails with the lookup bundle's contextual
    error, not a bare KeyError: 'ArticleType'."""
    from mhdb_tables2turtles_ray.pipelines.chills import chills_lookups

    with pytest.raises(ValueError, match="no sheet 'ArticleType'"):
        chills_lookups({})


def test_chills_triples_empty_workbook_is_noop(ray_session):
    """All spec sheets absent/empty → an empty (subj, pred, obj)
    Dataset, same contract as workbook.workbook_triples — requires the
    lookup sheets to exist (they are validated first)."""
    import pyarrow as pa

    from mhdb_tables2turtles_ray.pipelines.chills import (
        _LOOKUPS,
        chills_triples,
    )

    tables = {
        sheet: pa.table(
            {"index": pa.array([], pa.int64()), col: pa.array([], pa.string())}
        )
        for _, sheet, col, _ in _LOOKUPS
    }
    out = chills_triples(tables)
    assert out.count() == 0
    assert set(out.schema().names) == {"subj", "pred", "obj"}
