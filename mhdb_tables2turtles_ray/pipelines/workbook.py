"""Generic workbook builds: ANY .xlsx + a declarative config.

The chills module (``pipelines/chills.py``) hard-codes the reference's
17 worksheet emitters; this module is the same pattern as a USER
surface — the reference's ``structure_to_keep`` idea
(``mhdb/unused_functions.py:611-749``) completed for real workbooks: a
JSON/Parquet spec config (``stages/spec_config.py``) extended with

- ``sheets``:  {spec name: worksheet name} — which sheet each
  EmissionSpec iterates;
- ``lookups``: [{name, sheet, key, value, truncate?}] — the FK lookup
  dicts to build from lookup sheets (the ``ForeignKey.lookup`` /
  ``backup_lookup`` namespace);
- ``header``:  optional {base_uri, version, label, comment, prefixes}
  for the Turtle header (defaults = materialize_turtle's).

so a user can run a NEW workbook end-to-end with zero engine code:
``build --workbook file.xlsx --specs cfg.json --out DIR``.

Scale note: same as the chills module — workbooks are driver-side
config artifacts; the lookup bundle ships once via ``ray.put`` and the
emitters are stateless ``map_batches``. A 10^12-row "sheet" would just
arrive as Parquet instead (``ray.data.read_parquet`` → the same
specs), which is exactly what ``kg_build --specs`` already does.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray
import ray.data

from ..stages.emit import TripleEmitter
from ..stages.materialize import materialize_turtle
from ..stages.spec_config import specs_from_rows


def load_workbook_config(path: str) -> dict:
    """Parse a workbook config: returns {"specs": tuple[EmissionSpec],
    "sheets": {spec: sheet}, "lookups": [defs], "header": {...}}."""
    with open(path, encoding="utf-8") as f:
        cfg = json.load(f)
    specs = specs_from_rows(cfg["specs"])
    sheets = cfg.get("sheets", {})
    missing = [s.name for s in specs if s.name not in sheets]
    if missing:
        raise ValueError(
            f"workbook config: no sheet binding for spec(s) {missing} — "
            "add them to the 'sheets' mapping"
        )
    for lk in cfg.get("lookups", ()):
        for field in ("name", "sheet", "key", "value"):
            if field not in lk:
                raise ValueError(
                    f"workbook config: lookup def {lk!r} missing {field!r}"
                )
    return {
        "specs": specs,
        "sheets": sheets,
        "lookups": cfg.get("lookups", []),
        "header": cfg.get("header", {}),
    }


def build_lookup_bundle(
    tables: dict[str, pa.Table], lookup_defs
) -> dict[str, dict[int, str]]:
    """[{name, sheet, key, value, truncate?}] → {name: {key: value}}
    with the reference's value gates (non-string skipped, first key
    wins — ``.values[0]`` semantics)."""
    out: dict[str, dict[int, str]] = {}
    for lk in lookup_defs:
        # config-vs-workbook validation happens HERE (the config loader
        # can only check the def's own fields): a missing sheet or
        # column must name the lookup def, not die as a bare KeyError
        if lk["sheet"] not in tables:
            raise ValueError(
                f"lookup {lk['name']!r}: workbook has no sheet "
                f"{lk['sheet']!r} (have {sorted(tables)})"
            )
        table = tables[lk["sheet"]]
        for field in ("key", "value"):
            if lk[field] not in table.column_names:
                raise ValueError(
                    f"lookup {lk['name']!r}: sheet {lk['sheet']!r} has "
                    f"no column {lk[field]!r} (have {table.column_names})"
                )
        trunc = lk.get("truncate")
        d: dict[int, str] = {}
        for k, v in zip(
            table.column(lk["key"]).to_pylist(),
            table.column(lk["value"]).to_pylist(),
        ):
            if k is None or not isinstance(v, str):
                continue
            if int(k) not in d:
                d[int(k)] = v[:trunc] if trunc else v
        out[lk["name"]] = d
    return out


def union_or_empty(parts: list) -> ray.data.Dataset:
    """Union a list of (subj, pred, obj) emission streams; an empty
    list is a usable empty-triples Dataset (ONE home for the empty
    schema + union fold — the chills and generic builders must share
    the same contract or their empty/union behavior silently
    diverges)."""
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "subj": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                }
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def workbook_triples(
    tables: dict[str, pa.Table],
    specs,
    sheets: dict[str, str],
    lookups: dict[str, dict[int, str]],
    quarantine: bool = True,
) -> ray.data.Dataset:
    """Emit every spec over its bound sheet; union of all streams."""
    lookups_ref = ray.put(lookups)
    by_sheet: dict[str, list] = {}
    for spec in specs:
        by_sheet.setdefault(sheets[spec.name], []).append(spec)
    parts = []
    for sheet, sheet_specs in by_sheet.items():
        if sheet not in tables:
            raise ValueError(
                f"workbook has no sheet {sheet!r} "
                f"(have {sorted(tables)})"
            )
        table = tables[sheet]
        if table.num_rows == 0:
            continue
        parts.append(
            ray.data.from_arrow(table).map_batches(
                TripleEmitter(
                    tuple(sheet_specs), lookups_ref, quarantine=quarantine
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
    return union_or_empty(parts)


def build_workbook(
    workbook_path: str,
    config_path: str,
    out_dir: str,
    num_partitions: int = 4,
    resume: bool = True,
) -> dict:
    """.xlsx + config → Turtle shards (dedup folded into the
    materialize shuffle, independent per-partition resume)."""
    from ..sources.excel import read_excel_workbook

    cfg = load_workbook_config(config_path)
    tables = read_excel_workbook(workbook_path)
    lookups = build_lookup_bundle(tables, cfg["lookups"])
    triples = workbook_triples(
        tables, cfg["specs"], cfg["sheets"], lookups
    )
    header = cfg["header"]
    kwargs = {
        k: header[k]
        for k in ("base_uri", "version", "label", "comment")
        if k in header
    }
    if "prefixes" in header:
        kwargs["prefixes"] = [tuple(p) for p in header["prefixes"]]
    return materialize_turtle(
        triples,
        out_dir,
        num_partitions=num_partitions,
        resume=resume,
        dedup=True,
        **kwargs,
    )
