"""Config-driven per-row triple emission (the EmissionSpec engine).

The reference hand-unrolls ~45 instances of the same pattern — iterate a
worksheet, mint a subject IRI, gate every cell against an exclude list,
append (predicate, object) pairs, point-look-up FK columns against small
lookup sheets (reference ``mhdb/ingest.py`` §2.2 of SURVEY.md; e.g. the
papers emitter at ``mhdb/ingest.py:3150-3465``). We implement the pattern
ONCE as a declarative :class:`EmissionSpec` executed inside
``Dataset.map_batches`` over Arrow batches: one input row fans out to N
triple rows ``(subj, pred, obj)``.

Scale notes
-----------
- The emitter is embarrassingly parallel (pure function of the row +
  static vocab): stateless tasks, no shuffle.
- Lookup tables are broadcast once via ``ray.put`` and materialized per
  worker in ``__init__`` (use ``concurrency=`` to get an actor pool), not
  re-shipped per batch.
- Per-batch partial dedup (a set) collapses intra-batch duplicate
  triples before they hit the global dedup shuffle — the classic
  partial/final aggregate split.
- Dangling FKs do NOT crash (the reference raises IndexError,
  ``mhdb/ingest.py:3192-3193``); they are quarantined as counted
  ``:hasDanglingFK`` triples on the source subject so a 10^12-row run
  survives and the loss is measurable.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..functions.strings import check_iri, language_string, typed_literal

TRIPLE_SCHEMA = pa.schema(
    [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
)

# Reference exclude_list semantics (mhdb/ingest.py:23-24): the sentinel
# 'EmptyValue', empty string, the *strings* 'NaN'/'NAN'/'nan', real NaN
# and None all suppress emission. Note the string "None" is NOT excluded
# (quirk: ':None' objects appear in the golden output) — preserved.
_EXCLUDED_STRINGS = frozenset({"EmptyValue", "", "NaN", "NAN", "nan"})


def is_excluded(value) -> bool:
    # Hot path (called ~20× per input row): exact-type checks instead of
    # isinstance, NaN via self-inequality.
    if value is None:
        return True
    cls = value.__class__
    if cls is str:
        return value in _EXCLUDED_STRINGS
    if cls is float:
        return value != value
    return False


def fk_keys(value) -> list[int] | None:
    """Parse a scalar-or-comma-separated FK cell into int keys.

    Reference pattern (mhdb/ingest.py:3185-3190): float/int → one-element
    list; string → comma split, int() each non-empty piece. Returns None
    for excluded cells, raises ValueError on garbage (caller quarantines).
    """
    if is_excluded(value):
        return None
    if isinstance(value, bool):
        raise ValueError(f"bad FK cell: {value!r}")
    if isinstance(value, (int, float)):
        return [int(value)]
    if isinstance(value, str):
        return [int(x) for x in value.strip().split(",") if len(x) > 0]
    raise ValueError(f"bad FK cell: {value!r}")


@dataclass(frozen=True)
class Literal:
    """A literal-ish column emission.

    kind:
      - ``"lang"``      → ``\"\"\"value\"\"\"@lang`` (language_string)
      - ``"xsd:*"``     → typed literal, e.g. ``"xsd:anyURI"``
      - ``"iri"``       → run the value through check_iri (CURIE/label)
      - ``"curie:P"``   → ``P:value`` pass-through CURIE (e.g.
        ``curie:ICD9CM``, reference mhdb/ingest.py:658-667)
      - ``"raw"``       → value emitted verbatim (the reference's
        owl:sameAs / equivalentClasses columns pass through unminted,
        mhdb/ingest.py:3094-3103)
    split: explode the cell on this delimiter first (alias /
      equivalentClasses columns, reference mhdb/ingest.py:1373-1391).
    strip: strip each part BEFORE truncation/rendering — needed where
      the reference strips before slicing (the claims emitter strips
      then truncates to 50 chars, mhdb/ingest.py:3751-3752, while the
      FK path slices the raw cell, :3336 — the dual-truncation quirk
      visible in the golden chills.ttl).
    template: a format string over the whole ROW used instead of
      ``column`` — enables reverse-edge emission where the object is a
      composite mint of other columns (the reference's
      task→implementation reverse triple, mhdb/ingest.py:2405-2407).
      All referenced cells are exclude-gated like subject fields.
    """

    column: str
    predicate: str
    kind: str = "lang"
    lang: str = "en"
    casing: str = "delimited"
    truncate: int | None = None
    split: str | None = None
    template: str | None = None
    strip: bool = False

    def render_template(self, row: dict) -> list[str]:
        import string as _string

        fields = [f[1] for f in _string.Formatter().parse(self.template) if f[1]]
        if any(is_excluded(row.get(f)) for f in fields):
            return []
        value = self.template.format(**row)
        return self.render(value)

    def render(self, value) -> list[str]:
        if is_excluded(value):
            return []
        parts = [value]
        if self.split is not None and isinstance(value, str):
            parts = [x.strip() for x in value.strip().split(self.split) if len(x) > 0]
        out = []
        for part in parts:
            if is_excluded(part):
                continue
            if self.strip and isinstance(part, str):
                part = part.strip()
            if self.truncate is not None and isinstance(part, str):
                part = part[: self.truncate]
            if self.kind in ("xsd:gyear", "xsd:int", "xsd:nonNegativeInteger"):
                # reference int()s these before formatting (e.g.
                # int(publication_year), mhdb/ingest.py:3446) — a float
                # cell (pandas/xlsx numeric column) must not render
                # '2018.0'
                # int cells and integer strings stay on the lossless
                # int path — round-tripping through float64 would
                # corrupt xsd:int values above 2^53; the float path
                # only serves genuinely float-typed cells ('2018.0')
                try:
                    part = int(part)
                except (TypeError, ValueError):
                    try:
                        part = int(float(part))
                    except (TypeError, ValueError):
                        pass
            if self.kind == "lang":
                out.append(language_string(part, self.lang))
            elif self.kind == "iri":
                out.append(check_iri(part, self.casing))
            elif self.kind.startswith("curie:"):
                out.append("{}:{}".format(self.kind[6:], part))
            elif self.kind == "raw":
                # Verbatim except newline folding: an interior newline in
                # a sameAs/equivalentClasses cell would break the rendered
                # shard's ' ;\n\t' block grammar (validate._parse_blocks)
                # and the manifest triple-count invariant.
                text = part if isinstance(part, str) else str(part)
                if "\n" in text or "\r" in text:
                    text = text.replace("\r", " ").replace("\n", " ")
                out.append(text)
            else:
                out.append(typed_literal(part, self.kind))
        return out


@dataclass(frozen=True)
class ForeignKey:
    """An index-keyed lookup column emission (broadcast hash join).

    ``lookup`` names a ``{int: str}`` dict in the emitter's lookup
    bundle; each resolved value is minted with ``casing`` (or formatted
    as a typed literal when ``as_literal`` is set). ``default`` is
    emitted verbatim when the FK cell is empty/excluded — the
    reference's else-branch fallback (e.g. ``rdfs:subClassOf :Language``
    when a language has no parent, mhdb/ingest.py:1719-1720).

    The ``foreign()`` config surface (reference
    ``mhdb/unused_functions.py:417-535``) adds three independent knobs:
    ``split_key_by`` — a CUSTOM key delimiter; when set, the cell is
    parsed ``[int(float(x)) for x in str(cell).split(split_key_by)]``
    (the reference's exact rule — no empty-piece filtering, so garbage
    quarantines); when None the live-path comma rule (:func:`fk_keys`)
    applies. ``split_value_by`` — the looked-up VALUE is split on this
    delimiter and each piece minted separately. ``backup_lookup`` — a
    second lookup consulted when the primary value is missing or the
    string ``"None"`` (the Foreign Value Column_Backup_Header
    fallback)."""

    column: str
    predicate: str
    lookup: str
    casing: str = "PascalCase"
    as_literal: str | None = None
    default: str | None = None
    split_key_by: str | None = None
    split_value_by: str | None = None
    backup_lookup: str | None = None


@dataclass(frozen=True)
class EmissionSpec:
    """One table-to-triples emission rule (≈ one reference emitter)."""

    name: str
    subject_template: str  # str.format over row columns, e.g. "{repo} {path}"
    subject_casing: str = "PascalCase"
    subject_truncate: int | None = None
    rdf_type: str | None = None
    label_template: str | None = None  # lang-string label; None = no label
    statics: tuple[tuple[str, str], ...] = ()
    literals: tuple[Literal, ...] = ()
    fks: tuple[ForeignKey, ...] = ()

    def columns(self) -> set[str]:
        import string as _string

        fmt = _string.Formatter()
        cols = {f[1] for f in fmt.parse(self.subject_template) if f[1]}
        if self.label_template:
            cols |= {f[1] for f in fmt.parse(self.label_template) if f[1]}
        cols |= {lit.column for lit in self.literals if lit.column}
        for lit in self.literals:
            if lit.template:
                cols |= {f[1] for f in fmt.parse(lit.template) if f[1]}
        cols |= {fk.column for fk in self.fks}
        return cols


class TripleEmitter:
    """``map_batches`` callable: Arrow batch in → (subj, pred, obj) out.

    Pass the class itself with ``fn_constructor_kwargs`` and
    ``concurrency=N`` for an actor pool when lookups are large; with a
    plain instance it runs as stateless tasks (closure-captured specs).
    """

    def __init__(self, specs, lookups_ref=None, quarantine: bool = True):
        self.specs = tuple(specs)
        if lookups_ref is None:
            self.lookups = {}
        else:
            import ray

            obj = lookups_ref
            self.lookups = ray.get(obj) if isinstance(obj, ray.ObjectRef) else obj
        self.quarantine = quarantine
        import string as _string

        fmt = _string.Formatter()
        self._subject_fields = {
            spec.name: [f[1] for f in fmt.parse(spec.subject_template) if f[1]]
            for spec in self.specs
        }
        self._label_fields = {
            spec.name: [f[1] for f in fmt.parse(spec.label_template) if f[1]]
            if spec.label_template
            else []
            for spec in self.specs
        }
        # fast path: "{col}" templates resolve by key lookup, no .format
        self._subject_single = {
            spec.name: spec.subject_template[1:-1]
            if (
                spec.subject_template.startswith("{")
                and spec.subject_template.endswith("}")
                and spec.subject_template.count("{") == 1
            )
            else None
            for spec in self.specs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs: list[str] = []
        preds: list[str] = []
        objs: list[str] = []
        seen: set[tuple[str, str, str]] = set()
        seen_add = seen.add
        s_app, p_app, o_app = subjs.append, preds.append, objs.append

        # All emitted components come from our own formatters (lang/typed
        # literals, check_iri mints, static predicates) whose outputs can
        # never collide with the exclude list — raw pass-through values
        # are gated in Literal.render before formatting — so emit() only
        # needs the per-batch dedup set (partial/final aggregate split).
        def emit(s: str, p: str, o: str) -> None:
            t = (s, p, o)
            if t not in seen:
                seen_add(t)
                s_app(s)
                p_app(p)
                o_app(o)

        for spec in self.specs:
            needed = [c for c in spec.columns() if c in batch.column_names]
            col_lists = [batch.column(c).to_pylist() for c in needed]
            pre = self._precompute(spec, batch)
            emit_row = self._emit_row
            if needed:
                for i, vals in enumerate(zip(*col_lists)):
                    emit_row(spec, dict(zip(needed, vals)), i, pre, emit)
            else:  # constant-subject spec: one emission per input row
                for i in range(batch.num_rows):
                    emit_row(spec, {}, i, pre, emit)

        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    def _precompute(self, spec: EmissionSpec, batch: pa.Table) -> dict:
        """Vectorized (Arrow-kernel) precomputation of the expensive
        per-row string mints for the common shapes — delimited subject
        minting, single-column lang labels, lang/iri literal columns.
        The row loop then only gates and looks up. Divergence-safe: the
        kernels route unicode/control-char values to the scalar fns
        (functions/vectorized.py), and every pathological case (empty
        after strip, excluded cells) is still decided per-row from the
        RAW cell before a precomputed value is used."""
        import string as _string

        import pyarrow.compute as pc

        from ..functions.vectorized import (
            check_iri_delimited_vec,
            language_string_vec,
        )

        n = batch.num_rows
        pre = {"subject": None, "label": None, "lits": {}}
        if n == 0:
            return pre
        schema = {f.name: f.type for f in batch.schema}

        def _ok(t):
            return pa.types.is_string(t) or pa.types.is_large_string(t) or (
                pa.types.is_integer(t)
            )

        sfields = self._subject_fields[spec.name]
        if (
            spec.subject_casing == "delimited"
            and spec.subject_truncate is None
            and sfields
            and all(f in schema and _ok(schema[f]) for f in sfields)
        ):
            parts = []
            for lit_text, field, _, _ in _string.Formatter().parse(
                spec.subject_template
            ):
                if lit_text:
                    parts.append(pa.array([lit_text] * n, pa.string()))
                if field:
                    col = batch.column(field).combine_chunks()
                    if not pa.types.is_string(col.type):
                        col = pc.cast(col, pa.string())
                    parts.append(col)
            raw = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
                *parts, ""
            )
            minted = check_iri_delimited_vec(raw).to_pylist()
            nonempty = pc.not_equal(pc.utf8_trim_whitespace(raw), "").to_pylist()
            # Scalar parity: the scalar path also exclude-gates the
            # COMPOSED subject string (pre-strip — e.g. 'Na'+'N' → 'NaN'
            # is skipped, but ' NaN ' is not, matching is_excluded's
            # exact-membership semantics).
            composed_excluded = pc.is_in(
                raw, value_set=pa.array(sorted(_EXCLUDED_STRINGS), pa.string())
            ).to_pylist()
            pre["subject"] = [
                m if ok and not ex else None
                for m, ok, ex in zip(minted, nonempty, composed_excluded)
            ]

        lt = spec.label_template
        if (
            lt
            and lt.startswith("{")
            and lt.endswith("}")
            and lt.count("{") == 1
            and lt[1:-1] in schema
            and pa.types.is_string(schema[lt[1:-1]])
        ):
            pre["label"] = language_string_vec(
                batch.column(lt[1:-1]).combine_chunks()
            ).to_pylist()

        for idx, lit in enumerate(spec.literals):
            if lit.split is not None or lit.truncate is not None or lit.strip:
                continue
            t = schema.get(lit.column)
            if t is None or not pa.types.is_string(t):
                continue
            col = batch.column(lit.column).combine_chunks()
            if lit.kind == "lang":
                pre["lits"][idx] = language_string_vec(col, lit.lang).to_pylist()
            elif lit.kind == "iri" and lit.casing == "delimited":
                pre["lits"][idx] = check_iri_delimited_vec(col).to_pylist()
        return pre

    def _emit_row(self, spec: EmissionSpec, row: dict, i: int, pre: dict, emit) -> None:
        # Gate the RAW cells feeding the subject (reference checks the cell
        # against exclude_list before any formatting — a Python None must
        # not leak in as the string "None"; only a literal "None" cell
        # keeps the golden ':None' quirk).
        for f in self._subject_fields[spec.name]:
            if is_excluded(row.get(f)):
                return
        pre_subject = pre["subject"]
        if pre_subject is not None:
            subject = pre_subject[i]
            if subject is None:  # raw was empty after strip → row skipped
                return
        else:
            single = self._subject_single[spec.name]
            if single is not None:
                raw_subject = row.get(single)
                if raw_subject is None:
                    return
                if raw_subject.__class__ is not str:
                    raw_subject = str(raw_subject)
            else:
                try:
                    raw_subject = spec.subject_template.format(**row)
                except (KeyError, IndexError):
                    return
            if is_excluded(raw_subject):
                return
            raw_subject = raw_subject.strip()
            if not raw_subject:
                return
            if spec.subject_truncate is not None:
                raw_subject = raw_subject[: spec.subject_truncate]
            subject = check_iri(raw_subject, spec.subject_casing)

        if spec.rdf_type is not None:
            emit(subject, "a", spec.rdf_type)
        if spec.label_template is not None:
            lfields = self._label_fields[spec.name]
            if not any(is_excluded(row.get(f)) for f in lfields):
                pre_label = pre["label"]
                if pre_label is not None:
                    raw_label = row.get(lfields[0])
                    if raw_label and raw_label.strip():
                        rendered = pre_label[i]
                        if rendered is not None:
                            emit(subject, "rdfs:label", rendered)
                else:
                    raw_label = spec.label_template.format(**row)
                    if not is_excluded(raw_label) and raw_label.strip():
                        emit(subject, "rdfs:label", language_string(raw_label))
        for pred, obj in spec.statics:
            emit(subject, pred, obj)
        pre_lits = pre["lits"]
        for idx, lit in enumerate(spec.literals):
            cell = row.get(lit.column)
            if idx in pre_lits:
                if is_excluded(cell):
                    continue
                if lit.kind == "iri" and isinstance(cell, str) and not cell.strip():
                    # scalar path raises on empty labels — preserve
                    for obj in lit.render(cell):
                        emit(subject, lit.predicate, obj)
                    continue
                rendered = pre_lits[idx][i]
                if rendered is not None:
                    emit(subject, lit.predicate, rendered)
            elif lit.template is not None:
                for obj in lit.render_template(row):
                    emit(subject, lit.predicate, obj)
            else:
                for obj in lit.render(cell):
                    emit(subject, lit.predicate, obj)
        for fk in spec.fks:
            self._emit_fk(spec, subject, fk, row.get(fk.column), emit)

    def _emit_fk(self, spec, subject, fk: ForeignKey, cell, emit) -> None:
        table = self.lookups.get(fk.lookup, {})
        try:
            if fk.split_key_by is not None:
                keys = (
                    None
                    if is_excluded(cell)
                    else [
                        int(float(x))
                        for x in str(cell).split(fk.split_key_by)
                    ]
                )
            else:
                keys = fk_keys(cell)
        except ValueError:
            if self.quarantine:
                emit(
                    subject,
                    ":hasDanglingFK",
                    typed_literal(f"{fk.column}={cell}", "xsd:string"),
                )
            return
        if keys is None:
            if fk.default is not None:
                emit(subject, fk.predicate, fk.default)
            return
        for key in keys:
            value = table.get(key)
            if fk.backup_lookup is not None and (
                value is None or value == "None"
            ):
                # the foreign() backup-value-column fallback
                value = self.lookups.get(fk.backup_lookup, {}).get(key, value)
            if value is None:
                # Reference crashes here (IndexError via .values[0]); we
                # quarantine + count instead (SURVEY.md §7.4).
                if self.quarantine:
                    emit(
                        subject,
                        ":hasDanglingFK",
                        typed_literal(f"{fk.column}={key}", "xsd:string"),
                    )
                continue
            if not isinstance(value, str):
                continue  # reference: isinstance(objectRDF, str) gate
            parts = (
                [x for x in value.split(fk.split_value_by)]
                if fk.split_value_by is not None and value
                else [value]
            )
            for part in parts:
                if fk.as_literal is not None:
                    emit(
                        subject, fk.predicate, typed_literal(part, fk.as_literal)
                    )
                else:
                    emit(subject, fk.predicate, check_iri(part, fk.casing))


def emit_triples(ds, specs, lookups=None, concurrency=None, batch_size=4096, **kwargs):
    """Attach the emission stage to a Dataset → triples Dataset.

    ``lookups``: plain dict (closure-captured; fine when small) or a
    ``ray.ObjectRef`` from ``ray.put`` (broadcast once; use with
    ``concurrency`` so each actor deserializes once in ``__init__``).
    """
    if concurrency is not None:
        return ds.map_batches(
            TripleEmitter,
            fn_constructor_kwargs={"specs": tuple(specs), "lookups_ref": lookups},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            **kwargs,
        )
    emitter = TripleEmitter(specs, lookups)
    return ds.map_batches(
        emitter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        **kwargs,
    )
