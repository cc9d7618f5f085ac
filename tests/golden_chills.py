"""Reverse-engineered chills workbook fixture (VERDICT r4 item 1).

The reference's input workbook (``input/chills.xlsx``) is not
committed, but its golden output IS (``/root/reference/output/
chills.ttl``).  This module inverts the golden (s, p, o) set back into
the 17 worksheet DataFrames that ``ingest_chills`` (reference
``mhdb/ingest.py:3006-3948``) consumes, such that replaying the
reference's OWN ingest function over the fixture reproduces the golden
statements exactly.  The fixture is then the ground-truth input for the
engine-side golden gate (``test_golden_chills.py``) and the Excel
source end-to-end test.

Inversion notes
---------------
- Each entity sheet's value cell is recovered from the subject's
  ``rdfs:label`` (``language_string`` strips and escapes ``"`` →
  ``\\"``; we unescape).  The subject mint is verified to round-trip
  (``check_iri(cell) == subject``) so the fixture is self-consistent.
- Papers' FK cells are recovered by minting every lookup row's value
  the way the FK emitter does (``check_iri(value[:50], 'PascalCase')``
  for claims, plain PascalCase otherwise) and matching the paper's
  golden objects.
- The one dual-truncation quirk: a paper links ``:hasClaim
  :…AltruisticBeh`` while the claim subject is ``:…AltruisticBeha``.
  The FK path truncates the RAW cell (no strip,
  ``mhdb/ingest.py:3336``) while the claims emitter strips first
  (``:3752``) — so that claim's cell must carry one leading space.
  The builder discovers the needed padding automatically.
"""

from __future__ import annotations

import re
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

from mhdb_tables2turtles_ray.functions.strings import check_iri

from tests.golden_ttl import load_golden

EMPTY = "EmptyValue"
GOLDEN_PATH = "/root/reference/output/chills.ttl"
ONTOLOGY_SUBJECT = "<http://www.purl.org/mentalhealth/chills>"

# (sheet, value column, rdf type, extra columns) for the simple
# one-value-column entity sheets.
SIMPLE_SHEETS = [
    ("ArticleType", "ArticleType", ":ArticleType"),
    ("StimulusCategory", "StimulusCategory", ":StimulusCategory"),
    ("unit", "unit", ":Unit"),
    ("SubjectiveSensor", "SubjectiveData", ":SubjectiveSensor"),
    ("SubjectiveMeasure", "SubjectiveMeasure", ":SubjectiveMeasure"),
    ("Inference", "inference", ":Inference"),
    ("BrainAreas", "BrainAreas", ":BrainArea"),
    ("DefinitionOfChills_index", "DefinitionOfChills", ":DefinitionOfChills"),
]


def _unescape_label(text: str) -> str:
    return text.replace('\\"', '"')


def _lang_value(obj: str) -> str | None:
    m = re.fullmatch(r'"""(.*)"""@en', obj, re.DOTALL)
    return _unescape_label(m.group(1)) if m else None


def _typed_value(obj: str, xsd: str) -> str | None:
    m = re.fullmatch(r'"(.*)"\^\^' + re.escape(xsd), obj, re.DOTALL)
    return m.group(1) if m else None


def _by_subject(triples):
    subj: dict[str, dict[str, set[str]]] = {}
    for s, p, o in triples:
        subj.setdefault(s, {}).setdefault(p, set()).add(o)
    return subj


def golden_statements(path: str = GOLDEN_PATH):
    """Golden triples minus the ontology-header block (which
    ``write_header`` emits, not ``ingest_chills``)."""
    return {
        (s, p, o) for s, p, o in load_golden(path) if s != ONTOLOGY_SUBJECT
    }


def build_fixture(path: str = GOLDEN_PATH) -> dict[str, pd.DataFrame]:
    """Golden artifact → {sheet name: DataFrame} with the reference's
    original column names and 1-based integer ``index`` keys."""
    triples = golden_statements(path)
    S = _by_subject(triples)

    def typed(t):
        return sorted(s for s, preds in S.items() if t in preds.get("a", ()))

    # Label→sheet assignment. A subject can carry several labels: either
    # two near-duplicate rows in ONE sheet (a :Paper appears with and
    # without a trailing period) or one row in EACH of two sheets whose
    # mints collide (:Sound is both a :Measure and a :StimulusCategory,
    # 'Sound' vs 'sound'). Single-typed subject → all labels are rows of
    # its one sheet; multi-typed → one label per sheet, paired sorted.
    label_assign: dict[tuple[str, str], list[str]] = {}
    for s, preds in S.items():
        types = sorted(preds.get("a", ()))
        labels = sorted(
            _lang_value(o) for o in preds.get("rdfs:label", ()) if _lang_value(o)
        )
        if not types or not labels:
            continue
        if len(types) == 1:
            label_assign[(types[0], s)] = labels
        else:
            # fewer labels than sheets → the same text appears in both
            # sheets and the label set collapsed (e.g. :Altruism is both
            # an :Inference and a :SubjectiveMeasure, label 'altruism')
            assert len(labels) <= len(types), (s, types, labels)
            padded = labels + [labels[-1]] * (len(types) - len(labels))
            for t, lab in zip(types, padded):
                label_assign[(t, s)] = [lab]

    def rows_for(rdf_type):
        """(subject, label) pairs for one sheet — one per row."""
        for s in typed(rdf_type):
            for lab in label_assign[(rdf_type, s)]:
                yield s, lab

    def label_of(s, rdf_type):
        labs = label_assign[(rdf_type, s)]
        assert len(labs) == 1, (s, labs)
        return labs[0]

    sheets: dict[str, pd.DataFrame] = {}
    # value → 1-based index, per lookup sheet; fk mint → index
    fk_maps: dict[str, dict[str, int]] = {}

    # --- simple entity sheets -------------------------------------
    for sheet, col, rdf_type in SIMPLE_SHEETS:
        values = []
        mint_to_idx = {}
        for s, v in rows_for(rdf_type):
            assert check_iri(v, "PascalCase") == s, (sheet, v, s)
            values.append(v)
            mint_to_idx.setdefault(s, len(values))
        sheets[sheet] = pd.DataFrame(
            {"index": range(1, len(values) + 1), col: values}
        )
        fk_maps[sheet] = mint_to_idx

    # --- claims (dual-truncation quirk) ---------------------------
    claim_rows = []
    claims_fk = {}
    for s in typed(":Claim"):
        comments = S[s].get("rdfs:comment", ())
        assert len(comments) == 1, s
        full = _lang_value(next(iter(comments)))
        # discover the raw-cell padding that reproduces both the
        # stripped subject mint and the unstripped FK mint
        for pad in ("", " ", "  "):
            raw = pad + full
            if check_iri(raw.strip()[:50], "PascalCase") == s:
                break
        else:
            raise AssertionError(f"cannot invert claim subject {s}")
        claim_rows.append(raw)
        claims_fk[check_iri(raw[:50], "PascalCase")] = len(claim_rows)
    # resolve pads: a golden :hasClaim object that matches no unpadded
    # mint forces a leading space on its row
    wanted = {o for _, p, o in triples if p == ":hasClaim"}
    for miss in sorted(wanted - set(claims_fk)):
        fixed = False
        for i, raw in enumerate(claim_rows):
            for pad in (" ", "  "):
                cand = pad + raw.lstrip()
                if (
                    check_iri(cand[:50], "PascalCase") == miss
                    and check_iri(cand.strip()[:50], "PascalCase")
                    in typed(":Claim")
                ):
                    old_mint = check_iri(raw[:50], "PascalCase")
                    claims_fk.pop(old_mint, None)
                    claim_rows[i] = cand
                    claims_fk[miss] = i + 1
                    fixed = True
                    break
            if fixed:
                break
        assert fixed, f"cannot invert hasClaim object {miss}"
    sheets["claims"] = pd.DataFrame(
        {"index": range(1, len(claim_rows) + 1), "claims": claim_rows}
    )
    fk_maps["claims"] = claims_fk

    # --- researchers ----------------------------------------------
    rows = []
    res_fk = {}
    for s, name in rows_for(":Researcher"):
        preds = S[s]
        assert check_iri(name, "PascalCase") == s, (name, s)
        rows.append(
            {
                "Affiliate1": name,
                "Discipline": _first_lang(preds, ":hasDiscipline"),
                "Lab": _first_lang(preds, ":hasLab"),
                "Site": _first_lang(preds, ":hasSite"),
                "URL": _first_typed(preds, ":hasURL", "xsd:anyURI"),
                "Contact": _first_typed(preds, ":hasContact", "xsd:string"),
            }
        )
        res_fk[s] = len(rows)
    sheets["ChillsPeople"] = pd.DataFrame(rows).fillna(EMPTY)
    sheets["ChillsPeople"].insert(0, "index", range(1, len(rows) + 1))
    fk_maps["ChillsPeople"] = res_fk

    # --- measures / sensors (self- and cross-FK) -------------------
    measure_pairs = list(rows_for(":Measure"))
    measures_fk = {}
    for i, (s, _) in enumerate(measure_pairs):
        measures_fk.setdefault(s, i + 1)
    m_rows = []
    for s, v in measure_pairs:
        assert check_iri(v, "PascalCase") == s, (v, s)
        related = sorted(S[s].get(":hasRelatedMeasure", ()))
        m_rows.append(
            {
                "measure": v,
                "related_measure_index": _fk_cell(related, measures_fk),
            }
        )
    sheets["Measure"] = pd.DataFrame(m_rows).fillna(EMPTY)
    sheets["Measure"].insert(0, "index", range(1, len(m_rows) + 1))
    fk_maps["Measure"] = measures_fk

    sensor_pairs = list(rows_for(":Sensor"))
    sensors_fk = {}
    for i, (s, _) in enumerate(sensor_pairs):
        sensors_fk.setdefault(s, i + 1)
    s_rows = []
    for s, v in sensor_pairs:
        assert check_iri(v, "PascalCase") == s, (v, s)
        s_rows.append(
            {
                "sensor": v,
                "measure_index": _fk_cell(
                    sorted(S[s].get(":hasMeasure", ())), measures_fk
                ),
                "related_sensor_index": _fk_cell(
                    sorted(S[s].get(":hasRelatedSensor", ())), sensors_fk
                ),
            }
        )
    sheets["Sensors"] = pd.DataFrame(s_rows).fillna(EMPTY)
    sheets["Sensors"].insert(0, "index", range(1, len(s_rows) + 1))
    fk_maps["Sensors"] = sensors_fk

    # --- stimuli ----------------------------------------------------
    st_rows = []
    for s, v in rows_for(":Stimulus"):
        preds = S[s]
        assert check_iri(v, "PascalCase") == s, (v, s)
        st_rows.append(
            {
                "URI": v,
                "URL to stimulus": _first_typed(preds, ":hasURL", "xsd:anyURI"),
                "Subjective description of the stimulus": _first_lang(
                    preds, ":hasSubjectiveDescription"
                ),
            }
        )
    sheets["Stimulus"] = pd.DataFrame(st_rows).fillna(EMPTY)

    # --- papers (Index sheet) ---------------------------------------
    fk_cols = [
        ("ArticleType", ":hasArticleType", "ArticleType"),
        ("ChillsPeople_index", ":hasPrimaryResearcher", "ChillsPeople"),
        (
            "ChillsPeople_secondary_index",
            ":hasSecondaryResearcher",
            "ChillsPeople",
        ),
        ("StimulusCategory", ":hasStimulusCategory", "StimulusCategory"),
        ("unit_index", ":hasUnit", "unit"),
        ("SubjectiveSensor_index", ":hasSubjectiveSensor", "SubjectiveSensor"),
        (
            "SubjectiveMeasure_index",
            ":hasSubjectiveMeasure",
            "SubjectiveMeasure",
        ),
        ("Inference_index", ":hasInference", "Inference"),
        ("claims_index", ":hasClaim", "claims"),
        ("Brain areas", ":hasBrainArea", "BrainAreas"),
        (
            "Definition of chills",
            ":hasDefinitionOfChills",
            "DefinitionOfChills_index",
        ),
        ("sensor_index", ":hasSensor", "Sensors"),
        ("measure_index", ":hasMeasure", "Measure"),
    ]
    p_rows = []
    for s in typed(":Paper"):
        preds = S[s]
        titles = label_assign[(":Paper", s)]
        for t in titles:
            assert check_iri(t, "PascalCase") == s, (t, s)
        # A paper subject with k distinct values of a SCALAR column
        # (two :hasURL objects, say) can only come from k Index rows
        # sharing the title — the union of the rows' emissions is the
        # golden set regardless of how the values pair up, so spread
        # each multi-valued scalar across the rows sorted.
        scalars = {
            "N subjects": _typed_values(preds, ":hasNumberOfSubjects", "xsd:int"),
            "Modulator": _lang_values(preds, ":hasModulator"),
            "URL": _typed_values(preds, ":hasURL", "xsd:anyURI"),
            "publication_year": [
                int(y)
                for y in _typed_values(preds, ":hasPublicationYear", "xsd:gyear")
            ],
            "abstract": _lang_values(preds, ":hasAbstract"),
            "URL_stimulus": _typed_values(preds, ":hasStimulusURL", "xsd:anyURI"),
        }
        n_rows = max(
            [len(titles)] + [len(v) for v in scalars.values() if v]
        )
        for i in range(n_rows):
            row = {
                "Reseach study (research paper tilte)": titles[
                    min(i, len(titles) - 1)
                ]
            }
            for col, pred, sheet in fk_cols:
                row[col] = _fk_cell(sorted(preds.get(pred, ())), fk_maps[sheet])
            for col, vals in scalars.items():
                row[col] = vals[min(i, len(vals) - 1)] if vals else None
            p_rows.append(row)
    sheets["Index"] = pd.DataFrame(p_rows).fillna(EMPTY)

    # --- TBox sheets -------------------------------------------------
    c_rows = []
    for s in typed("rdf:Class"):
        preds = S[s]
        name = s[1:] if s.startswith(":") else s
        assert check_iri(name) == s, (name, s)
        c_rows.append(
            {
                "ClassName": name,
                "label": label_of(s, "rdf:Class"),
                "definition": _first_lang(preds, "rdfs:comment"),
                "sameAs": _first_raw(preds, "owl:sameAs"),
                "equivalentClasses": _first_raw(preds, "rdfs:equivalentClass"),
                "subClassOf": _iri_cell(preds, "rdfs:subClassOf"),
            }
        )
    sheets["Classes"] = pd.DataFrame(c_rows).fillna(EMPTY)

    pr_rows = []
    for s in typed("rdf:Property"):
        preds = S[s]
        name = s[1:] if s.startswith(":") else s
        assert check_iri(name) == s, (name, s)
        pr_rows.append(
            {
                "property": name,
                "label": label_of(s, "rdf:Property"),
                "propertyDomain": _iri_cell(preds, "rdfs:domain"),
                "propertyRange": _iri_cell(preds, "rdfs:range"),
                "definition": _first_lang(preds, "rdfs:comment"),
                "sameAs": _first_raw(preds, "owl:sameAs"),
                "equivalentProperty": _first_raw(preds, "rdfs:equivalentProperty"),
                "subPropertyOf": _iri_cell(preds, "rdfs:subPropertyOf"),
            }
        )
    sheets["Properties"] = pd.DataFrame(pr_rows).fillna(EMPTY)

    # parsed-but-unused sheet: must exist for ingest_chills to load
    sheets["ResearchStudyOnProjectLink1"] = pd.DataFrame(
        {"index": [1], "ResearchStudies": [EMPTY]}
    )
    return sheets


def _lang_values(preds, pred):
    return sorted(
        v
        for v in (_lang_value(o) for o in preds.get(pred, ()))
        if v is not None
    )


def _typed_values(preds, pred, xsd):
    return sorted(
        _typed_value(o, xsd)
        for o in preds.get(pred, ())
        if o.endswith("^^" + xsd)
    )


def _first_lang(preds, pred):
    vals = _lang_values(preds, pred)
    if not vals:
        return None
    assert len(vals) == 1, (pred, vals)
    return vals[0]


def _first_typed(preds, pred, xsd):
    vals = _typed_values(preds, pred, xsd)
    if not vals:
        return None
    assert len(vals) == 1, (pred, vals)
    return vals[0]


def _first_raw(preds, pred):
    objs = preds.get(pred, ())
    if not objs:
        return None
    assert len(objs) == 1, (pred, objs)
    return next(iter(objs))


def _iri_cell(preds, pred):
    """Invert a check_iri-minted object back to a cell value."""
    objs = preds.get(pred, ())
    if not objs:
        return None
    assert len(objs) == 1, (pred, objs)
    obj = next(iter(objs))
    cell = obj[1:] if obj.startswith(":") else obj
    assert check_iri(cell) == obj, (cell, obj)
    return cell


def _fk_cell(objects, mint_to_idx):
    """Golden FK objects → the reference's comma-separated index cell
    (single index stays an int, matching the float/int scalar branch)."""
    if not objects:
        return None
    idxs = sorted(mint_to_idx[o] for o in objects)
    if len(idxs) == 1:
        return idxs[0]
    return ",".join(str(i) for i in idxs)
