"""The chills module: real-workbook KG build gated against the
reference's committed golden artifact.

``ingest_chills`` (reference ``mhdb/ingest.py:3006-3948``) hand-unrolls
17 worksheet emitters; here each is one declarative
:class:`~..stages.emit.EmissionSpec`, the FK lookups are one broadcast
bundle, and the build is the same streaming emit → dedup-on-shuffle →
Turtle-shard pipeline every other module uses. The output (s, p, o)
set is pinned against the PARSED committed golden file
``/root/reference/output/chills.ttl`` (not a reconstructed oracle) in
``tests/test_golden_chills.py`` — exact equality, which subsumes the
north-star P/R ≥ 0.95 gate.

Semantics notes (vs the reference, quirks preserved):
- claims dual truncation: the claims sheet strips-then-slices its cell
  to 50 chars (``:3751-3752``) while the papers FK slices the RAW cell
  (``:3336``) — expressed as ``Literal(strip=True, truncate=50)`` on
  the sheet side and a pre-truncated lookup value on the FK side.
- the string "None" is a real value (``:None`` brain area in the
  golden output); only null/NaN/"EmptyValue"-family cells are gated.
- FK targets resolve through ``{index: value}`` dicts built from the
  lookup sheets with the reference's ``isinstance(value, str)`` gate.

Scale: the workbook is driver-side config (hundreds of rows); the
lookup bundle ships once via ``ray.put``. At 10^12-file scale the same
specs run unchanged over a Parquet ``Index``-shaped table — sheet
tables and corpus tables are both just Datasets to the emitter.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..stages.emit import EmissionSpec, ForeignKey, Literal, TripleEmitter
from ..stages.materialize import materialize_turtle

CHILLS_BASE_URI = "http://www.purl.org/mentalhealth/chills"
CHILLS_VERSION = "0.1.0"
CHILLS_LABEL = "chills"
# reference create_mhdb:41,54-55: "\n\n{ddashes}\n\t\t{title}\n{ddashes}\n"
_DDASHES = "=" * 80
CHILLS_COMMENT = "\n\n{0}\n\t\t{1}\n{0}\n".format(_DDASHES, "chillsdb")
CHILLS_PREFIXES = [("fabio", "http://purl.org/spar/fabio")]

# (lookup name, sheet, value column, truncate)
_LOOKUPS = (
    ("article_types", "ArticleType", "ArticleType", None),
    ("researchers", "ChillsPeople", "Affiliate1", None),
    ("stimulus_categories", "StimulusCategory", "StimulusCategory", None),
    ("units", "unit", "unit", None),
    ("subjective_sensors", "SubjectiveSensor", "SubjectiveData", None),
    ("subjective_measures", "SubjectiveMeasure", "SubjectiveMeasure", None),
    ("inferences", "Inference", "inference", None),
    ("claims50", "claims", "claims", 50),  # RAW slice — see module doc
    ("brain_areas", "BrainAreas", "BrainAreas", None),
    (
        "definitions_of_chills",
        "DefinitionOfChills_index",
        "DefinitionOfChills",
        None,
    ),
    ("sensors", "Sensors", "sensor", None),
    ("measures", "Measure", "measure", None),
)

_PAPER_TITLE = "Reseach study (research paper tilte)"  # sic — reference's typo


def chills_lookups(tables: dict[str, pa.Table]) -> dict[str, dict[int, str]]:
    """FK lookup bundle: {name: {index: value}} from the lookup sheets.

    One home for the reference's lookup semantics (the
    ``isinstance(objectRDF, str)`` gate, first-key-wins ``.values[0]``,
    the claims RAW slice): ``_LOOKUPS`` mapped onto
    :func:`workbook.build_lookup_bundle` — a chills workbook missing a
    lookup sheet/column gets that function's descriptive error instead
    of a bare KeyError."""
    from .workbook import build_lookup_bundle

    return build_lookup_bundle(
        tables,
        [
            {"name": n, "sheet": s, "key": "index", "value": c, "truncate": t}
            for n, s, c, t in _LOOKUPS
        ],
    )


def _entity_spec(name, column, rdf_type, literals=(), fks=()):
    return EmissionSpec(
        name=name,
        subject_template="{%s}" % column,
        subject_casing="PascalCase",
        rdf_type=rdf_type,
        label_template="{%s}" % column,
        literals=tuple(literals),
        fks=tuple(fks),
    )


def chills_specs() -> dict[str, tuple[EmissionSpec, ...]]:
    """{sheet name: emission specs} covering every live chills emitter."""
    simple = [
        ("ArticleType", "ArticleType", ":ArticleType"),
        ("StimulusCategory", "StimulusCategory", ":StimulusCategory"),
        ("unit", "unit", ":Unit"),
        ("SubjectiveSensor", "SubjectiveData", ":SubjectiveSensor"),
        ("SubjectiveMeasure", "SubjectiveMeasure", ":SubjectiveMeasure"),
        ("Inference", "inference", ":Inference"),
        ("BrainAreas", "BrainAreas", ":BrainArea"),
        (
            "DefinitionOfChills_index",
            "DefinitionOfChills",
            ":DefinitionOfChills",
        ),
    ]
    specs: dict[str, tuple[EmissionSpec, ...]] = {
        sheet: (_entity_spec(sheet.lower(), col, t),)
        for sheet, col, t in simple
    }

    specs["Classes"] = (
        EmissionSpec(
            name="chills_classes",
            subject_template="{ClassName}",
            subject_casing="delimited",
            rdf_type="rdf:Class",
            label_template="{label}",
            literals=(
                Literal("definition", "rdfs:comment", "lang"),
                Literal("sameAs", "owl:sameAs", "raw"),
                Literal(
                    "equivalentClasses", "rdfs:equivalentClass", "raw",
                    split=",",
                ),
                Literal("subClassOf", "rdfs:subClassOf", "iri"),
            ),
        ),
    )
    specs["Properties"] = (
        EmissionSpec(
            name="chills_properties",
            subject_template="{property}",
            subject_casing="delimited",
            rdf_type="rdf:Property",
            label_template="{label}",
            literals=(
                Literal("propertyDomain", "rdfs:domain", "iri"),
                Literal("propertyRange", "rdfs:range", "iri"),
                Literal("definition", "rdfs:comment", "lang"),
                Literal("sameAs", "owl:sameAs", "raw"),
                Literal("equivalentProperty", "rdfs:equivalentProperty", "raw"),
                Literal("subPropertyOf", "rdfs:subPropertyOf", "iri"),
            ),
        ),
    )
    specs["Index"] = (
        EmissionSpec(
            name="chills_papers",
            subject_template="{%s}" % _PAPER_TITLE,
            subject_casing="PascalCase",
            rdf_type=":Paper",
            label_template="{%s}" % _PAPER_TITLE,
            literals=(
                Literal("N subjects", ":hasNumberOfSubjects", "xsd:int"),
                Literal("Modulator", ":hasModulator", "lang"),
                Literal("URL", ":hasURL", "xsd:anyURI", strip=True),
                Literal(
                    "publication_year", ":hasPublicationYear", "xsd:gyear"
                ),
                Literal("abstract", ":hasAbstract", "lang"),
                Literal(
                    "URL_stimulus", ":hasStimulusURL", "xsd:anyURI",
                    strip=True,
                ),
            ),
            fks=(
                ForeignKey("ArticleType", ":hasArticleType", "article_types"),
                ForeignKey(
                    "ChillsPeople_index", ":hasPrimaryResearcher",
                    "researchers",
                ),
                ForeignKey(
                    "ChillsPeople_secondary_index", ":hasSecondaryResearcher",
                    "researchers",
                ),
                ForeignKey(
                    "StimulusCategory", ":hasStimulusCategory",
                    "stimulus_categories",
                ),
                ForeignKey("unit_index", ":hasUnit", "units"),
                ForeignKey(
                    "SubjectiveSensor_index", ":hasSubjectiveSensor",
                    "subjective_sensors",
                ),
                ForeignKey(
                    "SubjectiveMeasure_index", ":hasSubjectiveMeasure",
                    "subjective_measures",
                ),
                ForeignKey("Inference_index", ":hasInference", "inferences"),
                ForeignKey("claims_index", ":hasClaim", "claims50"),
                ForeignKey("Brain areas", ":hasBrainArea", "brain_areas"),
                ForeignKey(
                    "Definition of chills", ":hasDefinitionOfChills",
                    "definitions_of_chills",
                ),
                ForeignKey("sensor_index", ":hasSensor", "sensors"),
                ForeignKey("measure_index", ":hasMeasure", "measures"),
            ),
        ),
    )
    specs["ChillsPeople"] = (
        _entity_spec(
            "chills_researchers",
            "Affiliate1",
            ":Researcher",
            literals=(
                Literal("Discipline", ":hasDiscipline", "lang"),
                Literal("Lab", ":hasLab", "lang"),
                Literal("Site", ":hasSite", "lang"),
                Literal("URL", ":hasURL", "xsd:anyURI", strip=True),
                Literal("Contact", ":hasContact", "xsd:string"),
            ),
        ),
    )
    specs["claims"] = (
        EmissionSpec(
            name="chills_claims",
            subject_template="{claims}",
            subject_casing="PascalCase",
            subject_truncate=50,
            rdf_type=":Claim",
            literals=(
                Literal(
                    "claims", "rdfs:label", "lang", strip=True, truncate=50
                ),
                Literal("claims", "rdfs:comment", "lang"),
            ),
        ),
    )
    specs["Sensors"] = (
        _entity_spec(
            "chills_sensors",
            "sensor",
            ":Sensor",
            fks=(
                ForeignKey("measure_index", ":hasMeasure", "measures"),
                ForeignKey(
                    "related_sensor_index", ":hasRelatedSensor", "sensors"
                ),
            ),
        ),
    )
    specs["Measure"] = (
        _entity_spec(
            "chills_measures",
            "measure",
            ":Measure",
            fks=(
                ForeignKey(
                    "related_measure_index", ":hasRelatedMeasure", "measures"
                ),
            ),
        ),
    )
    specs["Stimulus"] = (
        EmissionSpec(
            name="chills_stimuli",
            subject_template="{URI}",
            subject_casing="PascalCase",
            rdf_type=":Stimulus",
            label_template="{URI}",
            literals=(
                Literal(
                    "URL to stimulus", ":hasURL", "xsd:anyURI", strip=True
                ),
                Literal(
                    "Subjective description of the stimulus",
                    ":hasSubjectiveDescription",
                    "lang",
                ),
            ),
        ),
    )
    return specs


def chills_triples(
    tables: dict[str, pa.Table], quarantine: bool = False
) -> ray.data.Dataset:
    """Workbook tables → (subj, pred, obj) Dataset (NOT yet deduped —
    the build folds dedup into the materialize shuffle).

    ``quarantine=False`` by default: for the golden gate a dangling FK
    is a fixture bug and should not emit ``:hasDanglingFK`` noise; pass
    True for production workbooks (counted quarantine instead of the
    reference's IndexError crash)."""
    lookups_ref = ray.put(chills_lookups(tables))
    specs = chills_specs()
    parts = []
    for sheet, sheet_specs in specs.items():
        table = tables.get(sheet)
        if table is None or table.num_rows == 0:
            continue
        ds = ray.data.from_arrow(table)
        parts.append(
            ds.map_batches(
                TripleEmitter(sheet_specs, lookups_ref, quarantine=quarantine),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
    from .workbook import union_or_empty

    # a workbook with none of the chills spec sheets (or all empty) is
    # a usable no-op, not an IndexError — the ONE shared contract
    return union_or_empty(parts)


def build_chills(
    tables: dict[str, pa.Table],
    out_dir: str,
    num_partitions: int = 4,
    resume: bool = True,
) -> dict:
    """Full chills build: emit → dedup-on-shuffle → Turtle shards with
    the reference's exact header (create_mhdb:147-169,386)."""
    return materialize_turtle(
        chills_triples(tables),
        out_dir,
        num_partitions=num_partitions,
        resume=resume,
        dedup=True,
        base_uri=CHILLS_BASE_URI,
        version=CHILLS_VERSION,
        label=CHILLS_LABEL,
        comment=CHILLS_COMMENT,
        prefixes=CHILLS_PREFIXES,
    )


def build_chills_from_workbook(
    workbook_path: str, out_dir: str, **kwargs
) -> dict:
    """CLI surface: ``build --workbook chills.xlsx --out DIR``."""
    from ..sources.excel import read_excel_workbook

    return build_chills(read_excel_workbook(workbook_path), out_dir, **kwargs)
