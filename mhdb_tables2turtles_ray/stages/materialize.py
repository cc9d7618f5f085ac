"""Graph materialization: sorted per-partition Turtle shards + header.

Reference semantics: ``turtle_from_dict`` renders one block per subject
(``pred obj`` pairs joined with `` ;\\n\\t``, blocks joined with blank
lines, terminated `` .`` — ``mhdb/write_ttl.py:263-324``); the header is
PREFIX lines for the *used* prefixes plus an ``owl:Ontology`` block
(``mhdb/write_ttl.py:387-492``, ``mhdb/create_mhdb:390-396``). The
reference builds ONE string for the whole graph in driver memory; we
render per-partition shards inside the cluster and only ship tiny
per-partition stats to the driver.

Partitioning: ``pid = hash(subj) % P`` so one subject never splits
across shards (deterministic → resumable; see state/manifest.py). A
pathological subject with millions of triples would bound a partition
from below — bump P or special-case such subjects; triple-hash salting
is NOT usable here because rendering needs whole subjects co-located.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import completed_partitions, write_partition_atomic
from .prefixes import _batch_prefixes


def subject_partition(batch: pa.Table, num_partitions: int) -> pa.Table:
    h = pd.util.hash_array(np.asarray(batch.column("subj").to_pylist(), dtype=object))
    pid = (h % num_partitions).astype(np.int64)
    return batch.append_column("pid", pa.array(pid, pa.int64()))


def render_turtle_blocks(table: pa.Table) -> str:
    """Render a (subj, pred, obj) table as deterministic Turtle text.

    Sorted by (subj, pred, obj) — the reference's output order is dict /
    set-iteration order (not stable run-to-run); sorting makes our shards
    byte-deterministic while preserving the identical triple SET.
    """
    import pyarrow.compute as pc

    table = table.sort_by(
        [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")]
    )
    if table.num_rows == 0:
        return ""
    # "pred obj" formatted vectorized; the remaining Python work is one
    # join per subject BLOCK (runs in the sorted order), not per row.
    pair_col = pc.binary_join_element_wise(
        table.column("pred").combine_chunks(),
        table.column("obj").combine_chunks(),
        " ",
    )
    subjs = np.asarray(table.column("subj").to_pylist(), dtype=object)
    pairs = np.asarray(pair_col.to_pylist(), dtype=object)
    starts = np.concatenate(([0], np.flatnonzero(subjs[1:] != subjs[:-1]) + 1))
    ends = np.concatenate((starts[1:], [len(subjs)]))
    blocks = [
        "{} {} .".format(subjs[a], " ;\n\t".join(pairs[a:b]))
        for a, b in zip(starts, ends)
    ]
    return "\n\n".join(blocks)


# Fixed preamble, byte-identical to the reference's (mhdb/create_mhdb:
# 390-394) including its quirky 2009 xsd namespace URL.
FIXED_PREAMBLE = (
    "PREFIX owl: <http://www.w3.org/2002/07/owl#> \n"
    "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> \n"
    "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> \n"
    "PREFIX xsd: <https://www.w3.org/2009/XMLSchema/XMLSchema#> \n"
)


def write_header(
    base_uri: str,
    version: str,
    label: str,
    comment: str,
    prefixes: list[tuple[str, str]],
    used: set[str] | None = None,
) -> str:
    """Header text: PREFIX lines (filtered to used prefixes when given),
    base prefix, and the owl:Ontology block — reference
    ``write_header_prefixes`` / ``write_header`` formats."""
    lines = FIXED_PREAMBLE
    for pfx, iri in prefixes:
        if used is not None and pfx not in used:
            continue
        lines += f"PREFIX {pfx}: <{iri}> \n"
    lines += f"\nPREFIX : <{base_uri}#> \n"
    return (
        f"{lines}<{base_uri}> a owl:Ontology ;\n"
        f"    owl:versionIRI <{base_uri}/{version}> ;\n"
        f'    owl:versionInfo "{version}"^^rdfs:Literal ;\n'
        f'    rdfs:label "{label}"^^rdfs:Literal ;\n'
        f'    rdfs:comment """{comment}"""@en .\n\n'
    )


def write_legacy_header_prefixes(prefixes: list[tuple[str, str]]) -> str:
    """Legacy Turtle ``@prefix`` header dialect (reference
    ``mhdb/write_rdf.py:47-74``): one ``@prefix p: <iri> .`` line per
    pair, then ``@base`` derived from the FIRST prefix's IRI with its
    final character stripped (quirk preserved). The live path uses the
    SPARQL-style ``PREFIX`` dialect above."""
    lines = "".join(f"@prefix {p}: <{iri}> .\n" for p, iri in prefixes)
    return lines + f"@base <{prefixes[0][1][:-1]}> .\n"


# --- Remaining legacy write_rdf surface (S6), conformance-tested -------------

# The reference's hard-coded default prefix block
# (mhdb/write_rdf.py:272-321's no-prefixes branch), byte-identical.
_LEGACY_DEFAULT_PREFIXES = """@prefix : <{0}#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix xml: <http://www.w3.org/XML/1998/namespace> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix dcterms: <http://dublincore.org/documents/2012/06/14/dcmi-terms/> .
@prefix health-lifesci: <http://health-lifesci.schema.org/> .
@prefix ICD10: <http://purl.bioontology.org/ontology/ICD10CM/> .
@prefix ICD9: <http://purl.bioontology.org/ontology/ICD9CM/> .
@prefix PATO: <http://www.ontobee.org/ontology/PATO?iri=http://purl.obolibrary.org/obo/PATO_> .
@prefix schema: <http://schema.org/> .
@prefix DOID: <http://bioportal.bioontology.org/ontologies/DOID?p=classes&conceptid=http://purl.obolibrary.org/obo/DOID> .
@base <{0}> .
"""


def legacy_build_import(uri: str | None) -> str | None:
    """Reference ``build_import`` (mhdb/write_rdf.py:27-45): an
    ``owl:imports`` substring, or None for a falsy URI (trailing space
    preserved)."""
    return "owl:imports <{0}> ".format(uri) if uri else None


def legacy_print_header(
    base_uri: str,
    version: str,
    label: str,
    comment: str,
    prefixes: list[tuple[str, str]] | None = None,
) -> str:
    """Reference ``print_header`` (mhdb/write_rdf.py:272-337): the legacy
    ``@prefix`` preamble (hard-coded block, or ``build_header_prefixes``
    over ``[("", base#), *prefixes]``) followed by the owl:Ontology
    block with ``^^rdfs:Literal``-typed metadata."""
    preamble = (
        _LEGACY_DEFAULT_PREFIXES.format(base_uri)
        if not prefixes
        else write_legacy_header_prefixes(
            [("", "{0}#".format(base_uri)), *prefixes]
        )
    )
    return """{4}<{0}> rdf:type owl:Ontology ;
    owl:versionIRI <{0}/{1}> ;
    owl:versionInfo "{1}"^^rdfs:Literal ;
    rdfs:label "{2}"^^rdfs:Literal ;
    rdfs:comment \"\"\"{3}\"\"\"^^rdfs:Literal .

""".format(base_uri, version, label, comment, preamble)


def legacy_print_subheader(object_type: str) -> str:
    """Reference ``print_subheader`` (mhdb/write_rdf.py:340-348): the
    banner comment block."""
    return """
#################################################################
#    {0}
#################################################################
""".format(object_type)


def legacy_general_axioms(disjoint_classes_list: list[str] | None = None) -> str:
    """Reference ``print_general_axioms`` (mhdb/write_rdf.py:351-384):
    the owl:AllDisjointClasses block. The reference repeats the
    ``owl:members ( :X`` line per class instead of listing members in
    one parenthesis — invalid-looking but preserved exactly (this is the
    emitted-bytes contract, quirks included)."""
    out = ""
    if disjoint_classes_list:
        out += """
[ rdf:type owl:AllDisjointClasses ;
  owl:members ( :{0} """.format(disjoint_classes_list[0])
        for cls in disjoint_classes_list[1:]:
            out += """
  owl:members ( :{0} """.format(cls)
        out += """
              )
] .
"""
    return out


def materialize_turtle(
    triples,
    out_dir: str,
    num_partitions: int = 16,
    resume: bool = True,
    dedup: bool = False,
    base_uri: str = "http://w3id.org/graft/kg",
    version: str = "0.1.0",
    label: str = "graft-kg",
    comment: str = "Ray-Data-native KG build",
    prefixes: list[tuple[str, str]] | None = None,
    include_stats: bool = False,
) -> dict:
    """Write per-partition Turtle shards + lineage manifests + header.

    ``dedup=True`` folds the global exact triple dedup into THIS
    shuffle: duplicate (s,p,o) rows share their subject, hence land in
    the same subject-hash partition, so a per-partition distinct is
    exact global dedup — the full build then needs ONE all-to-all
    instead of two (triple-bucket dedup + subject partition). Partition
    sizing: a partition holds all triples of its subjects in memory
    during render — pick ``num_partitions`` ≈ total triple bytes /
    target block size.

    Returns a summary: per-partition stats (tiny — one row per
    partition), skipped partition ids, and totals. Assumes ``out_dir``
    is shared storage when run multi-node.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir, num_partitions) if resume else set()
    pending = frozenset(range(num_partitions)) - done

    def assign(batch: pa.Table) -> pa.Table:
        batch = subject_partition(batch, num_partitions)
        if len(pending) < num_partitions:
            mask = pa.array([p in pending for p in batch.column("pid").to_pylist()])
            batch = batch.filter(mask)
        return batch

    def render_and_write(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pid = int(group.column("pid")[0].as_py())
        body = group.select(["subj", "pred", "obj"])
        if dedup:
            body = body.group_by(["subj", "pred", "obj"]).aggregate([])
        text = render_turtle_blocks(body)
        pfx = _batch_prefixes(body).column("prefix").to_pylist()
        n_subjects = len(body.group_by(["subj"]).aggregate([]))
        # per-partition quarantine metric: dangling-FK triples emitted by
        # the quarantine path instead of the reference's IndexError crash
        n_quarantined = int(
            pc.sum(
                pc.cast(pc.equal(body.column("pred"), ":hasDanglingFK"), pa.int64())
            ).as_py()
            or 0
        )
        manifest = write_partition_atomic(
            out_dir,
            pid,
            text,
            {
                "n_triples": body.num_rows,
                "n_subjects": n_subjects,
                "n_quarantined": n_quarantined,
                "prefixes": pfx,
            },
        )
        return pa.table(
            {
                "pid": pa.array([pid], pa.int64()),
                "n_triples": pa.array([body.num_rows], pa.int64()),
                "n_subjects": pa.array([n_subjects], pa.int64()),
                "bytes": pa.array([manifest["bytes"]], pa.int64()),
                "prefixes": pa.array([pfx], pa.list_(pa.string())),
            }
        )

    stats_ds = (
        triples.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pid")
        .map_groups(render_and_write, batch_format="pyarrow")
    )
    stats = stats_ds.take_all()  # one small row per partition

    used: set[str] = set()
    for row in stats:
        used.update(row["prefixes"])
    # merge prefixes recorded by previously-completed partitions
    import json

    from ..state.manifest import manifest_path

    for pid in done:
        try:
            with open(manifest_path(out_dir, pid)) as f:
                used.update(json.load(f).get("prefixes", []))
        except (OSError, json.JSONDecodeError):
            pass

    registry = prefixes
    if registry is None:
        from ..sources.vocab import PREFIXES

        registry = PREFIXES
    header = write_header(base_uri, version, label, comment, registry, used)
    with open(os.path.join(out_dir, "header.ttl"), "w") as f:
        f.write(header)

    summary = {
        "out_dir": out_dir,
        "num_partitions": num_partitions,
        "skipped": sorted(done),
        "written": sorted(int(r["pid"]) for r in stats),
        "n_triples": int(sum(r["n_triples"] for r in stats)),
        "n_subjects": int(sum(r["n_subjects"] for r in stats)),
        "used_prefixes": sorted(used),
    }
    if include_stats:
        # the executed plan's ds.stats() — the observability hook the
        # shuffle-count / overlap claims in STATS.md are captured from;
        # opt-in (a multi-KB free-text blob most consumers don't want)
        summary["stats"] = stats_ds.stats()
    return summary


def materialize_turtle_split(
    triples,
    out_root: str,
    provenance_predicate: str = "dcterms:isReferencedBy",
    num_partitions: int = 16,
    resume: bool = True,
    dedup: bool = False,
    **header_kwargs,
) -> dict[str, dict]:
    """Two-way sourced/unsourced materialize (reference
    ``structure_to_keep`` writes separate sourced and unsourced outputs,
    ``mhdb/unused_functions.py:611-749``).

    One coarse subject shuffle classifies every subject's triples by
    whether the subject carries ``provenance_predicate``
    (:func:`..stages.provenance.flag_sourced`); the flagged stream is
    pinned ONCE and each side then materializes to its own directory
    (``out_root/sourced``, ``out_root/unsourced``) with independent
    manifests — the two sides resume independently, and a failed
    sourced write never invalidates finished unsourced shards.

    Returns ``{"sourced": summary, "unsourced": summary}``.
    """
    import os

    import pyarrow.compute as pc

    from .provenance import flag_sourced

    flagged = flag_sourced(
        triples, provenance_predicate=provenance_predicate
    ).materialize()  # consumed twice (one filter pass per side)

    def side(keep: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch.column("sourced"), keep)
            return batch.filter(mask).select(["subj", "pred", "obj"])

        return flagged.map_batches(
            f, batch_format="pyarrow", zero_copy_batch=True
        )

    out = {}
    for name, keep in (("sourced", True), ("unsourced", False)):
        out[name] = materialize_turtle(
            side(keep),
            os.path.join(out_root, name),
            num_partitions=num_partitions,
            resume=resume,
            dedup=dedup,
            **header_kwargs,
        )
    return out
