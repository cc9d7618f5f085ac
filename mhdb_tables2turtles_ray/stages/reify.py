"""RDF reification (provenance statements about statements).

Reference surface: ``write_about_statement`` / ``write_ttl``
(``mhdb/write_ttl.py:327-384, 495-548``) render each (s, p, o) as an
``rdf:Statement`` blank node carrying rdf:subject/predicate/object plus
caller-supplied provenance pairs. (The reference function is dead code —
its ``create_label`` dependency has a broken import — so we implement
the documented semantics: bnode label = the delimited label of
``subject_predicate_object``.)

Distributed shape: a stateless ``map_batches`` fan-out — each triple row
becomes 4+len(provenance) rows; no shuffle."""

from __future__ import annotations

import pyarrow as pa

from ..functions.strings import convert_string_to_label


def statement_bnode(subj: str, pred: str, obj: str) -> str:
    return "_:" + convert_string_to_label("_".join([subj, pred, obj]))


def reify_triples(triples, provenance: tuple[tuple[str, str], ...] = ()):
    """(subj, pred, obj) Dataset → reified statement triples."""

    def reify(batch: pa.Table) -> pa.Table:
        subjs, preds, objs = [], [], []
        for s, p, o in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
        ):
            b = statement_bnode(s, p, o)
            for bp, bo in (
                ("rdf:type", "rdf:Statement"),
                ("rdf:subject", s),
                ("rdf:predicate", p),
                ("rdf:object", o),
                *provenance,
            ):
                subjs.append(b)
                preds.append(bp)
                objs.append(bo)
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    return triples.map_batches(reify, batch_format="pyarrow", zero_copy_batch=True)
