"""Stateful entity linking — actor-pool stages.

Reference semantics being generalized (SURVEY.md §2.3 ST1, §2.4 J4):

- lookup worksheets held in memory and probed per row → here: alias /
  crosswalk dictionaries loaded ONCE per actor in ``__init__`` from a
  ``ray.put`` broadcast, probed per batch (broadcast hash join — the
  small side never ships per batch, never shuffles);
- the 5-table first-match-wins id resolution waterfall
  (``mhdb/ingest.py:2521-2649``) → a unified id→(name, source, casing)
  dict whose insertion priority IS the waterfall order, plus the
  reln_type→predicate map with silent drop of unknown types.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.strings import check_iri, typed_literal


def _materialize(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


class EntityLinker:
    """Actor-pool callable: link a string column to canonical entities.

    Normalized-string + alias-dictionary lookup: ``lower().strip()`` the
    surface form, probe the alias map, emit the canonical name (or
    ``unknown_value`` — quarantine semantics — when unmatched).
    """

    def __init__(
        self,
        vocab_ref,
        column: str,
        out_col: str = "canonical",
        unknown_value: str | None = None,
    ):
        vocab = _materialize(vocab_ref)
        self.alias: dict[str, str] = vocab["alias"] if "alias" in vocab else vocab
        self.column = column
        self.out_col = out_col
        self.unknown = unknown_value

    def __call__(self, batch: pa.Table) -> pa.Table:
        values = batch.column(self.column).to_pylist()
        out = [
            self.alias.get(v.strip().lower(), self.unknown)
            if isinstance(v, str)
            else self.unknown
            for v in values
        ]
        return batch.append_column(self.out_col, pa.array(out, pa.string()))


def link_column(
    ds,
    vocab_ref,
    column: str,
    out_col: str = "canonical",
    unknown_value: str | None = None,
    concurrency=(1, 4),
    batch_size: int = 8192,
    **kwargs,
):
    """Attach an EntityLinker actor pool to a Dataset."""
    return ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={
            "vocab_ref": vocab_ref,
            "column": column,
            "out_col": out_col,
            "unknown_value": unknown_value,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )


class CrosswalkResolver:
    """Actor-pool callable: resolve (reln_type, startNode, endNode) edge
    batches into triples via the unified waterfall dictionary.

    Unmatched reln types are dropped (reference behavior); unmatched node
    ids are quarantined as counted triples instead of crashing.
    """

    def __init__(self, crosswalk_ref, reln_predicates):
        cw = _materialize(crosswalk_ref)
        self.union: dict[int, tuple[str, str, str]] = cw["union"]
        self.reln_predicates = dict(reln_predicates)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs, preds, objs = [], [], []
        relns = batch.column("reln_type").to_pylist()
        starts = batch.column("startNode").to_pylist()
        ends = batch.column("endNode").to_pylist()
        for reln, start, end in zip(relns, starts, ends):
            pred = self.reln_predicates.get(reln)
            if pred is None:
                continue  # unknown relation types silently dropped
            s = self._mint(start)
            o = self._mint(end)
            if s is None or o is None:
                hit = s if s is not None else check_iri(f"node {start}", "delimited")
                subjs.append(hit)
                preds.append(":hasDanglingFK")
                objs.append(
                    typed_literal(f"crosswalk={start if s is None else end}", "xsd:string")
                )
                continue
            subjs.append(s)
            preds.append(pred)
            objs.append(o)
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    def _mint(self, node_id) -> str | None:
        hit = self.union.get(node_id)
        if hit is None:
            return None
        name, _source, casing = hit
        return check_iri(name, casing)
