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
        import numpy as np

        cw = _materialize(crosswalk_ref)
        self.union: dict[int, tuple[str, str, str]] = cw["union"]
        self.reln_predicates = dict(reln_predicates)
        # Mint every vocabulary entry ONCE per actor (the union table is
        # small); the per-batch probe is then a vectorized searchsorted
        # into (sorted ids, minted IRIs) — no per-row check_iri calls.
        ids = np.fromiter(self.union.keys(), dtype=np.int64, count=len(self.union))
        order = np.argsort(ids)
        self._ids = ids[order]
        self._minted = np.array(
            [
                check_iri(self.union[int(i)][0], self.union[int(i)][2])
                for i in self._ids
            ],
            dtype=object,
        )

    def _mint_vec(self, node_ids):
        import numpy as np

        if len(self._ids) == 0:
            none = np.full(len(node_ids), None, dtype=object)
            return none, np.zeros(len(node_ids), dtype=bool)
        idx = np.clip(np.searchsorted(self._ids, node_ids), 0, len(self._ids) - 1)
        hit = self._ids[idx] == node_ids
        out = np.where(hit, self._minted[idx], None)
        return out, hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        relns = batch.column("reln_type").to_numpy(zero_copy_only=False)
        starts = batch.column("startNode").to_numpy()
        ends = batch.column("endNode").to_numpy()
        # vectorized reln → predicate over the few distinct values
        uniq, inv = np.unique(relns, return_inverse=True)
        pred_u = np.array(
            [self.reln_predicates.get(u) for u in uniq.tolist()], dtype=object
        )
        preds = pred_u[inv]
        known = np.array([p is not None for p in preds])  # unknown reln dropped

        s_iri, s_hit = self._mint_vec(starts)
        o_iri, o_hit = self._mint_vec(ends)
        ok = known & s_hit & o_hit
        dangling = known & ~ok

        subjs = list(s_iri[ok])
        out_preds = list(preds[ok])
        objs = list(o_iri[ok])
        # quarantine rows (rare): per-row work only here
        for i in np.nonzero(dangling)[0]:
            s = s_iri[i]
            subjs.append(
                s if s is not None else check_iri(f"node {starts[i]}", "delimited")
            )
            out_preds.append(":hasDanglingFK")
            objs.append(
                typed_literal(
                    f"crosswalk={starts[i] if s is None else ends[i]}", "xsd:string"
                )
            )
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(out_preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )
