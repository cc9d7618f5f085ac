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


class MentionScanner:
    """Actor-pool callable: detect vocabulary MENTIONS inside a free-
    text column and score them — the north-star "stateful mention
    detection + entity-link scoring" stage, generalizing the ST1 probe
    from field-equality lookup to in-content scanning.

    ``__init__`` (once per actor): materialize the alias dict and build
    the lowercase alias Arrow array for the membership kernel.
    ``__call__`` (per batch): RE2 tokenization (``split_pattern_regex``
    — Arrow regex, no lookarounds) → ``list_flatten`` →
    ``is_in(aliases)`` → the matched subset maps to canonical entities
    and aggregates per (row, entity) with one ``np.unique`` — no Python
    loop over rows or tokens. Output: one row per detected (id, entity)
    with ``n_mentions`` and ``score`` = n_mentions / n_tokens.
    """

    def __init__(self, vocab_ref, column: str, id_column: str):
        vocab = _materialize(vocab_ref)
        self.alias: dict[str, str] = vocab["alias"] if "alias" in vocab else vocab
        self.column = column
        self.id_column = id_column
        self._alias_arr = pa.array(sorted(self.alias), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ids = batch.column(self.id_column)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(
                pc.coalesce(batch.column(self.column), pa.scalar("", pa.string()))
            ),
            "[^a-z0-9+#_]+",
        )
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = la.values
        row_of = np.repeat(
            np.arange(batch.num_rows), np.diff(la.offsets.to_numpy())
        )
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        # denominator = real (non-empty) token count per row; boundary
        # splits produce "" tokens that must not dilute the score
        n_tokens = np.bincount(row_of[nonempty], minlength=batch.num_rows)
        hit = pc.is_in(flat, value_set=self._alias_arr).to_numpy(
            zero_copy_only=False
        )
        hit &= nonempty
        if not hit.any():
            return pa.table(
                {
                    self.id_column: pa.array([], ids.type),
                    "entity": pa.array([], pa.string()),
                    "n_mentions": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        m_rows = row_of[hit]
        m_toks = np.asarray(flat.to_numpy(zero_copy_only=False)[hit], dtype=object)
        # canonicalize only the matched tokens (small): distinct surface
        # forms map through the alias dict once
        uniq, inv = np.unique(m_toks, return_inverse=True)
        canon = np.array([self.alias[u] for u in uniq.tolist()], dtype=object)[inv]
        # count per (row, entity)
        euniq, einv = np.unique(canon, return_inverse=True)
        combined = m_rows * len(euniq) + einv
        cuniq, counts = np.unique(combined, return_counts=True)
        out_rows = (cuniq // len(euniq)).astype(np.int64)
        out_ents = np.array(euniq, dtype=object)[cuniq % len(euniq)]
        denom = np.maximum(n_tokens[out_rows], 1)
        return pa.table(
            {
                self.id_column: ids.take(pa.array(out_rows)),
                "entity": pa.array(out_ents, pa.string()),
                "n_mentions": pa.array(counts, pa.int64()),
                "score": pa.array(counts / denom, pa.float64()),
            }
        )


def scan_mentions(
    ds,
    vocab_ref,
    column: str = "content",
    id_column: str = "path",
    concurrency=(1, 4),
    batch_size: int = 2048,
):
    """Attach a MentionScanner actor pool: (id, entity, n_mentions,
    score) rows for every vocabulary mention detected in ``column``."""
    return ds.map_batches(
        MentionScanner,
        fn_constructor_kwargs={
            "vocab_ref": vocab_ref,
            "column": column,
            "id_column": id_column,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
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
