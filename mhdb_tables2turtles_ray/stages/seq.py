"""Ordered-collection (rdf:Seq) emission.

Two operators:

- :func:`parse_response_options` + :class:`SeqEmitter` — the reference's
  response-options parser (``mhdb/ingest.py:2199-2239``): a cell like
  ``'1="never", 2="sometimes"'`` (or a plain comma list of ``k=v``
  pairs) becomes an ``rdf:Seq`` subject with ``rdf:_N`` membership
  triples, N from list position. Reference quirks preserved: leading
  ``-`` stripped, newlines deleted (not spaced), excluded responses get
  NO membership triple (their ordinal is silently skipped), and items
  without ``=`` are quarantined rather than crashing the task.
- :func:`event_sequences` — the same Seq shape over an ordered event
  log: per-key ``rdf:_N`` membership from a deterministic in-group
  enumeration (ST2 semantics under parallelism).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ..functions.strings import check_iri, language_string, typed_literal
from .emit import is_excluded

_QUOTED_OPT = re.compile(r'[-+]?[0-9]+=".*?"')


def parse_response_options(cell: str) -> tuple[str, list[str | None]]:
    """Cell → (seq_iri, responses) with reference parsing semantics.

    Each response is the text after ``=`` (stripped); an item with no
    ``=`` yields None (the reference would raise IndexError there —
    SURVEY.md §7.4 says quarantine instead).
    """
    text = cell.strip("-").replace("\n", "")
    seq_iri = check_iri(text)
    if '"' in text:
        items = _QUOTED_OPT.findall(text)
    else:
        items = text.split(",")
    responses: list[str | None] = []
    for item in items:
        parts = item.split("=")
        responses.append(parts[1].strip() if len(parts) > 1 else None)
    return seq_iri, responses


class SeqEmitter:
    """map_batches callable: (subject_iri_col, options_col) → triples."""

    def __init__(
        self,
        subject_col: str,
        options_col: str,
        predicate: str = ":hasResponseOptions",
    ):
        self.subject_col = subject_col
        self.options_col = options_col
        self.predicate = predicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs, preds, objs = [], [], []

        def emit(s, p, o):
            subjs.append(s)
            preds.append(p)
            objs.append(o)

        for subject, cell in zip(
            batch.column(self.subject_col).to_pylist(),
            batch.column(self.options_col).to_pylist(),
        ):
            if is_excluded(cell) or is_excluded(subject):
                continue
            seq_iri, responses = parse_response_options(cell)
            emit(subject, self.predicate, seq_iri)
            emit(seq_iri, "a", "rdf:Seq")
            for i, response in enumerate(responses):
                if response is None:
                    emit(
                        seq_iri,
                        ":hasDanglingFK",
                        typed_literal(f"{self.options_col}[{i}]", "xsd:string"),
                    )
                    continue
                if is_excluded(response):
                    continue  # reference: ordinal silently skipped
                response_iri = check_iri(response)
                emit(response_iri, ":hasResponseOptionText", language_string(response))
                emit(seq_iri, "rdf:_{0}".format(i + 1), response_iri)

        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )


def event_sequences(
    ds,
    key_col: str,
    item_col: str,
    order_by: list[str],
    subject_template: str = ":User_{key}_Events",
    item_template: str = ":Event_{item}",
    limit: int | None = None,
):
    """Ordered log → rdf:Seq triples per key.

    groupby(key) shuffle + deterministic in-group sort; ``limit`` keeps
    the first N members per key (bounded Seq).
    """

    def to_seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="mergesort")
        if limit is not None:
            g = g.head(limit)
        key = g[key_col].iloc[0]
        subject = subject_template.format(key=key)
        rows = [{"subj": subject, "pred": "a", "obj": "rdf:Seq"}]
        for n, item in enumerate(g[item_col], start=1):
            rows.append(
                {
                    "subj": subject,
                    "pred": f"rdf:_{n}",
                    "obj": item_template.format(item=item),
                }
            )
        return pd.DataFrame(rows)

    return ds.groupby(key_col).map_groups(to_seq, batch_format="pandas")
