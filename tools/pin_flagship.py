"""Regenerate / append the pinned flagship-summary constants.

The flagship corpus pipeline's subjects pass through check_iri delimited
casing over unicode paths — not expressible in SQL — so its DuckDB-side
oracle is a CONSTANT per testdata scale, derived here from the
REFERENCE-SEMANTICS oracle (tests/oracle_ref.py, which imports the
reference checkout's own scalar functions), NOT from the engine under
test. The script prints paste-ready ``WHEN <count(events)> THEN ...``
lines for ``pipelines/registry.py``'s ``kg_flagship_summary`` SQL (keyed
on count(events) because the documents table has 500 rows at multiple
scales). The CASE's ELSE branch is a loud ``UNPINNED_SCALE`` sentinel,
so a scale you have NOT pinned fails the gate explicitly — run this
script with the new scale's dir to append its pin. The sf0.001 pin is
additionally re-derived inside the test suite on every run
(tests/test_kg_pipeline.py), so drift fails loudly.

Run: ``python tools/pin_flagship.py [SF_DIR ...]`` (from /root/repo;
defaults to the three driver scales).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
import ray  # noqa: E402

if not ray.is_initialized():
    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        logging_level="ERROR",
    )

from mhdb_tables2turtles_ray.functions.numeric import (  # noqa: E402
    triple_multiset_digest,
)
from mhdb_tables2turtles_ray.sources.corpus import (  # noqa: E402
    corpus_from_documents,
)
from mhdb_tables2turtles_ray.sources.vocab import build_vocab_bundle  # noqa: E402
from tests.oracle_ref import oracle_corpus_triples  # noqa: E402

sf_dirs = sys.argv[1:] or [
    f"/root/testdata/{sf}" for sf in ("sf0.001", "sf0.01", "sf0.1")
]

vocab = build_vocab_bundle()
pins = []  # (events_count, n_triples, content_hash)
for sf_dir in sf_dirs:
    n_events = pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows
    df = corpus_from_documents(sf_dir).to_pandas()
    triples = sorted(oracle_corpus_triples(df, vocab))
    s, p, o = zip(*triples)
    h = triple_multiset_digest(list(s), list(p), list(o))
    pins.append((n_events, len(triples), f"{h:016x}"))
    print(
        f"{sf_dir}: docs={len(df)} events={n_events} "
        f"n_triples={len(triples)} content_hash={h:016x}"
    )

print("\nPaste into kg_flagship_summary (registry.py) — n_triples CASE:")
for n_events, n_triples, _ in pins:
    print(f"  WHEN {n_events} THEN CAST({n_triples} AS BIGINT)")
print("content_hash CASE:")
for n_events, _, h in pins:
    print(f"  WHEN {n_events} THEN '{h}'")

ray.shutdown()
