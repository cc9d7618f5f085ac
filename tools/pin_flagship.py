"""Regenerate the pinned flagship-summary constants in the registry.

The flagship corpus pipeline's subjects pass through check_iri delimited
casing over unicode paths — not expressible in SQL — so its DuckDB-side
oracle is a CONSTANT per testdata scale, derived here from the
REFERENCE-SEMANTICS oracle (tests/oracle_ref.py, which imports the
reference checkout's own scalar functions), NOT from the engine under
test. Paste the printed (docs, n_triples, content_hash) rows into
``pipelines/registry.py``'s ``kg_flagship_summary`` SQL. The sf0.001 pin
is additionally re-derived inside the test suite on every run
(tests/test_kg_pipeline.py), so drift fails loudly.

Run: ``python tools/pin_flagship.py`` (from /root/repo).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

vocab = build_vocab_bundle()
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    df = corpus_from_documents(f"/root/testdata/{sf}").to_pandas()
    triples = sorted(oracle_corpus_triples(df, vocab))
    s, p, o = zip(*triples)
    h = triple_multiset_digest(list(s), list(p), list(o))
    print(f"{sf}: docs={len(df)} n_triples={len(triples)} content_hash={h:016x}")

ray.shutdown()
