"""KG-construction queries over the ``documents`` testdata table.

These run the REAL engine stages (EmissionSpec emitter, linker actor
pool, dedup shuffle, prefix aggregation) on inputs whose minting results
are also expressible in ANSI SQL — putting triple emission itself under
the driver's DuckDB value-hash gate. The flagship corpus pipeline (sha1
commits, reference-exact quirks) is checked by the reference-semantics
oracle in tests instead (not SQL-expressible).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.tables import read_table
from ..sources.vocab import language_vocab
from ..stages.dedup import dedup_triples
from ..stages.emit import EmissionSpec, Literal, emit_triples
from ..stages.linker import link_column
from ..stages.prefixes import used_prefixes


def _doc_spec() -> EmissionSpec:
    return EmissionSpec(
        name="document",
        subject_template="Doc {doc_id}",
        subject_casing="delimited",
        rdf_type=":Document",
        label_template="{source}",
        literals=(
            Literal(column="source", predicate=":fromSource", kind="iri"),
            Literal(
                column="lang_canonical",
                predicate=":hasLanguage",
                kind="iri",
                casing="PascalCase",
            ),
            Literal(column="n_chars", predicate=":hasNChars", kind="xsd:int"),
        ),
    )


def doc_triples(sf_dir: str) -> ray.data.Dataset:
    """documents → deduplicated (subj, pred, obj) via the real engine."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])
    ds = link_column(
        ds, ray.put(language_vocab()), column="lang", out_col="lang_canonical",
        concurrency=(1, 4),
    )
    triples = emit_triples(ds, [_doc_spec()])
    return dedup_triples(triples, num_buckets=16)


def doc_prefixes(sf_dir: str) -> ray.data.Dataset:
    """Distinct CURIE prefixes used by doc_triples (header aggregation)."""
    prefixes = used_prefixes(doc_triples(sf_dir))
    return ray.data.from_arrow(pa.table({"prefix": pa.array(prefixes, pa.string())}))


def subject_degree(sf_dir: str) -> ray.data.Dataset:
    """(subj, degree) — triple fan-out per subject (skew observability)."""
    from ray.data.aggregate import Count

    return doc_triples(sf_dir).groupby("subj").aggregate(Count(alias_name="degree"))


def entity_link_lang(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, canonical) — the linker actor pool over documents.lang."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    out = link_column(
        ds,
        ray.put(language_vocab()),
        column="lang",
        out_col="canonical",
        unknown_value="UNKNOWN",
        concurrency=(1, 4),
    )
    return out.select_columns(["doc_id", "canonical"])


def doc_sha256(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, sha256) — the per-row content sha256 invariant, checked
    bit-for-bit against DuckDB's sha256()."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sha(batch: pa.Table) -> pa.Table:
        digests = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "sha256": pa.array(digests)}
        )

    return ds.map_batches(sha, batch_format="pyarrow", zero_copy_batch=True)


def flagship_summary(sf_dir: str) -> ray.data.Dataset:
    """(n_triples, content_hash) — the FLAGSHIP corpus pipeline under
    the driver's value-hash gate. Runs the full engine (corpus
    derivation, sha256 invariant, linker actor pool, EmissionSpec
    emitter, TBox union, global dedup) and reduces the deduplicated
    triple set to a streaming order-independent multiset digest:
    per-batch (count, sum-of-row-hashes) partials merged by addition —
    no sort, no driver materialization of triples, valid at any scale.

    The oracle side is a CONSTANT pinned from the reference-semantics
    oracle (tests/oracle_ref.py, which runs the reference checkout's
    OWN scalar functions) at each testdata scale — regenerate with
    ``python tools/pin_flagship.py``; the sf0.001 pin is re-derived
    from that oracle inside the test suite on every run, so the
    constant cannot drift from reference semantics unnoticed."""
    from ..functions.numeric import triple_multiset_digest
    from .kg import kg_from_documents

    triples = kg_from_documents(sf_dir)

    def digest_partial(batch: pa.Table) -> pa.Table:
        h = triple_multiset_digest(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
        )
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "h": pa.array([h], pa.uint64()),
            }
        )

    parts = triples.map_batches(
        digest_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    n, h = 0, 0
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        n += int(pc.sum(b.column("n")).as_py() or 0)
        for hv in b.column("h").to_pylist():
            h = (h + int(hv)) % (1 << 64)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_triples": pa.array([n], pa.int64()),
                "content_hash": pa.array([format(h, "016x")], pa.string()),
            }
        )
    )


def reified_doc_triples(sf_dir: str) -> ray.data.Dataset:
    """Reification operator over the document triples: every (s, p, o)
    becomes an rdf:Statement blank node with 4 triples."""
    from ..stages.reify import reify_triples

    return reify_triples(doc_triples(sf_dir))


def subject_degree_salted(sf_dir: str) -> ray.data.Dataset:
    """Same result as :func:`subject_degree` via the salted two-phase
    aggregation (hot-key-safe shuffle; identical oracle)."""
    from ..stages.salted import salted_group_count

    return salted_group_count(doc_triples(sf_dir), "subj", num_salts=8)


def event_seq(sf_dir: str) -> ray.data.Dataset:
    """rdf:Seq of each user's first 5 events in (ts, event_id) order —
    the ordered-collection emission over a partitioned log."""
    from ..stages.seq import event_sequences

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return event_sequences(
        ds,
        key_col="user_id",
        item_col="event_id",
        order_by=["ts", "event_id"],
        limit=5,
    )


def supplier_region(sf_dir: str) -> ray.data.Dataset:
    """Two-hop broadcast lookup (J3): supplier → nation → region."""
    from ..sources.tables import load_lookup
    from ..stages.twohop import two_hop_lookup

    nation = load_lookup(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = load_lookup(sf_dir, "region", columns=["r_regionkey", "r_name"])
    hop1 = ray.put(
        dict(
            zip(
                nation.column("n_nationkey").to_pylist(),
                nation.column("n_regionkey").to_pylist(),
            )
        )
    )
    hop2 = ray.put(
        dict(
            zip(
                region.column("r_regionkey").to_pylist(),
                region.column("r_name").to_pylist(),
            )
        )
    )
    ds = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    out = two_hop_lookup(ds, "s_nationkey", hop1, hop2, out_col="r_name")
    return out.select_columns(["s_suppkey", "r_name"])


# event_type → crosswalk relation for the J4 waterfall demo below; the
# 'error' type maps to an UNKNOWN relation the resolver silently drops
# (reference behavior for unmapped reln types, mhdb/ingest.py:2607-2646).
_EVENT_RELN = {
    "click": "PARTOF",
    "purchase": "MEASUREDBY",
    "signup": "ASSERTS",
    "view": "KINDOF",
    "error": "UNKNOWNTYPE",
}


def crosswalk_link(sf_dir: str) -> ray.data.Dataset:
    """J4 entity-link waterfall under the oracle gate: events become
    (reln_type, startNode, endNode) edges whose node ids are resolved
    against the 5-table priority-union dictionary inside the
    CrosswalkResolver actor pool; unknown relations drop."""
    from ..sources.vocab import RELN_PREDICATES, crosswalk_tables
    from ..stages.linker import CrosswalkResolver

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def to_edges(batch: pa.Table) -> pa.Table:
        relns = [
            _EVENT_RELN.get(t, "UNKNOWNTYPE")
            for t in batch.column("event_type").to_pylist()
        ]
        return pa.table(
            {
                "reln_type": pa.array(relns, pa.string()),
                "startNode": pa.array(
                    batch.column("user_id").to_numpy() % 110, pa.int64()
                ),
                "endNode": pa.array(
                    batch.column("event_id").to_numpy() % 110, pa.int64()
                ),
            }
        )

    cw_ref = ray.put(crosswalk_tables())
    edges = ds.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    triples = edges.map_batches(
        CrosswalkResolver,
        fn_constructor_kwargs={
            "crosswalk_ref": cw_ref,
            "reln_predicates": RELN_PREDICATES,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    return dedup_triples(triples, num_buckets=16)


# The language CASE mirrored in every oracle query (deterministic alias
# dictionary, sources/vocab.py) — keep in sync with language_vocab().
LANG_CASE_SQL = (
    "CASE lang WHEN 'en' THEN 'English' WHEN 'fr' THEN 'French' "
    "WHEN 'es' THEN 'Spanish' WHEN 'zh' THEN 'Chinese' "
    "WHEN 'de' THEN 'German' WHEN 'ja' THEN 'Japanese' ELSE NULL END"
)

DOC_TRIPLES_SQL = f"""
WITH t AS (
  SELECT 'Doc_' || CAST(doc_id AS VARCHAR) AS s, lang, source, n_chars
  FROM documents
), triples AS (
  SELECT ':' || s AS subj, 'a' AS pred, ':Document' AS obj FROM t
  UNION ALL
  SELECT ':' || s, 'rdfs:label', '\"\"\"' || source || '\"\"\"@en' FROM t
  UNION ALL
  SELECT ':' || s, ':fromSource', ':' || source FROM t
  UNION ALL
  SELECT ':' || s, ':hasLanguage', ':' || {LANG_CASE_SQL} FROM t
  WHERE {LANG_CASE_SQL} IS NOT NULL
  UNION ALL
  SELECT ':' || s, ':hasNChars', '"' || CAST(n_chars AS VARCHAR) || '"^^xsd:int'
  FROM t
)
SELECT DISTINCT subj, pred, obj FROM triples
"""
