"""The flagship pipeline: source-code corpus → RDF Turtle knowledge graph.

End-to-end shape (SURVEY.md §3.4):

    read corpus (repo, path, commit, lang, content)
      → map_batches: content sha256 (per-row invariant, stateless)
      → map_batches(actor pool): language mention → canonical entity
      → map_batches: EmissionSpec triple emission (stateless, partial dedup)
      → union: driver-built TBox triples (tiny)
      → groupby(bucket): global exact triple dedup (the one wide shuffle)
      → groupby(subject-hash pid): sorted Turtle shards + lineage manifests
      → driver: used-prefix header

Everything streams; the driver only ever sees per-partition stats.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..functions.strings import check_iri, language_string
from ..sources.corpus import add_content_sha256, corpus_from_documents
from ..sources.vocab import build_vocab_bundle
from ..stages.dedup import dedup_triples
from ..stages.emit import EmissionSpec, Literal, emit_triples
from ..stages.linker import link_column
from ..stages.materialize import materialize_turtle


def corpus_specs() -> tuple[EmissionSpec, ...]:
    """Emission rules for the corpus table (the reference's per-sheet
    emitters, §2.2, transplanted onto the corpus schema)."""
    file_spec = EmissionSpec(
        name="source_file",
        subject_template="{repo} {path}",
        subject_casing="delimited",
        rdf_type=":SourceFile",
        label_template="{path}",
        literals=(
            Literal(column="commit", predicate=":atCommit", kind="xsd:string"),
            Literal(
                column="content_sha256",
                predicate=":hasContentSha256",
                kind="xsd:string",
            ),
            Literal(column="repo", predicate=":belongsToRepo", kind="iri"),
            Literal(column="lang_canonical", predicate=":hasLanguage", kind="iri",
                    casing="PascalCase"),
        ),
    )
    repo_spec = EmissionSpec(
        name="repository",
        subject_template="{repo}",
        subject_casing="delimited",
        rdf_type=":Repository",
        label_template="{repo}",
    )
    return (file_spec, repo_spec)


def tbox_triples(vocab: dict) -> pa.Table:
    """Driver-built ontology-side triples (languages TBox + crosswalk
    equivalences) — tiny, unioned into the ABox stream before dedup."""
    subjs, preds, objs = [], [], []
    langs = vocab["languages"]
    for name in langs["by_index"].values():
        iri = check_iri(name, "PascalCase")
        subjs += [iri, iri]
        preds += ["a", "rdfs:label"]
        objs += [":Language", language_string(name)]
        for curie in langs["equivalent"].get(name, []):
            subjs.append(iri)
            preds.append("rdfs:equivalentClass")
            objs.append(check_iri(curie))
    for cls in (":SourceFile", ":Repository", ":Language"):
        subjs.append(cls)
        preds.append("a")
        objs.append("rdfs:Class")
    return pa.table(
        {
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
        }
    )


def kg_triples(
    corpus: ray.data.Dataset,
    vocab: dict | None = None,
    linker_concurrency=None,
    dedup_buckets: int = 32,
) -> ray.data.Dataset:
    """corpus Dataset → deduplicated (subj, pred, obj) Dataset.

    ``linker_concurrency`` sizes the linker actor pool. Ray fuses the
    upstream stateless maps (corpus gen, sha256) INTO the actor pool, so
    an undersized fixed pool caps the whole heavy chain; default is an
    autoscaling pool up to the session's CPU count.
    """
    return dedup_triples(
        kg_triples_raw(corpus, vocab, linker_concurrency),
        num_buckets=dedup_buckets,
    )


def kg_triples_raw(
    corpus: ray.data.Dataset,
    vocab: dict | None = None,
    linker_concurrency=None,
    specs=None,
) -> ray.data.Dataset:
    """Emission WITHOUT the global dedup shuffle (per-batch partial dedup
    only). Used by :func:`kg_build`, which folds exact dedup into the
    materialize shuffle instead (one all-to-all for the whole build).

    ``specs`` overrides the coded emission registry — pass the result of
    ``stages.spec_config.load_specs`` to drive emission from a user
    config table (the reference's ``structure_to_keep`` surface)."""
    vocab = vocab or build_vocab_bundle()
    if linker_concurrency is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        # Leave ≥2 CPUs for the task-based stages (emitter, shuffle,
        # render): an actor pool whose MINIMUM reserves every CPU
        # deadlocks the pipeline — actors hold their CPUs even when
        # blocked on downstream backpressure (observed as a permanent
        # stall on a 2-CPU cluster).
        linker_concurrency = (1, max(1, ncpu - 2))
    lang_ref = ray.put(vocab["languages"])

    ds = add_content_sha256(corpus)
    ds = link_column(
        ds,
        lang_ref,
        column="lang",
        out_col="lang_canonical",
        unknown_value=None,  # unmatched languages simply emit no triple
        concurrency=linker_concurrency,
    )
    triples = emit_triples(ds, corpus_specs() if specs is None else specs)
    return triples.union(ray.data.from_arrow(tbox_triples(vocab)))


def kg_build(
    corpus: ray.data.Dataset,
    out_dir: str,
    vocab: dict | None = None,
    num_partitions: int = 16,
    resume: bool = True,
    linker_concurrency=None,
    dedup_buckets: int = 32,  # kept for API compat; dedup rides the
    # materialize shuffle (duplicate triples share their subject, so the
    # subject-hash partition dedups exactly) — one all-to-all total.
    specs=None,
    include_stats: bool = False,
) -> dict:
    """Full build: triples + Turtle shards + manifests + header.
    ``include_stats=True`` adds the executed plan's ``ds.stats()`` to
    the summary (the STATS.md capture hook)."""
    del dedup_buckets
    vocab = vocab or build_vocab_bundle()
    triples = kg_triples_raw(corpus, vocab, linker_concurrency, specs=specs)
    return materialize_turtle(
        triples,
        out_dir,
        num_partitions=num_partitions,
        resume=resume,
        dedup=True,
        base_uri=vocab["base_uri"],
        prefixes=vocab["prefixes"],
        include_stats=include_stats,
    )


def kg_build_modules(
    corpus: ray.data.Dataset,
    out_root: str,
    modules: dict[str, tuple],
    vocab: dict | None = None,
    num_partitions: int = 16,
    resume: bool = True,
) -> dict[str, dict]:
    """Multi-module build: the reference driver's per-module loop
    (``mhdb/create_mhdb:175-218`` — states/disorders/.../chills, each
    ingested into its own statements dict and written to its own .ttl)
    re-expressed as independent spec-set builds sharing one vocabulary
    bundle, each materialized to ``out_root/<module>/`` with its own
    manifests (so modules resume independently).

    ``modules``: {module_name: tuple[EmissionSpec, ...]}. Returns one
    summary per module.
    """
    import os

    vocab = vocab or build_vocab_bundle()
    lang_ref = ray.put(vocab["languages"])
    summaries = {}
    for name, specs in modules.items():
        ds = add_content_sha256(corpus)
        ds = link_column(
            ds, lang_ref, column="lang", out_col="lang_canonical",
            concurrency=(1, 4),
        )
        triples = emit_triples(ds, specs)
        triples = triples.union(ray.data.from_arrow(tbox_triples(vocab)))
        summaries[name] = materialize_turtle(
            triples,
            os.path.join(out_root, name),
            num_partitions=num_partitions,
            resume=resume,
            dedup=True,
            base_uri=f"{vocab['base_uri']}/{name}",
            prefixes=vocab["prefixes"],
        )
    return summaries


def kg_from_documents(sf_dir: str, **kwargs) -> ray.data.Dataset:
    """Convenience: testdata documents table → KG triples Dataset."""
    return kg_triples(corpus_from_documents(sf_dir), **kwargs)
