"""End-to-end training-data curation — the canonical funnel a 100-TB
text pipeline runs, composed entirely from this engine's streaming
stages:

    read → ONE fused per-doc pass (token count + language vote, the
    text.py Arrow kernels) filtering to long-enough in-language docs
    → exact dedup (digest groupby, smallest-id keeper, thresholded
    key-filter semi-join back to the docs)
    → near-dup removal (MinHash-LSH pairs → distributed connected
    components → anti semi-join — ``dedup_keep_best_lsh``)
    → OPTIONAL train/test decontamination (``text.decontaminate_pair``
    against a caller-supplied benchmark set, anti semi-join of the
    contaminated ids)
    → surviving doc ids + a per-stage funnel summary.

Every stage streams; the only driver state is the funnel counts and the
thresholded dedup key filters. The funnel dict is the observability a
curation run ships to its metrics sink.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from ..sources.tables import read_table
from .text import LANG_MARKERS, lang_vote


def curate_corpus(
    sf_dir: str | None = None,
    ds: ray.data.Dataset | None = None,
    min_tokens: int = 5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    decontam_test_ds: ray.data.Dataset | None = None,
    decontam_ngram: int = 8,
    decontam_max_hits: int = 0,
    **lsh_kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """Returns (surviving (doc_id) Dataset, funnel summary dict with
    per-stage counts: input → after_quality_lang → after_exact_dedup →
    after_near_dedup [→ after_decontam]).

    Pass ``decontam_test_ds`` (a (doc_id, text) Dataset of held-out
    benchmark docs) to also drop any surviving doc sharing more than
    ``decontam_max_hits`` lowercased ``decontam_ngram``-gram positions
    with it — contamination is computed once against the
    exact-deduped docs (it does not depend on the near-dup outcome), so
    the stage is one broadcast-filter probe plus an exact anti
    semi-join of the contaminated ids."""
    import ray

    from ..stages.semijoin import build_key_filter, semi_join
    from .dedup import dedup_keep_best_lsh

    supported = set(LANG_MARKERS) | {"unknown"}
    unknown_langs = set(langs) - supported
    if unknown_langs:
        # a typo'd or unsupported language would otherwise match nothing
        # and silently empty the corpus
        raise ValueError(
            f"unsupported language(s) {sorted(unknown_langs)} — the vote "
            f"only ever produces {sorted(supported)}"
        )

    if ds is None:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # count without materializing: for the parquet path this is a
    # metadata-only answer; a caller-supplied derived Dataset pays one
    # extra execution, which beats pinning the whole corpus in the
    # object store just to count it
    n_input = ds.count()

    keep_langs = sorted(set(langs))

    def fused_filter(batch: pa.Table) -> pa.Table:
        # null text counts as 0 tokens BY RULE (dropped below min_tokens),
        # not via an undefined NaN→int cast: coalesce before counting
        text = pc.coalesce(batch.column("text"), pa.scalar("", pa.string()))
        n_tokens = (
            pc.count_substring_regex(text, r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lang = lang_vote(text)  # the same vote the lang_id query runs
        keep = (n_tokens >= min_tokens) & np.isin(lang, keep_langs)
        return batch.filter(pa.array(keep))

    filtered = ds.map_batches(
        fused_filter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed by count + digest + semi-join
    n_filtered = filtered.count()
    if n_filtered == 0:
        # everything dropped (e.g. strict thresholds): short-circuit with
        # an empty survivors Dataset instead of driving the dedup stages
        # over an empty input
        empty = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64())})
        )
        summary = {
            "input": int(n_input),
            "after_quality_lang": 0,
            "after_exact_dedup": 0,
            "after_near_dedup": 0,
        }
        if decontam_test_ds is not None:
            # summary schema is a function of the ARGUMENTS, not of how
            # many rows survived — callers read after_decontam whenever
            # they passed a test set
            summary["after_decontam"] = 0
        return empty, summary

    def digest(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text_md5": pa.array(keys)}
        )

    exact_ids = (
        filtered.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    # semi-join the docs back through the thresholded key filter (exact
    # under the threshold, Bloom above — a Bloom false positive keeps an
    # extra duplicate, the benign direction for a keep-filter)
    keys = build_key_filter(exact_ids, "doc_id")
    exact_docs = semi_join(filtered, "doc_id", ray.put(keys)).materialize()
    n_exact = exact_docs.count()

    survivors = dedup_keep_best_lsh(
        ds=exact_docs, threshold=jaccard_threshold, **lsh_kwargs
    ).materialize()
    summary = {
        "input": int(n_input),
        "after_quality_lang": int(n_filtered),
        "after_exact_dedup": int(n_exact),
        "after_near_dedup": int(survivors.count()),
    }
    if decontam_test_ds is not None:
        from .text import decontaminate_pair

        contaminated = decontaminate_pair(
            exact_docs, decontam_test_ds, n=decontam_ngram
        )

        def over_limit(t: pa.Table) -> pa.Table:
            keep = pc.greater(t.column("n_hits"), decontam_max_hits)
            return pa.table({"doc_id": t.filter(keep).column("doc_id")})

        bad_ids = contaminated.map_batches(
            over_limit, batch_format="pyarrow", zero_copy_batch=True
        )
        ckeys = build_key_filter(bad_ids, "doc_id", exact_threshold=None)
        survivors = semi_join(
            survivors, "doc_id", ray.put(ckeys), anti=True
        ).materialize()
        summary["after_decontam"] = int(survivors.count())
    return survivors, summary
