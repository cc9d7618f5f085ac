"""End-to-end training-data curation — the canonical funnel a 100-TB
text pipeline runs, composed entirely from this engine's streaming
stages:

    read → ONE fused per-doc pass (token count + language vote, the
    text.py Arrow kernels) filtering to long-enough in-language docs
    → exact dedup (digest groupby, smallest-id keeper, thresholded
    key-filter semi-join back to the docs)
    → OPTIONAL perplexity filter (a bigram LM trained on the deduped
    docs themselves, CCNet-style — ``lm.score_perplexity``)
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

from ..sources.tables import read_table
from .text import LANG_MARKERS, lang_vote, whitespace_token_count


def curate_corpus(
    sf_dir: str | None = None,
    ds: ray.data.Dataset | None = None,
    min_tokens: int = 5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    length_pct_max: float | None = None,
    source_cap: int | None = None,
    source_col: str = "source",
    cap_seed: int = 42,
    ppl_max: float | None = None,
    embeddings_ds: ray.data.Dataset | None = None,
    semantic_threshold: float = 0.98,
    semantic_kwargs: dict | None = None,
    decontam_test_ds: ray.data.Dataset | None = None,
    decontam_ngram: int = 8,
    decontam_max_hits: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_partitions: int = 16,
    **lsh_kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """Returns (surviving (doc_id) Dataset, funnel summary dict with
    per-stage counts: input → after_quality_lang → after_exact_dedup
    [→ after_perplexity] → after_near_dedup [→ after_decontam]).

    Pass ``length_pct_max`` (e.g. ``0.99``) to add a percentile-based
    length-outlier cut after the quality/language filter: the token-count
    distribution's EXACT ``quantile_cont`` value is computed with the
    unbounded-domain refinement stage (``stages/quantiles.py`` — no
    assumed length ceiling) and docs STRICTLY longer than it are
    dropped. The cut is ≥ the shortest surviving doc's length by
    construction, so the stage can never empty a non-empty corpus; the
    funnel summary gains ``after_length_cut``.

    Pass ``source_cap`` (an int) to add the per-source document quota
    every web corpus applies (an over-crawled domain must not dominate
    the mix): at most ``source_cap`` docs survive per distinct
    ``source_col`` value, chosen by the deterministic seeded
    smallest-md5 rule (``shards.cap_per_stratum`` — identical survivors
    at any cluster size; ``cap_seed`` redraws). The cap runs BEFORE the
    dedup stages so an over-crawled source's excess never pays for
    digesting or LSH hashing; the summary gains ``after_source_cap``.
    The input must carry ``source_col`` (read automatically on the
    ``sf_dir`` path, validated loudly on the ``ds`` path); docs with a
    NULL source carry no quota evidence and are KEPT — the same
    no-evidence→keep convention as null perplexity and missing
    embeddings.

    Pass ``ppl_max`` to add the CCNet-style statistical quality stage:
    a bigram LM is trained on the exact-deduped docs themselves
    (training AFTER dedup keeps duplicated boilerplate from skewing
    the counts) and docs whose per-token perplexity exceeds the
    threshold are dropped; docs with no bigrams (null perplexity)
    carry no evidence and are kept. A Bloom false positive in the
    keep-filter keeps an extra high-perplexity doc — the benign
    direction, same as the exact-dedup keeper.

    Pass ``embeddings_ds`` (a (doc_id, embedding list<float>) Dataset
    aligned with the corpus) to add a SEMANTIC near-dup stage after the
    lexical LSH removal: random-hyperplane LSH over the surviving docs'
    vectors → distributed connected components → keep each semantic
    cluster's smallest doc_id (``dedup.embedding_duplicate_ids`` —
    vectors never shuffle, 24-byte band rows only). Docs WITHOUT an
    embedding carry no semantic evidence and are kept; the summary
    gains ``after_semantic_dedup``. ``semantic_kwargs`` reaches the
    removal machinery (``cc_max_iters`` for deep dup-cluster graphs,
    ``band_bits``/``max_bucket``/``seed`` for the LSH) — a
    non-convergence RuntimeError must be actionable from here, not a
    dead end.

    Pass ``decontam_test_ds`` (a (doc_id, text) Dataset of held-out
    benchmark docs) to also drop any surviving doc sharing more than
    ``decontam_max_hits`` lowercased ``decontam_ngram``-gram positions
    with it — contamination is computed once against the
    exact-deduped docs (it does not depend on the near-dup outcome), so
    the stage is one broadcast-filter probe plus an exact anti
    semi-join of the contaminated ids.

    Pass ``checkpoint_dir`` for FUNNEL-LEVEL RESUME: each stage's
    surviving doc-id generation is persisted there
    (``state/funnel.FunnelCheckpoint`` — per-partition atomic parquet
    + a done-marker per stage, parameters pinned in
    ``_funnel_meta.json``; mismatched parameters raise, and so does a
    resume whose input row count differs from the one the checkpoint
    was created over — same-size different-content corpora remain the
    caller's responsibility, as with any checkpoint store). A rerun
    resumes AFTER the last completed stage: completed stages' counts
    come from their markers, the needed text-bearing boundary is
    rebuilt as one exact semi-join of the input against the
    checkpointed ids (never the Bloom path — resume must reproduce the
    non-resumed survivor set bit-for-bit), and the summary gains
    ``resumed_stages``. The funnel stages are deterministic pure
    functions of (input, params), which is what makes the skipped
    recomputation sound."""
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

    if length_pct_max is not None and not 0.0 < length_pct_max <= 1.0:
        # validate BEFORE the quality/language pass materializes — a
        # 99-instead-of-0.99 typo must fail in milliseconds, not after
        # an hours-long scan (same rule as source_cap below)
        raise ValueError(
            f"length_pct_max must be in (0, 1], got {length_pct_max}"
        )

    if source_cap is not None and source_cap < 1:
        # pure argument validation — before the (potentially hours-long)
        # quality-filter pass runs, and independent of how many rows
        # survive it (cap_per_stratum's own check would never fire on
        # an emptied corpus)
        raise ValueError(f"source_cap must be >= 1, got {source_cap}")

    if ds is None:
        cols = ["doc_id", "text"]
        if source_cap is not None:
            cols.append(source_col)  # only ship the column when capping
        ds = read_table(sf_dir, "documents", columns=cols)
    elif source_cap is not None:
        names = (ds.schema() or pa.schema([])).names
        if source_col not in names:
            raise ValueError(
                f"source_cap needs a {source_col!r} column on the input "
                f"(got {sorted(names)}) — pass source_col= if it is "
                "named differently"
            )
    keep_langs = sorted(set(langs))

    # --- funnel checkpointing (state/funnel.py) -----------------------
    stage_plan = ["after_quality_lang"]
    if length_pct_max is not None:
        stage_plan.append("after_length_cut")
    if source_cap is not None:
        stage_plan.append("after_source_cap")
    stage_plan.append("after_exact_dedup")
    if ppl_max is not None:
        stage_plan.append("after_perplexity")
    stage_plan.append("after_near_dedup")
    if embeddings_ds is not None:
        stage_plan.append("after_semantic_dedup")
    if decontam_test_ds is not None:
        stage_plan.append("after_decontam")
    ckpt = None
    resumed: list[str] = []
    if checkpoint_dir is not None:
        from ..state.funnel import FunnelCheckpoint

        ckpt = FunnelCheckpoint(
            checkpoint_dir,
            num_partitions=checkpoint_partitions,
            params={
                "min_tokens": min_tokens,
                "langs": keep_langs,
                "jaccard_threshold": jaccard_threshold,
                "length_pct_max": length_pct_max,
                "source_cap": source_cap,
                "source_col": source_col,
                "cap_seed": cap_seed,
                "ppl_max": ppl_max,
                "semantic": embeddings_ds is not None,
                "semantic_threshold": semantic_threshold,
                "semantic_kwargs": semantic_kwargs or {},
                "decontam": decontam_test_ds is not None,
                "decontam_ngram": decontam_ngram,
                "decontam_max_hits": decontam_max_hits,
                "lsh_kwargs": lsh_kwargs,
                # structural: the generation files' partition width — a
                # kill mid-checkpoint-write resumed at a different width
                # would mis-read the sink's completed-partition manifests
                "checkpoint_partitions": checkpoint_partitions,
            },
        )
        resumed = ckpt.complete_prefix(stage_plan)

    def _restore(ids_ds, with_source: bool = False):
        # stage-boundary reconstruction: EXACT semi-join only (a Bloom
        # false positive would resurrect a dropped doc and break the
        # run-vs-resume survivor equality this feature promises)
        cols = ["doc_id", "text"]
        if with_source:
            cols.append(source_col)
        have = (ds.schema() or pa.schema([])).names
        base = ds.select_columns([c for c in cols if c in have])
        keys = build_key_filter(ids_ds, "doc_id", exact_threshold=None)
        return semi_join(base, "doc_id", ray.put(keys)).materialize()

    if "after_quality_lang" in resumed:
        info = ckpt.marker_info(stage_plan, "after_quality_lang")
        n_input, n_filtered = info["n_input"], info["n"]
        # input guard: the marker pinned the corpus size at creation —
        # resuming a checkpoint_dir against a DIFFERENT corpus must
        # refuse loudly instead of silently returning the old run's
        # survivors (params alone cannot catch this). count() is
        # metadata-only on the parquet path; a caller-supplied derived
        # Dataset pays one execution — far below any funnel stage, and
        # the stages' purity promise is "(input, params)", so the input
        # half needs SOME pin. Same-size different-content corpora are
        # the caller's responsibility (documented), as with any
        # checkpoint store.
        n_actual = ds.count()
        if n_actual != n_input:
            raise ValueError(
                f"funnel checkpoint input mismatch: {checkpoint_dir!r} "
                f"was created over a {n_input}-row corpus, resume got "
                f"{n_actual} rows — use a fresh checkpoint_dir for a "
                "different corpus"
            )
        filtered = None  # rebuilt lazily only if a pre-dedup stage pends
    else:
        # count without materializing: for the parquet path this is a
        # metadata-only answer; a caller-supplied derived Dataset pays
        # one extra execution, which beats pinning the whole corpus in
        # the object store just to count it
        n_input = ds.count()

        def fused_filter(batch: pa.Table) -> pa.Table:
            # null text counts as 0 tokens BY RULE (dropped below
            # min_tokens) — whitespace_token_count coalesces first
            text = pc.coalesce(
                batch.column("text"), pa.scalar("", pa.string())
            )
            n_tokens = whitespace_token_count(batch.column("text"))
            lang = lang_vote(text)  # the same vote the lang_id query runs
            keep = (n_tokens >= min_tokens) & np.isin(lang, keep_langs)
            return batch.filter(pa.array(keep))

        filtered = ds.map_batches(
            fused_filter, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()  # consumed by count + digest + semi-join
        n_filtered = filtered.count()
        if ckpt is not None:
            ckpt.save(
                stage_plan,
                "after_quality_lang",
                filtered.select_columns(["doc_id"]),
                n_filtered,
                extra={"n_input": int(n_input)},
            )

    def _need_filtered():
        # only reachable on resume paths where the last completed stage
        # is pre-dedup (prefix property of complete_prefix); the source
        # column is re-attached only while the cap stage still pends
        nonlocal filtered
        if filtered is None:
            with_source = (
                source_cap is not None and "after_source_cap" not in resumed
            )
            filtered = _restore(
                ckpt.load_ids(stage_plan, resumed[-1]), with_source
            )
        return filtered

    if n_filtered == 0:
        # everything dropped (e.g. strict thresholds): short-circuit with
        # an empty survivors Dataset instead of driving the dedup stages
        # over an empty input
        empty = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64())})
        )
        # keys in funnel stage order, same as the non-empty path
        summary = {"input": int(n_input), "after_quality_lang": 0}
        if length_pct_max is not None:
            summary["after_length_cut"] = 0
        if source_cap is not None:
            summary["after_source_cap"] = 0
        summary["after_exact_dedup"] = 0
        if ppl_max is not None:
            summary["after_perplexity"] = 0
        summary["after_near_dedup"] = 0
        if embeddings_ds is not None:
            summary["after_semantic_dedup"] = 0
        if decontam_test_ds is not None:
            # summary schema is a function of the ARGUMENTS, not of how
            # many rows survived — callers read after_decontam whenever
            # they passed a test set
            summary["after_decontam"] = 0
        if ckpt is not None:
            # same contract as the main path: checkpointed runs always
            # report what was resumed (stress/CLI consumers read the
            # key unconditionally)
            summary["resumed_stages"] = list(resumed)
        return empty, summary

    n_length_cut = None
    if length_pct_max is not None and "after_length_cut" in resumed:
        n_length_cut = ckpt.marker_info(stage_plan, "after_length_cut")["n"]
    elif length_pct_max is not None:
        from ..stages.quantiles import exact_float_quantiles

        filtered = _need_filtered() if filtered is None else filtered

        def tok_lens(batch: pa.Table) -> pa.Table:
            # the SAME count definition as the quality filter and the
            # cut below (text.whitespace_token_count — single home)
            n = whitespace_token_count(batch.column("text"))
            return pa.table({"n_tokens": pa.array(n.astype(np.float64))})

        # token counts are integer-valued, so the point-mass snap
        # resolves each rank almost immediately (typically one pass)
        cut = exact_float_quantiles(
            filtered.map_batches(
                tok_lens, batch_format="pyarrow", zero_copy_batch=True
            ),
            "n_tokens",
            (length_pct_max,),
            bins=256,
            gather_limit=4096,
        )[length_pct_max]

        def under_cut(batch: pa.Table) -> pa.Table:
            n = whitespace_token_count(batch.column("text")).astype(np.float64)
            return batch.filter(pa.array(n <= cut))

        filtered = filtered.map_batches(
            under_cut, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_length_cut = filtered.count()
        if ckpt is not None:
            ckpt.save(
                stage_plan,
                "after_length_cut",
                filtered.select_columns(["doc_id"]),
                n_length_cut,
            )

    n_source_cap = None
    if source_cap is not None and "after_source_cap" in resumed:
        n_source_cap = ckpt.marker_info(stage_plan, "after_source_cap")["n"]
    elif source_cap is not None:
        filtered = _need_filtered() if filtered is None else filtered
        # per-source quota BEFORE the dedup stages: an over-crawled
        # source is capped first so its excess never pays for digesting,
        # LSH hashing or component finding. Deterministic smallest-k by
        # md5(seed:doc_id) per source (shards.cap_per_stratum) — the
        # keep-filter is EXACT like every funnel filter (a Bloom false
        # positive would keep a doc beyond its source's quota).
        from .shards import cap_per_stratum

        capped = cap_per_stratum(
            filtered.select_columns(["doc_id", source_col]),
            source_col,
            source_cap,
            seed=cap_seed,
        ).materialize()  # consumed twice below (count + unique)
        ckeys_ref = ray.put(
            build_key_filter(capped, "doc_id", exact_threshold=None)
        )
        # the cap is the source column's only consumer — drop it here so
        # the dedup/LSH stages never ship it through their shuffles
        keep_cols = [c for c in filtered.schema().names if c != source_col]

        def cap_keep(t: pa.Table) -> pa.Table:
            # a doc with a NULL source carries no quota evidence: KEEP
            # (the funnel's no-evidence→keep convention — null
            # perplexity kept, missing embedding kept); cap_per_stratum
            # never saw it (pandas groupby drops null strata)
            import ray as _ray

            keys = _ray.get(ckeys_ref)
            in_cap = np.isin(t.column("doc_id").to_numpy(), keys)
            no_src = pc.is_null(t.column(source_col)).to_numpy(
                zero_copy_only=False
            )
            return t.filter(pa.array(in_cap | no_src)).select(keep_cols)

        filtered = filtered.map_batches(
            cap_keep, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_source_cap = filtered.count()
        if ckpt is not None:
            ckpt.save(
                stage_plan,
                "after_source_cap",
                filtered.select_columns(["doc_id"]),
                n_source_cap,
            )

    if "after_exact_dedup" in resumed:
        n_exact = ckpt.marker_info(stage_plan, "after_exact_dedup")["n"]
        exact_docs = None  # rebuilt lazily only when a later stage needs it
    else:
        filtered = _need_filtered() if filtered is None else filtered

        def digest(batch: pa.Table) -> pa.Table:
            keys = [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in batch.column("text").to_pylist()
            ]
            return pa.table(
                {"doc_id": batch.column("doc_id"), "text_md5": pa.array(keys)}
            )

        from ..stages.grouped import bucketed_agg

        exact_ids = bucketed_agg(
            filtered.map_batches(
                digest, batch_format="pyarrow", zero_copy_batch=True
            ),
            "text_md5",
            "doc_id",
            how="min",
        ).select_columns(["doc_id"])
        # semi-join the docs back through the thresholded key filter
        # (exact under the threshold, Bloom above — a Bloom false
        # positive keeps an extra duplicate, the benign direction for a
        # keep-filter)
        keys = build_key_filter(exact_ids, "doc_id")
        exact_docs = semi_join(filtered, "doc_id", ray.put(keys)).materialize()
        n_exact = exact_docs.count()
        if ckpt is not None:
            ckpt.save(
                stage_plan,
                "after_exact_dedup",
                exact_docs.select_columns(["doc_id"]),
                n_exact,
            )

    def _need_exact():
        # the latest text-bearing boundary: post-perplexity ids when
        # that stage is in the resumed prefix, else post-exact-dedup
        nonlocal exact_docs
        if exact_docs is None:
            name = (
                "after_perplexity"
                if "after_perplexity" in resumed
                else "after_exact_dedup"
            )
            exact_docs = _restore(ckpt.load_ids(stage_plan, name))
        return exact_docs

    # keys in funnel order: quality → [length cut] → [source cap] → dedup
    summary = {"input": int(n_input), "after_quality_lang": int(n_filtered)}
    if n_length_cut is not None:
        summary["after_length_cut"] = int(n_length_cut)
    if n_source_cap is not None:
        summary["after_source_cap"] = int(n_source_cap)
    summary["after_exact_dedup"] = int(n_exact)
    if ckpt is not None:
        summary["resumed_stages"] = list(resumed)

    if ppl_max is not None and "after_perplexity" in resumed:
        summary["after_perplexity"] = ckpt.marker_info(
            stage_plan, "after_perplexity"
        )["n"]
    elif ppl_max is not None:
        from .lm import score_perplexity

        scored = score_perplexity(None, ds=_need_exact())

        def low_ppl(t: pa.Table) -> pa.Table:
            # null perplexity (no bigrams) carries no evidence: keep
            keep = pc.fill_null(
                pc.less_equal(t.column("ppl"), ppl_max), True
            )
            return pa.table({"doc_id": t.filter(keep).column("doc_id")})

        good_ids = scored.map_batches(
            low_ppl, batch_format="pyarrow", zero_copy_batch=True
        )
        pkeys = build_key_filter(good_ids, "doc_id")
        exact_docs = semi_join(
            exact_docs, "doc_id", ray.put(pkeys)
        ).materialize()
        n_ppl = int(exact_docs.count())
        summary["after_perplexity"] = n_ppl
        if ckpt is not None:
            ckpt.save(
                stage_plan,
                "after_perplexity",
                exact_docs.select_columns(["doc_id"]),
                n_ppl,
            )

    if "after_near_dedup" in resumed:
        summary["after_near_dedup"] = ckpt.marker_info(
            stage_plan, "after_near_dedup"
        )["n"]
        survivors = None  # loaded lazily from the latest id checkpoint
    else:
        survivors = dedup_keep_best_lsh(
            ds=_need_exact(), threshold=jaccard_threshold, **lsh_kwargs
        ).materialize()
        n_near = int(survivors.count())
        summary["after_near_dedup"] = n_near
        if ckpt is not None:
            # id-only generation, like every earlier stage: a corpus-
            # sized text column in the checkpoint would turn the 31-MB-
            # per-partition id files the sizing comment promises into an
            # extra corpus copy of I/O at scale
            ckpt.save(
                stage_plan,
                "after_near_dedup",
                survivors.select_columns(["doc_id"]),
                n_near,
            )

    def _need_survivors():
        nonlocal survivors
        if survivors is None:
            last = [
                s
                for s in resumed
                if s
                in ("after_near_dedup", "after_semantic_dedup", "after_decontam")
            ][-1]
            survivors = ckpt.load_ids(stage_plan, last).materialize()
        return survivors

    if embeddings_ds is not None and "after_semantic_dedup" in resumed:
        summary["after_semantic_dedup"] = ckpt.marker_info(
            stage_plan, "after_semantic_dedup"
        )["n"]
    elif embeddings_ds is not None:
        from .dedup import embedding_duplicate_ids

        # embeddings of the SURVIVING docs only (a doc removed by the
        # lexical stages must not vote semantic clusters); docs with no
        # embedding row are untouched — no evidence, keep. ONE dropped
        # set, ONE anti-join: the non-root ids come straight from the
        # removal machinery rather than inverting its kept set back
        skeys2 = build_key_filter(
            _need_survivors(), "doc_id", exact_threshold=None
        )
        emb = semi_join(embeddings_ds, "doc_id", ray.put(skeys2))
        emb = emb.rename_columns({"doc_id": "vec_id"})
        sem_dropped = embedding_duplicate_ids(
            ds=emb, threshold=semantic_threshold, **(semantic_kwargs or {})
        ).rename_columns({"vec_id": "doc_id"})
        dkeys = build_key_filter(sem_dropped, "doc_id", exact_threshold=None)
        survivors = semi_join(
            survivors, "doc_id", ray.put(dkeys), anti=True
        ).materialize()
        n_sem = int(survivors.count())
        summary["after_semantic_dedup"] = n_sem
        if ckpt is not None:
            ckpt.save(
                stage_plan,
                "after_semantic_dedup",
                survivors.select_columns(["doc_id"]),
                n_sem,
            )

    if decontam_test_ds is not None and "after_decontam" in resumed:
        summary["after_decontam"] = ckpt.marker_info(
            stage_plan, "after_decontam"
        )["n"]
    elif decontam_test_ds is not None:
        from .text import decontaminate_pair

        contaminated = decontaminate_pair(
            _need_exact(), decontam_test_ds, n=decontam_ngram
        )

        def over_limit(t: pa.Table) -> pa.Table:
            keep = pc.greater(t.column("n_hits"), decontam_max_hits)
            return pa.table({"doc_id": t.filter(keep).column("doc_id")})

        bad_ids = contaminated.map_batches(
            over_limit, batch_format="pyarrow", zero_copy_batch=True
        )
        ckeys = build_key_filter(bad_ids, "doc_id", exact_threshold=None)
        survivors = semi_join(
            _need_survivors(), "doc_id", ray.put(ckeys), anti=True
        ).materialize()
        n_dec = int(survivors.count())
        summary["after_decontam"] = n_dec
        if ckpt is not None:
            ckpt.save(
                stage_plan,
                "after_decontam",
                survivors.select_columns(["doc_id"]),
                n_dec,
            )

    final = survivors if survivors is not None else _need_survivors()
    # the documented return shape is a (doc_id) Dataset — normalize so
    # fresh runs (full rows off the dedup anti-join) and resumed runs
    # (id-only checkpoint generations) present the same schema
    return final.select_columns(["doc_id"]), summary


def prepare_training_data(
    sf_dir: str,
    out_dir: str,
    weights: dict[str, float] | None = None,
    default_weight: float = 1.0,
    n_shards: int = 8,
    seed: int = 42,
    resume: bool = True,
    strip_spans_window: int | None = None,
    bpe_merges: int | None = None,
    bpe_max_words: int = 1_000_000,
    bpe_model_path: str | None = None,
    shard_file_format: str = "parquet",
    **curate_kwargs,
) -> dict:
    """The WHOLE training-data prep flow, end to end: curate (quality +
    language filter → exact dedup → near-dup removal [→
    decontamination]) → weighted language resampling → deterministic
    seeded shard write. Returns the funnel summary extended with
    ``after_resample`` and the shard-write summary (written / skipped /
    n_rows).

    Shuffle budget: curation's internal exchanges + exactly ONE
    payload exchange (the shard write's permutation). The resample step
    adds ZERO data movement — it is the pure per-row
    ``shards.resample_batch`` rule applied inline on the text-bearing
    stream, replicas keyed by a synthetic ``uid = doc_id * 2^16 +
    copy`` so each replica gets its own permutation position (an
    upsampled doc's copies land in DIFFERENT shards, which is exactly
    what an epoch-level mixer wants). Output shards carry (uid,
    doc_id, copy, lang, text).

    ``strip_spans_window``: when set, the curated text stream
    additionally passes through substring-level dedup
    (``dedup.strip_duplicate_spans`` — every window of that many
    tokens occurring >= 2 times among the CURATED docs is cut from all
    of them) before mixing, so shards never carry verbatim
    cross-document boilerplate that doc-level dedup can't see. The
    detection corpus is the curated stream itself (post doc-dedup —
    removed duplicates must not vote content into "duplicated").

    ``bpe_merges``: when set, the flow also TOKENIZES — a BPE model
    (``pipelines/bpe.py``) is trained on the curated stream (post-dedup,
    pre-resample: duplicated boilerplate and upsampled copies must not
    skew the learned merges) and the mixed stream is encoded before the
    shard write, so shards carry (uid, doc_id, copy, lang, input_ids,
    n_pieces, n_unk) instead of raw text — training-ready token shards.
    The summary gains a ``bpe`` entry (merges/vocab size, truncation
    flag). ``bpe_model_path`` instead LOADS a persisted tokenizer
    (``bpe.save_bpe_model``) and encodes with it — the incremental
    path: later corpus slices shard under the SAME vocabulary as the
    first (ids comparable across runs); mutually exclusive with
    ``bpe_merges``. ``shard_file_format="jsonl"`` writes JSONL shards
    instead of parquet (same manifests/resume).
    """
    from ..stages.semijoin import build_key_filter, semi_join
    from .shards import _validate_weights, resample_batch, write_training_shards

    if bpe_merges is not None and bpe_model_path is not None:
        # pure argument validation — must fire BEFORE the (potentially
        # hours-long) curation funnel runs, not after
        raise ValueError(
            "pass bpe_merges (train on this corpus) OR bpe_model_path "
            "(encode with a persisted tokenizer), not both"
        )
    wmap = _validate_weights(weights or {}, default_weight)
    caller_ds = curate_kwargs.get("ds")
    survivors, summary = curate_corpus(sf_dir, **curate_kwargs)

    if caller_ds is not None:
        # curation ran on the caller's dataset — the mix step must pull
        # text from the SAME source, or survivor ids would be joined
        # against unrelated sf_dir documents (wrong text, silent drops)
        names = (caller_ds.schema() or pa.schema([])).names
        missing = {"doc_id", "lang", "text"} - set(names)
        if missing:
            raise ValueError(
                "ds passed to prepare_training_data must carry "
                f"doc_id/lang/text for the mix step; missing {sorted(missing)}"
            )
        docs = caller_ds
    else:
        docs = read_table(
            sf_dir, "documents", columns=["doc_id", "lang", "text"]
        )
    # exact_threshold=None: the keep-filter must be EXACT at any scale —
    # a Bloom filter's false positives would readmit curated-OUT docs
    # (near-dups, wrong-language, and docs decontamination explicitly
    # dropped) into training shards, voiding the funnel's guarantees
    # (same rule as the anti joins in dedup_keep_best_lsh and the
    # decontam stage above)
    skeys = build_key_filter(survivors, "doc_id", exact_threshold=None)
    import ray

    curated = semi_join(docs, "doc_id", ray.put(skeys))
    if strip_spans_window is not None:
        from .dedup import strip_duplicate_spans

        # materialize once: the span stage consumes the stream twice
        # (window count + strip) and the shard write a third time —
        # without this the read+filter lineage would re-execute each time
        curated = strip_duplicate_spans(
            None, window=strip_spans_window, ds=curated.materialize()
        )

    model = None
    if bpe_merges is not None:
        from . import bpe as bpe_mod

        # the curated stream is consumed by BOTH the word-count scan and
        # the shard write (plus the strip transform above if enabled) —
        # pin it once so the curate/strip lineage never re-executes
        curated = curated.materialize()
        model = bpe_mod.train_bpe(
            sf_dir, num_merges=bpe_merges, max_words=bpe_max_words, ds=curated
        )
        summary["bpe"] = {
            "merges": len(model["merges"]),
            "vocab": len(model["vocab"]),
            "truncated": model["truncated"],
        }
    elif bpe_model_path is not None:
        from .bpe import load_bpe_model

        model = load_bpe_model(bpe_model_path)
        summary["bpe"] = {
            "merges": len(model["merges"]),
            "vocab": len(model["vocab"]),
            "truncated": model["truncated"],
            "loaded_from": bpe_model_path,
        }

    def mix(df):
        out = resample_batch(df, wmap, default_weight, seed)
        if len(out):
            too_big = int(out["copy"].max())
            if too_big >= 1 << 16:
                raise ValueError(
                    f"copy index {too_big} overflows the uid scheme "
                    "(doc_id * 2^16 + copy); cap weights below 65536"
                )
        out["uid"] = out["doc_id"].to_numpy() * (1 << 16) + out[
            "copy"
        ].to_numpy()
        return out[["uid", "doc_id", "copy", "lang", "text"]]

    mixed = curated.map_batches(mix, batch_format="pandas")
    if model is not None:
        from . import bpe as bpe_mod

        mixed = bpe_mod.bpe_encode(sf_dir, model, ds=mixed)
    write_summary = write_training_shards(
        mixed, out_dir, id_col="uid", n_shards=n_shards, seed=seed,
        resume=resume, file_format=shard_file_format,
    )
    # n_rows counts rows written THIS run: on a resumed run with
    # already-finished shards it is a partial count, so only claim the
    # funnel number when every shard was actually (re)written — never
    # count the stream itself, which would re-execute curate+mix just
    # for observability
    if write_summary["skipped"]:
        summary["after_resample"] = None
    else:
        summary["after_resample"] = int(write_summary["n_rows"])
    summary["shards"] = write_summary
    return summary
