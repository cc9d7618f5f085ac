"""CLI entry point — the ``ray job submit`` surface.

    python -m mhdb_tables2turtles_ray build \
        --input /path/to/corpus/*.parquet --out /tmp/kg \
        --partitions 64 [--no-resume] [--validate]

    python -m mhdb_tables2turtles_ray build --sf-dir /root/testdata/sf0.001 \
        --out /tmp/kg

On a cluster this module is the job driver: submit with
``ray job submit -- python -m mhdb_tables2turtles_ray build ...`` and
Ray Data schedules the stages across nodes; locally it initialises a
local session itself (guarded — never re-inits a driver-owned session).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="mhdb_tables2turtles_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="corpus parquet → Turtle KG shards")
    src = b.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", nargs="+", help="corpus parquet paths/globs")
    src.add_argument("--sf-dir", help="testdata dir (documents-derived corpus)")
    src.add_argument("--workbook",
                     help=".xlsx workbook (chills-module build: stdlib OOXML "
                          "reader → per-sheet EmissionSpecs → Turtle shards)")
    b.add_argument("--out", required=True, help="output directory (shared storage)")
    b.add_argument("--partitions", type=int, default=64)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--validate", action="store_true", help="parse shards after write")
    b.add_argument("--specs", default=None,
                   help="emission-spec config file (.json/.parquet) overriding "
                        "the coded registry (structure_to_keep surface)")
    b.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode CPU count (ignored under ray job submit)")

    x = sub.add_parser(
        "export",
        help="run a registry query and write it as resumable "
             "hash-partitioned parquet",
    )
    x.add_argument("--query", required=True, help="name from the query registry")
    x.add_argument("--sf-dir", required=True)
    x.add_argument("--out", required=True)
    x.add_argument("--key", required=True, help="partition key column")
    x.add_argument("--range", action="store_true", dest="range_partition",
                   help="range-partition on --key (numeric) instead of "
                        "hashing: output files are globally ordered")
    x.add_argument("--partitions", type=int, default=16)
    x.add_argument("--format", choices=["parquet", "jsonl"], default="parquet",
                   dest="file_format",
                   help="partition file format (jsonl = one JSON object "
                        "per row, the training-interchange format)")
    x.add_argument("--no-resume", action="store_true")
    x.add_argument("--num-cpus", type=int, default=None)

    s = sub.add_parser(
        "shard",
        help="write the corpus as deterministic seeded training shards "
             "(global-shuffle semantics, byte-identical on rerun)",
    )
    ssrc = s.add_mutually_exclusive_group(required=True)
    ssrc.add_argument("--input", nargs="+", help="corpus parquet paths/globs")
    ssrc.add_argument("--sf-dir", help="testdata dir (documents table)")
    s.add_argument("--out", required=True)
    s.add_argument("--shards", type=int, default=64)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--format", choices=["parquet", "jsonl"], default="parquet",
                   dest="file_format",
                   help="shard file format (jsonl = one JSON object per row)")
    s.add_argument("--no-resume", action="store_true")
    s.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser(
        "curate",
        help="the whole training-data prep flow: quality/language filter "
             "→ dedup → near-dup removal → weighted mix → seeded shards",
    )
    csrc = c.add_mutually_exclusive_group(required=True)
    csrc.add_argument("--input", nargs="+",
                      help="corpus parquet paths/globs (doc_id, lang, text)")
    csrc.add_argument("--sf-dir", help="testdata dir (documents table)")
    c.add_argument("--out", required=True, help="shard output directory")
    c.add_argument("--shards", type=int, default=8)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--format", choices=["parquet", "jsonl"], default="parquet",
                   dest="file_format")
    c.add_argument("--weights", default=None,
                   help='per-language mix weights as JSON, e.g. \'{"en": 2.0}\'')
    c.add_argument("--default-weight", type=float, default=1.0)
    c.add_argument("--min-tokens", type=int, default=5)
    c.add_argument("--langs", default="en",
                   help="comma-separated language allowlist (default: en)")
    c.add_argument("--length-pct-max", type=float, default=None,
                   help="drop docs above this token-count percentile (e.g. 0.99)")
    c.add_argument("--source-cap", type=int, default=None,
                   help="keep at most this many docs per source (seeded "
                        "deterministic per-source quota)")
    c.add_argument("--ppl-max", type=float, default=None,
                   help="drop docs above this bigram-LM perplexity")
    c.add_argument("--checkpoint-dir", default=None,
                   help="funnel-level resume: persist each curation "
                        "stage's survivor ids here; a rerun resumes at "
                        "the last completed stage")
    c.add_argument("--strip-spans-window", type=int, default=None,
                   help="also strip duplicated token windows of this size")
    c.add_argument("--embeddings", nargs="+", default=None,
                   help="parquet paths/globs of (doc_id, embedding) rows: "
                        "adds the semantic near-dup stage")
    c.add_argument("--semantic-threshold", type=float, default=None,
                   help="cosine threshold for the semantic stage "
                        "(with --embeddings; default 0.98)")
    c.add_argument("--decontam-test", nargs="+", default=None,
                   help="parquet paths/globs of held-out benchmark docs "
                        "(doc_id, text): adds train/test decontamination")
    c.add_argument("--decontam-ngram", type=int, default=None,
                   help="shared-n-gram size for decontamination "
                        "(with --decontam-test; default 8)")
    c.add_argument("--decontam-max-hits", type=int, default=None,
                   help="max tolerated shared n-grams before a doc is "
                        "dropped (with --decontam-test; default 0)")
    cbpe = c.add_mutually_exclusive_group()
    cbpe.add_argument("--bpe-merges", type=int, default=None,
                      help="train a BPE tokenizer on the curated stream and "
                           "write token shards instead of text")
    cbpe.add_argument("--bpe-model", default=None,
                      help="encode with this persisted tokenizer instead")
    c.add_argument("--no-resume", action="store_true")
    c.add_argument("--num-cpus", type=int, default=None)

    d = sub.add_parser(
        "dedup",
        help="filter a corpus increment against a persisted dedup index "
             "(exact md5 by default, --near for minhash signatures); "
             "survivors are appended to the index as a new generation",
    )
    dsrc = d.add_mutually_exclusive_group(required=True)
    dsrc.add_argument("--input", nargs="+",
                      help="increment parquet paths/globs (doc_id, text)")
    dsrc.add_argument("--sf-dir", help="testdata dir (documents table)")
    d.add_argument("--index", required=True, dest="index_dir",
                   help="persisted index directory (created on first use; "
                        "structural params pinned there)")
    d.add_argument("--near", action="store_true",
                   help="minhash near-dup mode instead of exact md5")
    d.add_argument("--partitions", type=int, default=None,
                   help="index hash partitions (pinned at creation; "
                        "default 16 exact / 32 near)")
    d.add_argument("--exact-threshold", type=int, default=None,
                   help="exact mode: max indexed digests before the "
                        "seen-set switches to a Bloom filter")
    d.add_argument("--fpp", type=float, default=None,
                   help="exact mode: Bloom false-positive rate")
    d.add_argument("--num-perm", type=int, default=None,
                   help="near mode: minhash permutations (pinned)")
    d.add_argument("--bands", type=int, default=None,
                   help="near mode: LSH bands (pinned)")
    d.add_argument("--shingle-k", type=int, default=None,
                   help="near mode: shingle size (pinned)")
    d.add_argument("--threshold", type=float, default=None,
                   help="near mode: est-Jaccard duplicate threshold")
    d.add_argument("--bloom-capacity", type=int, default=None,
                   help="near mode: Bloom sidecar capacity (pinned)")
    d.add_argument("--out", default=None,
                   help="also write the surviving ids as partitioned "
                        "parquet here ((doc_id, text_md5) exact / "
                        "(doc_id) near — join text back from the "
                        "increment). Must be a new/empty directory: the "
                        "index ingests the increment in the same run, so "
                        "a partial prior write can never be resumed")
    d.add_argument("--out-partitions", type=int, default=16,
                   help="partition count for --out (the index's own "
                        "partition count is --partitions)")
    d.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser(
        "profile",
        help="one-pass column profile of a table (counts, nulls, "
             "approx-distinct, min/max) — audit inputs before a big run",
    )
    psrc = p.add_mutually_exclusive_group(required=True)
    psrc.add_argument("--input", nargs="+", help="parquet paths/globs")
    psrc.add_argument("--sf-dir", help="testdata dir (with --table)")
    p.add_argument("--table", default=None,
                   help="table name under --sf-dir (e.g. events, documents)")
    p.add_argument("--columns", default=None,
                   help="comma-separated subset (default: every column)")
    p.add_argument("--num-cpus", type=int, default=None)

    t = sub.add_parser(
        "tokenize",
        help="train a BPE tokenizer (--train-merges + --save-model) or "
             "encode the corpus with a saved one (--model [--out DIR])",
    )
    tsrc = t.add_mutually_exclusive_group(required=True)
    tsrc.add_argument("--input", nargs="+", help="corpus parquet paths/globs")
    tsrc.add_argument("--sf-dir", help="testdata dir (documents table)")
    tmode = t.add_mutually_exclusive_group(required=True)
    tmode.add_argument("--train-merges", type=int, default=None,
                       help="learn this many merges from the corpus")
    tmode.add_argument("--model", default=None,
                       help="encode with this saved model (bpe.save_bpe_model)")
    t.add_argument("--save-model", default=None,
                   help="where to persist the trained model (with --train-merges)")
    t.add_argument("--min-count", type=int, default=None)
    t.add_argument("--max-words", type=int, default=None)
    t.add_argument("--out", default=None,
                   help="write (doc_id, input_ids, ...) shards here (with --model)")
    t.add_argument("--partitions", type=int, default=None)
    t.add_argument("--no-resume", action="store_true")
    t.add_argument("--num-cpus", type=int, default=None)

    args = parser.parse_args(argv)

    if args.cmd == "tokenize":
        # a flag for the OTHER mode must error, not silently no-op
        # (e.g. --train-merges with --out would print training stats
        # and exit 0 without ever writing the output directory)
        if args.train_merges is not None:
            bad = [n for n, v in (("--out", args.out),
                                  ("--partitions", args.partitions),
                                  ("--no-resume", args.no_resume or None))
                   if v is not None]
        else:
            bad = [n for n, v in (("--save-model", args.save_model),
                                  ("--min-count", args.min_count),
                                  ("--max-words", args.max_words))
                   if v is not None]
            if args.out is None:
                # stats-only submode: shard-writing flags would no-op
                # (distinct message from the cross-mode one below — these
                # flags DO apply to --model mode, just not without --out)
                need_out = [n for n, v in (("--partitions", args.partitions),
                                           ("--no-resume", args.no_resume or None))
                            if v is not None]
                if need_out and not bad:
                    parser.error(
                        f"{', '.join(need_out)} require(s) --out "
                        "(shard-writing mode); without --out, --model "
                        "only prints stats"
                    )
        if bad:
            mode = "--train-merges" if args.train_merges is not None else "--model"
            parser.error(f"{', '.join(bad)} do(es) not apply to {mode} mode")

    if args.cmd == "profile":
        # pure argument validation — before Ray ever starts
        if args.sf_dir and not args.table:
            parser.error("--sf-dir requires --table (which table to profile)")
        if args.input and args.table:
            parser.error("--table only applies to --sf-dir")

    if args.cmd == "dedup":
        # a flag for the OTHER mode must error, not silently no-op
        near_only = [n for n, v in (("--num-perm", args.num_perm),
                                    ("--bands", args.bands),
                                    ("--shingle-k", args.shingle_k),
                                    ("--threshold", args.threshold),
                                    ("--bloom-capacity", args.bloom_capacity))
                     if v is not None]
        exact_only = [n for n, v in (("--exact-threshold",
                                      args.exact_threshold),
                                     ("--fpp", args.fpp))
                      if v is not None]
        if args.near and exact_only:
            parser.error(f"{', '.join(exact_only)} do(es) not apply to "
                         "--near mode")
        if not args.near and near_only:
            parser.error(f"{', '.join(near_only)} require(s) --near")
        if args.out_partitions < 1:
            parser.error("--out-partitions must be >= 1")
        if args.out is not None:
            import os as _os

            if not args.out:
                # "" would make the truthy write checks below silently
                # skip the write AFTER the index ingested the increment
                parser.error("--out must be a non-empty path")
            if _os.path.exists(args.out) and (
                not _os.path.isdir(args.out) or _os.listdir(args.out)
            ):
                # loud, BEFORE the index ingests the increment: after
                # that, survivors recompute as 0 and a partial prior
                # write could never be completed — refusing up front is
                # the only honest behavior (a plain FILE at the path
                # would otherwise only crash the sink's makedirs, too
                # late)
                parser.error(
                    f"--out {args.out} exists and is not an empty "
                    "directory; the survivor write is not resumable "
                    "(pick a fresh directory per increment)"
                )

    if args.cmd == "curate":
        # pure argument validation — before Ray ever starts
        if args.weights is not None:
            try:
                args.weights = json.loads(args.weights)
            except ValueError as exc:
                parser.error(f"--weights is not valid JSON: {exc}")
            if not isinstance(args.weights, dict):
                parser.error(
                    "--weights must be a JSON object, e.g. '{\"en\": 2.0}'"
                )
        if args.source_cap is not None and args.source_cap < 1:
            parser.error("--source-cap must be >= 1")
        if args.length_pct_max is not None and not (
            0.0 < args.length_pct_max <= 1.0
        ):
            # e.g. 99 instead of 0.99 — fail at parse time, not after
            # the quality scan
            parser.error("--length-pct-max must be in (0, 1] (a percentile)")
        # stage-tuning flags must error without their stage's dataset
        # flag, not silently no-op
        if args.embeddings is None and args.semantic_threshold is not None:
            parser.error("--semantic-threshold requires --embeddings")
        if args.semantic_threshold is not None and not (
            0.0 < args.semantic_threshold <= 1.0
        ):
            # e.g. 95 instead of 0.95 would make the stage a silent no-op
            parser.error("--semantic-threshold must be in (0, 1] (a cosine)")
        if args.decontam_test is None:
            bad = [n for n, v in (("--decontam-ngram", args.decontam_ngram),
                                  ("--decontam-max-hits",
                                   args.decontam_max_hits))
                   if v is not None]
            if bad:
                parser.error(f"{', '.join(bad)} require(s) --decontam-test")
        if args.decontam_ngram is not None and args.decontam_ngram < 1:
            # 0 degenerates the gram builder into 1-gram over-dropping
            parser.error("--decontam-ngram must be >= 1")
        from .pipelines.text import LANG_MARKERS

        args.langs = tuple(
            s.strip() for s in args.langs.split(",") if s.strip()
        )
        unsupported = sorted(set(args.langs) - set(LANG_MARKERS))
        if unsupported:
            parser.error(
                f"--langs {unsupported} unsupported; known: "
                f"{sorted(LANG_MARKERS)}"
            )

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.cmd == "export":
        from .pipelines.registry import queries
        from .stages.parquet_sink import write_partitioned_parquet

        reg = queries()
        if args.query not in reg:
            print(json.dumps({"error": f"unknown query {args.query!r}",
                              "available": sorted(reg)}))
            ray.shutdown()
            return 2
        result = reg[args.query](args.sf_dir)
        if args.range_partition:
            from .stages.parquet_sink import write_range_partitioned_parquet

            summary = write_range_partitioned_parquet(
                result, args.out, args.key,
                num_partitions=args.partitions, resume=not args.no_resume,
                file_format=args.file_format,
            )
        else:
            summary = write_partitioned_parquet(
                result, args.out, args.key,
                num_partitions=args.partitions, resume=not args.no_resume,
                file_format=args.file_format,
            )
        print(json.dumps({"query": args.query, "out_dir": args.out, **summary}))
        ray.shutdown()
        return 0

    if args.cmd == "tokenize":
        import ray.data

        from .pipelines import bpe as bpe_mod
        from .sources.tables import read_table

        if args.sf_dir:
            ds = read_table(args.sf_dir, "documents", columns=["doc_id", "text"])
        else:
            ds = ray.data.read_parquet(args.input)
        if args.train_merges is not None:
            model = bpe_mod.train_bpe(
                args.sf_dir or "",
                num_merges=args.train_merges,
                min_count=args.min_count or 1,
                max_words=args.max_words or 1_000_000,
                ds=ds,
            )
            out = {
                "merges": len(model["merges"]),
                "vocab": len(model["vocab"]),
                "n_words": model["n_words"],
                "truncated": model["truncated"],
            }
            if args.save_model:
                bpe_mod.save_bpe_model(model, args.save_model)
                out["model_path"] = args.save_model
            print(json.dumps(out))
        else:
            from .stages.parquet_sink import write_partitioned_parquet

            model = bpe_mod.load_bpe_model(args.model)
            enc = bpe_mod.bpe_encode(args.sf_dir or "", model, ds=ds)
            if args.out:
                summary = write_partitioned_parquet(
                    enc, args.out, "doc_id",
                    num_partitions=args.partitions or 16,
                    resume=not args.no_resume,
                )
                print(json.dumps({"model": args.model, "out_dir": args.out,
                                  **summary}))
            else:
                # distributed aggregate — never per-doc rows on the driver
                # (sum() yields None entries on a zero-row corpus)
                totals = enc.sum(["n_pieces", "n_unk"]) or {}
                print(json.dumps({
                    "model": args.model,
                    "n_pieces": int(totals.get("sum(n_pieces)") or 0),
                    "n_unk": int(totals.get("sum(n_unk)") or 0),
                }))
        ray.shutdown()
        return 0

    if args.cmd == "shard":
        import ray.data

        from .pipelines.shards import write_training_shards
        from .sources.tables import read_table

        if args.sf_dir:
            ds = read_table(args.sf_dir, "documents")
        else:
            ds = ray.data.read_parquet(args.input)
        summary = write_training_shards(
            ds, args.out, id_col=args.id_col, n_shards=args.shards,
            seed=args.seed, resume=not args.no_resume,
            file_format=args.file_format,
        )
        print(json.dumps({"out_dir": args.out, "seed": args.seed, **summary}))
        ray.shutdown()
        return 0

    if args.cmd == "dedup":
        import ray.data

        from .pipelines import dedup as dedup_mod
        from .sources.tables import read_table

        if args.sf_dir:
            ds = read_table(args.sf_dir, "documents", columns=["doc_id", "text"])
        else:
            ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
        n_input = ds.count()
        kwargs = {
            k: v
            for k, v in (
                ("num_partitions", args.partitions),
                ("exact_threshold", args.exact_threshold),
                ("fpp", args.fpp),
                ("num_perm", args.num_perm),
                ("bands", args.bands),
                ("shingle_k", args.shingle_k),
                ("threshold", args.threshold),
                ("bloom_capacity", args.bloom_capacity),
            )
            if v is not None
        }
        fn = (dedup_mod.incremental_minhash_dedup if args.near
              else dedup_mod.incremental_exact_dedup)
        survivors = fn(None, args.index_dir, ds=ds, **kwargs)
        if args.out:
            # near mode returns a lazy dataset — pin it so count() and
            # the write below don't each re-run its shuffle
            survivors = survivors.materialize()
        out = {
            "mode": "near" if args.near else "exact",
            "index_dir": args.index_dir,
            "input": int(n_input),
            "survivors": int(survivors.count()),
        }
        if args.out:
            if out["survivors"] == 0:
                # the sink refuses zero-row unknown-schema writes by
                # design; an empty increment is a normal outcome here
                out["write"] = {"written": [], "skipped": [], "n_rows": 0,
                                "note": "no survivors — nothing written"}
            else:
                from .stages.parquet_sink import write_partitioned_parquet

                out["write"] = write_partitioned_parquet(
                    survivors, args.out, "doc_id",
                    num_partitions=args.out_partitions,
                )
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if args.cmd == "curate":
        import ray.data

        from .pipelines.curate import prepare_training_data

        kwargs = {}
        if args.source_cap is not None:
            kwargs["source_cap"] = args.source_cap
        if args.checkpoint_dir is not None:
            kwargs["checkpoint_dir"] = args.checkpoint_dir
        if args.input:
            cols = ["doc_id", "lang", "text"]
            if args.source_cap is not None:
                cols.append("source")
            kwargs["ds"] = ray.data.read_parquet(args.input, columns=cols)
        if args.embeddings is not None:
            kwargs["embeddings_ds"] = ray.data.read_parquet(
                args.embeddings, columns=["doc_id", "embedding"]
            )
            if args.semantic_threshold is not None:
                kwargs["semantic_threshold"] = args.semantic_threshold
        if args.decontam_test is not None:
            kwargs["decontam_test_ds"] = ray.data.read_parquet(
                args.decontam_test, columns=["doc_id", "text"]
            )
            if args.decontam_ngram is not None:
                kwargs["decontam_ngram"] = args.decontam_ngram
            if args.decontam_max_hits is not None:
                kwargs["decontam_max_hits"] = args.decontam_max_hits
        summary = prepare_training_data(
            args.sf_dir,
            args.out,
            weights=args.weights,
            default_weight=args.default_weight,
            n_shards=args.shards,
            seed=args.seed,
            resume=not args.no_resume,
            strip_spans_window=args.strip_spans_window,
            bpe_merges=args.bpe_merges,
            bpe_model_path=args.bpe_model,
            shard_file_format=args.file_format,
            min_tokens=args.min_tokens,
            langs=args.langs,
            length_pct_max=args.length_pct_max,
            ppl_max=args.ppl_max,
            **kwargs,
        )
        print(json.dumps({"out_dir": args.out, "seed": args.seed, **summary}))
        ray.shutdown()
        return 0

    if args.cmd == "profile":
        import ray.data

        from .stages.profile import profile_table
        from .sources.tables import read_table

        cols = ([s for s in args.columns.split(",") if s]
                if args.columns else None)
        if args.sf_dir:
            ds = read_table(args.sf_dir, args.table, columns=cols)
        else:
            ds = ray.data.read_parquet(args.input, columns=cols)
        prof = profile_table(ds, columns=cols)
        print(json.dumps(prof.to_pylist()))
        ray.shutdown()
        return 0

    if getattr(args, "workbook", None):
        if args.specs:
            # generic path: ANY workbook + a declarative config binding
            # specs/lookups/header to its sheets
            from .pipelines.workbook import build_workbook

            summary = build_workbook(
                args.workbook, args.specs, args.out,
                num_partitions=args.partitions, resume=not args.no_resume,
            )
        else:
            from .pipelines.chills import build_chills_from_workbook

            summary = build_chills_from_workbook(
                args.workbook, args.out,
                num_partitions=args.partitions, resume=not args.no_resume,
            )
        if args.validate:
            from .stages.validate import validate_turtle_dir

            summary["validation"] = validate_turtle_dir(args.out)
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    from .pipelines.kg import kg_build
    from .sources.corpus import corpus_from_documents

    if args.sf_dir:
        corpus = corpus_from_documents(args.sf_dir)
    else:
        import ray.data

        corpus = ray.data.read_parquet(
            args.input, columns=["repo", "path", "commit", "lang", "content"]
        )

    specs = None
    if args.specs:
        from .stages.spec_config import load_specs

        specs = load_specs(args.specs)

    summary = kg_build(
        corpus, args.out, num_partitions=args.partitions,
        resume=not args.no_resume, specs=specs,
    )
    if args.validate:
        from .stages.validate import validate_turtle_dir

        summary["validation"] = validate_turtle_dir(args.out)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
