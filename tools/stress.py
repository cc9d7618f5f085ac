#!/usr/bin/env python3
"""Reproducible large-corpus stress runs (the BASELINE.md numbers).

Replicates the sf0.1 documents table N× with offset ids (every replica
an exact duplicate of its base doc — deterministic, no external data)
and drives one named pipeline over the result, reporting wall time,
throughput and driver max RSS as ONE JSON line. This is the committed
form of the ad-hoc scripts behind the "2,000,000-doc … stress" entries
in BASELINE.md — rerunnable by anyone, not just the session that
produced them.

  python tools/stress.py bpe        # train_bpe + bpe_encode
  python tools/stress.py curate     # curate_corpus funnel
  python tools/stress.py decontam   # decontaminate_pair (100-doc test set)
  python tools/stress.py quantiles  # exact_float_quantiles over a derived
                                    # float column (replicated events)
  python tools/stress.py cap        # cap_per_stratum per-source quota
                                    # (closed-form survivor invariant;
                                    # exits nonzero if violated)
  python tools/stress.py knn        # all-docs k-NN graph over replicated
                                    # embeddings (closed-form same-base
                                    # edge invariant; exits nonzero)
  python tools/stress.py spans      # substring dup-span strip (replicas
                                    # duplicate every window -> closed-
                                    # form full-strip invariant)
  python tools/stress.py incdedup   # incremental dedup vs a persisted
                                    # index: fresh index -> n_base
                                    # survivors, all-dup Bloom-path
                                    # increment -> exactly 0
  --replicas 400 --sf-dir /root/testdata/sf0.1 --num-cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# driver sys.path does NOT propagate to Ray workers — without PYTHONPATH
# a run started outside the repo hangs forever while workers retry
# deserializing map_batches functions (the CLAUDE.md gotcha). Must be
# set BEFORE ray.init so spawned workers inherit it.
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _REPO
)


def replicated_documents(sf_dir: str, replicas: int):
    """(doc_id, text) Dataset: documents × replicas, ids offset per
    replica (same scheme as the BASELINE.md stress entries)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_base = base.num_rows
    base_ref = ray.put(
        {
            "doc_id": base.column("doc_id").to_numpy(),
            "text": base.column("text").to_pylist(),
        }
    )

    def gen(batch):
        b = ray.get(base_ref)
        gids = batch["id"].astype(np.int64)
        pos = (gids % n_base).astype(np.int64)
        rep = gids // n_base
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"][pos] + rep * 1_000_000, pa.int64()),
                "text": pa.array([b["text"][p] for p in pos.tolist()], pa.string()),
            }
        )

    return (
        ray.data.range(n_base * replicas, override_num_blocks=replicas)
        .map_batches(gen, batch_format="numpy"),
        n_base * replicas,
    )


def run_bpe(sf_dir: str, replicas: int) -> dict:
    import pyarrow as pa

    from mhdb_tables2turtles_ray.pipelines import bpe

    ds, n_docs = replicated_documents(sf_dir, replicas)
    t0 = time.time()
    model = bpe.train_bpe(sf_dir, num_merges=200, ds=ds)
    t_train = time.time() - t0
    ds2, _ = replicated_documents(sf_dir, replicas)
    t0 = time.time()
    enc = bpe.bpe_encode(sf_dir, model, concurrency=(1, 30), ds=ds2)
    tot = enc.map_batches(
        lambda t: pa.table(
            {
                "n": [t.column("n_pieces").to_numpy().sum()],
                "u": [t.column("n_unk").to_numpy().sum()],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas().sum()
    t_enc = time.time() - t0
    base_model = bpe.train_bpe(sf_dir, num_merges=200)
    return {
        "train_sec": round(t_train, 1),
        "train_docs_per_sec": round(n_docs / t_train),
        "encode_sec": round(t_enc, 1),
        "encode_docs_per_sec": round(n_docs / t_enc),
        "n_pieces": int(tot["n"]),
        "n_unk": int(tot["u"]),
        "merges": len(model["merges"]),
        "replica_invariant": base_model["merges"] == model["merges"],
    }


def run_curate(sf_dir: str, replicas: int) -> dict:
    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    ds, n_docs = replicated_documents(sf_dir, replicas)
    t0 = time.time()
    survivors, funnel = curate_corpus(None, ds=ds, langs=("en", "de", "fr"))
    n_surv = survivors.count()
    dt = time.time() - t0
    return {
        "sec": round(dt, 1),
        "docs_per_sec": round(n_docs / dt),
        "funnel": funnel,
        "survivors": int(n_surv),
    }


def run_curate_resume(sf_dir: str, replicas: int) -> dict:
    """Funnel-checkpoint resume at stress scale: full checkpointed run,
    then the final (near-dedup) generation is deleted — simulating a
    kill during the most expensive stage — and the rerun must resume
    from the exact-dedup boundary with an IDENTICAL survivor set.
    Reports both wall times; the resume run skips the quality scan and
    the digest dedup entirely."""
    import shutil
    import tempfile

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    ckpt = tempfile.mkdtemp(prefix="funnel_ck_", dir="/tmp")
    try:
        ds, n_docs = replicated_documents(sf_dir, replicas)
        t0 = time.time()
        survivors, funnel = curate_corpus(
            None, ds=ds, langs=("en", "de", "fr"), checkpoint_dir=ckpt
        )
        ids_full = sorted(r["doc_id"] for r in survivors.take_all())
        t_full = time.time() - t0

        shutil.rmtree(f"{ckpt}/02_after_near_dedup")
        ds2, _ = replicated_documents(sf_dir, replicas)
        t1 = time.time()
        survivors2, funnel2 = curate_corpus(
            None, ds=ds2, langs=("en", "de", "fr"), checkpoint_dir=ckpt
        )
        ids_resumed = sorted(r["doc_id"] for r in survivors2.take_all())
        t_resume = time.time() - t1
        return {
            "sec_full": round(t_full, 1),
            "sec_resume": round(t_resume, 1),
            "docs_per_sec_full": round(n_docs / t_full),
            "resumed_stages": funnel2["resumed_stages"],
            "funnel": funnel,
            "survivors": len(ids_full),
            "exact": ids_full == ids_resumed
            and all(
                funnel[k] == funnel2[k]
                for k in funnel
                if k != "resumed_stages"
            ),
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def run_decontam(sf_dir: str, replicas: int) -> dict:
    import pyarrow.parquet as pq
    import ray

    from mhdb_tables2turtles_ray.pipelines.text import decontaminate_pair

    ds, n_docs = replicated_documents(sf_dir, replicas)
    test = ray.data.from_arrow(
        pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).slice(0, 100)
    )
    t0 = time.time()
    n_bad = decontaminate_pair(ds, test, n=5).count()
    dt = time.time() - t0
    return {
        "sec": round(dt, 1),
        "docs_per_sec": round(n_docs / dt),
        "contaminated": int(n_bad),
    }


def run_quantiles(sf_dir: str, replicas: int) -> dict:
    import numpy as np
    import pyarrow as pa

    from mhdb_tables2turtles_ray.stages.quantiles import exact_float_quantiles

    ds, n_docs = replicated_documents(sf_dir, replicas)

    # derive a heavy-tailed float from the text lengths (deterministic)
    def to_float(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.utf8_length(pc.coalesce(t.column("text"), "")).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        return pa.table({"v": pa.array(np.exp(n / 1000.0), pa.float64())})

    fds = ds.map_batches(to_float, batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    qs = exact_float_quantiles(fds, "v", (0.5, 0.9, 0.99))
    dt = time.time() - t0
    return {
        "sec": round(dt, 1),
        "rows_per_sec": round(n_docs / dt),
        "quantiles": {str(k): v for k, v in qs.items()},
    }


def run_incdedup(sf_dir: str, replicas: int) -> dict:
    """Incremental exact dedup against a persisted index, with
    closed-form invariants at every step. Increment 1 (the replicated
    corpus) hits a FRESH index: within-batch dedup must keep exactly
    one survivor per DISTINCT base text (replicas share their base
    doc's md5, and the base corpus itself carries a few exact dups —
    the expected count is the base table's distinct-digest count,
    computed on the driver from the 5,000-row base). Increment 2 (the same corpus re-replicated under fresh ids)
    probes the now-populated index through the BLOOM path
    (exact_threshold=0 forces it): every doc is genuinely indexed, and
    a Bloom filter has no false negatives, so survivors must be
    EXACTLY 0 — deterministic, no fpp caveat (false positives only
    ever drop new docs, and there are none). Exits nonzero on
    violation."""
    import hashlib as _hashlib
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.dedup import incremental_exact_dedup

    index_dir = tempfile.mkdtemp(prefix="incdedup_ix_", dir="/tmp")
    try:
        base_texts = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["text"]
        ).column("text").to_pylist()
        n_distinct = len(
            {_hashlib.md5((x or "").encode()).hexdigest() for x in base_texts}
        )
        ds1, n_docs = replicated_documents(sf_dir, replicas)
        t0 = time.time()
        surv1 = incremental_exact_dedup(None, index_dir, ds=ds1)
        n1 = surv1.count()
        t_first = time.time() - t0

        # fresh ids far above increment 1's id space
        off = (replicas + 1) * 1_000_000

        def shift(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                pa.array(t.column("doc_id").to_numpy() + off, pa.int64()),
            )

        ds2, _ = replicated_documents(sf_dir, replicas)
        ds2 = ds2.map_batches(shift, batch_format="pyarrow", zero_copy_batch=True)
        t1 = time.time()
        surv2 = incremental_exact_dedup(
            None, index_dir, ds=ds2, exact_threshold=0
        )
        n2 = surv2.count()
        t_second = time.time() - t1
        return {
            "sec_first": round(t_first, 1),
            "sec_second_bloom": round(t_second, 1),
            "docs_per_sec_first": round(n_docs / t_first),
            "docs_per_sec_second": round(n_docs / t_second),
            "survivors_first": int(n1),
            "expected_first": int(n_distinct),
            "survivors_second": int(n2),
            "expected_second": 0,
            "exact": int(n1) == n_distinct and int(n2) == 0,
        }
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def run_spans(sf_dir: str, replicas: int) -> dict:
    """Substring (dup-span) dedup over the replicated corpus, with a
    closed-form exactness invariant. Every replica is an exact copy of
    its base doc, so EVERY `window`-token window occurs >= replicas >=
    min_count times — strip_duplicate_spans must therefore cut a doc
    with >= window tokens to "" (n_tokens_removed = its full token
    count) and leave a doc with < window tokens untouched (no window
    exists). Verified per-row, distributed (one audit map; the corpus
    never materializes on the driver). Exits nonzero on violation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from mhdb_tables2turtles_ray.pipelines.dedup import strip_duplicate_spans
    from mhdb_tables2turtles_ray.pipelines.text import whitespace_token_count

    window = 16
    if replicas < 2:
        raise SystemExit("spans stress needs --replicas >= 2 (= min_count)")
    base = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = base.column("doc_id").to_numpy()
    # the engine's OWN count kernel on both sides of the invariant —
    # tokenizer parity by construction, and vectorized (the audit is
    # half the harness wall time; a Python split() loop here doubled it)
    toks = whitespace_token_count(base.column("text"))
    order = np.argsort(ids)
    base_ref = ray.put({"ids": ids[order], "toks": toks[order]})

    ds, n_docs = replicated_documents(sf_dir, replicas)
    t0 = time.time()
    stripped = strip_duplicate_spans(None, window=window, ds=ds)

    def audit(t: pa.Table) -> pa.Table:
        b = ray.get(base_ref)
        did = t.column("doc_id").to_numpy() % 1_000_000
        exp = b["toks"][np.searchsorted(b["ids"], did)]
        out_tok = whitespace_token_count(t.column("text"))
        rem = t.column("n_tokens_removed").to_numpy()
        strip = exp >= window
        bad = int(
            (
                (strip & ((out_tok != 0) | (rem != exp)))
                | (~strip & ((out_tok != exp) | (rem != 0)))
            ).sum()
        )
        return pa.table(
            {
                "rows": [len(did)],
                "bad": [bad],
                "removed": [int(rem.sum())],
                "out_tok": [int(out_tok.sum())],
            }
        )

    tot = stripped.map_batches(
        audit, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas().sum()
    dt = time.time() - t0
    exp_removed = int(toks[toks >= window].sum()) * replicas
    exp_out = int(toks[toks < window].sum()) * replicas
    return {
        "sec": round(dt, 1),
        "docs_per_sec": round(n_docs / dt),
        "rows": int(tot["rows"]),
        "bad_rows": int(tot["bad"]),
        "tokens_removed": int(tot["removed"]),
        "expected_removed": exp_removed,
        "tokens_out": int(tot["out_tok"]),
        "expected_out": exp_out,
        "exact": (
            int(tot["bad"]) == 0
            and int(tot["rows"]) == n_docs
            and int(tot["removed"]) == exp_removed
            and int(tot["out_tok"]) == exp_out
        ),
    }


def run_knn(sf_dir: str, replicas: int) -> dict:
    """All-docs k-NN graph over the replicated embeddings table, with a
    closed-form exactness invariant. Each base vector is replicated
    `replicas`× with ids offset by rep × 1e6 — identical float bytes, so
    every replica lands in the same IVF home cluster and each query's
    true top-k are its own sibling replicas at cosine 1.0. Provided the
    base table's max off-diagonal cosine rounds below 1.0 at 6 decimals
    (checked) and k ≤ replicas − 1, the graph must contain EXACTLY
    n × k edges, every edge same-base (neighbor ≡ query mod 1e6) at
    cosine 1.0 — verified distributed (one count map, no driver edge
    materialization). Exits nonzero on violation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from mhdb_tables2turtles_ray.pipelines.similarity import knn_graph

    k = 5
    if replicas < k + 1:
        raise SystemExit("knn stress needs --replicas > k=5 for the invariant")

    base = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n_base = base.num_rows
    ids = base.column("vec_id").to_numpy()
    emb = np.array(base.column("embedding").to_pylist(), dtype=np.float64)
    if ids.max() >= 1_000_000 or len(np.unique(ids)) != n_base:
        raise SystemExit(f"{sf_dir}: vec_ids unfit for the ×1e6 offset scheme")
    # precondition of the closed form: no two DISTINCT base vectors may
    # tie a replica's 1.0 cosine after the 6-decimal round
    nrm = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    gram = nrm @ nrm.T
    np.fill_diagonal(gram, -1.0)
    if gram.max() >= 0.9999995:
        raise SystemExit(
            f"{sf_dir}: base vectors too parallel (max cos {gram.max():.8f})"
            " — the same-base invariant does not apply to this corpus"
        )
    base_ref = ray.put({"vec_id": ids, "emb": emb})

    def gen(batch):
        b = ray.get(base_ref)
        gids = batch["id"].astype(np.int64)
        pos = (gids % n_base).astype(np.int64)
        rep = gids // n_base
        return pa.table(
            {
                "vec_id": pa.array(
                    b["vec_id"][pos] + rep * 1_000_000, pa.int64()
                ),
                "embedding": pa.array(
                    list(b["emb"][pos]), pa.list_(pa.float64())
                ),
            }
        )

    n_vecs = n_base * replicas
    ds = ray.data.range(n_vecs, override_num_blocks=replicas).map_batches(
        gen, batch_format="numpy"
    )
    t0 = time.time()
    graph = knn_graph(k=k, n_clusters=64, nprobe=2, ds=ds)

    def audit(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy()
        nb = t.column("neighbor_id").to_numpy()
        cos = t.column("cosine").to_numpy()
        bad = int(((q % 1_000_000) != (nb % 1_000_000)).sum()) + int(
            (cos != 1.0).sum()
        )
        return pa.table({"edges": [len(q)], "bad": [bad]})

    tot = graph.map_batches(
        audit, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas().sum()
    dt = time.time() - t0
    n_edges, n_bad = int(tot["edges"]), int(tot["bad"])
    return {
        "sec": round(dt, 1),
        "vecs_per_sec": round(n_vecs / dt),
        "n_vectors": n_vecs,
        "edges": n_edges,
        "expected_edges": n_vecs * k,
        "bad_edges": n_bad,
        "exact": n_edges == n_vecs * k and n_bad == 0,
    }


def run_cap(sf_dir: str, replicas: int) -> dict:
    """Per-source cap over the replicated corpus. Source =
    doc_id % 20000; the replica offset (1e6) is a multiple of 20000, so
    every base doc's replicas share its source: exactly
    n_base distinct sources × `replicas` members each. With cap=50 the
    survivor count is therefore EXACT (n_base × min(replicas, 50)) —
    a deterministic at-scale correctness check, not just a timing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from mhdb_tables2turtles_ray.pipelines.shards import cap_per_stratum

    import numpy as np
    import pyarrow.parquet as pq

    ds, n_docs = replicated_documents(sf_dir, replicas)
    n_base = n_docs // replicas
    cap = 50

    # precondition of the closed form: base ids distinct mod 20000 — a
    # colliding --sf-dir would otherwise report a spurious pipeline
    # failure (harness-assumption failure must be distinguishable)
    base_ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_numpy()
    if len(np.unique(base_ids % 20_000)) != n_base:
        raise SystemExit(
            f"{sf_dir}: base doc_ids collide mod 20000 — the cap "
            "stress's closed-form invariant does not apply to this corpus"
        )

    def add_source(t: pa.Table) -> pa.Table:
        mod = t.column("doc_id").to_numpy() % 20_000
        sid = pc.cast(pa.array(mod, pa.int64()), pa.string())
        return pa.table({"doc_id": t.column("doc_id"), "source": sid})

    keyed = ds.map_batches(
        add_source, batch_format="pyarrow", zero_copy_batch=True
    )
    t0 = time.time()
    surv = cap_per_stratum(keyed, "source", cap, seed=42).materialize()
    n_surv = surv.count()
    dt = time.time() - t0
    df = surv.to_pandas()  # bounded: n_base × cap rows
    per_source = df.groupby("source")["doc_id"].count()
    expect = n_base * min(replicas, cap)
    max_per = int(per_source.max()) if len(per_source) else 0
    # exact = the FULL invariant, not just the total (compensating
    # per-source violations must not pass)
    exact = (
        n_surv == expect
        and int(per_source.size) == n_base
        and max_per == min(replicas, cap)
    )
    return {
        "sec": round(dt, 1),
        "rows_per_sec": round(n_docs / dt),
        "survivors": int(n_surv),
        "expected": int(expect),
        "exact": bool(exact),
        "n_sources": int(per_source.size),
        "max_per_source": max_per,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("which",
                    choices=["bpe", "curate", "curate_resume", "decontam",
                             "quantiles", "cap", "knn", "spans",
                             "incdedup"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=400)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    fn = {
        "bpe": run_bpe,
        "curate": run_curate,
        "curate_resume": run_curate_resume,
        "decontam": run_decontam,
        "quantiles": run_quantiles,
        "cap": run_cap,
        "knn": run_knn,
        "spans": run_spans,
        "incdedup": run_incdedup,
    }[args.which]
    out = fn(args.sf_dir, args.replicas)
    out["which"] = args.which
    out["replicas"] = args.replicas
    out["driver_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )
    print(json.dumps(out))
    ray.shutdown()
    # entries with a closed-form invariant (cap) report exact; a
    # violation must fail the process, not just flip a JSON field
    return 0 if out.get("exact", True) else 1


if __name__ == "__main__":
    sys.exit(main())
