"""The primary input corpus: Parquet of source-code repositories.

Shape per BASELINE.json ``input_hint`` — exactly
``(repo: string, path: string, commit: string, lang: string, content: string)``.

Two deterministic constructions (no external data):

- :func:`corpus_from_documents` — derive a corpus-shaped Dataset from the
  driver-generated ``documents`` testdata table (doc_id/text/lang/source →
  repo/path/commit/lang/content), fully deterministic, streamed.
- :func:`synthesize_corpus` — synthesize a corpus of arbitrary size from
  ``ray.data.range`` (used for scale/bench fixtures; includes duplicate
  rows, skewed repos and adversarial strings per FIXTURES.md §A).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .tables import read_table

# Directory/file fragments used to mint deterministic paths. Include
# hyphens, digit-led names and casing to exercise the label converter.
_DIRS = ("src", "lib", "tests", "docs-site", "Tools", "3rdparty", "pkg utils")
_STEMS = ("main", "util-helpers", "Parser", "0index", "data model", "IO", "räksmörgås")
_EXTS = {"en": "py", "fr": "rs", "es": "go", "zh": "cc", "de": "ts"}


def _commit_hex(key: str) -> str:
    """Deterministic 40-char lowercase hex 'commit' for a row key."""
    return hashlib.sha1(key.encode("utf-8")).hexdigest()


def _mint_paths(ids: np.ndarray, langs: list[str]) -> list[str]:
    out = []
    for i, lang in zip(ids.tolist(), langs):
        d = _DIRS[i % len(_DIRS)]
        s = _STEMS[(i // 7) % len(_STEMS)]
        ext = _EXTS.get(lang, "txt")
        out.append(f"{d}/{s}_{i}.{ext}")
    return out


def corpus_from_documents(
    sf_dir: str, replicas: int = 1, **read_kwargs
) -> ray.data.Dataset:
    """documents.parquet → corpus-shaped Dataset, deterministically.

    repo   = f"org{doc_id % 7}/repo{doc_id % 101}"  (small cardinality →
             natural skewed groupby key)
    path   = minted nested path (unicode / spaces / hyphens / digit-led)
    commit = sha1 hex of the doc_id (stable)
    lang   = documents.lang
    content= documents.text

    ``replicas > 1`` fans every document out to that many distinct
    corpus files (ids offset per replica, content duplicated) — a
    deterministic scale-up used by the benchmark so the pipeline sees a
    corpus large enough to exercise every core.
    """
    if replicas > 1:
        # Bench-only scale-up: the (small) documents table is broadcast
        # once and row ids minted from ray.data.range — every block of
        # the range becomes an independent generation task, so the
        # replicated corpus parallelizes across all cores instead of
        # being produced inside one reader task.
        import ray

        import pyarrow.parquet as pq

        base = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        n_base = base.num_rows
        base_ref = ray.put(
            {
                "doc_id": base.column("doc_id").to_numpy(),
                "text": base.column("text").to_pylist(),
                "lang": base.column("lang").to_pylist(),
            }
        )

        def gen(batch: dict) -> pa.Table:
            b = ray.get(base_ref)
            gids = batch["id"].astype(np.int64)
            pos = (gids % n_base).astype(np.int64)
            rep = gids // n_base
            ids = b["doc_id"][pos] + rep * 1_000_000
            langs = [b["lang"][p] for p in pos.tolist()]
            return pa.table(
                {
                    "repo": pa.array(
                        [f"org{i % 7}/repo{i % 101}" for i in ids.tolist()]
                    ),
                    "path": pa.array(_mint_paths(ids, langs)),
                    "commit": pa.array([_commit_hex(f"doc-{i}") for i in ids.tolist()]),
                    "lang": pa.array(langs),
                    "content": pa.array([b["text"][p] for p in pos.tolist()]),
                }
            )

        return ray.data.range(n_base * replicas, override_num_blocks=replicas).map_batches(
            gen, batch_format="numpy"
        )

    ds = read_table(
        sf_dir, "documents", columns=["doc_id", "text", "lang"], **read_kwargs
    )

    def to_corpus(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        langs = batch.column("lang").to_pylist()
        repos = [f"org{i % 7}/repo{i % 101}" for i in ids.tolist()]
        commits = [_commit_hex(f"doc-{i}") for i in ids.tolist()]
        return pa.table(
            {
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(_mint_paths(ids, langs), pa.string()),
                "commit": pa.array(commits, pa.string()),
                "lang": batch.column("lang"),
                "content": batch.column("text"),
            }
        )

    return ds.map_batches(to_corpus, batch_format="pyarrow", zero_copy_batch=True)


def synthesize_corpus(
    n_rows: int,
    skew_repo_fraction: float = 0.0,
    dup_fraction: float = 0.01,
    payload_repeat: int = 1,
) -> ray.data.Dataset:
    """Pure synthetic corpus of ``n_rows`` (no testdata dependency).

    Deterministic function of the row id only — safe to regenerate
    identically at any parallelism. ``skew_repo_fraction`` routes that
    fraction of rows to a single hot repo (salting/skew fixtures);
    ``dup_fraction`` makes that fraction exact duplicates of earlier rows
    (dedup fixtures). ``payload_repeat`` multiplies the content size
    (wide-record fixtures — multi-KB rows per FIXTURES.md §A).
    """
    langs = list(_EXTS)

    def gen(batch: dict) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        n = len(ids)
        eff = ids.copy()
        if dup_fraction > 0:
            period = max(2, int(1 / dup_fraction))
            is_dup = (ids % period) == (period - 1)
            eff[is_dup] = ids[is_dup] // 2  # duplicate an earlier row's content
        rows_lang = [langs[int(i) % len(langs)] for i in eff]
        hot = ids % 1000 < int(skew_repo_fraction * 1000)
        repos = [
            "org0/hot-repo" if h else f"org{int(i) % 7}/repo{int(i) % 101}"
            for i, h in zip(eff, hot)
        ]
        contents = [
            " ".join(
                _STEMS[int(x) % len(_STEMS)].lower()
                for x in range(int(i) % 11, int(i) % 11 + 8 + int(i) % 23)
            )
            + f' "q{int(i) % 13}"\nline-{int(i) % 5}'
            for i in eff
        ]
        if payload_repeat > 1:
            contents = [c * payload_repeat for c in contents]
        return pa.table(
            {
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(_mint_paths(eff, rows_lang), pa.string()),
                "commit": pa.array([_commit_hex(f"row-{int(i)}") for i in eff]),
                "lang": pa.array(rows_lang, pa.string()),
                "content": pa.array(contents, pa.string()),
            }
        )

    return ray.data.range(n_rows).map_batches(gen, batch_format="numpy")


def add_content_sha256(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Append the per-row ``content`` sha256 hex column — the cross-engine
    invariant mandated by BASELINE.json (checked against DuckDB's sha256
    in the correctness gate)."""

    def _sha(batch: pa.Table) -> pa.Table:
        digests = [
            hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None
            for v in batch.column("content").to_pylist()
        ]
        return batch.append_column("content_sha256", pa.array(digests, pa.string()))

    return ds.map_batches(_sha, batch_format="pyarrow", zero_copy_batch=True)
