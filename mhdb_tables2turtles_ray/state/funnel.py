"""Funnel-level checkpointed resume for the curation pipeline.

A killed 100-TB curation run must resume at the last COMPLETED funnel
stage, not restart from the raw corpus. Each stage's surviving doc-id
set is persisted as hash-partitioned parquet (riding
``stages/parquet_sink.write_partitioned_parquet``'s per-partition
atomic manifests, so even a kill MID-WRITE of a checkpoint resumes
that write) plus a ``_stage_done.json`` marker written only after the
whole generation is on disk. The funnel's parameters are pinned in
``_funnel_meta.json`` at creation — resuming with different parameters
raises instead of silently mixing generations (the same pinned-params
rule as the dedup index's ``_index_meta.json``). The INPUT half of the
purity contract is pinned too: the first stage's marker records the
corpus row count, and ``curate_corpus`` refuses a resume whose input
count differs (a checkpoint_dir pointed at a different corpus must not
return the old run's survivors).

Correctness of resume: the curation stages are deterministic pure
functions of (input, params) — md5 keeper rules, seeded LSH,
content digests — so a recomputed stage reproduces its ids exactly,
and reconstructing a stage boundary = raw input semi-joined against
the checkpointed EXACT id set (never the Bloom path: a false positive
would resurrect a dropped doc and break run-vs-resume equality).
"""

from __future__ import annotations

import glob
import json
import os

_META = "_funnel_meta.json"
_DONE = "_stage_done.json"


class FunnelCheckpoint:
    """Per-stage survivor-id generations under ``ckpt_dir``."""

    def __init__(self, ckpt_dir: str, params: dict, num_partitions: int = 16):
        # generation width: size so one partition's id file stays in the
        # tens-of-MB band (1e9 ids / 256 partitions ≈ 31 MB of int64)
        self.num_partitions = num_partitions
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)
        self._params = json.loads(json.dumps(params, sort_keys=True))
        meta_path = os.path.join(ckpt_dir, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                recorded = json.load(f)["params"]
            if recorded != self._params:
                raise ValueError(
                    "funnel checkpoint parameter mismatch: the directory "
                    f"{ckpt_dir!r} was created with {recorded!r}, resume "
                    f"requested {self._params!r} — use a fresh "
                    "checkpoint_dir for a different funnel configuration"
                )
        else:
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"params": self._params}, f, sort_keys=True)
            os.replace(tmp, meta_path)

    # --- paths -------------------------------------------------------
    def _stage_dir(self, i: int, name: str) -> str:
        return os.path.join(self.dir, f"{i:02d}_{name}")

    def _marker(self, i: int, name: str) -> str:
        return os.path.join(self._stage_dir(i, name), _DONE)

    # --- queries -----------------------------------------------------
    def complete_prefix(self, stage_plan: list[str]) -> list[str]:
        """The longest prefix of ``stage_plan`` whose markers exist —
        resume starts after its last element. Orphan markers past a
        missing stage are ignored (their stages recompute; determinism
        makes any partial partition files reusable as-is)."""
        done = []
        for i, name in enumerate(stage_plan):
            if not os.path.exists(self._marker(i, name)):
                break
            done.append(name)
        return done

    def marker_info(self, stage_plan: list[str], name: str) -> dict:
        with open(self._marker(stage_plan.index(name), name)) as f:
            return json.load(f)

    def load_ids(self, stage_plan: list[str], name: str):
        """Checkpointed id generation → (doc_id) Dataset."""
        import ray.data

        files = sorted(
            glob.glob(
                os.path.join(
                    self._stage_dir(stage_plan.index(name), name),
                    "part-*.parquet",
                )
            )
        )
        return ray.data.read_parquet(files)

    # --- writes ------------------------------------------------------
    def save(
        self,
        stage_plan: list[str],
        name: str,
        ids_ds,
        count: int,
        extra: dict | None = None,
    ) -> None:
        """Persist one stage's id generation + completion marker.
        No-op when the marker already exists (stage was resumed)."""
        from ..stages.parquet_sink import write_partitioned_parquet

        i = stage_plan.index(name)
        marker = self._marker(i, name)
        if os.path.exists(marker):
            return
        write_partitioned_parquet(
            ids_ds,
            self._stage_dir(i, name),
            key_col="doc_id",
            num_partitions=self.num_partitions,
            resume=True,
            sort_within=["doc_id"],
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": name, "n": int(count), **(extra or {})}, f)
        os.replace(tmp, marker)
