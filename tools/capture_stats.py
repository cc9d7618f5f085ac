"""Reproduce the STATS.md captures.

Runs the production kg_build (sf0.1, replicas=40) with
``include_stats=True`` and prints the executed plan's ``ds.stats()``
(the one-all-to-all evidence), then builds a fresh cluster-partitioned
IVF index and prints the probe's pruned-read stats.

Run: ``python tools/capture_stats.py`` (from /root/repo).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

if not ray.is_initialized():
    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from mhdb_tables2turtles_ray.pipelines.kg import kg_build  # noqa: E402
from mhdb_tables2turtles_ray.pipelines.similarity import (  # noqa: E402
    ann_ivf_partitioned,
    build_ivf_index,
)
from mhdb_tables2turtles_ray.sources.corpus import corpus_from_documents  # noqa: E402

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

out = "/tmp/kg_stats_capture"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
summary = kg_build(
    corpus_from_documents(SF, replicas=40), out,
    num_partitions=16, resume=False, include_stats=True,
)
print(
    f"# kg_build wall={time.time() - t0:.2f}s "
    f"n_triples={summary['n_triples']} n_subjects={summary['n_subjects']}"
)
print(summary["stats"])

idx = "/tmp/ivf_stats_capture"
shutil.rmtree(idx, ignore_errors=True)
build_ivf_index(SF, idx, n_clusters=8)
ds = ann_ivf_partitioned(SF, index_dir=idx, nprobe=2)
ds.to_pandas()
print("# ann_ivf_partitioned probe (nprobe=2):")
print(ds.stats()[:2000])

# --- curate_corpus funnel (round 4): survivors-stage stats + counts ---
from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus  # noqa: E402

t0 = time.time()
survivors, funnel = curate_corpus(SF)
n = survivors.count()
print(
    f"# curate_corpus wall={time.time() - t0:.2f}s survivors={n} "
    f"funnel={funnel}"
)
print(survivors.stats()[:3000])

ray.shutdown()
