"""mhdb_tables2turtles_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the *semantics* of
charlie42/mhdb-tables2turtles (tables → RDF Turtle) re-architected as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, designed for a 10^12-file Parquet corpus on a multi-node Ray
cluster (tested single-node).

Layout
------
- ``functions/``  pure scalar + vectorized string/literal functions
  (bit-exact ports of the reference's IRI-minting / label-casing /
  literal-formatting semantics; see reference ``mhdb/write_ttl.py``).
- ``sources/``    Parquet readers, deterministic synthetic corpus +
  vocabulary generators (no external data).
- ``stages/``     reusable Dataset stage builders: triple emission
  (EmissionSpec engine), entity linking (actor pool), dedup shuffle,
  ordered enumeration, used-prefix aggregation, Turtle materialize.
- ``state/``      broadcast helpers, per-partition lineage manifests,
  checkpointed-resume logic.
- ``pipelines/``  end-to-end pipelines: the flagship corpus→Turtle KG
  build, plus the large-scale training-data ops (dedup families,
  similarity search, text analysis, multimodal plumbing).

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` —
sessions are owned by the driver, ``bench.py``, and the test fixture.
"""

__version__ = "0.1.0"
