"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then ``entry()`` as a smoke check,
then runs each ``queries()[name](sf_dir)`` at sf=0.01 against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash). Nothing here (or in the library) calls
``ray.init``/``ray.shutdown``.

Column-name / value-determinism conventions used throughout:
- every computed column is explicitly named identically in the Ray
  pipeline and the SQL;
- floating-point aggregates are rounded at the output boundary (sum
  order differs between engines); pure int/string results are exact;
- cosine similarities are computed in float64 on both sides
  (``CAST(embedding AS DOUBLE[])`` in SQL) and rounded to 6 decimals.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMALL = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: corpus-shaped Dataset from sf0.001 documents →
    sha256 invariant → linker actor pool → EmissionSpec triple emission →
    global dedup shuffle → (subj, pred, obj) Dataset."""
    from mhdb_tables2turtles_ray.pipelines.kg import kg_from_documents

    return kg_from_documents(SF_SMALL)


def queries() -> dict[str, Callable[[str], Any]]:
    from mhdb_tables2turtles_ray.pipelines.registry import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from mhdb_tables2turtles_ray.pipelines.registry import oracle_sql as _o

    return _o()
