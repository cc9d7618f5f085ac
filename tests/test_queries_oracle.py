"""Driver-style correctness gate: every queries() entry with an oracle
is executed on Ray AND in DuckDB at sf0.001 and compared EXACTLY
(sorted columns, sorted rows, no float tolerance — mirroring the
driver's order-insensitive value-hash)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    return con


def _to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        df = result.to_pandas()
    else:
        df = pd.DataFrame(result)
    return df


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _query_names():
    import __ray_entry__ as entrymod

    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, con, sf_small, ray_session):
    import __ray_entry__ as entrymod

    ours = _canon(_to_pandas(entrymod.queries()[name](sf_small)))
    oracle = _canon(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(ours.columns) == list(oracle.columns), (
        ours.columns,
        oracle.columns,
    )
    assert len(ours) == len(oracle), (len(ours), len(oracle))
    pd.testing.assert_frame_equal(ours, oracle, check_exact=True, check_dtype=False)


def test_rows_only_queries_run(sf_small, ray_session):
    """Queries without an oracle still must run and return rows."""
    import __ray_entry__ as entrymod

    qs, sql = entrymod.queries(), entrymod.oracle_sql()
    for name in sorted(set(qs) - set(sql)):
        out = _to_pandas(qs[name](sf_small))
        assert len(out) > 0, name


def test_entry_runs(ray_session):
    import __ray_entry__ as entrymod

    ds = entrymod.entry()
    assert ds.count() > 0
    assert set(ds.schema().names) == {"subj", "pred", "obj"}
