"""Driver-style oracle check over the REAL driver contract
(__ray_entry__): every queries() entry executes; SQL-expressible ones
are compared to their oracle_sql() via DuckDB on the same parquet —
row count, column names, order-insensitive values (the CORRECTNESS
gate the driver applies)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_sql_checked_query_matches_oracle(name, con):
    got = _to_pandas(QUERIES[name](SF_DIR))
    want = con.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    assert len(got) == len(want)
    g, w = _canon(got), _canon(want)
    # the driver's value-hash is dtype-sensitive (int64 vs float64 hash
    # differently) — pin exact dtype equality so oracle-side HUGEINT→
    # float64 artifacts (round-1's 6 red rows) fail HERE, not at verify
    assert list(g.dtypes) == list(w.dtypes), (g.dtypes.to_dict(), w.dtypes.to_dict())
    pd.testing.assert_frame_equal(g, w)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs_and_is_stable(name):
    res = _to_pandas(QUERIES[name](SF_DIR))
    assert len(res) >= 0
    assert len(res.columns) > 0


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert {"doc_id", "lang_pred", "quality_score"} <= set(df.columns)
