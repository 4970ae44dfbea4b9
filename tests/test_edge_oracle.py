"""Edge-case oracle parity: every documents-only SQL-checked query runs
on a handcrafted adversarial corpus (empty text, whitespace-only,
single-word, unicode incl. non-ASCII words, shared shingles, unknown
language) and must match its DuckDB oracle there too — the driver
fixture is benign, this is where off-by-ones live (md5 of UTF-8,
len(ws)<3 shingle fallback, empty-split behavior, DEFAULT_RATE langs)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

TEXTS = [
    "",                                    # empty doc
    "   ",                                 # whitespace only
    "one",                                 # single word (< shingle width)
    "one two",                             # two words
    "alpha beta gamma delta",              # shares a shingle with doc 5
    "alpha beta gamma epsilon",            # near-dup of doc 4
    "héllo wörld häßlich ünïcode wörld",   # non-ASCII tokens, repeat
    "alpha beta gamma delta",              # exact dup of doc 4
]
LANGS = ["en", "de", "xx", "zh", "en", "en", "fr", "en"]  # xx → DEFAULT_RATE


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(TEXTS))), pa.int64()),
            "text": pa.array(TEXTS),
            "lang": pa.array(LANGS),
            "source": pa.array([f"s{i}n{i * 7}" for i in range(len(TEXTS))]),
            "n_chars": pa.array([len(x) for x in TEXTS], pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet')"
    )
    return c


# documents-only SQL-checked queries (others read events/lineitem/etc.)
DOC_QUERIES = [
    "dedup_exact_first",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_incremental",
    "decontaminate",
    "assemble_corpus",
    "split_assign",
    "mix_sample",
    "group_sample",
    "inverted_index",
    "text_embed_counts",
    "gram_matrix",
    "text_token_count",
    "text_quality_counts",
    "text_redact",
    "text_fingerprint32",
    "text_fingerprint",
    "m2_extract_number",
    "m3_take_before",
    "f4_permissive_cast",
    "pagerank",
    "triangle_count",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_corpus_matches_oracle(name, edge_dir, edge_con):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = queries[name](edge_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = edge_con.execute(oracles[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    g, w = _canon(got), _canon(want)
    assert list(g.dtypes) == list(w.dtypes), (g.dtypes.to_dict(), w.dtypes.to_dict())
    pd.testing.assert_frame_equal(g, w)
