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
    "dedup_containment",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_incremental",
    "decontaminate",
    "assemble_corpus",
    "split_assign",
    "mix_sample",
    "dsir_weights",
    "dsir_sample",
    "table_diff",
    "group_sample",
    "inverted_index",
    "collocations",
    "text_gopher_repetition",
    "lm_score",
    "search_conjunctive",
    "pack_sequences",
    "bm25_topk",
    "langid_confusion",
    "fingerprint_collisions",
    "text_top_keyword",
    "text_embed_counts",
    "gram_matrix",
    "text_token_count",
    "text_bpe_token_count",
    "text_score",
    "text_classify",
    "text_word_freq",
    "dedup_simhash",
    "dup_span_fraction",
    "dedup_exact_substr",
    "src_jsonl",
    "text_quality_counts",
    "text_redact",
    "text_fingerprint32",
    "text_fingerprint",
    "m2_extract_number",
    "m3_take_before",
    "f4_permissive_cast",
    "pagerank",
    "triangle_count",
    "graph_degree_hist",
    "bfs_levels",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def test_graph_shuffle_path_matches_dense(edge_dir, monkeypatch):
    """The join/groupby shuffle path (the beyond-2²¹-nodes scale story)
    stays bit-identical to the dense fast path the fixtures normally
    exercise — without this, a shuffle-path regression would only
    surface at >2M docs or non-contiguous ids in production."""
    from crawlkit.pipelines import graph

    def canon(df):
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        return df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)

    dense_pr = canon(graph.pagerank(edge_dir))
    dense_bfs = canon(graph.bfs_levels(edge_dir))
    monkeypatch.setattr(graph, "_DENSE_MAX_NODES", 0)  # force shuffle path
    pd.testing.assert_frame_equal(canon(graph.pagerank(edge_dir)), dense_pr)
    pd.testing.assert_frame_equal(canon(graph.bfs_levels(edge_dir)), dense_bfs)


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


# --- events-table edge corpus: timestamp TIES, boundary values, single
# user, same-hour bursts — where window tie-breaks and boundary
# comparisons live ---------------------------------------------------------

import datetime as _dt

_T0 = _dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    rows = [
        # user 1: three events at the IDENTICAL timestamp (tie-break by
        # event_id), values at the 50.0 / 90.0 filter boundaries
        (0, _T0, 1, "click", 50.0),
        (1, _T0, 1, "purchase", 90.0),
        (2, _T0, 1, "purchase", 90.01),
        # user 2: a view→click→purchase funnel inside one hour, then a
        # session gap of exactly 30 minutes (boundary of the 1800s rule)
        (3, _T0, 2, "view", 1.0),
        (4, _T0 + _dt.timedelta(minutes=10), 2, "click", 2.0),
        (5, _T0 + _dt.timedelta(minutes=20), 2, "purchase", 3.0),
        (6, _T0 + _dt.timedelta(minutes=50), 2, "view", 4.0),
        # user 3: single event (windows of size one, LAG null path)
        (7, _T0 + _dt.timedelta(hours=2), 3, "error", 0.009),  # floor→0 cents
        # user 4: descending event_id vs ascending ts (order separation)
        (9, _T0 + _dt.timedelta(hours=3), 4, "click", 77.77),
        (8, _T0 + _dt.timedelta(hours=3, minutes=1), 4, "click", 77.77),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([f'{{"k": {r[0]}}}' for r in rows]),
        }
    )
    pq.write_table(t, d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_events_con(edge_events_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{edge_events_dir}/events.parquet')"
    )
    return c


EVENT_QUERIES = [
    "g1_group_merge",
    "src_csv",
    "g2_running_max",
    "d1_distinct",
    "f1_filter",
    "m13_json_extract",
    "o1_sort_topk",
    "u_union",
    "s_except",
    "s_intersect",
    "sample_deterministic",
    "w_tumbling",
    "w_sliding",
    "w_session",
    "j_interval_overlap",
    "w_running_distinct",
    "j_time_self",
    "j_asof_nearest",
    "w_gaps_islands",
    "event_bursts",
    "w_lag_delta",
    "w_rolling_sum",
    "w_rolling_max",
    "w_first_last",
    "w_percent_rank",
    "topk_per_group",
    "median_disc",
    "percentile_hist",
    "winsorize",
    "count_distinct_exact",
    "heavy_hitters",
    "mode_per_group",
    "funnel_conversion",
    "cohort_retention",
    "corr_moments",
    "cube_agg",
    "zscore_outliers",
    "mad_outliers",
    "path_trigrams",
    "data_profile",
    "skew_audit",
    "event_transitions",
    "cooccurrence_pairs",
    "sequence_match",
    "scd2_intervals",
    "s_except_all",
    "attribution_last_touch",
    "active_users_rolling",
]


@pytest.mark.parametrize("name", sorted(set(EVENT_QUERIES)))
def test_edge_events_matches_oracle(name, edge_events_dir, edge_events_con):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = queries[name](edge_events_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = edge_events_con.execute(oracles[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    g, w = _canon(got), _canon(want)
    assert list(g.dtypes) == list(w.dtypes), (g.dtypes.to_dict(), w.dtypes.to_dict())
    pd.testing.assert_frame_equal(g, w)


# --- lineitem/orders edge corpus: the q1 shipdate boundary (<=), empty
# m6 ranges (max linenumber = 1), floor-to-zero cents, dangling join
# keys (orderkey absent from orders), quantity/discount rank ties -------


@pytest.fixture(scope="module")
def edge_tpch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_tpch")
    li = [
        # okey, lineno, qty, extprice, disc, tax, rf, ls, shipdate
        (1, 1, 1.0, 0.009, 0.0, 0.0, "A", "F", _dt.datetime(1998, 9, 2)),   # boundary date IN; floor→0 cents
        (1, 2, 1.0, 100.0, 0.1, 0.0, "A", "F", _dt.datetime(1998, 9, 3)),   # boundary date OUT
        (2, 1, 5.0, 200.0, 0.05, 0.0, "N", "O", _dt.datetime(1997, 1, 1)),  # max lineno = 1 → m6 empty range
        (3, 1, 5.0, 300.0, 0.05, 0.0, "N", "O", _dt.datetime(1997, 6, 1)),  # qty tie with okey 2
        (3, 2, 50.0, 400.0, 0.0, 0.0, "R", "F", _dt.datetime(1996, 1, 1)),
        (4, 1, 50.0, 999.99, 0.1, 0.0, "R", "F", _dt.datetime(1995, 1, 1)), # okey 4 DANGLING (not in orders)
        # okey 5-free; okey 2 shipped within 30 days of o_orderdate → non-empty range join
        (2, 2, 7.0, 10.0, 0.0, 0.0, "N", "O", _dt.datetime(1995, 1, 15)),
    ]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
            "l_partkey": pa.array([1] * len(li), pa.int64()),
            "l_suppkey": pa.array([1] * len(li), pa.int64()),
            "l_linenumber": pa.array([r[1] for r in li], pa.int64()),
            "l_quantity": pa.array([r[2] for r in li], pa.float64()),
            "l_extendedprice": pa.array([r[3] for r in li], pa.float64()),
            "l_discount": pa.array([r[4] for r in li], pa.float64()),
            "l_tax": pa.array([r[5] for r in li], pa.float64()),
            "l_returnflag": pa.array([r[6] for r in li]),
            "l_linestatus": pa.array([r[7] for r in li]),
            "l_shipdate": pa.array([r[8] for r in li], pa.timestamp("us")),
        }
    )
    pq.write_table(t, d / "lineitem.parquet")
    od = [
        (1, "1-URGENT", "O", 100.0),
        (2, "3-MEDIUM", "F", 200.0),
        (3, "1-URGENT", "O", 300.0),
        # okey 4 deliberately absent (dangling lineitem side)
        (5, "1-URGENT", "O", 500.0),  # order with no lineitems
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in od], pa.int64()),
            "o_custkey": pa.array([1] * len(od), pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in od]),
            "o_totalprice": pa.array([r[3] for r in od], pa.float64()),
            "o_orderdate": pa.array([_dt.datetime(1995, 1, 1)] * len(od), pa.timestamp("us")),
            "o_orderpriority": pa.array([r[1] for r in od]),
        }
    )
    pq.write_table(t, d / "orders.parquet")
    cu = [
        (1, "BUILDING"),   # urgent spend exists
        (2, "BUILDING"),   # no urgent orders → left-null path
        (3, "MACHINERY"),  # urgent spend outside BUILDING → right-only path
    ]
    t = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in cu], pa.int64()),
            "c_name": pa.array([f"c{r[0]}" for r in cu]),
            "c_nationkey": pa.array([0] * len(cu), pa.int64()),
            "c_acctbal": pa.array([0.0] * len(cu), pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in cu]),
        }
    )
    pq.write_table(t, d / "customer.parquet")
    # part: skyline adversaries — identical frontier duplicates (both
    # kept: neither strictly dominates), price tie with a smaller size
    # (dominated), size tie at a higher price (dominated), a
    # floor-boundary price (9.999 → 999 cents beats 10.00 → 1000)
    pt = [
        # pkey, size, retailprice
        (1, 10, 5.00),    # frontier
        (2, 10, 5.00),    # identical duplicate of 1 → BOTH kept
        (3, 8, 5.00),     # same price, smaller size → dominated by 1
        (4, 10, 6.00),    # same size, higher price → dominated by 1
        (5, 20, 9.999),   # floor → 999 cents, frontier
        (6, 20, 10.00),   # 1000 cents, size tie → dominated by 5
        (7, 1, 1.00),     # cheapest → frontier regardless of size
        (8, 15, 7.50),    # frontier (no cheaper part has size ≥ 15)
        (9, 12, 8.00),    # interior → dominated by 8
    ]
    t = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in pt], pa.int64()),
            "p_name": pa.array([f"part{r[0]}" for r in pt]),
            "p_brand": pa.array(["B1"] * len(pt)),
            "p_type": pa.array(["T1"] * len(pt)),
            "p_size": pa.array([r[1] for r in pt], pa.int32()),
            "p_retailprice": pa.array([r[2] for r in pt], pa.float64()),
        }
    )
    pq.write_table(t, d / "part.parquet")
    t = pa.table(
        {
            "n_nationkey": pa.array([0], pa.int64()),
            "n_name": pa.array(["NATION0"]),
            "n_regionkey": pa.array([0], pa.int64()),
        }
    )
    pq.write_table(t, d / "nation.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_tpch_con(edge_tpch_dir):
    c = duckdb.connect()
    for tbl in ("lineitem", "orders", "customer", "part", "nation"):
        c.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{edge_tpch_dir}/{tbl}.parquet')"
        )
    return c


TPCH_QUERIES = [
    "q1_pricing",
    "m6_range_expand",
    "j_hash_join",
    "j_shuffle_join",
    "j_bloom_semi",
    "j_bloom_anti",
    "spearman_moments",
    "rollup_agg",
    "pivot_wide",
    "j_keyed_range",
    "j_left_outer",
    "j_full_outer",
    "skyline_pareto",
    "q10_returned",
    "zorder_layout",
]


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_edge_tpch_matches_oracle(name, edge_tpch_dir, edge_tpch_con):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = queries[name](edge_tpch_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = edge_tpch_con.execute(oracles[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    g, w = _canon(got), _canon(want)
    assert list(g.dtypes) == list(w.dtypes), (g.dtypes.to_dict(), w.dtypes.to_dict())
    pd.testing.assert_frame_equal(g, w)


# --- embeddings edge corpus: exact-duplicate vectors (cosine TIES →
# vec_id tie-break), antipodal pairs, negative components, tiny values
# near the 1e-6 centroid quantum ------------------------------------------

import numpy as np


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_emb")
    dim = 64
    base = np.linspace(-1.0, 1.0, dim, dtype=np.float32)
    rows = {
        0: base,                        # query (vec_id % 50 == 0)
        1: base.copy(),                 # EXACT duplicate of the query
        2: -base,                       # antipodal (cosine −1)
        3: np.roll(base, 1),            # near-tie neighbor
        4: np.roll(base, 2),
        5: np.roll(base, 5),
        6: np.roll(base, 7),
        50: np.roll(base, 3),           # second query
        51: np.roll(base, 3).copy(),    # its exact duplicate
        # NOTE deliberately absent: ε-magnitude and scaled-parallel
        # vectors — their cosines differ from a competitor's only in the
        # last float bits, where engine (normalized matmul) and DuckDB
        # (list_cosine_similarity) may legitimately round opposite ways
        # and flip an order that is a true tie in real arithmetic. Exact
        # DUPLICATES are kept: within each system the duplicate's sim is
        # computed identically, so the id tie-break decides in both.
    }
    t = pa.table(
        {
            "vec_id": pa.array(sorted(rows), pa.int64()),
            "embedding": pa.array(
                [rows[k].tolist() for k in sorted(rows)], pa.list_(pa.float32())
            ),
            "label": pa.array([k % 3 for k in sorted(rows)], pa.int32()),
        }
    )
    pq.write_table(t, d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_emb_con(edge_emb_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{edge_emb_dir}/embeddings.parquet')"
    )
    return c


@pytest.mark.parametrize(
    "name", ["knn_bruteforce", "emb_centroid", "knn_reciprocal", "emb_quantize_int8"]
)
def test_edge_embeddings_matches_oracle(name, edge_emb_dir, edge_emb_con):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = queries[name](edge_emb_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = edge_emb_con.execute(oracles[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    g, w = _canon(got), _canon(want)
    assert list(g.dtypes) == list(w.dtypes)
    pd.testing.assert_frame_equal(g, w)


def test_every_documents_only_oracle_is_edge_covered(edge_con):
    """Sync guard: any SQL-checked query whose oracle needs ONLY the
    documents table must be in DOC_QUERIES (edge coverage is the layer
    that catches off-by-ones the benign sf fixtures never trip — a new
    doc-only op that skips it is a coverage hole, not a choice)."""
    for name, sql in entrymod.oracle_sql().items():
        if "/tmp/crawlkit_oracle/" in sql:
            # manifest-backed oracle (generator-intent parquet, not an
            # sf table) — its adversarial coverage lives in the codec/
            # crawl harnesses (test_edge_codecs, test_crawl_golden),
            # not in the documents edge corpus
            continue
        try:
            edge_con.execute("EXPLAIN " + sql)
        except Exception:
            continue  # needs tables beyond documents → other fixtures
        assert name in DOC_QUERIES, f"{name} is documents-only but not edge-covered"
